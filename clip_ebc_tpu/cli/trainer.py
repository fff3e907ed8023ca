"""Training driver CLI.

Flag surface mirrors the reference's argparse (reference trainer.py:22-85)
plus TPU-specific knobs (--data_root, --bf16, --max_points). There is no
mp.spawn / process-per-device: a single process drives the whole mesh
(multi-host runs launch one process per host and call
jax.distributed.initialize via --coordinator/--num_hosts/--host_id).

Usage example (ShanghaiTech B, DMCount-EBC VGG-19):
  python -m clip_ebc_tpu.cli.trainer --model vgg19_ae --dataset shb \
      --input_size 448 --reduction 8 --truncation 4 --count_loss dmcount
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train an EBC crowd-counting model (TPU).")
    # Model
    p.add_argument("--model", type=str, default="vgg19_ae")
    p.add_argument("--input_size", type=int, default=448)
    p.add_argument("--reduction", type=int, default=8, choices=[8, 16, 32])
    p.add_argument("--regression", action="store_true", help="blockwise regression instead of classification")
    p.add_argument("--truncation", type=int, default=None)
    p.add_argument("--anchor_points", type=str, default="average", choices=["average", "middle"])
    p.add_argument("--prompt_type", type=str, default="word", choices=["word", "number"])
    p.add_argument("--granularity", type=str, default="fine", choices=["fine", "dynamic", "coarse"])
    p.add_argument("--num_vpt", type=int, default=32)
    p.add_argument("--vpt_drop", type=float, default=0.0)
    p.add_argument("--shallow_vpt", action="store_true")
    # Dataset
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_crops", type=int, default=1)
    p.add_argument("--min_scale", type=float, default=1.0)
    p.add_argument("--max_scale", type=float, default=2.0)
    p.add_argument("--brightness", type=float, default=0.1)
    p.add_argument("--contrast", type=float, default=0.1)
    p.add_argument("--saturation", type=float, default=0.1)
    p.add_argument("--hue", type=float, default=0.0)
    p.add_argument("--kernel_size", type=int, default=5)
    p.add_argument("--saltiness", type=float, default=1e-3)
    p.add_argument("--spiciness", type=float, default=1e-3)
    p.add_argument("--jitter_prob", type=float, default=0.2)
    p.add_argument("--blur_prob", type=float, default=0.2)
    p.add_argument("--noise_prob", type=float, default=0.5)
    # Evaluation
    p.add_argument("--sliding_window", action="store_true")
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--window_size", type=int, default=None)
    p.add_argument("--strategy", type=str, default="average", choices=["average", "max"])
    p.add_argument("--resize_to_multiple", action="store_true")
    p.add_argument("--zero_pad_to_multiple", action="store_true")
    p.add_argument("--pad_to_multiple", type=int, default=0,
                   help="zero-pad eval images up to this multiple so full-image "
                        "eval compiles one XLA program per size *bucket* instead "
                        "of per distinct size (e.g. 256 keeps NWPU-val to a "
                        "handful of programs); 0 disables")
    # Loss
    p.add_argument("--weight_count_loss", type=float, default=1.0)
    p.add_argument("--count_loss", type=str, default="mae", choices=["mae", "mse", "dmcount"])
    # Optimizer / schedule
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--warmup_epochs", type=int, default=50)
    p.add_argument("--warmup_lr", type=float, default=1e-6)
    p.add_argument("--T_0", type=int, default=5)
    p.add_argument("--T_mult", type=int, default=2)
    p.add_argument("--eta_min", type=float, default=1e-7)
    # Training
    p.add_argument("--total_epochs", type=int, default=2600)
    p.add_argument("--eval_start", type=int, default=50)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--save_freq", type=int, default=5)
    p.add_argument("--save_best_k", type=int, default=3)
    p.add_argument("--amp", action="store_true", help="bf16 compute (TPU AMP)")
    p.add_argument("--num_workers", type=int, default=4,
                   help="loader prefetch threads (decode/aug overlap)")
    p.add_argument("--loader_procs", type=int, default=0,
                   help="loader WORKER PROCESSES (torch DataLoader analog; "
                        "the numpy aug pipeline is GIL-bound, so threads "
                        "cannot use more than ~1 core — set to ~cores/2 on "
                        "real TPU-VM hosts to feed the chip)")
    p.add_argument("--seed", type=int, default=42)
    # TPU / paths
    p.add_argument("--pretrained", type=str, default=None,
                   help="torch checkpoint (.pt/.pth) to initialize from: an "
                        "OpenAI CLIP, torchvision VGG/ViT/ResNet, or reference "
                        "CLIP-EBC state dict (auto-detected and converted; "
                        "replaces the reference's download-at-import flow, "
                        "reference models/clip/_clip/prepare.py:43-95)")
    p.add_argument("--allow_byte_tokenizer", action="store_true",
                   help="permit loading pretrained CLIP text towers without "
                   "the real BPE vocab (synthetic-weight testing ONLY; text "
                   "features will not match the pretrained embedding space)")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--max_points", type=int, default=0,
                   help="per-image point pad for the OT loss; 0 (default) "
                   "auto-sizes from the dataset's max annotation count so "
                   "no point is ever truncated (the reference's OT uses "
                   "every GT point, reference losses/dm_loss.py:48)")
    p.add_argument("--eval_disable_size_check", action="store_true")
    # Multi-host
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_hosts", type=int, default=1)
    p.add_argument("--host_id", type=int, default=0)
    # Observability
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler device trace of the first resumed epoch")
    # TPU performance knobs
    p.add_argument("--attn_backend", type=str, default="auto", choices=["auto", "flash", "sdpa"])
    p.add_argument("--fused_head", type=str, default="auto", choices=["auto", "on", "off"])
    p.add_argument("--decoder_before_upsample", action="store_true",
                   help="TPU-optimized CLIP-EBC head order (non-reference; see KNOWN_DIFFERENCES)")
    return p


def config_from_args(args) -> "ExperimentConfig":
    from ..config import ExperimentConfig

    fields = {f.name for f in dataclasses.fields(ExperimentConfig)}
    kwargs = {k: v for k, v in vars(args).items() if k in fields}
    return ExperimentConfig(**kwargs).normalize()


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    from ..config import ExperimentConfig  # noqa: F401  (resolved above)
    from ..data import CrowdDataset, TrainLoader, make_eval_transforms, make_train_transforms
    from ..losses import make_loss_fn
    from ..models import get_model
    from ..parallel.mesh import initialize_distributed
    from ..training import Trainer
    from ..training.checkpoint import CheckpointManager
    from ..training.evaluate import Evaluator, evaluate
    from ..utils import MetricWriter, get_logger

    initialize_distributed(args.coordinator, args.num_hosts, args.host_id)
    cfg = config_from_args(args)

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.amp else jnp.float32
    is_host0 = jax.process_index() == 0

    logger = get_logger(os.path.join(cfg.ckpt_dir, "train.log") if is_host0 else None)
    logger.info("config: %s", cfg)

    model = get_model(
        cfg.model,
        cfg.input_size,
        cfg.reduction,
        cfg.bins,
        cfg.bin_anchors,
        prompt_type=cfg.prompt_type,
        num_vpt=cfg.num_vpt,
        deep_vpt=not cfg.shallow_vpt,
        vpt_drop=cfg.vpt_drop,
        dtype=dtype,
        attn_backend=args.attn_backend,
        fused_head=args.fused_head,
        decoder_before_upsample=args.decoder_before_upsample,
    )
    loss_fn = make_loss_fn(cfg)
    trainer = Trainer(cfg, model, loss_fn)
    logger.info("mesh: %s (%d devices)", trainer.mesh, trainer.mesh.devices.size)

    train_ds = CrowdDataset(
        cfg.dataset, "train", data_root=cfg.data_root,
        transforms=make_train_transforms(cfg), num_crops=cfg.num_crops,
        check_sizes=not args.eval_disable_size_check,
    )
    loader = TrainLoader(
        train_ds,
        batch_size=cfg.batch_size,
        reduction=cfg.reduction,
        max_points=args.max_points or None,
        seed=cfg.seed,
        num_threads=cfg.num_workers,
        num_workers=args.loader_procs,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
    )

    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), next(iter(loader)))
    if args.pretrained:
        from ..models.pretrained import apply_pretrained
        from ..parallel.mesh import replicate_array

        host_vars = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        loaded = apply_pretrained(
            model, host_vars, args.pretrained,
            allow_byte_tokenizer=getattr(args, "allow_byte_tokenizer", False),
        )

        def _put(tree):
            # replicate_array, not device_put: every host holds the same
            # converted numpy tree, and a plain device_put onto a global
            # NamedSharding is single-process-only (parallel/mesh.py).
            return jax.tree_util.tree_map(
                lambda x: replicate_array(trainer.mesh, np.asarray(x)), tree
            )

        state = state.replace(
            params=_put(loaded["params"]),
            batch_stats=_put(loaded.get("batch_stats", host_vars["batch_stats"])),
        )
        logger.info("initialized from pretrained checkpoint %s", args.pretrained)
    ckpt = CheckpointManager(cfg.ckpt_dir, cfg.save_best_k)
    start_epoch = 1
    resumed = ckpt.restore_latest(state)
    if resumed is not None:
        state, start_epoch = resumed
        logger.info("resumed from %s at epoch %d", cfg.ckpt_dir, start_epoch)

    writer = MetricWriter(cfg.ckpt_dir) if is_host0 else None
    # Eval runs on EVERY host: the Evaluator shards window batches over the
    # global mesh, so a single-host eval would deadlock the collective
    # (unlike the reference's rank-0-only eval, reference trainer.py:161-179;
    # under SPMD all processes execute the same program and host 0 logs).
    val_ds = CrowdDataset(
        cfg.dataset, "val", data_root=cfg.data_root,
        transforms=make_eval_transforms(cfg),
        check_sizes=not args.eval_disable_size_check,
    )
    evaluator = Evaluator(
        model,
        reduction=cfg.reduction,
        sliding_window=cfg.sliding_window,
        window_size=cfg.window_size,
        stride=cfg.stride,
        strategy=args.strategy,
        pad_to_multiple=args.pad_to_multiple,
        mesh=trainer.mesh,  # shard window batches across the pod
    )

    from ..utils.profiling import trace

    for epoch in range(start_epoch, cfg.total_epochs + 1):
        t0 = time.time()
        with trace(args.profile_dir, enabled=bool(args.profile_dir) and epoch == start_epoch + 1):
            state, metrics = trainer.train_epoch(state, loader, epoch)
        logger.info(
            "epoch %d/%d (%.1fs): %s", epoch, cfg.total_epochs, time.time() - t0,
            " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
        )
        if writer:
            writer.write_scalars(epoch, {f"train/{k}": v for k, v in metrics.items()})

        if epoch >= cfg.eval_start and (epoch - cfg.eval_start) % cfg.eval_freq == 0:
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            scores = evaluate(evaluator, variables, val_ds,
                              decode_procs=args.loader_procs)
            best = ckpt.update_best(scores, epoch, variables)  # collective
            if is_host0:
                logger.info(
                    "eval epoch %d: mae=%.2f rmse=%.2f | best mae=%s", epoch,
                    scores["mae"], scores["rmse"],
                    [f"{s:.2f}@{e}" for s, e in best["mae"]],
                )
                writer.write_scalars(epoch, {f"val/{k}": v for k, v in scores.items()})

        if epoch % cfg.save_freq == 0 or epoch == cfg.total_epochs:
            ckpt.save_latest(state, epoch, metrics)  # collective

    if writer:
        writer.close()


if __name__ == "__main__":
    main()
