"""Export a serving artifact: serialized StableHLO inference program.

TPU-native replacement for the reference's serve-by-rerunning-Python
pattern (reference test_nwpu.py:55-68 rebuilds the torch module and loads
a .pth per run): lower the inference function ONCE — on any host, for any
target platform — into a self-contained ``.jaxexp`` file (weights and
frozen text features baked in) plus a JSON manifest, then serve it with a
thin loader (clip_ebc_tpu.export.load_exported) and zero model code.

Examples:
  # window forward, symbolic batch, TPU target, from a CPU-only host
  python -m clip_ebc_tpu.cli.export_model --model clip_vit_b_16 \
      --weight_path ckpt_dir --platforms tpu --out serve/clip_win.jaxexp

  # whole sliding-window pipeline for a fixed 2048x3072 image shape
  python -m clip_ebc_tpu.cli.export_model --mode pipeline \
      --image_h 2048 --image_w 3072 --sliding_window \
      --out serve/clip_pipe.jaxexp
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export the inference program as serialized StableHLO."
    )
    p.add_argument("--mode", type=str, default="window",
                   choices=["window", "pipeline"],
                   help="'window': fixed-window batched forward (B may be "
                   "symbolic); 'pipeline': whole sliding-window program at "
                   "a fixed image shape")
    p.add_argument("--model", type=str, default="clip_vit_b_16")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--reduction", type=int, default=8, choices=[8, 16, 32])
    p.add_argument("--regression", action="store_true")
    p.add_argument("--truncation", type=int, default=4)
    p.add_argument("--anchor_points", type=str, default="average",
                   choices=["average", "middle"])
    p.add_argument("--prompt_type", type=str, default="word",
                   choices=["word", "number"])
    p.add_argument("--granularity", type=str, default="fine",
                   choices=["fine", "dynamic", "coarse"])
    p.add_argument("--bins_dataset", type=str, default="qnrf")
    p.add_argument("--num_vpt", type=int, default=32)
    p.add_argument("--shallow_vpt", action="store_true")
    p.add_argument("--weight_path", type=str, default=None)
    p.add_argument("--pretrained", type=str, default=None)
    p.add_argument("--allow_byte_tokenizer", action="store_true")
    p.add_argument("--random_init", action="store_true",
                   help="export with freshly initialized weights (shape / "
                   "latency testing only — no trained checkpoint required)")
    p.add_argument("--amp", action="store_true",
                   help="export a bfloat16 program (fp32 otherwise)")
    p.add_argument("--batch", type=int, default=0,
                   help="window-mode batch size; 0 = symbolic (one artifact "
                   "serves every batch size)")
    p.add_argument("--image_h", type=int, default=2048)
    p.add_argument("--image_w", type=int, default=3072)
    p.add_argument("--window_size", type=int, default=None)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--strategy", type=str, default="average",
                   choices=["average", "max"])
    p.add_argument("--shard_devices", type=int, default=0,
                   help="pipeline mode only: export a pod-sharded program "
                   "over a 1-D data mesh of this many devices (the window "
                   "batch is partitioned exactly as the live mesh-mode "
                   "pipeline); the artifact must then be served on that "
                   "many devices. 0 = single-device program")
    p.add_argument("--platforms", type=str, default="cpu",
                   help="comma-separated lowering targets (cpu,tpu); a tpu "
                   "artifact can be exported from a CPU-only host")
    p.add_argument("--no_bake_weights", action="store_true",
                   help="export weights as call-time arguments (sidecar "
                        ".weights.npz) instead of embedded constants: "
                        "small program, weight hot-swap, RPC-safe "
                        "compile payloads")
    p.add_argument("--out", type=str, required=True,
                   help="output path for the serialized program; a JSON "
                   "manifest is written alongside as <out>.json")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    window = args.window_size or args.input_size
    stride = args.stride or window

    import jax
    import jax.numpy as jnp

    from ..config import get_bins_and_anchors
    from ..export import export_pipeline, export_window_forward, save_exported
    from ..models import get_model
    from ._common import load_weights

    bins = anchors = None
    if not args.regression:
        bins, anchors = get_bins_and_anchors(
            args.reduction, args.truncation, args.bins_dataset,
            args.granularity, args.anchor_points,
        )
    dtype = jnp.bfloat16 if args.amp else jnp.float32
    model = get_model(
        args.model, args.input_size, args.reduction, bins, anchors,
        prompt_type=args.prompt_type, num_vpt=args.num_vpt,
        deep_vpt=not args.shallow_vpt, dtype=dtype,
    )
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.input_size, args.input_size, 3)), train=False,
    )
    variables = template if args.random_init else load_weights(args, model, template)

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    meta = {
        "model": args.model, "input_size": args.input_size,
        "reduction": args.reduction, "mode": args.mode,
        "weight_path": args.weight_path, "pretrained": args.pretrained,
        "dtype": "bfloat16" if args.amp else "float32",
    }
    bake = not args.no_bake_weights
    meta["bake_weights"] = bake
    weights = None
    if args.mode == "window":
        exp = export_window_forward(
            model, variables, window,
            batch=args.batch or None, dtype=dtype, platforms=platforms,
            bake_weights=bake,
        )
    else:
        mesh = None
        if args.shard_devices:
            from ..parallel.mesh import make_mesh

            devs = jax.devices()
            if len(devs) < args.shard_devices:
                raise SystemExit(
                    f"--shard_devices {args.shard_devices} > visible devices "
                    f"{len(devs)} (set XLA_FLAGS="
                    "--xla_force_host_platform_device_count=N to lower a "
                    "pod-sharded artifact on a small host)")
            mesh = make_mesh(devices=devs[: args.shard_devices])
        meta.update(image_shape=[args.image_h, args.image_w],
                    window=window, stride=stride, strategy=args.strategy,
                    shard_devices=args.shard_devices)
        exp = export_pipeline(
            model, variables, (args.image_h, args.image_w),
            window=(window, window), stride=(stride, stride),
            reduction=args.reduction, strategy=args.strategy,
            dtype=dtype, platforms=platforms, mesh=mesh,
            bake_weights=bake,
        )
    if not bake:
        exp, weights = exp
    save_exported(exp, args.out, meta, weights=weights)
    print(f"exported {args.mode} program -> {args.out} "
          f"(platforms={','.join(platforms)}; manifest {args.out}.json)")


if __name__ == "__main__":
    main()
