"""NWPU-Crowd test-set submission generator.

Loads a trained checkpoint, predicts counts for the 1500 unlabeled test
images (optionally sliding-window), and writes the crowdbenchmark.com
submission file: lines of "{image_id} {count}" with NO trailing newline
(reference test_nwpu.py:89-116).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generate NWPU test predictions.")
    p.add_argument("--model", type=str, default="clip_vit_b_16")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--reduction", type=int, default=8, choices=[8, 16, 32])
    p.add_argument("--regression", action="store_true")
    p.add_argument("--truncation", type=int, default=4)
    p.add_argument("--anchor_points", type=str, default="average", choices=["average", "middle"])
    p.add_argument("--prompt_type", type=str, default="word", choices=["word", "number"])
    p.add_argument("--granularity", type=str, default="fine", choices=["fine", "dynamic", "coarse"])
    p.add_argument("--num_vpt", type=int, default=32)
    p.add_argument("--vpt_drop", type=float, default=0.0)
    p.add_argument("--shallow_vpt", action="store_true")
    p.add_argument("--weight_path", type=str, default=None,
                   help="checkpoint dir: a best/* snapshot or a ckpt dir with latest/")
    p.add_argument("--pretrained", type=str, default=None,
                   help="torch checkpoint (.pt/.pth) to convert and load "
                        "(e.g. a reference-trained CLIP-EBC state dict). "
                        "NOTE: --weight_path restores a complete trained "
                        "snapshot and fully replaces it; --pretrained only "
                        "matters when --weight_path is absent")
    p.add_argument("--allow_byte_tokenizer", action="store_true",
                   help="permit pretrained CLIP text towers without the real "
                   "BPE vocab (synthetic-weight testing ONLY)")
    p.add_argument("--sliding_window", action="store_true")
    p.add_argument("--window_size", type=int, default=None)
    p.add_argument("--stride", type=int, default=None, help="defaults to window_size//2 (reference test_nwpu.py:75)")
    p.add_argument("--strategy", type=str, default="average", choices=["average", "max"])
    p.add_argument("--resize_to_multiple", action="store_true")
    p.add_argument("--zero_pad_to_multiple", action="store_true")
    p.add_argument("--pad_to_multiple", type=int, default=0,
                   help="zero-pad images up to this multiple to bucket eval "
                        "shapes (bounds XLA recompiles on NWPU's ~2000 sizes); "
                        "0 disables")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--result_dir", type=str, default="nwpu_test_results")
    p.add_argument("--amp", action="store_true")
    p.add_argument("--quant", type=str, default="none",
                   choices=["none", "int8", "int8_static"],
                   help="W8A8 int8 inference matmuls in the CLIP ViT trunk "
                        "(TPU MXU int8 path; no reference equivalent). "
                        "int8_static calibrates per-tensor activation scales "
                        "on the first --calib_images and skips the per-matmul "
                        "max-reduction the dynamic mode pays")
    p.add_argument("--calib_images", type=int, default=2,
                   help="images used to calibrate int8_static activation scales")
    p.add_argument("--quant_attn", nargs="?", const="kernel", default=None,
                   choices=["kernel", "xla"],
                   help="with --quant int8_static: run QK^T/PV on the int8 "
                        "MXU with calibrated static q/k/v scales. 'kernel' "
                        "(bare flag) = inside the Pallas kernel "
                        "(ops/fused_attention.py); 'xla' = XLA integer "
                        "einsums (ops/int8_attention.py)")
    p.add_argument("--packed_eval", action="store_true",
                   help="with --sliding_window: pack windows across images "
                        "into fixed-size forward batches (one compiled trunk "
                        "program for the whole run, no per-image padding "
                        "waste; ops/packed_eval.py)")
    p.add_argument("--batch_windows", type=int, default=128,
                   help="forward batch size for --packed_eval")
    p.add_argument("--limit", type=int, default=None, help="process only the first N images (smoke tests)")
    p.add_argument("--disable_size_check", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.sliding_window:
        args.window_size = args.input_size if args.window_size is None else args.window_size
        # NOTE: unlike the training driver, the reference NWPU driver
        # defaults stride to window//2
        args.stride = args.window_size // 2 if args.stride is None else args.stride

    import jax
    import jax.numpy as jnp

    from ..config import get_bins_and_anchors
    from ..data import NWPUTestDataset
    from ..data.transforms import Resize2Multiple, ZeroPad2Multiple
    from ..models import get_model
    from ..training.evaluate import Evaluator
    from ._common import calibrate_static_int8, check_quant_support, load_weights

    check_quant_support(args.quant, args.model)
    bins = anchors = None
    if not args.regression:
        bins, anchors = get_bins_and_anchors(
            args.reduction, args.truncation, "nwpu", args.granularity, args.anchor_points
        )

    if args.quant_attn and args.quant != "int8_static":
        raise SystemExit("--quant_attn requires --quant int8_static")
    if args.packed_eval and not args.sliding_window:
        raise SystemExit("--packed_eval requires --sliding_window")
    dtype = jnp.bfloat16 if args.amp else jnp.float32
    model_kw = dict(
        prompt_type=args.prompt_type, num_vpt=args.num_vpt,
        deep_vpt=not args.shallow_vpt, vpt_drop=args.vpt_drop, dtype=dtype,
        quant_int8=args.quant.startswith("int8"),
        quant_attn={"kernel": True, "xla": "xla", None: False}[args.quant_attn],
    )
    model = get_model(
        args.model, args.input_size, args.reduction, bins, anchors,
        quant_mode="static" if args.quant == "int8_static" else "dynamic",
        **model_kw,
    )
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.input_size, args.input_size, 3)), train=False
    )

    variables = load_weights(args, model, template)

    if args.quant == "int8_static":
        calib_ds = NWPUTestDataset(
            data_root=args.data_root, check_sizes=not args.disable_size_check
        )
        variables = calibrate_static_int8(
            args, model_kw, bins, anchors, variables,
            (calib_ds[i][0] for i in range(min(args.calib_images, len(calib_ds)))),
        )

    transforms = None
    if args.sliding_window and args.resize_to_multiple:
        transforms = Resize2Multiple(args.window_size, args.stride)
    elif args.sliding_window and args.zero_pad_to_multiple:
        transforms = ZeroPad2Multiple(args.window_size, args.stride)

    dataset = NWPUTestDataset(
        data_root=args.data_root, transforms=transforms,
        check_sizes=not args.disable_size_check,
    )
    evaluator = Evaluator(
        model, reduction=args.reduction,
        sliding_window=args.sliding_window, window_size=args.window_size,
        stride=args.stride, strategy=args.strategy,
        pad_to_multiple=args.pad_to_multiple,
    )

    n = len(dataset) if args.limit is None else min(args.limit, len(dataset))
    lines = []
    if args.packed_eval:
        names = []

        def images():
            for i in range(n):
                image, name = dataset[i]
                names.append(name)
                yield image

        densities = evaluator.predict_densities_packed(
            variables, images(), batch_windows=args.batch_windows
        )
        for i, density in enumerate(densities):
            count = float(density.sum())
            lines.append(f"{os.path.splitext(names[i])[0]} {count}")
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{n}")
    else:
        for i in range(n):
            image, name = dataset[i]
            count = evaluator.predict_count(variables, image)
            lines.append(f"{os.path.splitext(name)[0]} {count}")
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{n}")

    os.makedirs(args.result_dir, exist_ok=True)
    src = args.weight_path if args.weight_path is not None else args.pretrained
    tag = os.path.basename(os.path.normpath(src))
    parent = os.path.basename(os.path.dirname(os.path.normpath(src)))
    out_path = os.path.join(args.result_dir, f"{parent}_{tag}.txt".lstrip("_"))
    with open(out_path, "w") as f:
        f.write("\n".join(lines))  # no trailing newline (reference :111-116)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
