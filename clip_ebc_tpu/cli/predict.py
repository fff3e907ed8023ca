"""Generic inference driver: a directory (or list) of images -> per-image
crowd counts, optionally density maps.

The reference only ships the NWPU-specific submission driver
(reference test_nwpu.py); this is the deployment-shaped equivalent for
arbitrary images: same model/checkpoint/quantization flags as
``cli.test_nwpu``, but it walks any directory of jpg/png/npy images and
writes a CSV of counts (and ``.npy`` density maps with ``--save_density``).
"""

from __future__ import annotations

import argparse
import glob
import os
import re


IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".npy")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Predict crowd counts for images.")
    p.add_argument("images", type=str,
                   help="image file, directory, or glob pattern")
    p.add_argument("--model", type=str, default="clip_vit_b_16")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--reduction", type=int, default=8, choices=[8, 16, 32])
    p.add_argument("--regression", action="store_true")
    p.add_argument("--truncation", type=int, default=4)
    p.add_argument("--anchor_points", type=str, default="average", choices=["average", "middle"])
    p.add_argument("--prompt_type", type=str, default="word", choices=["word", "number"])
    p.add_argument("--granularity", type=str, default="fine", choices=["fine", "dynamic", "coarse"])
    p.add_argument("--bins_dataset", type=str, default="qnrf",
                   help="dataset whose bin table to use (the bins were derived per dataset)")
    p.add_argument("--num_vpt", type=int, default=32)
    p.add_argument("--shallow_vpt", action="store_true")
    p.add_argument("--weight_path", type=str, default=None)
    p.add_argument("--pretrained", type=str, default=None)
    p.add_argument("--allow_byte_tokenizer", action="store_true",
                   help="permit pretrained CLIP text towers without the real "
                   "BPE vocab (synthetic-weight testing ONLY)")
    p.add_argument("--sliding_window", action="store_true")
    p.add_argument("--window_size", type=int, default=None)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--strategy", type=str, default="average", choices=["average", "max"])
    p.add_argument("--pad_to_multiple", type=int, default=None,
                   help="zero-pad images up to a multiple of this (counts "
                   "cover the valid region only). Default: the model's "
                   "divisibility requirement (ViT patch size, else the "
                   "reduction) so arbitrary-size images just work; 0 disables")
    p.add_argument("--amp", action="store_true")
    p.add_argument("--quant", type=str, default="none",
                   choices=["none", "int8", "int8_static"])
    p.add_argument("--calib_images", type=int, default=2)
    p.add_argument("--quant_attn", nargs="?", const="kernel", default=None,
                   choices=["kernel", "xla"],
                   help="with --quant int8_static: int8 QK^T/PV with "
                        "calibrated static q/k/v scales. 'kernel' (default "
                        "when the flag is given bare) runs them inside the "
                        "Pallas kernel; 'xla' as XLA integer einsums "
                        "(ops/int8_attention.py)")
    p.add_argument("--packed_eval", action="store_true",
                   help="with --sliding_window: pack windows across images "
                        "into fixed-size forward batches (ops/packed_eval.py)")
    p.add_argument("--batch_windows", type=int, default=128,
                   help="forward batch size for --packed_eval")
    p.add_argument("--out", type=str, default="predictions.csv")
    p.add_argument("--save_density", type=str, default=None,
                   help="directory for per-image density .npy files")
    return p


def _list_images(spec: str):
    if os.path.isdir(spec):
        paths = [
            p for p in sorted(glob.glob(os.path.join(spec, "*")))
            if os.path.splitext(p)[1].lower() in IMG_EXTS
        ]
    elif os.path.isfile(spec):
        paths = [spec]
    else:
        paths = sorted(glob.glob(spec))
    if not paths:
        raise SystemExit(f"no images found for {spec!r}")
    return paths


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.sliding_window:
        args.window_size = args.input_size if args.window_size is None else args.window_size
        args.stride = args.window_size // 2 if args.stride is None else args.stride
    if args.pad_to_multiple is None:
        # arbitrary-size images must not crash on the model's divisibility
        # check: ViT variants need patch-size multiples, CNNs reduction
        # multiples (the sliding-window path pads to the window on its own)
        m = re.search(r"vit_[a-z]+_(\d+)$", args.model)
        args.pad_to_multiple = int(m.group(1)) if m else args.reduction

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import get_bins_and_anchors
    from ..data.crowd import _load_image, normalize_image
    from ..models import get_model
    from ..training.evaluate import Evaluator
    from ._common import calibrate_static_int8, check_quant_support, load_weights

    check_quant_support(args.quant, args.model)
    paths = _list_images(args.images)

    bins = anchors = None
    if not args.regression:
        bins, anchors = get_bins_and_anchors(
            args.reduction, args.truncation, args.bins_dataset,
            args.granularity, args.anchor_points,
        )
    if args.quant_attn and args.quant != "int8_static":
        raise SystemExit("--quant_attn requires --quant int8_static")
    if args.packed_eval and not args.sliding_window:
        raise SystemExit("--packed_eval requires --sliding_window")
    dtype = jnp.bfloat16 if args.amp else jnp.float32
    model_kw = dict(
        prompt_type=args.prompt_type, num_vpt=args.num_vpt,
        deep_vpt=not args.shallow_vpt, dtype=dtype,
        quant_int8=args.quant.startswith("int8"),
        quant_attn={"kernel": True, "xla": "xla", None: False}[args.quant_attn],
    )
    model = get_model(
        args.model, args.input_size, args.reduction, bins, anchors,
        quant_mode="static" if args.quant == "int8_static" else "dynamic",
        **model_kw,
    )
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.input_size, args.input_size, 3)), train=False,
    )

    variables = load_weights(args, model, template)

    if args.quant == "int8_static":
        variables = calibrate_static_int8(
            args, model_kw, bins, anchors, variables,
            (
                normalize_image(_load_image(p))
                for p in paths[: args.calib_images]
            ),
        )

    evaluator = Evaluator(
        model, reduction=args.reduction,
        sliding_window=args.sliding_window, window_size=args.window_size,
        stride=args.stride, strategy=args.strategy,
        pad_to_multiple=args.pad_to_multiple,
    )
    if args.save_density:
        os.makedirs(args.save_density, exist_ok=True)

    def densities():
        if args.packed_eval:
            yield from evaluator.predict_densities_packed(
                variables,
                (normalize_image(_load_image(p)) for p in paths),
                batch_windows=args.batch_windows,
            )
        else:
            for path in paths:
                image = normalize_image(_load_image(path))
                yield evaluator.predict_density(variables, image)

    # incremental write: one bad image must not lose prior results
    n = 0
    with open(args.out, "w") as f:
        f.write("image,count\n")
        for i, density in enumerate(densities()):
            path = paths[i]
            count = float(np.asarray(density, np.float32).sum())
            f.write(f"{os.path.basename(path)},{count:.2f}\n")
            f.flush()
            n += 1
            if args.save_density:
                np.save(
                    os.path.join(
                        args.save_density,
                        os.path.splitext(os.path.basename(path))[0] + ".npy",
                    ),
                    np.asarray(density, np.float32),
                )
            if (i + 1) % 50 == 0:
                print(f"{i + 1}/{len(paths)}")
    print(f"wrote {args.out} ({n} images)")


if __name__ == "__main__":
    main()
