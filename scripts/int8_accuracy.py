"""Measure bf16-vs-int8_static accuracy on representative synthetic crowds.

KNOWN_DIFFERENCES #11 needs a real number: calibrate the W8A8-static path
on rendered crowd scenes (NOT N(0,1) noise), then compare bf16 and
int8_static sliding-window counts + MAE/RMSE across a density/size sweep.

Usage (real chip):
    PYTHONPATH=/root/repo python scripts/int8_accuracy.py --out /tmp/int8_acc.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_calib", type=int, default=8)
    p.add_argument("--n_eval", type=int, default=24)
    p.add_argument("--out", type=str, default="/tmp/int8_acc.json")
    p.add_argument("--window", type=int, default=224)
    p.add_argument("--stride", type=int, default=224)
    p.add_argument(
        "--sizes", type=str, default="448x672,896x1344",
        help="comma-separated HxW scene sizes for the sweep; smaller "
        "sizes (e.g. 224x448) make the int8-emulated CPU run tractable "
        "when no chip is reachable — the int8-vs-bf16 count delta is "
        "what's measured, and it is shape-local")
    p.add_argument(
        "--ckpt", type=str, default=None,
        help="full-model .npz from scripts/convergence_run.py --save_ckpt: "
        "run the sweep on TRAINED weights instead of random init "
        "(VERDICT r3 weak #5)")
    p.add_argument(
        "--bins_dataset", type=str, default="qnrf",
        help="bin table the checkpoint was trained with (the synthetic "
        "convergence runs use shb)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from clip_ebc_tpu.data.crowd import normalize_image
    from clip_ebc_tpu.data.synthetic import render_crowd_scene
    from clip_ebc_tpu.ops.quant import calibrate_int8
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict, window_grid
    from clip_ebc_tpu.utils.metrics import count_errors

    rng = np.random.default_rng(42)

    def norm_scene(size, count):
        img, pts = render_crowd_scene(rng, size=size, count=count)
        return normalize_image(img.astype(np.float32) / 255.0), len(pts)

    sizes = [tuple(int(v) for v in sz.split("x")) for sz in args.sizes.split(",")]
    # size/density sweep: small/large scenes x sparse/medium/dense
    sweep = []
    for size in sizes:
        for count in (5, 60, 300):
            for _ in range(max(args.n_eval // (3 * len(sizes)), 1)):
                sweep.append(norm_scene(size, count))

    qa_env = os.environ.get("INT8_QUANT_ATTN", "0")
    q_attn = {"0": False, "1": True, "xla": "xla"}.get(qa_env, False)
    bd = args.bins_dataset
    bf16, _ = _flagship(dtype=jnp.bfloat16, bins_dataset=bd)
    quant, _ = _flagship(
        dtype=jnp.bfloat16, quant_int8=True, quant_mode="static",
        quant_attn=q_attn, bins_dataset=bd,
    )
    dyn, _ = _flagship(dtype=jnp.bfloat16, quant_int8=True, bins_dataset=bd)
    variables = bf16.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16), train=False
    )
    weights = "random-init"
    if args.ckpt:
        import jax.tree_util as jtu

        from clip_ebc_tpu.models.convert import load_prepared_tree

        p_ck, s_ck, meta = load_prepared_tree(args.ckpt)
        ref_shapes = jtu.tree_map(lambda x: x.shape, dict(variables)["params"])
        got_shapes = jtu.tree_map(lambda x: x.shape, p_ck)
        if ref_shapes != got_shapes:
            raise SystemExit(
                f"--ckpt param shapes do not match the flagship model; was it "
                f"trained with --bins_dataset {bd}? (meta: {dict(meta)})")
        variables = dict(variables)
        variables["params"] = p_ck
        if s_ck:
            variables["batch_stats"] = s_ck
        weights = f"trained ({meta.get('kind', '?')}, val MAE " \
                  f"{meta.get('final_val_mae', '?')})"
        print(f"loaded trained weights from {args.ckpt}: {dict(meta)}")

    # calibration: window batches from REPRESENTATIVE scenes (the recipe
    # cli/test_nwpu + cli/predict run with --quant int8_static)
    calib_batches = []
    for _ in range(args.n_calib):
        img, _ = norm_scene(sizes[0], int(rng.integers(5, 300)))
        coords = window_grid(img.shape[:2], (args.window,) * 2, (args.window,) * 2)
        calib_batches.append(
            np.stack([img[y : y + args.window, x : x + args.window] for y, x in coords])
        )
    cal_vars = calibrate_int8(
        jax.jit(lambda v, b: dyn.apply(v, b, train=False, mutable=["quant"])),
        dict(variables), calib_batches,
    )

    def counts_for(model, vset):
        text_feats = jax.jit(lambda v: model.apply(v, method="encode_text"))(vset)

        def forward(v, images):
            return model.apply(v, images, train=False, text_feats=text_feats).astype(
                jnp.float32
            )

        out = []
        for img, _n in sweep:
            d = sliding_window_predict(
                forward, vset, jnp.asarray(img, jnp.bfloat16),
                window=(args.window,) * 2, stride=(args.stride,) * 2, reduction=8,
            )
            out.append(float(d.sum()))
        return np.asarray(out)

    gt = np.asarray([n for _, n in sweep], np.float64)
    c_bf16 = counts_for(bf16, variables)
    c_int8 = counts_for(quant, cal_vars)

    e_bf16 = count_errors(c_bf16, gt)
    e_int8 = count_errors(c_int8, gt)
    rel = np.abs(c_int8 - c_bf16) / np.maximum(np.abs(c_bf16), 1.0)
    result = {
        "n_images": len(sweep),
        "sizes": args.sizes,
        "window": args.window,
        "weights": weights,
        "quant_attn": q_attn,
        "bf16": e_bf16,
        "int8_static": e_int8,
        "count_rel_delta_mean": float(rel.mean()),
        "count_rel_delta_max": float(rel.max()),
        "mae_delta": float(e_int8["mae"] - e_bf16["mae"]),
        "rmse_delta": float(e_int8["rmse"] - e_bf16["rmse"]),
        "note": ("deltas measure QUANTIZATION error of the pipeline on "
                 "representative imagery" +
                 ("" if args.ckpt else "; random-init weights, not trained "
                  "accuracy")),
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
