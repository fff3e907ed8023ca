"""Packed vs per-image sliding-window eval throughput on a mixed-size
image stream (the real NWPU/ShanghaiTech serving scenario).

Per-image (`sliding_window_predict`): each distinct image shape compiles
its own trunk program and pads its window count up to the bucket — small
images waste up to ~40% of the batch. Packed (`ops/packed_eval.py`): one
fixed-size forward for the whole stream, always full.

The size stream mimics NWPU-Crowd after the reference's preprocessing
(aspect-preserving resize into [448, 3072] snapped to 32, reference
preprocess.sh:7) — the REAL per-image sizes are unavailable here (no
dataset egress), so the mix below spans the range with mass in the
1-3 MP middle; the distribution is recorded in the JSON artifact.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_packed_eval.py
Env: PACK_QUANT=none|int8_static  PACK_W=128  PACK_IMAGES=18
     PACK_OUT=path.json (append/update a JSON artifact)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _flagship
    from clip_ebc_tpu.ops.packed_eval import WindowPacker
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict, window_grid

    quant_env = os.environ.get("PACK_QUANT", "int8_static")
    quant = quant_env.startswith("int8")
    W = int(os.environ.get("PACK_W", "128"))
    n_images = int(os.environ.get("PACK_IMAGES", "18"))
    window, stride, red = (224, 224), (224, 224), 8

    model, _ = _flagship(
        dtype=jnp.bfloat16, quant_int8=quant,
        quant_mode="static" if quant_env == "int8_static" else "dynamic",
        quant_attn=os.environ.get("PACK_QUANT_ATTN", "1") == "1" and
        quant_env == "int8_static",
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
        train=False,
    )
    if quant_env == "int8_static":
        from clip_ebc_tpu.ops.quant import calibrate_int8

        dyn, _ = _flagship(dtype=jnp.bfloat16, quant_int8=True)
        calib = jax.random.normal(
            jax.random.PRNGKey(2), (16, 224, 224, 3), jnp.bfloat16
        )
        variables = calibrate_int8(
            jax.jit(lambda v, b: dyn.apply(v, b, train=False, mutable=["quant"])),
            dict(variables), [calib],
        )
    text_feats = jax.jit(lambda v: model.apply(v, method="encode_text"))(variables)

    def forward(v, images):
        return model.apply(
            v, images, train=False, text_feats=text_feats
        ).astype(jnp.float32)

    # NWPU-like mixed sizes: multiples of 32 in [448, 3072] (the reference
    # preprocessing range, preprocess.sh:7), mass in the 1-3 MP middle
    rng = np.random.default_rng(0)
    sizes = [(576, 768), (1024, 1536), (448, 672), (768, 1152),
             (2048, 3072), (576, 864), (1280, 1920), (896, 1344),
             (1536, 2048)]
    images = [
        jnp.asarray(rng.normal(size=(h, w, 3)), jnp.bfloat16)
        for h, w in (sizes * ((n_images + len(sizes) - 1) // len(sizes)))[:n_images]
    ]
    n_windows = sum(
        window_grid(im.shape[:2], window, stride).shape[0] for im in images
    )

    def run_per_image(salt):
        c = 0.0
        for im in images:
            d = sliding_window_predict(
                forward, variables, im + salt, window=window, stride=stride,
                reduction=red, strategy="average",
            )
            c += d.sum()
        return c

    def run_packed(salt):
        packer = WindowPacker(
            forward, variables, window, stride, red, "average",
            batch_windows=W, chunk=16,
        )
        c = 0.0
        for im in images:
            packer.add(im + salt)
            for _, d in packer.ready():
                c += d.sum()
        packer.flush()
        for _, d in packer.ready():
            c += d.sum()
        return c

    rows = {}
    for name, fn in (("per-image", run_per_image), ("packed", run_packed)):
        float(fn(jnp.bfloat16(0.0)))  # compile
        float(fn(jnp.bfloat16(1e-4)))  # warm
        iters = 4
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            vals = [fn(jnp.bfloat16((10 * r + i + 2) * 1e-4)) for i in range(iters)]
            for v in vals:
                float(v)
            best = min(best, (time.perf_counter() - t0) / iters)
        dt = best
        print(
            f"{name:<10} ({quant_env}): {dt*1e3:8.1f} ms/stream "
            f"({n_windows/dt:7.1f} windows/s, {len(images)/dt:5.2f} img/s, "
            f"{n_windows} windows / {len(images)} images)"
        )
        rows[name] = {
            "ms_per_stream": round(dt * 1e3, 1),
            "windows_per_s": round(n_windows / dt, 1),
            "imgs_per_s": round(len(images) / dt, 2),
        }

    out_path = os.environ.get("PACK_OUT")
    if out_path:
        artifact = {
            "note": "Packed vs per-image sliding-window eval over an "
                    "NWPU-like mixed-size stream (synthetic sizes in the "
                    "reference preprocessing range [448,3072] mult-32; real "
                    "NWPU sizes unavailable without the dataset). Timing "
                    "min-of-3 over whole-stream passes.",
            "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "device": f"{jax.devices()[0].device_kind} ({jax.devices()[0].platform})",
            "config": {"quant": quant_env, "batch_windows": W,
                       "n_images": len(images), "n_windows": int(n_windows),
                       "window": 224, "stride": 224,
                       "sizes": [list(im.shape[:2]) for im in images]},
            "results": rows,
            "packed_speedup_x": round(
                rows["packed"]["imgs_per_s"] / rows["per-image"]["imgs_per_s"], 3),
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
