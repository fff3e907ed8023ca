"""Bisect the sliding-window pipeline's gather+assembly overhead.

The r5 decoder-pre ledger (scripts/ledger_decoder_pre.py) measured
gather+assembly at ~18 ms/image — 33% of pipeline time, ~100x above the
HBM bandwidth floor (the gather moves ~43 MB, the assembly scatters 110k
f32 in reduction space). This script times each half separately, plus the
composed variants, min-of-N style (relay stalls inflate means):

  gather        - vmapped dynamic_slice of 140->144 windows (43 MB)
  assemble      - scatter-add overlap-average of (140, 28, 28) preds
  fwd           - the batched window forward alone
  fwd+gather    - gather feeding the forward (no assembly)
  pipeline      - the full sliding_window_predict

Usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
           python scripts/bisect_gather_assembly.py
Env: BIS_QUANT=int8_static|none, BIS_H/BIS_W, BIS_ITERS, BIS_REPEATS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed_min(fn, iters, repeats):
    float(fn(0))  # compile
    float(fn(1))  # warm
    best = float("inf")
    k = 10
    for _ in range(repeats):
        t0 = time.perf_counter()
        vals = [fn(k + i) for i in range(iters)]
        for v in vals:
            float(v)
        best = min(best, (time.perf_counter() - t0) / iters)
        k += iters
    return best


def main():
    quant_env = os.environ.get("BIS_QUANT", "int8_static")
    quant = quant_env.startswith("int8")
    H = int(os.environ.get("BIS_H", "2048"))
    W = int(os.environ.get("BIS_W", "3072"))
    iters = int(os.environ.get("BIS_ITERS", "8"))
    repeats = int(os.environ.get("BIS_REPEATS", "3"))
    WIN, STRIDE, RED = 224, 224, 8
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}), quant={quant_env}, "
          f"image {H}x{W}")

    from __graft_entry__ import _flagship
    from clip_ebc_tpu.ops.sliding_window import (
        assemble_windows, sliding_window_predict, window_grid)

    model, _ = _flagship(
        dtype=jnp.bfloat16, quant_int8=quant,
        quant_mode="static" if quant_env == "int8_static" else "dynamic",
        decoder_before_upsample=True,
    )
    starts = window_grid((H, W), (WIN, WIN), (STRIDE, STRIDE))
    n = starts.shape[0]
    n_pad = ((n + 15) // 16) * 16
    print(f"{n} windows/image (padded {n_pad})")

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, WIN, WIN, 3), jnp.bfloat16),
        train=False)
    if quant_env == "int8_static":
        from clip_ebc_tpu.ops.quant import calibrate_int8

        dyn, _ = _flagship(dtype=jnp.bfloat16, quant_int8=True,
                           decoder_before_upsample=True)
        calib = jax.random.normal(jax.random.PRNGKey(2), (16, WIN, WIN, 3),
                                  jnp.bfloat16)
        variables = calibrate_int8(
            jax.jit(lambda v, b: dyn.apply(v, b, train=False, mutable=["quant"])),
            dict(variables), [calib])
    text_feats = jax.jit(lambda v: model.apply(v, method="encode_text"))(variables)

    def forward(v, images):
        return model.apply(v, images, train=False, text_feats=text_feats
                           ).astype(jnp.float32)

    image = jnp.asarray(jax.random.normal(jax.random.PRNGKey(0), (H, W, 3)),
                        jnp.bfloat16)
    windows0 = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (n_pad, WIN, WIN, 3)),
        jnp.bfloat16)
    preds0 = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (n, WIN // RED, WIN // RED)),
        jnp.float32)
    starts_dev = jnp.asarray(
        np.concatenate([starts, np.zeros((n_pad - n, 2), np.int32)]))

    # -- gather only ---------------------------------------------------------
    @jax.jit
    def gather_only(img, st, i):
        img = img + i.astype(img.dtype) * 1e-4

        def g(yx):
            return jax.lax.dynamic_slice(img, (yx[0], yx[1], 0), (WIN, WIN, 3))

        return jax.vmap(g)(st).sum()

    t_gather = timed_min(
        lambda i: gather_only(image, starts_dev, jnp.asarray(float(i))),
        iters, repeats)

    # -- assembly only -------------------------------------------------------
    @jax.jit
    def assemble_only(p, i):
        p = p + i.astype(p.dtype) * 1e-4
        return assemble_windows(p, (H, W), (WIN, WIN), (STRIDE, STRIDE), RED,
                                "average").sum()

    t_asm = timed_min(lambda i: assemble_only(preds0, jnp.asarray(float(i))),
                      iters, repeats)

    # -- forward only --------------------------------------------------------
    @jax.jit
    def fwd_only(v, xs, i):
        xs = xs + i.astype(xs.dtype) * 1e-4
        return forward(v, xs).sum()

    t_fwd = timed_min(lambda i: fwd_only(variables, windows0,
                                         jnp.asarray(float(i))), iters, repeats)

    # -- gather + forward (no assembly) --------------------------------------
    @jax.jit
    def gather_fwd(v, img, st, i):
        img = img + i.astype(img.dtype) * 1e-4

        def g(yx):
            return jax.lax.dynamic_slice(img, (yx[0], yx[1], 0), (WIN, WIN, 3))

        ws = jax.vmap(g)(st)
        return forward(v, ws).sum()

    t_gf = timed_min(
        lambda i: gather_fwd(variables, image, starts_dev, jnp.asarray(float(i))),
        iters, repeats)

    # -- full pipeline -------------------------------------------------------
    @jax.jit
    def pipeline(v, img, i):
        img = img + i.astype(img.dtype) * 1e-4
        return sliding_window_predict(
            forward, v, img, window=(WIN, WIN), stride=(STRIDE, STRIDE),
            reduction=RED, strategy="average").sum()

    t_pipe = timed_min(lambda i: pipeline(variables, image,
                                          jnp.asarray(float(i))), iters, repeats)

    print(f"\n{'stage':<28}{'ms':>10}{'w/s':>10}")
    for name, t in (
        ("gather only", t_gather),
        ("assemble only", t_asm),
        ("forward only", t_fwd),
        ("gather+forward", t_gf),
        ("pipeline", t_pipe),
        ("  pipe - (gather+fwd)", t_pipe - t_gf),
        ("  (gather+fwd) - fwd", t_gf - t_fwd),
    ):
        print(f"{name:<28}{t * 1e3:>10.2f}{n / t:>10.0f}")


if __name__ == "__main__":
    main()
