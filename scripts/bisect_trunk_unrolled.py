"""Latency-cancelled per-component attribution of the int8_static trunk.

Every prior per-stage number (r4 ledger, r3 bisects) was per-call and
polluted by the relay's fixed ~28-30 ms round-trip. This script times
each component as a K-chained unrolled jit differenced against K=1, so
the latency cancels exactly:

  trunk       - model.image_encoder on the window batch (the 34.5ms blob)
  attn-stack  - 12x fused_ln_qkv_attention_int8 (the real default path:
                int8 LN+qkv in-kernel, bf16 pair-packed attention)
  mlp-stack   - 12x [LN (XLA) + int8_matmul_static 768->3072 -> quick_gelu
                -> int8_matmul_static 3072->768] exactly as the block runs
  outproj     - 12x int8_matmul_static 768->768
  patchify    - PatchifyMatmul alone

Their sum vs the trunk exposes integration overhead; each vs its matmul
floor exposes per-component slack.

Usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
           python scripts/bisect_trunk_unrolled.py
Env: TB_K (default 5), TB_BATCH (144), TB_ITERS, TB_REPEATS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed_min(fn, iters, repeats):
    float(fn(0))
    float(fn(1))
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


def cancelled(make_run, K, iters, repeats):
    r1, rK = make_run(1), make_run(K)
    t1 = timed_min(r1, iters, repeats)
    tK = timed_min(rK, iters, repeats)
    return (tK - t1) / (K - 1)


def main():
    K = int(os.environ.get("TB_K", "5"))
    batch = int(os.environ.get("TB_BATCH", "144"))
    iters = int(os.environ.get("TB_ITERS", "4"))
    repeats = int(os.environ.get("TB_REPEATS", "2"))
    WIN = 224
    N_IMG_W = 140  # windows per 2048x3072 image, for ms/image scaling
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}), batch {batch}, K={K}")

    from __graft_entry__ import _flagship
    from clip_ebc_tpu.ops.fused_attention import fused_ln_qkv_attention_int8, seq_pad
    from clip_ebc_tpu.ops.quant import calibrate_int8, int8_matmul_static
    from clip_ebc_tpu.models.transformer import quick_gelu, LayerNormF32

    model, _ = _flagship(
        dtype=jnp.bfloat16, quant_int8=True, quant_mode="static",
        decoder_before_upsample=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, WIN, WIN, 3), jnp.bfloat16),
        train=False)
    dyn, _ = _flagship(dtype=jnp.bfloat16, quant_int8=True,
                       decoder_before_upsample=True)
    calib = jax.random.normal(jax.random.PRNGKey(2), (16, WIN, WIN, 3),
                              jnp.bfloat16)
    variables = calibrate_int8(
        jax.jit(lambda v, b: dyn.apply(v, b, train=False, mutable=["quant"])),
        dict(variables), [calib])

    windows = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (batch, WIN, WIN, 3)),
        jnp.bfloat16)
    scale = N_IMG_W / batch  # per-image normalization

    rows = []

    def report(name, t):
        rows.append((name, t * scale * 1e3))
        print(f"{name:<34}{t * scale * 1e3:>9.2f} ms/img", flush=True)

    # ---- trunk ---------------------------------------------------------------
    def make_trunk(k):
        @jax.jit
        def run(v, xs, i):
            s = i * 1e-6
            for _ in range(k):
                feats = model.apply(
                    v, xs + s.astype(xs.dtype) * 1e-4,
                    method=lambda mdl, xx: mdl.image_encoder(xx, False))
                s = feats.astype(jnp.float32).sum() * 1e-12 + s
            return s

        return run

    report("trunk (image_encoder)", cancelled(
        lambda k: (lambda i, r=make_trunk(k): r(variables, windows,
                                                jnp.asarray(float(i)))),
        K, iters, repeats))

    # ---- attention stack (the real int8_static default path) ----------------
    D, LAYERS, HEADS = 768, 12, 12
    L = 229
    lp = -(-L // seq_pad()) * seq_pad()
    g = jnp.ones((D,), jnp.float32)
    bb = jnp.zeros((D,), jnp.float32)
    w = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (D, 3 * D)) * 0.02, jnp.float32)
    bias = jnp.zeros((3 * D,), jnp.float32)
    act_scale = jnp.asarray(0.05, jnp.float32)
    x0 = jnp.asarray(jax.random.normal(jax.random.PRNGKey(4), (batch, lp, D)),
                     jnp.bfloat16)
    sm = (D // HEADS) ** -0.5

    def make_attn(k):
        @jax.jit
        def run(x, w_, i):
            x = x + i.astype(x.dtype) * 1e-4
            for _ in range(k * LAYERS):
                x = x + fused_ln_qkv_attention_int8(
                    x, g, bb, w_, bias, act_scale, HEADS, L, sm)
            return x.astype(jnp.float32).sum()

        return run

    report("attn stack 12x (int8 ln+qkv)", cancelled(
        lambda k: (lambda i, r=make_attn(k): r(x0, w, jnp.asarray(float(i)))),
        K, iters, repeats))

    # ---- MLP stack -----------------------------------------------------------
    w1 = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (D, 4 * D)) * 0.02, jnp.float32)
    w2 = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(6), (4 * D, D)) * 0.02, jnp.float32)
    s1 = jnp.asarray(0.05, jnp.float32)
    s2 = jnp.asarray(0.05, jnp.float32)
    ln = LayerNormF32(1e-5)
    lnv = ln.init(jax.random.PRNGKey(7), x0)

    def make_mlp(k):
        @jax.jit
        def run(x, w1_, w2_, i):
            x = x + i.astype(x.dtype) * 1e-4
            for _ in range(k * LAYERS):
                h = ln.apply(lnv, x)
                h = int8_matmul_static(h, w1_, s1, out_dtype=jnp.bfloat16)
                h = quick_gelu(h)
                h = int8_matmul_static(h, w2_, s2, out_dtype=jnp.bfloat16)
                x = x + h
            return x.astype(jnp.float32).sum()

        return run

    report("mlp stack 12x (ln+int8 fc/proj)", cancelled(
        lambda k: (lambda i, r=make_mlp(k): r(x0, w1, w2, jnp.asarray(float(i)))),
        K, iters, repeats))

    # ---- out-proj stack --------------------------------------------------------
    w3 = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(8), (D, D)) * 0.02, jnp.float32)

    def make_oproj(k):
        @jax.jit
        def run(x, w3_, i):
            x = x + i.astype(x.dtype) * 1e-4
            for _ in range(k * LAYERS):
                x = x + int8_matmul_static(x, w3_, s1, out_dtype=jnp.bfloat16)
            return x.astype(jnp.float32).sum()

        return run

    report("out-proj stack 12x (int8)", cancelled(
        lambda k: (lambda i, r=make_oproj(k): r(x0, w3, jnp.asarray(float(i)))),
        K, iters, repeats))

    # ---- patchify -------------------------------------------------------------
    from clip_ebc_tpu.models.transformer import PatchifyMatmul

    pm = PatchifyMatmul(D, 16, use_bias=False, dtype=jnp.bfloat16)
    pv = pm.init(jax.random.PRNGKey(9), windows)

    def make_patch(k):
        @jax.jit
        def run(xs, i):
            s = i * 1e-6
            for _ in range(k):
                o = pm.apply(pv, xs + s.astype(xs.dtype) * 1e-4)
                s = o.astype(jnp.float32).sum() * 1e-12 + s
            return s

        return run

    report("patchify", cancelled(
        lambda k: (lambda i, r=make_patch(k): r(windows, jnp.asarray(float(i)))),
        K, iters, repeats))

    comp = sum(t for n, t in rows[1:])
    print(f"\n{'sum of components':<34}{comp:>9.2f} ms/img")
    print(f"{'trunk - components':<34}{rows[0][1] - comp:>9.2f} ms/img "
          "(LN_pre/pos-embed/VPT/ln_post/pad + scheduling overlap)")


if __name__ == "__main__":
    main()
