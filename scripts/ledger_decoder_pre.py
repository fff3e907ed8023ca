"""Decoder-pre inference ledger: where does each millisecond go?

VERDICT r3 item 2: the decoder-before-upsample deploy variant runs at 52%
of its own int8 speed-of-light (4122 of 7998 w/s). This script produces
the measured per-stage ledger at the flagship eval shape (224^2 windows,
int8_static trunk, text features hoisted) so every remaining millisecond
is either optimized or proven to be at its floor — the same discipline
that closed the train-side ledger in r3.

Stages:
  pipeline      - full sliding_window_predict on a 2048x3072 image
  forward       - batched window forward only (gather/assembly excluded)
  trunk         - image-encoder features only
  head          - forward - trunk (decoder + proj + cosine head + upsample)
  gather+asm    - pipeline - forward (window gather + overlap assembly)
  attn-kernel   - 12x fused LN+qkv+attention layers alone (same shapes)
  matmul-floor  - the same matmul FLOPs as bare XLA matmuls (no LN/softmax)

Usage: PYTHONPATH=/root/repo python scripts/ledger_decoder_pre.py [iters]
Env: LEDGER_QUANT=none|int8_static (default int8_static), LEDGER_BATCH.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

V5E_BF16 = 197e12
V5E_INT8 = 394e12


def timed(fn, iters=6, warmup=2):
    for i in range(warmup + 1):
        float(fn(i))
    t0 = time.perf_counter()
    vals = [fn(10 + i) for i in range(iters)]
    for v in vals:
        float(v)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    quant_env = os.environ.get("LEDGER_QUANT", "int8_static")
    quant = quant_env.startswith("int8")
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}), quant={quant_env}")

    from __graft_entry__ import _flagship
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict, window_grid

    # LEDGER_H/LEDGER_W shrink the image for CPU smoke runs (the per-stage
    # jit programs are shape-generic; only the windows-per-image scaling
    # changes)
    H = int(os.environ.get("LEDGER_H", "2048"))
    W = int(os.environ.get("LEDGER_W", "3072"))
    WIN, STRIDE, RED = 224, 224, 8
    model, _ = _flagship(
        dtype=jnp.bfloat16, quant_int8=quant,
        quant_mode="static" if quant_env == "int8_static" else "dynamic",
        decoder_before_upsample=True,
    )
    n_windows = window_grid((H, W), (WIN, WIN), (STRIDE, STRIDE)).shape[0]
    batch = int(os.environ.get("LEDGER_BATCH", str(((n_windows + 15) // 16) * 16)))
    print(f"{n_windows} windows/image; forward batch {batch}")

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

    image = jnp.asarray(jax.random.normal(jax.random.PRNGKey(0), (H, W, 3)),
                        jnp.bfloat16)
    windows = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (batch, WIN, WIN, 3)),
        jnp.bfloat16)

    # -- full pipeline ------------------------------------------------------
    def forward(v, images):
        return model.apply(v, images, train=False, text_feats=text_feats
                           ).astype(jnp.float32)

    @jax.jit
    def pipeline(v, img, i):
        img = img + i.astype(img.dtype) * 1e-4
        return sliding_window_predict(
            forward, v, img, window=(WIN, WIN), stride=(STRIDE, STRIDE),
            reduction=RED, strategy="average").sum()

    t_pipe = timed(lambda i: pipeline(variables, image, jnp.asarray(float(i))),
                   iters)

    # -- batched forward only ------------------------------------------------
    @jax.jit
    def fwd_only(v, xs, i):
        xs = xs + i.astype(xs.dtype) * 1e-4
        return model.apply(v, xs, train=False, text_feats=text_feats).sum()

    t_fwd = timed(lambda i: fwd_only(variables, windows, jnp.asarray(float(i))),
                  iters)

    # -- trunk only ----------------------------------------------------------
    @jax.jit
    def trunk_only(v, xs, i):
        xs = xs + i.astype(xs.dtype) * 1e-4
        feats = model.apply(
            v, xs, method=lambda mdl, xx: mdl.image_encoder(xx, False))
        return feats.sum()

    has_trunk_method = True
    t_trunk = timed(lambda i: trunk_only(variables, windows,
                                         jnp.asarray(float(i))), iters)

    # -- bare attention stack (12 fused LN+qkv+attn layers, same shapes) -----
    from clip_ebc_tpu.ops.fused_attention import fused_ln_qkv_attention

    D, LAYERS, HEADS = 768, 12, 12
    L = 1 + 14 * 14 + 32  # CLS + 14x14 patches + VPT-32 = 229 -> lp 256
    # (matches ClipViT: n_real = 229, padded in-kernel to the next
    # 128-multiple — see models/clip/image_encoder.py n_real/lp)
    g = jnp.ones((D,), jnp.float32)
    bb = jnp.zeros((D,), jnp.float32)
    wqkv = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (D, 3 * D)) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * D,), jnp.bfloat16)
    x0 = jnp.asarray(jax.random.normal(jax.random.PRNGKey(4), (batch, L, D)),
                     jnp.bfloat16)

    sm_scale = (D // HEADS) ** -0.5

    @jax.jit
    def attn_stack(x, w, i):
        x = x + i.astype(x.dtype) * 1e-4
        for _ in range(LAYERS):
            x = x + fused_ln_qkv_attention(
                x, g, bb, w, bqkv, num_heads=HEADS, kv_len=L,
                sm_scale=sm_scale)
        return x.sum()

    t_attn = timed(lambda i: attn_stack(x0, wqkv, jnp.asarray(float(i))), iters)

    # -- matmul floor: identical matmul FLOPs, no LN/softmax/masking ---------
    lp = ((L + 127) // 128) * 128

    @jax.jit
    def matmul_floor(x, w, i):
        x = x + i.astype(x.dtype) * 1e-4
        acc = 0.0
        for _ in range(LAYERS):
            qkv = x @ w  # (b, lp, 3D)
            q = qkv[..., :D]
            k = qkv[..., D:2 * D]
            v = qkv[..., 2 * D:]
            # executed attention FLOPs = pair-packed 2x: (lp, 128) tiles
            q2 = q.reshape(batch, lp, 6, 128)
            k2 = k.reshape(batch, lp, 6, 128)
            v2 = v.reshape(batch, lp, 6, 128)
            s = jnp.einsum("blpd,bmpd->bplm", q2, k2,
                           preferred_element_type=jnp.float32)
            s2 = jnp.einsum("blpd,bmpd->bplm", q2 * 0.5, k2,
                            preferred_element_type=jnp.float32)
            o = jnp.einsum("bplm,bmpd->blpd", (s + s2).astype(jnp.bfloat16), v2)
            x = x + o.reshape(batch, lp, D)
            acc = acc + s.sum()
        return x.sum() + acc

    x0p = jnp.asarray(jax.random.normal(jax.random.PRNGKey(5), (batch, lp, D)),
                      jnp.bfloat16)
    t_floor = timed(lambda i: matmul_floor(x0p, wqkv, jnp.asarray(float(i))),
                    iters)

    # -- report ---------------------------------------------------------------
    w_per_img = n_windows
    rows = [
        ("pipeline (full image)", t_pipe, w_per_img / t_pipe),
        ("forward (window batch)", t_fwd * w_per_img / batch,
         batch / t_fwd),
        ("trunk only", t_trunk * w_per_img / batch if has_trunk_method else
         float("nan"),
         batch / t_trunk if has_trunk_method else float("nan")),
        ("head = forward - trunk",
         (t_fwd - t_trunk) * w_per_img / batch if has_trunk_method else
         float("nan"), float("nan")),
        ("gather+assembly = pipe - fwd",
         t_pipe - t_fwd * w_per_img / batch, float("nan")),
        ("attn stack (12x fused LN+qkv)", t_attn * w_per_img / batch,
         float("nan")),
        ("attn matmul floor (XLA)", t_floor * w_per_img / batch, float("nan")),
        ("attn vector overhead = stack - floor",
         (t_attn - t_floor) * w_per_img / batch, float("nan")),
    ]
    print(f"\n{'stage':<38}{'ms/image':>10}{'w/s':>10}")
    for name, t, ws in rows:
        print(f"{name:<38}{t * 1e3:>10.2f}{ws:>10.0f}")
    exec_attn_tflop = w_per_img * LAYERS * 2 * (2 * lp * lp * D) * 2 / 1e12
    print(f"\nexecuted attention (pair-packed 2x): {exec_attn_tflop:.2f} "
          f"TFLOP/img -> bf16 floor {exec_attn_tflop/ (V5E_BF16/1e12) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
