"""Differential trunk bisection: time layer VARIANTS under one harness.

Instead of timing ops in isolation (layout/fusion context differs from
the real layer), this times the real 12-layer trunk computation with
components knocked out, all under the same unrolled-repetition harness;
differences attribute per-component cost in context. Unrolled (not
lax.scan) so the emitter sees the same straight-line code as the real
model.

Usage: python scripts/bisect_trunk2.py [iters] [reps] [layers]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    LAYERS = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); {LAYERS} layers x {REPS} reps")

    B, L, D, H = 496, 256, 768, 12
    KV_LEN = 229
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, L, D), dt)
    ks = jax.random.split(key, 8)
    w_qkv = jax.random.normal(ks[0], (D, 3 * D), dt) * 0.02
    b_qkv = jnp.zeros((3 * D,), dt)
    w_out = jax.random.normal(ks[1], (D, D), dt) * 0.02
    w_fc = jax.random.normal(ks[2], (D, 4 * D), dt) * 0.02
    w_proj = jax.random.normal(ks[3], (4 * D, D), dt) * 0.02
    g1 = jnp.ones((D,), jnp.float32)
    b1 = jnp.zeros((D,), jnp.float32)

    from clip_ebc_tpu.ops.fused_attention import fused_qkv_attention

    def ln(v):
        f = v.astype(jnp.float32)
        mu = f.mean(-1, keepdims=True)
        var = ((f - mu) ** 2).mean(-1, keepdims=True)
        return ((f - mu) * jax.lax.rsqrt(var + 1e-5) * g1 + b1).astype(v.dtype)

    def layer(v, use_ln=True, use_attn=True, use_mlp=True, fused=True):
        h = ln(v) if use_ln else v
        qkv = h @ w_qkv + b_qkv
        if use_attn:
            if fused:
                a = fused_qkv_attention(qkv, H, KV_LEN, 64.0**-0.5)
            else:
                from clip_ebc_tpu.ops.fused_attention import _reference

                a = _reference(qkv, H, KV_LEN, 64.0**-0.5)
        else:
            a = qkv[..., :D]
        v = v + a @ w_out
        if use_mlp:
            h = ln(v) if use_ln else v
            h = h @ w_fc
            h = h * jax.nn.sigmoid(1.702 * h)
            v = v + h @ w_proj
        return v

    def trunk(i, **kw):
        v = x0 + (i * 1e-6).astype(dt)
        for r in range(REPS * LAYERS):
            v = layer(v, **kw)
        return v.astype(jnp.float32).sum()

    variants = {
        "full (fused attn)": {},
        "full (xla sdpa)": {"fused": False},
        "no attention": {"use_attn": False},
        "no mlp": {"use_mlp": False},
        "no layernorm": {"use_ln": False},
    }
    denom = REPS * LAYERS
    results = {}
    for name, kw in variants.items():
        fn = jax.jit(lambda i, kw=kw: trunk(jnp.asarray(i, jnp.float32), **kw))
        results[name] = timed(fn, iters) / denom
        print(f"{name:22s} {results[name] * 1e3 * LAYERS:8.1f} ms/trunk "
              f"({results[name] * 1e3:6.2f} ms/layer)")

    full = results["full (fused attn)"]
    for part, key_ in (("attention", "no attention"), ("mlp", "no mlp"),
                       ("layernorm", "no layernorm")):
        print(f"{part:22s} {(full - results[key_]) * 1e3 * LAYERS:8.1f} ms/trunk")


if __name__ == "__main__":
    main()
