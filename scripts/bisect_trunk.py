"""Per-op timing bisection of the flagship ViT trunk at eval shapes.

Times each component of a ResidualAttentionBlock at B=496 windows,
L=256 padded tokens, D=768 and compares the per-layer sum against the
measured full trunk, so the 47%-of-peak MXU gap (STATUS.md) can be
attributed: matmuls vs attention kernel vs LayerNorm/elementwise.

Each op is amplified K times inside one jitted ``lax.scan`` (carrying a
scalar that perturbs the input so nothing can be hoisted or deduped) —
the relay adds ~25 ms of fixed dispatch+fetch latency per call, which
would otherwise swamp single-op timings.

Usage: python scripts/bisect_trunk.py [iters] [K]
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
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); K={K} reps in-jit")

    B, L, D, H = 496, 256, 768, 12
    KV_LEN = 229  # 1 cls + 32 vpt + 196 patches
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, D), dt)
    w_qkv = jax.random.normal(key, (D, 3 * D), dt) * 0.02
    w_out = jax.random.normal(key, (D, D), dt) * 0.02
    w_fc = jax.random.normal(key, (D, 4 * D), dt) * 0.02
    w_proj = jax.random.normal(key, (4 * D, D), dt) * 0.02
    qkv_const = jax.random.normal(key, (B, L, 3 * D), dt)

    from clip_ebc_tpu.ops.fused_attention import fused_qkv_attention
    from clip_ebc_tpu.models.transformer import (
        LayerNormF32,
        ResidualAttentionBlock,
    )

    ln = LayerNormF32()
    ln_vars = ln.init(key, x)
    blk = ResidualAttentionBlock(num_heads=H, dtype=dt, fused_qkv=True, kv_len=KV_LEN)
    blk_vars = blk.init(key, x)

    def amplified(op, base):
        """jit(scan over K): acc += op(base + eps_k).sum(), eps_k from carry."""

        @jax.jit
        def run(i):
            def body(carry, k):
                eps = (i + k).astype(dt) * 1e-6
                return carry + op(base + eps).astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K, dtype=jnp.int32))
            return acc

        return run

    cases = {
        "qkv matmul (768->2304)": amplified(lambda v: v @ w_qkv, x),
        "out matmul (768->768)": amplified(lambda v: v @ w_out, x),
        "mlp fc+gelu+proj": amplified(
            lambda v: ((lambda h: (h * jax.nn.sigmoid(1.702 * h)) @ w_proj)(v @ w_fc)),
            x,
        ),
        "fused attention kernel": amplified(
            lambda v: fused_qkv_attention(v, H, KV_LEN, 64.0**-0.5), qkv_const
        ),
        "layernorm f32 (one)": amplified(lambda v: ln.apply(ln_vars, v), x),
        "residual add (one)": amplified(lambda v: v + x, x),
        "FULL layer (module)": amplified(lambda v: blk.apply(blk_vars, v), x),
    }

    results = {}
    for name, fn in cases.items():
        results[name] = timed(fn, iters) / K
        print(f"{name:28s} {results[name] * 1e3:8.2f} ms")

    parts = (
        results["qkv matmul (768->2304)"]
        + results["out matmul (768->768)"]
        + results["mlp fc+gelu+proj"]
        + results["fused attention kernel"]
        + 2 * results["layernorm f32 (one)"]
        + 2 * results["residual add (one)"]
    )
    print(f"\nsum of parts: {parts * 1e3:.2f} ms vs full layer "
          f"{results['FULL layer (module)'] * 1e3:.2f} ms "
          f"(x12 = {results['FULL layer (module)'] * 12e3:.0f} ms trunk)")
    tokens = B * L
    for nm, fl in (
        ("qkv matmul (768->2304)", 2 * tokens * D * 3 * D),
        ("out matmul (768->768)", 2 * tokens * D * D),
        ("mlp fc+gelu+proj", 4 * tokens * D * 4 * D),
        ("fused attention kernel", 2 * 4 * B * H * L * L * 64),  # even/odd 2x
    ):
        print(f"{nm:28s} {fl / results[nm] / 1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
