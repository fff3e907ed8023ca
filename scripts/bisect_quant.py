"""Is int8 actually 2x on the v5e MXU through XLA? Times the flagship
trunk matmul shapes bf16 vs W8A8-static vs W8A8-dynamic, unrolled 24x
(same differencing harness as bisect_trunk2; relay-safe).

Usage: python scripts/bisect_quant.py [iters] [reps]
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
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); {REPS} reps unrolled")

    B, L, D = 496, 256, 768
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, L, D), dt)
    w = jax.random.normal(key, (D, 3 * D), dt) * 0.02
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / 0.001), -127, 127).astype(jnp.int8)
    s_w = jnp.full((1, 3 * D), 0.001, jnp.float32)

    from clip_ebc_tpu.ops.quant import int8_matmul, int8_matmul_static

    def chain(op):
        @jax.jit
        def run(x0, i):
            v = x0 + (i * 1e-6).astype(dt)
            acc = jnp.float32(0)
            for r in range(REPS):
                y = op(v)
                acc = acc + y.astype(jnp.float32).sum()
                v = v + (acc * 1e-12).astype(dt)  # serialize: v depends on y
            return acc

        return lambda i: run(x0, jnp.asarray(float(i), jnp.float32))

    flops = 2 * B * L * D * 3 * D
    cases = {
        "bf16 matmul": chain(lambda v: v @ w),
        "int8 prequantized W, dyn act": chain(
            lambda v: int8_matmul(v, w.astype(jnp.float32), out_dtype=dt)
        ),
        "int8 static act scale": chain(
            lambda v: int8_matmul_static(
                v, w.astype(jnp.float32), jnp.float32(0.05), out_dtype=dt
            )
        ),
        "int8 raw (pre-q both)": chain(
            lambda v: (
                jax.lax.dot_general(
                    jnp.clip(jnp.round(v.astype(jnp.float32) * 20.0), -127, 127).astype(jnp.int8),
                    w8,
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                * s_w
            ).astype(dt)
        ),
    }
    for name, fn in cases.items():
        t = timed(fn, iters) / REPS
        print(f"{name:30s} {t * 1e3:7.2f} ms  {flops / t / 1e12:6.1f} TFLOP/s-equiv")


if __name__ == "__main__":
    main()
