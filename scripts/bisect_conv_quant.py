"""Does XLA hit the int8 MXU rate for 3x3 convs (the ClipEBC decoder
shape, B=496 x 28x28 x 768)? bf16 vs int8 conv, unrolled, relay-safe.

Usage: python scripts/bisect_conv_quant.py [iters] [reps]
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
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); {REPS} reps unrolled")

    B, HW, C = 496, 28, 768
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, HW, HW, C), dt)
    w = jax.random.normal(key, (3, 3, C, C), dt) * 0.02
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / 0.001), -127, 127).astype(jnp.int8)

    dn = jax.lax.conv_dimension_numbers(x0.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_bf16(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(dt)

    def conv_int8(v):
        vq = jnp.clip(jnp.round(v.astype(jnp.float32) * 20.0), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            vq, w8, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * 5e-5).astype(dt)

    def chain(op):
        @jax.jit
        def run(x0, i):
            v = x0 + (i * 1e-6).astype(dt)
            acc = jnp.float32(0)
            for r in range(REPS):
                y = op(v)
                acc = acc + y.astype(jnp.float32).sum()
                v = v + (acc * 1e-12).astype(dt)
            return acc

        return lambda i: run(x0, jnp.asarray(float(i), jnp.float32))

    flops = 2 * B * HW * HW * 9 * C * C
    for name, op in (("bf16 3x3 conv", conv_bf16), ("int8 3x3 conv", conv_int8)):
        t = timed(chain(op), iters) / REPS
        print(f"{name:20s} {t * 1e3:7.2f} ms  {flops / t / 1e12:6.1f} TFLOP/s-equiv")


if __name__ == "__main__":
    main()
