"""Probe: does the stored TPU layout of a (H, W, 3) image tax every
pixel-touching op vs the same bytes as (H, W*3)?

Times a K-unrolled elementwise chain (read+write the full array per rep,
chained so nothing hoists) on both shapes, latency-cancelled — if the
3-minor layout wastes lanes, the 3-D variant's per-rep time is a large
multiple of the 2-D one; if XLA stores/handles both at full bandwidth,
they match. Decides whether a flat-pixel *input contract* (host uploads
the same row-major bytes as (H, W*3)) is worth wiring through the eval
pipeline.

Usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
           python scripts/probe_pixel_layout.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed_min(fn, iters=6, repeats=3):
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


def cancelled(make_run, x, K=8):
    def bind(k):
        r = make_run(k)
        return lambda i: r(x, jnp.asarray(float(i)))

    t1 = timed_min(bind(1))
    tK = timed_min(bind(K))
    return (tK - t1) / (K - 1)


def make_elemwise(k):
    @jax.jit
    def run(x, i):
        s = i * 1e-6
        for _ in range(k):
            x = x * jnp.asarray(1.0001, x.dtype) + s.astype(x.dtype)
            s = x.ravel()[0].astype(jnp.float32) * 1e-12 + s
        return s

    return run


def main():
    H, W = 2048, 3072
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    key = jax.random.PRNGKey(0)
    x3 = jnp.asarray(jax.random.normal(key, (H, W, 3)), jnp.bfloat16)
    x2 = x3.reshape(H, W * 3)
    mb = H * W * 3 * 2 / 1e6
    t3 = cancelled(make_elemwise, x3)
    print(f"(H, W, 3)  elemwise: {t3 * 1e3:8.3f} ms/rep "
          f"({2 * mb / 1e3 / t3:6.1f} GB/s eff)")
    t2 = cancelled(make_elemwise, x2)
    print(f"(H, W*3)   elemwise: {t2 * 1e3:8.3f} ms/rep "
          f"({2 * mb / 1e3 / t2:6.1f} GB/s eff)")
    print(f"ratio 3d/2d: {t3 / t2:.2f}x")


if __name__ == "__main__":
    main()
