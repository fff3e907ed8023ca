"""DMCount OT-loss microbench: dense vs separable (factored) Sinkhorn.

The DMCount cost matrix is separable (dy ⊕ dx), so the Gibbs kernel
factorises K = ky ⊗ kx and each scaling matvec becomes two (P, H)/(P, W)
matmuls instead of one dense (P, H*W) one — losses/sinkhorn.py
sinkhorn_separable. This measures both at the flagship train shape
(B=128, P=256 padded points, 28x28 density grid, 100 iterations).

Usage: python scripts/bench_ot.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from clip_ebc_tpu.losses.sinkhorn import sinkhorn, sinkhorn_separable


def timed(fn, iters=10, warmup=3):
    for i in range(warmup):
        jax.block_until_ready(fn(i))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(100 + i)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    P, H, W, size, red, reg = 256, 28, 28, 224, 8, 10.0
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, size, (B, P, 2)).astype(np.float32)
    mask = rng.random((B, P)) < 0.8
    cood = (np.arange(0, size, red) + red / 2).astype(np.float32)
    dy = (pts[:, :, 1:2] - cood[None, None, :]) ** 2  # (B, P, H)
    dx = (pts[:, :, 0:1] - cood[None, None, :]) ** 2  # (B, P, W)
    cost = (dy[:, :, :, None] + dx[:, :, None, :]).reshape(B, P, H * W)
    a = np.where(mask, 1.0 / np.maximum(mask.sum(1, keepdims=True), 1), 0.0)
    src = rng.uniform(0.01, 1.0, (B, H * W)).astype(np.float32)
    b = src / src.sum(1, keepdims=True)

    A, Bm = jnp.asarray(a, jnp.float32), jnp.asarray(mask)
    Bh = jnp.asarray(b, jnp.float32)
    COST = jnp.asarray(cost, jnp.float32)
    KY = jnp.asarray(np.exp(-dy / reg), jnp.float32)
    KX = jnp.asarray(np.exp(-dx / reg), jnp.float32)

    @jax.jit
    def dense(i):
        res = jax.vmap(
            lambda aa, bb, cc, mm: sinkhorn(
                aa, bb, cc, reg=reg, max_iters=100, a_mask=mm, return_plan=False
            ).beta
        )(A + i * 1e-12, Bh, COST, Bm)
        return res.sum()

    @jax.jit
    def separable(i):
        res = jax.vmap(
            lambda aa, bb, ky, kx, mm: sinkhorn_separable(
                aa, bb, ky, kx, reg=reg, max_iters=100, a_mask=mm,
                return_plan=False,
            ).beta
        )(A + i * 1e-12, Bh.reshape(B, H, W), KY, KX, Bm)
        return res.sum()

    t_d = timed(dense)
    print(f"dense     : {t_d*1e3:7.2f} ms/batch ({B} images, 100 iters)")
    t_s = timed(separable)
    print(f"separable : {t_s*1e3:7.2f} ms/batch  ({t_d/t_s:.2f}x)")


if __name__ == "__main__":
    main()
