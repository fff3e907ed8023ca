"""Per-shape conv timing for the vgg19_ae train step.

STATUS r2 measured the whole vgg19_ae 448^2 step at ~55 TFLOP/s effective
(fwd 45 ms / fwd+bwd 132 ms at batch 32) where decoder-style convs reach
82% MXU. This times each distinct conv shape in the network (fwd and
fwd+bwd) so the slow stages can be named before optimizing anything.

Methodology: K-unrolled chained applications inside one jit (output feeds
the next input so nothing hoists/dedupes; lax.scan amplification measured
bogus on the relay — see .claude/skills/verify). Relay floor ~25 ms/call.

Usage: PYTHONPATH=/root/repo python scripts/bisect_vgg_stages.py [iters] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn


def timed(fn, iters=4, warmup=2):
    for i in range(warmup + 1):
        float(fn(i))
    t0 = time.perf_counter()
    vals = [fn(10 + i) for i in range(iters)]
    for v in vals:
        float(v)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B = int(os.environ.get("BENCH_BATCH", "32"))
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); B={B}, K={K} unrolled")

    # every distinct (spatial, cin, cout) 3x3 conv in vgg19_ae 448/8:
    # encoder cfg E truncated at reduction 8 + decoder/reg head shapes
    shapes = [
        (448, 3, 64),
        (448, 64, 64),
        (224, 64, 128),
        (224, 128, 128),
        (112, 128, 256),
        (112, 256, 256),
        (56, 256, 512),
        (56, 512, 512),
        (56, 512, 256),  # reg head reg0
        (56, 256, 128),  # reg head reg1
    ]
    key = jax.random.PRNGKey(0)

    for hw, cin, cout in shapes:
        x = jax.random.normal(key, (B, hw, hw, cin), jnp.bfloat16)
        conv = nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.bfloat16)
        v = conv.init(key, x)
        # chain K applications; project back to cin if needed so the chain
        # type-checks (projection cost included but identical across rows)
        proj = nn.Dense(cin, dtype=jnp.bfloat16)
        vp = proj.init(key, jnp.zeros((1, hw, hw, cout), jnp.bfloat16))

        def apply_k(v, vp, x, i):
            y = x + i.astype(x.dtype) * 1e-6
            for _ in range(K):
                y = proj.apply(vp, jax.nn.relu(conv.apply(v, y)))
            return y.astype(jnp.float32).sum()

        fwd = jax.jit(apply_k)

        @jax.jit
        def fwdbwd(v, vp, x, i):
            g = jax.grad(
                lambda v_: apply_k(v_, vp, x, i)
            )(v)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(), g, jnp.float32(0)
            )

        t_f = timed(lambda i: fwd(v, vp, x, jnp.float32(i)), iters) / K
        t_fb = timed(lambda i: fwdbwd(v, vp, x, jnp.float32(i)), iters) / K
        fl = 2 * B * hw * hw * 9 * cin * cout
        fl_p = 2 * B * hw * hw * cout * cin  # the 1x1 projection
        print(
            f"{hw:4d}^2 {cin:4d}->{cout:4d}: fwd {t_f*1e3:7.2f} ms "
            f"({(fl+fl_p)/t_f/1e12:6.1f} TF/s)  fwd+bwd {t_fb*1e3:7.2f} ms "
            f"({3*(fl+fl_p)/t_fb/1e12:6.1f} TF/s, x{t_fb/t_f:.2f})"
        )


if __name__ == "__main__":
    main()
