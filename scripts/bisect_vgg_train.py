"""vgg19_ae 448^2 train-step attribution: forward vs backward vs loss.

The train bench measures ~166 ms/step at batch 32 (~45 TFLOP/s effective)
— this times the forward alone and the loss-less step to locate the gap.

Usage: python scripts/bisect_vgg_train.py [iters]
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
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    from clip_ebc_tpu.config import ExperimentConfig, get_bins_and_anchors
    from clip_ebc_tpu.models import get_model

    B = int(os.environ.get("BENCH_BATCH", "32"))
    bins, anchors = get_bins_and_anchors(8, 4, "nwpu", "fine", "average")
    model = get_model("vgg19_ae", 448, 8, bins, anchors, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 448, 448, 3), jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    @jax.jit
    def fwd_eval(v, x, i):
        return model.apply(v, x + i.astype(x.dtype) * 1e-4, train=False).astype(jnp.float32).sum()

    @jax.jit
    def fwd_bwd(v, x, i):
        def loss(params):
            variables = {"params": params}
            if "batch_stats" in v:
                variables["batch_stats"] = v["batch_stats"]
            out, _ = model.apply(
                variables, x + i.astype(x.dtype) * 1e-4, train=True,
                mutable=["batch_stats"],
            )
            logits, density = out
            return logits.astype(jnp.float32).sum() + density.astype(jnp.float32).sum()

        val, g = jax.value_and_grad(loss)(v["params"])
        return val + sum(jnp.sum(t).astype(jnp.float32) for t in jax.tree.leaves(g))

    t1 = timed(lambda i: fwd_eval(v, x, jnp.asarray(float(i))), iters)
    print(f"forward (eval) : {t1 * 1e3:7.1f} ms  ({B / t1:6.1f} crops/s)")
    t2 = timed(lambda i: fwd_bwd(v, x, jnp.asarray(float(i))), iters)
    print(f"fwd+bwd (no OT): {t2 * 1e3:7.1f} ms  ({B / t2:6.1f} crops/s)")
    print(f"backward ratio : {t2 / t1:4.2f}x forward")


if __name__ == "__main__":
    main()
