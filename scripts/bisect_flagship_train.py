"""clip_vit_b_16 VPT-32 train-step attribution on the real chip.

The flagship train bench (BENCH_MODE=train_flagship) measures the full
production step (Trainer._step: fwd + bwd + Adam + dmcount loss).  This
script isolates the stages to locate the remaining gap to the 700 crops/s
A100-estimate target:

  fwd(eval)      - inference forward only
  fwd(train)     - train-mode forward (loss fwd incl. Sinkhorn)
  fwd+bwd        - value_and_grad of the full loss (no optimizer)
  full step      - the production Trainer._step
  full step mae  - same with count_loss=mae (no Sinkhorn while_loop)

Usage: BENCH_BATCH=128 python scripts/bisect_flagship_train.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
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


def make_batch(cfg, batch):
    from clip_ebc_tpu.data.loader import Batch

    rng = np.random.default_rng(0)
    hw = cfg.input_size // cfg.reduction
    pts = rng.uniform(0, cfg.input_size, (batch, 256, 2)).astype(np.float32)
    density = np.zeros((batch, hw, hw), np.float32)
    for i in range(batch):
        for x, y in pts[i]:
            density[i, int(y) // cfg.reduction, int(x) // cfg.reduction] += 1.0
    return Batch(
        images=rng.normal(size=(batch, cfg.input_size, cfg.input_size, 3)).astype(
            np.float32
        ),
        points=pts,
        point_mask=np.ones((batch, 256), bool),
        density=density,
    )


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    from clip_ebc_tpu.config import ExperimentConfig
    from clip_ebc_tpu.losses import make_loss_fn
    from clip_ebc_tpu.models import get_model
    from clip_ebc_tpu.parallel.mesh import shard_batch
    from clip_ebc_tpu.training import Trainer

    B = int(os.environ.get("BENCH_BATCH", "128"))
    cfg = ExperimentConfig(
        dataset="qnrf", model="clip_vit_b_16", input_size=224, reduction=8,
        truncation=4, count_loss="dmcount", batch_size=B, amp=True,
        num_vpt=32, prompt_type="word",
    ).normalize()
    model = get_model(cfg.model, cfg.input_size, cfg.reduction, cfg.bins,
                      cfg.bin_anchors, dtype=jnp.bfloat16)
    trainer = Trainer(cfg, model, make_loss_fn(cfg))
    b = make_batch(cfg, B)
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    b_dev = shard_batch(trainer.mesh, b)
    lr = jnp.asarray(1e-4, jnp.float32)
    text_feats = trainer.text_features(state)

    x = jnp.asarray(b.images, jnp.bfloat16)
    bstats = state.batch_stats

    @jax.jit
    def fwd_eval(params, x, i):
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats
        out = model.apply(
            variables, x + i.astype(x.dtype) * 1e-4, train=False,
            text_feats=text_feats,
        )
        return out.astype(jnp.float32).sum()

    loss_fn = make_loss_fn(cfg)
    frozen = getattr(model, "frozen_param_predicate", None)
    from clip_ebc_tpu.training.trainer import _stop_frozen

    def compute_loss(params, images, batch):
        if frozen is not None:
            params = _stop_frozen(params, frozen)
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats
        out = model.apply(
            variables, images, train=True, text_feats=text_feats,
            mutable=["batch_stats"] if bstats else [],
        )
        (logits, pred_density), _ = out
        loss, _ = loss_fn(logits, pred_density, batch)
        return loss

    @jax.jit
    def fwd_train(params, x, i, batch):
        return compute_loss(params, x + i.astype(x.dtype) * 1e-4, batch)

    @jax.jit
    def fwd_bwd(params, x, i, batch):
        val, g = jax.value_and_grad(compute_loss)(
            params, x + i.astype(x.dtype) * 1e-4, batch
        )
        return val + sum(
            jnp.sum(t).astype(jnp.float32) for t in jax.tree.leaves(g)
        )

    t = timed(lambda i: fwd_eval(state.params, x, jnp.asarray(float(i))), iters)
    print(f"fwd (eval)     : {t*1e3:7.1f} ms  ({B/t:6.1f} crops/s)")
    t = timed(lambda i: fwd_train(state.params, x, jnp.asarray(float(i)), b_dev), iters)
    print(f"fwd (train+OT) : {t*1e3:7.1f} ms  ({B/t:6.1f} crops/s)")
    t = timed(lambda i: fwd_bwd(state.params, x, jnp.asarray(float(i)), b_dev), iters)
    print(f"fwd+bwd        : {t*1e3:7.1f} ms  ({B/t:6.1f} crops/s)")

    # full production step (donated state: rebuild per call is excluded by
    # timing only the steady-state loop with a persistent state object)
    st = state

    def full(i):
        nonlocal st
        st, info = trainer._step(st, b_dev, lr, text_feats)
        return info["loss"]

    t = timed(full, iters)
    print(f"full step      : {t*1e3:7.1f} ms  ({B/t:6.1f} crops/s)")


if __name__ == "__main__":
    main()
