"""End-to-end train-step tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.config import ExperimentConfig
from clip_ebc_tpu.data.loader import Batch
from clip_ebc_tpu.losses import make_loss_fn
from clip_ebc_tpu.models import get_model
from clip_ebc_tpu.parallel.mesh import make_mesh, shard_batch
from clip_ebc_tpu.training import Trainer

INPUT = 32
RED = 8
HW = INPUT // RED


def tiny_cfg(**kw):
    base = dict(
        dataset="shb",
        model="vgg11_ae",
        input_size=INPUT,
        reduction=RED,
        truncation=4,
        count_loss="mae",
        batch_size=8,
        lr=1e-3,
        warmup_epochs=2,
        warmup_lr=1e-4,
    )
    base.update(kw)
    return ExperimentConfig(**base).normalize()


def synthetic_batch(rng, b=8):
    images = rng.normal(size=(b, INPUT, INPUT, 3)).astype(np.float32)
    points = np.zeros((b, 8, 2), np.float32)
    mask = np.zeros((b, 8), bool)
    density = np.zeros((b, HW, HW), np.float32)
    for i in range(b):
        n = int(rng.integers(1, 5))
        pts = rng.uniform(0, INPUT, (n, 2)).astype(np.float32)
        points[i, :n] = pts
        mask[i, :n] = True
        for x, y in pts:
            density[i, int(y) // RED, int(x) // RED] += 1.0
    return Batch(images=images, points=points, point_mask=mask, density=density)


class _OneBatchLoader:
    def __init__(self, batch, n=2):
        self.batch, self.n = batch, n

    def set_epoch(self, e):
        pass

    def __iter__(self):
        for _ in range(self.n):
            yield self.batch


def test_train_step_runs_and_loss_decreases():
    cfg = tiny_cfg()
    model = get_model(cfg.model, cfg.input_size, cfg.reduction, cfg.bins, cfg.bin_anchors)
    loss_fn = make_loss_fn(cfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    trainer = Trainer(cfg, model, loss_fn, mesh)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    losses = []
    state, m = trainer.train_epoch(state, _OneBatchLoader(batch, 10), epoch=1)
    losses.append(m["loss"])
    state, m = trainer.train_epoch(state, _OneBatchLoader(batch, 10), epoch=2)
    losses.append(m["loss"])
    assert np.isfinite(losses).all()
    assert losses[1] < losses[0], losses  # same batch repeated: loss must drop
    assert int(state.step) == 20


def test_train_step_dmcount_loss():
    cfg = tiny_cfg(count_loss="dmcount")
    model = get_model(cfg.model, cfg.input_size, cfg.reduction, cfg.bins, cfg.bin_anchors)
    loss_fn = make_loss_fn(cfg)
    trainer = Trainer(cfg, model, loss_fn)
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_epoch(state, _OneBatchLoader(batch, 2), epoch=1)
    for k in ("loss", "ce_loss", "ot_loss", "tv_loss", "count_loss"):
        assert k in metrics and np.isfinite(metrics[k]), (k, metrics)


def test_batch_stats_updated_and_replicated():
    cfg = tiny_cfg(model="vgg11_bn")  # BN variant so batch_stats exist
    model = get_model(cfg.model, cfg.input_size, cfg.reduction, cfg.bins, cfg.bin_anchors)
    trainer = Trainer(cfg, model, make_loss_fn(cfg))
    rng = np.random.default_rng(2)
    batch = synthetic_batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    bs_before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state, _ = trainer.train_epoch(state, _OneBatchLoader(batch, 1), epoch=1)
    bs_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs_before), np.asarray(bs_after))
    # outputs stay fully addressable & replicated for checkpointing
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.is_fully_replicated


def test_regression_mode_trains():
    cfg = tiny_cfg(regression=True, count_loss="dmcount")
    model = get_model(cfg.model, cfg.input_size, cfg.reduction)  # Regressor
    trainer = Trainer(cfg, model, make_loss_fn(cfg))
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_epoch(state, _OneBatchLoader(batch, 2), epoch=1)
    assert np.isfinite(metrics["loss"])


def test_schedule_drives_lr():
    cfg = tiny_cfg()
    model = get_model(cfg.model, cfg.input_size, cfg.reduction, cfg.bins, cfg.bin_anchors)
    trainer = Trainer(cfg, model, make_loss_fn(cfg))
    assert trainer.schedule(0) == pytest.approx(cfg.warmup_lr)
    assert trainer.schedule(2) == pytest.approx(cfg.lr)


def test_clip_vpt_frozen_trunk_and_text_hoist(rng):
    """VPT flagship semantics: the frozen ViT trunk and text tower must not
    move, the prompts/decoder/head must train, and the hoisted text
    features (ClipEBC.encode_text) must be forward-equivalent to the
    inline text tower."""
    cfg = tiny_cfg(model="clip_vit_b_16")
    model = get_model(
        cfg.model, cfg.input_size, cfg.reduction, cfg.bins, cfg.bin_anchors,
        num_vpt=2,
    )
    trainer = Trainer(cfg, model, make_loss_fn(cfg), make_mesh())
    batch = synthetic_batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    feats = model.apply(variables, method="encode_text")
    d_inline = model.apply(variables, jnp.asarray(batch.images[:2]), train=False)
    d_hoisted = model.apply(
        variables, jnp.asarray(batch.images[:2]), train=False, text_feats=feats
    )
    np.testing.assert_allclose(
        np.asarray(d_inline), np.asarray(d_hoisted), atol=1e-6
    )

    def snap(tree, *path):
        node = tree
        for k in path:
            node = node[k]
        return np.asarray(jax.device_get(node))

    trunk_before = snap(state.params, "image_encoder", "resblock_0", "mlp_fc", "kernel")
    text_before = snap(state.params, "text_encoder", "resblock_0", "mlp_fc", "kernel")
    vpt_before = snap(state.params, "image_encoder", "vpt")

    state, metrics = trainer.train_epoch(state, _OneBatchLoader(batch, 2), epoch=1)
    assert np.isfinite(metrics["loss"])

    np.testing.assert_array_equal(
        snap(state.params, "image_encoder", "resblock_0", "mlp_fc", "kernel"),
        trunk_before,
    )
    np.testing.assert_array_equal(
        snap(state.params, "text_encoder", "resblock_0", "mlp_fc", "kernel"),
        text_before,
    )
    assert np.abs(snap(state.params, "image_encoder", "vpt") - vpt_before).max() > 0


def test_stop_frozen_preserves_trainable_grads(rng):
    """Pruning frozen subtrees with stop_gradient must leave the gradients
    of the trainable parameters bit-unchanged (it only removes dead work)."""
    from clip_ebc_tpu.models.clip.model import _vpt_frozen_predicate
    from clip_ebc_tpu.training.trainer import _stop_frozen

    cfg = tiny_cfg(model="clip_vit_b_16")
    model = get_model(
        cfg.model, cfg.input_size, cfg.reduction, cfg.bins, cfg.bin_anchors,
        num_vpt=2,
    )
    loss_fn = make_loss_fn(cfg)
    batch = synthetic_batch(rng, b=2)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(batch.images[:1]), train=True)
    params = variables["params"]

    def loss_of(p, prune):
        if prune:
            p = _stop_frozen(p, _vpt_frozen_predicate)
        (logits, density), _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            jnp.asarray(batch.images), train=True, mutable=["batch_stats"],
        )
        loss, _ = loss_fn(logits, density, batch)
        return loss

    g_full = jax.grad(lambda p: loss_of(p, False))(params)
    g_pruned = jax.grad(lambda p: loss_of(p, True))(params)

    flat_full = jax.tree_util.tree_flatten_with_path(g_full)[0]
    flat_pruned = dict(jax.tree_util.tree_flatten_with_path(g_pruned)[0])
    checked_frozen = checked_train = 0
    for path, g in flat_full:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        gp = np.asarray(flat_pruned[path])
        if _vpt_frozen_predicate(keys):
            assert np.all(gp == 0), keys
            checked_frozen += 1
        else:
            np.testing.assert_allclose(gp, np.asarray(g), atol=1e-6, err_msg=str(keys))
            checked_train += 1
    assert checked_frozen > 0 and checked_train > 0
