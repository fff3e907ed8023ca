import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.training.checkpoint import CheckpointManager
from clip_ebc_tpu.training.optim import make_optimizer
from clip_ebc_tpu.training.state import TrainState


def make_state(seed=0):
    k = jax.random.PRNGKey(seed)
    params = {"w": jax.random.normal(k, (4, 4)), "b": jnp.zeros((4,))}
    tx = make_optimizer(weight_decay=1e-4)
    return TrainState.create(params=params, batch_stats={"bn": jnp.ones((4,))}, tx=tx)


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), save_best_k=2)
    state = make_state()
    state = state.apply_gradients(jax.tree_util.tree_map(jnp.ones_like, state.params), lr=0.1)
    mgr.save_latest(state, epoch=3, loss_info={"loss": 1.5})

    template = make_state(seed=99)
    restored, next_epoch = mgr.restore_latest(template)
    assert next_epoch == 4
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.asarray(state.params["w"]))
    np.testing.assert_allclose(np.asarray(restored.batch_stats["bn"]), np.asarray(state.batch_stats["bn"]))
    assert int(restored.step) == 1
    # optimizer moments restored too
    flat_a = jax.tree_util.tree_leaves(restored.opt_state)
    flat_b = jax.tree_util.tree_leaves(state.opt_state)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_restore_absent_returns_none(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "nothing"))
    assert mgr.restore_latest(make_state()) is None


def test_best_k_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), save_best_k=2)
    w = lambda v: {"params": {"w": jnp.full((2,), float(v))}}
    # epochs with mae scores: 5->10.0, 6->8.0, 7->9.0, 8->7.0
    mgr.update_best({"mae": 10.0, "rmse": 20.0}, 5, w(5))
    mgr.update_best({"mae": 8.0, "rmse": 25.0}, 6, w(6))
    best = mgr.update_best({"mae": 9.0, "rmse": 22.0}, 7, w(7))
    assert [e for _, e in best["mae"]] == [6, 7]
    assert [e for _, e in best["rmse"]] == [5, 7]
    best = mgr.update_best({"mae": 7.0, "rmse": 21.0}, 8, w(8))
    assert [e for _, e in best["mae"]] == [8, 6]
    assert [e for _, e in best["rmse"]] == [5, 8]
    # epoch 7 fell out of both top-2 lists -> pruned; 5,6,8 retained
    kept = sorted(os.listdir(tmp_path / "ck" / "best"))
    assert kept == ["5", "6", "8"]
    # restore the best-mae weights
    path = mgr.best_weights_path("mae", 0)
    restored = mgr.restore_weights(path, w(0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 8.0)


def test_best_k_worse_score_not_saved(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), save_best_k=1)
    mgr.update_best({"mae": 5.0, "rmse": 5.0}, 1, {"w": jnp.zeros(2)})
    mgr.update_best({"mae": 9.0, "rmse": 9.0}, 2, {"w": jnp.zeros(2)})
    assert sorted(os.listdir(tmp_path / "ck" / "best")) == ["1"]


def test_best_k_rerun_epoch_supersedes(tmp_path):
    """Crash-between-eval-and-save then re-run: the epoch's score must be
    replaced, not duplicated."""
    mgr = CheckpointManager(str(tmp_path / "ck"), save_best_k=3)
    w = {"w": jnp.zeros(2)}
    mgr.update_best({"mae": 9.0, "rmse": 9.0}, 1, w)
    best = mgr.update_best({"mae": 7.0, "rmse": 7.0}, 1, w)  # re-run epoch 1
    assert best["mae"] == [(7.0, 1)]
    assert len(mgr.meta["hist_scores"]["mae"]) == 1
