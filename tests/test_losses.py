import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.losses import DMCountConfig, dace_loss, dmcount_loss
from clip_ebc_tpu.losses.dace import bin_class_map, cross_entropy_sum_mean
from tests.test_sinkhorn import numpy_sinkhorn_oracle

INPUT = 64
RED = 8
HW = INPUT // RED


def numpy_dmcount_oracle(pred, target, point_lists, reg=10.0, iters=100,
                         w_ot=0.1, w_tv=0.01, input_size=INPUT, reduction=RED):
    """Independent numpy implementation of the DMCount composite loss value."""
    eps = 1e-8
    b = pred.shape[0]
    cood = np.arange(0, input_size, reduction, dtype=np.float64) + reduction / 2
    pred_count = pred.reshape(b, -1).sum(1)
    tgt_count = np.array([len(p) for p in point_lists], np.float64)
    normed_pred = pred / (pred_count[:, None, None] + eps)

    ot = 0.0
    for i, pts in enumerate(point_lists):
        if len(pts) == 0:
            continue
        dx = (pts[:, 0:1] - cood[None]) ** 2
        dy = (pts[:, 1:2] - cood[None]) ** 2
        cost = (dy[:, :, None] + dx[:, None, :]).reshape(len(pts), -1)
        src = normed_pred[i].reshape(-1)
        a = np.full(len(pts), 1.0 / len(pts))
        _, beta = numpy_sinkhorn_oracle(a, src, cost, reg, max_iters=iters)
        dens = pred[i].reshape(-1)
        c = dens.sum()
        grad = c / (c * c + eps) * beta - (dens * beta).sum() / (c * c + eps)
        ot += (dens * grad).sum()

    normed_tgt = target / (tgt_count[:, None, None] + eps)
    tv = (np.abs(normed_pred - normed_tgt).sum((1, 2)) * tgt_count).mean()
    cnt = np.abs(pred_count - tgt_count).mean()
    return ot * w_ot + tv * w_tv + cnt, dict(ot=ot, tv=tv, count=cnt)


def make_batch(rng, b=3, max_pts=16, empty_idx=None):
    pred = rng.uniform(0, 0.5, (b, HW, HW)).astype(np.float32)
    pts_lists = []
    for i in range(b):
        n = 0 if i == empty_idx else int(rng.integers(1, 10))
        pts_lists.append(rng.uniform(0, INPUT, (n, 2)).astype(np.float32))
    target = np.zeros((b, HW, HW), np.float32)
    for i, pts in enumerate(pts_lists):
        for x, y in pts:
            target[i, int(y) // RED, int(x) // RED] += 1.0
    points = np.zeros((b, max_pts, 2), np.float32)
    mask = np.zeros((b, max_pts), bool)
    for i, pts in enumerate(pts_lists):
        points[i, : len(pts)] = pts
        mask[i, : len(pts)] = True
    return pred, target, points, mask, pts_lists


def test_dmcount_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    pred, target, points, mask, pts_lists = make_batch(rng)
    cfg = DMCountConfig(input_size=INPUT, reduction=RED)
    loss, info = dmcount_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(points), jnp.asarray(mask), cfg
    )
    oracle, parts = numpy_dmcount_oracle(pred.astype(np.float64), target, pts_lists)
    assert float(loss) == pytest.approx(oracle, rel=2e-3)
    assert float(info["ot_loss"]) == pytest.approx(parts["ot"], rel=2e-3, abs=1e-4)
    assert float(info["tv_loss"]) == pytest.approx(parts["tv"], rel=1e-4)
    assert float(info["count_loss"]) == pytest.approx(parts["count"], rel=1e-4)


def test_dmcount_empty_image_contributes_zero_ot():
    rng = np.random.default_rng(1)
    pred, target, points, mask, pts_lists = make_batch(rng, b=2, empty_idx=0)
    cfg = DMCountConfig(input_size=INPUT, reduction=RED)
    loss, info = dmcount_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(points), jnp.asarray(mask), cfg
    )
    oracle, _ = numpy_dmcount_oracle(pred.astype(np.float64), target, pts_lists)
    assert np.isfinite(float(loss))
    assert float(loss) == pytest.approx(oracle, rel=2e-3)


def test_dmcount_ot_gradient_closed_form():
    """grad of the OT term w.r.t. pred must equal the DM-Count closed form
    beta/c - <s,beta>/c^2 (reference dm_loss.py:66-76), computed here from
    the numpy-oracle Sinkhorn duals."""
    rng = np.random.default_rng(2)
    pred, target, points, mask, pts_lists = make_batch(rng, b=2)
    # weight_tv=0 and isolate the OT+count part; count grad is sign(pred_count - n)/B
    cfg = DMCountConfig(input_size=INPUT, reduction=RED, weight_ot=1.0, weight_tv=0.0)

    def total(p):
        loss, _ = dmcount_loss(p, jnp.asarray(target), jnp.asarray(points), jnp.asarray(mask), cfg)
        return loss

    g = np.asarray(jax.grad(total)(jnp.asarray(pred)), np.float64)

    eps = 1e-8
    cood = np.arange(0, INPUT, RED, dtype=np.float64) + RED / 2
    b = pred.shape[0]
    pred64 = pred.astype(np.float64)
    pred_count = pred64.reshape(b, -1).sum(1)
    n_pts = np.array([len(p) for p in pts_lists], np.float64)
    count_grad = np.sign(pred_count - n_pts)[:, None, None] / b * np.ones_like(pred64)
    for i, pts in enumerate(pts_lists):
        dx = (pts[:, 0:1] - cood[None]) ** 2
        dy = (pts[:, 1:2] - cood[None]) ** 2
        cost = (dy[:, :, None] + dx[:, None, :]).reshape(len(pts), -1)
        src = (pred64[i] / (pred_count[i] + eps)).reshape(-1)
        a = np.full(len(pts), 1.0 / len(pts))
        _, beta = numpy_sinkhorn_oracle(a, src, cost, reg=10.0, max_iters=100)
        dens = pred64[i].reshape(-1)
        c = dens.sum()
        expected = (c / (c * c + eps) * beta - (dens * beta).sum() / (c * c + eps)).reshape(HW, HW)
        np.testing.assert_allclose(
            g[i] - count_grad[i], expected, rtol=5e-3, atol=5e-5
        )


def test_bin_class_map():
    bins = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, float("inf"))]
    d = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 7.0]])
    classes = bin_class_map(d, bins)
    np.testing.assert_array_equal(np.asarray(classes), [[0, 1, 2, 3, 3]])


def test_bin_class_map_overlap_later_wins():
    bins = [(0.0, 2.0), (2.0, float("inf"))]
    d = jnp.asarray([[2.0]])
    assert int(bin_class_map(d, bins)[0, 0]) == 1


def test_cross_entropy_reduction_semantics():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    classes = rng.integers(0, 3, (2, 4, 4))
    ce = cross_entropy_sum_mean(jnp.asarray(logits), jnp.asarray(classes))
    # numpy oracle
    x = logits - logits.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    picked = np.take_along_axis(logp, classes[..., None], -1)[..., 0]
    oracle = (-picked).sum((1, 2)).mean()
    assert float(ce) == pytest.approx(oracle, rel=1e-5)


def test_dace_loss_mae():
    rng = np.random.default_rng(4)
    pred, target, points, mask, _ = make_batch(rng, b=2)
    logits = rng.normal(size=(2, HW, HW, 4)).astype(np.float32)
    bins = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, float("inf"))]
    loss, info = dace_loss(
        jnp.asarray(logits), jnp.asarray(pred), jnp.asarray(target),
        jnp.asarray(points), jnp.asarray(mask), bins=bins,
        weight_count_loss=1.0, count_loss="mae",
    )
    mae = np.abs(pred - target).sum((1, 2)).mean()
    assert float(info["mae_loss"]) == pytest.approx(mae, rel=1e-5)
    assert float(loss) == pytest.approx(float(info["ce_loss"]) + mae, rel=1e-5)


def test_dace_loss_dmcount_composes():
    rng = np.random.default_rng(5)
    pred, target, points, mask, _ = make_batch(rng, b=2)
    logits = rng.normal(size=(2, HW, HW, 4)).astype(np.float32)
    bins = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, float("inf"))]
    cfg = DMCountConfig(input_size=INPUT, reduction=RED)
    loss, info = dace_loss(
        jnp.asarray(logits), jnp.asarray(pred), jnp.asarray(target),
        jnp.asarray(points), jnp.asarray(mask), bins=bins,
        weight_count_loss=1.0, count_loss="dmcount", dm_cfg=cfg,
    )
    assert np.isfinite(float(loss))
    for k in ("ce_loss", "ot_loss", "tv_loss", "count_loss", "loss"):
        assert k in info


def test_dace_loss_jit_and_grad():
    rng = np.random.default_rng(6)
    pred, target, points, mask, _ = make_batch(rng, b=2)
    logits = rng.normal(size=(2, HW, HW, 4)).astype(np.float32)
    bins = ((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, float("inf")))
    cfg = DMCountConfig(input_size=INPUT, reduction=RED)

    @jax.jit
    def f(lg, pd):
        loss, _ = dace_loss(
            lg, pd, jnp.asarray(target), jnp.asarray(points), jnp.asarray(mask),
            bins=bins, count_loss="dmcount", dm_cfg=cfg,
        )
        return loss

    g = jax.grad(f, argnums=(0, 1))(jnp.asarray(logits), jnp.asarray(pred))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


def test_dmcount_beyond_legacy_point_cap():
    """OT parity at P > 2048 (the pre-r4 fixed pad): a 3000-point image
    must match the numpy oracle exactly like a sparse one — the auto pad
    (loader) plus the separable solver make the uncapped-OT semantics of
    the reference (reference losses/dm_loss.py:48) the default."""
    rng = np.random.default_rng(11)
    b, pad = 2, 4096
    pred = rng.uniform(0, 0.5, (b, HW, HW)).astype(np.float32)
    pts_lists = [
        rng.uniform(0, INPUT, (3000, 2)).astype(np.float32),
        rng.uniform(0, INPUT, (7, 2)).astype(np.float32),
    ]
    target = np.zeros((b, HW, HW), np.float32)
    for i, pts in enumerate(pts_lists):
        for x, y in pts:
            target[i, int(y) // RED, int(x) // RED] += 1.0
    points = np.zeros((b, pad, 2), np.float32)
    mask = np.zeros((b, pad), bool)
    for i, pts in enumerate(pts_lists):
        points[i, : len(pts)] = pts
        mask[i, : len(pts)] = True

    cfg = DMCountConfig(input_size=INPUT, reduction=RED)
    loss, info = dmcount_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(points),
        jnp.asarray(mask), cfg
    )
    oracle, parts = numpy_dmcount_oracle(pred.astype(np.float64), target, pts_lists)
    assert float(loss) == pytest.approx(oracle, rel=2e-3)
    assert float(info["ot_loss"]) == pytest.approx(parts["ot"], rel=2e-3, abs=1e-4)
