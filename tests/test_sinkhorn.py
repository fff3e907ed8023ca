import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.losses.sinkhorn import M_EPS, sinkhorn


def numpy_sinkhorn_oracle(a, b, C, reg, max_iters=100, stop_thr=1e-9, eval_freq=10):
    """Independent numpy Sinkhorn-Knopp implementation used as an oracle."""
    na, nb = C.shape
    K = np.exp(-C / reg)
    u = np.full(na, 1.0 / na)
    v = np.full(nb, 1.0 / nb)
    it, err = 0, np.inf
    while it < max_iters and err > stop_thr:
        u_prev, v_prev = u, v
        v = b / (u @ K + M_EPS)
        u = a / (K @ v + M_EPS)
        if not (np.all(np.isfinite(u)) and np.all(np.isfinite(v))):
            u, v = u_prev, v_prev
            break
        it += 1
        if it % eval_freq == 0:
            b_hat = (u @ K) * v
            err = np.sum((b - b_hat) ** 2)
    P = u[:, None] * K * v[None, :]
    beta = reg * np.log(v + M_EPS)
    return P, beta


def random_problem(rng, na=7, nb=13, scale=1.0):
    a = rng.uniform(0.1, 1, na)
    a /= a.sum()
    b = rng.uniform(0.1, 1, nb)
    b /= b.sum()
    C = rng.uniform(0, scale, (na, nb))
    return a, b, C


def test_sinkhorn_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    a, b, C = random_problem(rng, scale=5.0)
    res = sinkhorn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(C), reg=1.0, max_iters=200)
    P_np, beta_np = numpy_sinkhorn_oracle(a, b, C, reg=1.0, max_iters=200)
    np.testing.assert_allclose(np.asarray(res.plan), P_np, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.beta), beta_np, rtol=1e-3, atol=1e-4)


def test_sinkhorn_marginals():
    rng = np.random.default_rng(1)
    a, b, C = random_problem(rng, na=5, nb=9, scale=2.0)
    res = sinkhorn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(C), reg=0.5, max_iters=1000)
    P = np.asarray(res.plan)
    np.testing.assert_allclose(P.sum(1), a, atol=1e-4)
    np.testing.assert_allclose(P.sum(0), b, atol=1e-4)


def test_sinkhorn_masked_rows_inert():
    """A padded problem must produce the same solution as the unpadded one."""
    rng = np.random.default_rng(2)
    a, b, C = random_problem(rng, na=4, nb=8, scale=3.0)
    res_ref = sinkhorn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(C), reg=1.0, max_iters=300)

    pad = 3
    a_pad = np.concatenate([a, np.zeros(pad)])
    C_pad = np.concatenate([C, np.full((pad, C.shape[1]), 1e6)], axis=0)
    mask = np.concatenate([np.ones(4, bool), np.zeros(pad, bool)])
    res_pad = sinkhorn(
        jnp.asarray(a_pad), jnp.asarray(b), jnp.asarray(C_pad), reg=1.0,
        max_iters=300, a_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(res_pad.plan[:4]), np.asarray(res_ref.plan), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(res_pad.plan[4:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(res_pad.beta), np.asarray(res_ref.beta), rtol=1e-3, atol=1e-4
    )


def test_sinkhorn_huge_costs_no_nan():
    """DMCount regime: squared pixel distances up to ~4e5, reg=10 -> massive
    underflow in K; the M_EPS guards must keep everything finite."""
    rng = np.random.default_rng(3)
    n = 16
    pts = rng.uniform(0, 448, (n, 2))
    centers = np.stack(np.meshgrid(np.arange(4, 448, 8), np.arange(4, 448, 8)), -1).reshape(-1, 2)
    C = ((pts[:, None, :] - centers[None]) ** 2).sum(-1)
    a = np.full(n, 1.0 / n)
    b = rng.uniform(0, 1, C.shape[1])
    b /= b.sum()
    res = sinkhorn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(C), reg=10.0, max_iters=100)
    assert np.isfinite(np.asarray(res.beta)).all()
    assert np.isfinite(np.asarray(res.plan)).all()


def test_sinkhorn_vmap():
    rng = np.random.default_rng(4)
    batch = [random_problem(rng, na=6, nb=10, scale=2.0) for _ in range(3)]
    A = jnp.asarray(np.stack([x[0] for x in batch]))
    B = jnp.asarray(np.stack([x[1] for x in batch]))
    C = jnp.asarray(np.stack([x[2] for x in batch]))
    batched = jax.vmap(lambda a, b, c: sinkhorn(a, b, c, reg=1.0, max_iters=200).plan)
    P = np.asarray(batched(A, B, C))
    for i, (a, b, c) in enumerate(batch):
        P_np, _ = numpy_sinkhorn_oracle(a, b, c, reg=1.0, max_iters=200)
        np.testing.assert_allclose(P[i], P_np, rtol=1e-4, atol=1e-7)


def _grid_problem(rng, P=24, H=7, W=5, size=56, reg=4.0, masked=0):
    """A DMCount-shaped problem: points vs grid block centers, separable
    squared-L2 cost. Returns (a, b, cost, ky, kx, mask)."""
    red = size // max(H, W)
    pts = rng.uniform(0, size, (P, 2)).astype(np.float32)
    cy = (np.arange(H) * red + red / 2).astype(np.float32)
    cx = (np.arange(W) * red + red / 2).astype(np.float32)
    dy = (pts[:, 1:2] - cy[None, :]) ** 2
    dx = (pts[:, 0:1] - cx[None, :]) ** 2
    cost = (dy[:, :, None] + dx[:, None, :]).reshape(P, H * W)
    mask = np.arange(P) < (P - masked)
    n = mask.sum()
    a = np.where(mask, 1.0 / n, 0.0).astype(np.float32)
    b = rng.uniform(0.1, 1.0, H * W).astype(np.float32)
    b /= b.sum()
    return a, b, cost, np.exp(-dy / reg), np.exp(-dx / reg), mask


def test_sinkhorn_separable_matches_dense():
    """The factored solver (sinkhorn_separable) runs the same iteration as
    the dense one on K = ky ⊗ kx; duals and plan must agree to fp32
    accumulation tolerance."""
    from clip_ebc_tpu.losses.sinkhorn import sinkhorn_separable

    rng = np.random.default_rng(7)
    for masked in (0, 9):
        a, b, cost, ky, kx, mask = _grid_problem(rng, masked=masked)
        H, W = ky.shape[1], kx.shape[1]
        reg = 4.0
        r_d = sinkhorn(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(cost), reg=reg,
            max_iters=60, a_mask=jnp.asarray(mask), return_plan=True,
        )
        r_s = sinkhorn_separable(
            jnp.asarray(a), jnp.asarray(b).reshape(H, W), jnp.asarray(ky),
            jnp.asarray(kx), reg=reg, max_iters=60,
            a_mask=jnp.asarray(mask), return_plan=True,
        )
        assert int(r_s.iters) == int(r_d.iters)
        np.testing.assert_allclose(
            np.asarray(r_s.plan), np.asarray(r_d.plan), rtol=2e-3, atol=1e-6
        )
        # The duals are gauge-sensitive; compare the gauge-invariant
        # combination the DMCount gradient uses (beta - weighted mean).
        s = np.asarray(r_d.plan).sum(0)  # a source-like weighting
        s = s / max(s.sum(), 1e-12)
        for r in (r_d, r_s):
            assert np.isfinite(np.asarray(r.beta)).all()
        gd = np.asarray(r_d.beta) - np.sum(s * np.asarray(r_d.beta))
        gs = np.asarray(r_s.beta) - np.sum(s * np.asarray(r_s.beta))
        np.testing.assert_allclose(gs, gd, rtol=5e-3, atol=5e-3)


def test_sinkhorn_separable_vmap_dmcount_shape():
    """Batched (vmapped) separable solve on the flagship 28x28 grid stays
    finite and satisfies the marginal constraints."""
    from clip_ebc_tpu.losses.sinkhorn import sinkhorn_separable

    rng = np.random.default_rng(8)
    probs = [_grid_problem(rng, P=32, H=28, W=28, size=224, reg=10.0, masked=m)
             for m in (0, 5, 31)]
    A = jnp.asarray(np.stack([p[0] for p in probs]))
    B = jnp.asarray(np.stack([p[1].reshape(28, 28) for p in probs]))
    KY = jnp.asarray(np.stack([p[3] for p in probs]))
    KX = jnp.asarray(np.stack([p[4] for p in probs]))
    M = jnp.asarray(np.stack([p[5] for p in probs]))
    fn = jax.vmap(
        lambda a, b, ky, kx, m: sinkhorn_separable(
            a, b, ky, kx, reg=10.0, max_iters=100, a_mask=m, return_plan=True
        ).plan
    )
    plans = np.asarray(fn(A, B, KY, KX, M))
    assert np.isfinite(plans).all()
    for i, (a, b, cost, _ky, _kx, mask) in enumerate(probs):
        # the batched factored solve must match the dense solver per image
        # (marginals themselves need not be met at 100 iters on this
        # spread-out b; dense deviates identically)
        r_d = sinkhorn(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(cost), reg=10.0,
            max_iters=100, a_mask=jnp.asarray(mask), return_plan=True,
        )
        np.testing.assert_allclose(
            plans[i], np.asarray(r_d.plan), rtol=2e-3, atol=1e-6
        )
