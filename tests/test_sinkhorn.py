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
