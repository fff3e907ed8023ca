"""Entropic-OT Sinkhorn solver, batched and masked for TPU.

Semantics follow the Sinkhorn-Knopp scaling loop the reference uses
(reference losses/bregman_pytorch.py:102-144): plain (non-log) scaling
with M_EPS division guards, fp32 throughout, NaN/Inf bail-out restoring
the previous iterates, and a convergence check on the source-marginal
error every ``eval_freq`` iterations.

TPU-first differences:
- The whole batch is solved at once: callers ``vmap`` :func:`sinkhorn`
  over padded cost matrices. Padded target rows are disabled via
  ``a == 0`` and a zeroed kernel row, making them exactly inert after
  the first iteration (the reference loops over images in Python,
  reference losses/dm_loss.py:48).
- Fixed-shape ``lax.while_loop`` with an iteration cap instead of a
  Python ``while``; early exit still happens when the marginal error
  drops below ``stop_thr``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

M_EPS = 1e-16


class SinkhornResult(NamedTuple):
    plan: jnp.ndarray  # (na, nb) transport plan
    u: jnp.ndarray  # (na,) scaling
    v: jnp.ndarray  # (nb,) scaling
    alpha: jnp.ndarray  # (na,) dual potential reg*log(u)
    beta: jnp.ndarray  # (nb,) dual potential reg*log(v)
    err: jnp.ndarray  # final marginal error
    iters: jnp.ndarray  # iterations executed


def _masked_u0(a_mask, na):
    """u starts at 1/n over the *valid* rows, matching the reference's
    per-image init where na is the true point count
    (reference bregman_pytorch.py:88). The duals are gauge-dependent on
    this choice even though the plan and the OT gradient are not."""
    if a_mask is None:
        return jnp.full((na,), 1.0 / na, jnp.float32)
    n_valid = jnp.maximum(jnp.sum(a_mask.astype(jnp.float32)), 1.0)
    return jnp.where(a_mask, 1.0 / n_valid, 0.0).astype(jnp.float32)


def _scaling_loop(a, b, KT_u, K_v, u0, v0, max_iters, stop_thr, eval_freq):
    """The shared Sinkhorn-Knopp scaling iteration: plain (non-log) scaling
    with M_EPS division guards, NaN/Inf bail-out restoring the previous
    iterates, and the source-marginal convergence check every ``eval_freq``
    iterations (reference bregman_pytorch.py:102-144). The kernel enters
    only through the two matvec closures ``KT_u``/``K_v``, so the dense and
    factored solvers run provably identical iterations; ``v``/``b`` may be
    any shape (the separable solver keeps them 2-D)."""

    def cond(state):
        u, v, err, it, done = state
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    def body(state):
        u, v, err, it, done = state
        v_new = b / (KT_u(u) + M_EPS)
        u_new = a / (K_v(v_new) + M_EPS)

        bad = jnp.logical_not(
            jnp.all(jnp.isfinite(u_new)) & jnp.all(jnp.isfinite(v_new))
        )
        # On numerical failure keep the previous iterates and stop
        # (reference bregman_pytorch.py:111-115).
        u_next = jnp.where(bad, u, u_new)
        v_next = jnp.where(bad, v, v_new)

        it_next = it + 1
        check = jnp.logical_and(it_next % eval_freq == 0, jnp.logical_not(bad))

        def marginal_err(_):
            b_hat = KT_u(u_next) * v_next
            return jnp.sum((b - b_hat) ** 2)

        err_next = jax.lax.cond(check, marginal_err, lambda _: err, None)
        done_next = jnp.logical_or(bad, err_next <= stop_thr)
        return u_next, v_next, err_next, it_next, done_next

    err0 = jnp.asarray(jnp.inf, jnp.float32)
    return jax.lax.while_loop(
        cond, body, (u0, v0, err0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )


def sinkhorn(
    a: jnp.ndarray,
    b: jnp.ndarray,
    cost: jnp.ndarray,
    reg: float = 10.0,
    max_iters: int = 100,
    stop_thr: float = 1e-9,
    eval_freq: int = 10,
    a_mask: Optional[jnp.ndarray] = None,
    return_plan: bool = True,
) -> SinkhornResult:
    """Solve entropic OT between histograms ``a`` (na,) and ``b`` (nb,).

    ``a_mask`` marks valid rows of ``a``/``cost``; masked rows behave as if
    absent (their kernel row is zeroed and their scaling stays 0).
    All computation is fp32 regardless of input dtypes.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    cost = cost.astype(jnp.float32)
    na, nb = cost.shape

    K = jnp.exp(-cost / reg)
    if a_mask is not None:
        K = jnp.where(a_mask[:, None], K, 0.0)
        a = jnp.where(a_mask, a, 0.0)

    u0 = _masked_u0(a_mask, na)
    v0 = jnp.full((nb,), 1.0 / nb, jnp.float32)
    u, v, err, iters, _ = _scaling_loop(
        a, b, lambda u_: u_ @ K, lambda v_: K @ v_, u0, v0,
        max_iters, stop_thr, eval_freq,
    )

    alpha = reg * jnp.log(u + M_EPS)
    beta = reg * jnp.log(v + M_EPS)
    # The (na, nb) plan is only needed for Wasserstein-distance diagnostics;
    # the DMCount gradient uses just the dual beta. Skipping it saves a
    # batch x P x HW materialization in the train step.
    plan = u[:, None] * K * v[None, :] if return_plan else jnp.zeros((0, 0), jnp.float32)
    return SinkhornResult(plan=plan, u=u, v=v, alpha=alpha, beta=beta, err=err, iters=iters)


def sinkhorn_separable(
    a: jnp.ndarray,
    b: jnp.ndarray,
    ky: jnp.ndarray,
    kx: jnp.ndarray,
    reg: float = 10.0,
    max_iters: int = 100,
    stop_thr: float = 1e-9,
    eval_freq: int = 10,
    a_mask: Optional[jnp.ndarray] = None,
    return_plan: bool = False,
) -> SinkhornResult:
    """:func:`sinkhorn` specialised to a SEPARABLE cost on a 2-D grid.

    DMCount's OT cost is squared L2 between points and block centers, i.e.
    ``cost[p, (y, x)] = dy[p, y] + dx[p, x]``, so the Gibbs kernel factors
    exactly: ``K = ky ⊗ kx`` with ``ky = exp(-dy/reg)`` (na, H) and
    ``kx = exp(-dx/reg)`` (na, W). Each scaling matvec then factorises into
    two small matmuls over the FACTORS instead of one over the dense
    (na, H*W) kernel:

        (u @ K)[y, x]  = sum_p (u[p] * ky[p, y]) * kx[p, x]
                       = ((u[:, None] * ky)^T @ kx)[y, x]
        (K @ v)[p]     = sum_y ky[p, y] * (kx @ V^T)[p, y],  V = v as (H, W)

    Same iteration count, same guards, same duals as the dense solver (up
    to fp32 rounding: ``exp(s+t) == exp(s)*exp(t)`` exactly in the reals),
    but the per-iteration operand traffic drops from na*H*W to na*(H+W) —
    the TPU-native shape for the DMCount train step, where the dense
    (256, 784) kernel per image is pure HBM burn.

    ``b`` is the 2-D (H, W) source histogram; returned ``v``/``beta`` are
    flattened row-major (y-major) to match the dense solver's layout.
    ``return_plan`` materialises the dense (na, H*W) plan (diagnostics
    only).
    """
    a = a.astype(jnp.float32)
    b2 = b.astype(jnp.float32)
    ky = ky.astype(jnp.float32)
    kx = kx.astype(jnp.float32)
    na, h = ky.shape
    w = kx.shape[1]

    if a_mask is not None:
        ky = jnp.where(a_mask[:, None], ky, 0.0)
        a = jnp.where(a_mask, a, 0.0)

    u0 = _masked_u0(a_mask, na)
    v0 = jnp.full((h, w), 1.0 / (h * w), jnp.float32)

    def KT_u(u):  # (na,) -> (H, W)
        return (u[:, None] * ky).T @ kx

    def K_v(v2):  # (H, W) -> (na,)
        return jnp.sum(ky * (kx @ v2.T), axis=1)

    u, v2, err, iters, _ = _scaling_loop(
        a, b2, KT_u, K_v, u0, v0, max_iters, stop_thr, eval_freq
    )
    v = v2.reshape(h * w)

    alpha = reg * jnp.log(u + M_EPS)
    beta = reg * jnp.log(v + M_EPS)
    if return_plan:
        K = (ky[:, :, None] * kx[:, None, :]).reshape(na, h * w)
        plan = u[:, None] * K * v[None, :]
    else:
        plan = jnp.zeros((0, 0), jnp.float32)
    return SinkhornResult(plan=plan, u=u, v=v, alpha=alpha, beta=beta, err=err, iters=iters)
