"""Pallas TPU flash attention for the ViT / CLIP-text resblocks.

Computes ``softmax(Q K^T * scale) V`` tile-by-tile with an online softmax
so the (L, L) score matrix never touches HBM. At CLIP-EBC's sequence
lengths (197-2304 tokens: 224px windows up to large native-resolution
images) the win is HBM traffic, not VMEM capacity — XLA materializes the
scores between the two matmuls, this kernel does not.

Forward is the Pallas kernel; backward (via ``jax.custom_vjp``) recomputes
attention with the reference einsum path and differentiates that — exact
gradients, standard remat trade (the (L, L) matrix exists transiently in
the backward only).

Grid: (B, H, nQ, nKV); the KV axis is the sequential online-softmax
reduction, everything else is parallel. fp32 statistics regardless of
input dtype. Padding: inputs are padded to block multiples outside the
kernel; padded KV columns are masked by absolute index, padded Q rows are
sliced off afterwards.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale: float, causal: bool, kv_len: int, block_q: int, block_k: int,
    num_kv_blocks: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # Causal: skip KV tiles strictly above the diagonal.
    run = True
    if causal:
        run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(run)
    def _run():
        # bf16 operands, fp32 MXU accumulation (fp32 inputs would halve
        # MXU throughput).
        q = q_ref[0, 0]  # (block_q, dh)
        k = k_ref[0, 0]  # (block_k, dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        if sm_scale != 1.0:
            s = s * sm_scale

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[...]  # (block_q, 128) broadcast lanes
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])  # (block_q, block_k)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]  # (block_k, dh)
        acc_scratch[...] = acc_scratch[...] * alpha[:, : acc_scratch.shape[-1]] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l = l_scratch[...][:, : 1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Below this sequence length the whole K/V fits comfortably in VMEM and the
# online-softmax tiling only adds overhead; a batched single-block kernel
# (several (batch, head) pairs per program) keeps the MXU busy instead.
SHORT_SEQ_MAX = 512


def _short_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, causal, kv_len):
    # Matmuls take the native (bf16) inputs and accumulate in fp32 on the
    # MXU — casting inputs to fp32 first would halve MXU throughput.
    q = q_ref[...]  # (bh_blk, L, dh)
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    if sm_scale != 1.0:
        s = s * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    mask = col < kv_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _flash_forward_short(
    q, k, v, sm_scale: float, causal: bool, interpret: bool, block_bh: int = 8
):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    lp = _round_up(max(lq, lk), 128)

    def prep(x):
        x = x.reshape(b * h, x.shape[2], dh)
        if x.shape[1] != lp:
            x = jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)
    bh = b * h
    bh_p = _round_up(bh, block_bh)
    if bh_p != bh:
        qp = jnp.pad(qp, ((0, bh_p - bh), (0, 0), (0, 0)))
        kp = jnp.pad(kp, ((0, bh_p - bh), (0, 0), (0, 0)))
        vp = jnp.pad(vp, ((0, bh_p - bh), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _short_kernel, sm_scale=sm_scale, causal=causal, kv_len=lk
        ),
        out_shape=jax.ShapeDtypeStruct((bh_p, lp, dh), q.dtype),
        grid=(bh_p // block_bh,),
        in_specs=[
            pl.BlockSpec((block_bh, lp, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_bh, lp, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_bh, lp, dh), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_bh, lp, dh), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:bh, :lq].reshape(b, h, lq, dh)


def _flash_forward(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    sm_scale: float, causal: bool, block_q: int, block_k: int, interpret: bool,
) -> jnp.ndarray:
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    lq_p, lk_p = _round_up(lq, block_q), _round_up(lk, block_k)

    def pad_seq(x, target):
        if x.shape[2] == target:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, target - x.shape[2]), (0, 0)))

    qp, kp, vp = pad_seq(q, lq_p), pad_seq(k, lk_p), pad_seq(v, lk_p)
    num_kv_blocks = lk_p // block_k

    grid = (b, h, lq_p // block_q, num_kv_blocks)
    kernel = functools.partial(
        _kernel,
        sm_scale=sm_scale,
        causal=causal,
        kv_len=lk,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda b_, h_, q_, k_: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block_k, dh), lambda b_, h_, q_, k_: (b_, h_, k_, 0)),
            pl.BlockSpec((1, 1, block_k, dh), lambda b_, h_, q_, k_: (b_, h_, k_, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dh), lambda b_, h_, q_, k_: (b_, h_, q_, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # m
            pltpu.VMEM((block_q, 128), jnp.float32),  # l
            pltpu.VMEM((block_q, dh), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :lq]


def _reference(q, k, v, sm_scale, causal):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    if causal:
        lq, lk = s.shape[-2], s.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        s = jnp.where(col <= row, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def flash_attention(
    q, k, v,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """(B, H, L, Dh) q/k/v -> (B, H, L, Dh). Unnormalized scale defaults to
    1/sqrt(Dh). Short sequences route to the batched single-block kernel,
    long ones to the tiled online-softmax kernel."""
    scale = q.shape[-1] ** -0.5 if sm_scale is None else sm_scale
    if max(q.shape[2], k.shape[2]) <= SHORT_SEQ_MAX:
        return _flash_forward_short(q, k, v, scale, causal, interpret)
    return _flash_forward(q, k, v, scale, causal, block_q, block_k, interpret)


def _fwd(q, k, v, sm_scale, causal, block_q, block_k, interpret):
    out = flash_attention(q, k, v, sm_scale, causal, block_q, block_k, interpret)
    return out, (q, k, v)


def _bwd(sm_scale, causal, block_q, block_k, interpret, residuals, g):
    q, k, v = residuals
    scale = q.shape[-1] ** -0.5 if sm_scale is None else sm_scale
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, scale, causal), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def flash_sdpa(q, k, v, mask):
    """Drop-in ``attn_impl`` for MultiHeadAttention: a non-None mask is, in
    this framework, always the causal text mask."""
    return flash_attention(q, k, v, None, mask is not None)
