"""Fused qkv multi-head attention for the ViT trunk (Pallas TPU).

Why this exists: XLA's sdpa path at CLIP's shapes (B~500 windows, L=229,
H=12, dh=64) is HBM-bound, not FLOP-bound — measured 8.3 ms/layer on v5e
where the matmuls alone are ~0.8 ms. The traffic comes from (a) the
(B,L,H,dh)->(B,H,L,dh) transposes of q/k/v, (b) the fp32 (B,H,L,L) score
tensor written+read around the softmax, and (c) the output transpose back.

This kernel removes all of it: it consumes the joint in-projection output
``(B, L, 3*D)`` exactly as ``nn.Dense`` produces it (no transposes, no
layout change) and keeps scores/softmax entirely in VMEM.

The dh=64 problem: TPU vector lanes are 128-wide, so per-head (L, 64)
operands waste half the machine. Heads are processed in PAIRS packed into
128 lanes. For the pair (2c, 2c+1) with packed operands Q2/K2/V2
(L, 128):

    S_even = (Q2 * even_lane_mask) @ K2^T     -- odd-head lanes are zero,
    S_odd  = (Q2 * odd_lane_mask)  @ K2^T        so the cross-head products
                                                 contribute exactly 0.0
    O2 = softmax(S_even) @ (V2 * even_lane_mask)
       + softmax(S_odd)  @ (V2 * odd_lane_mask)

Every matmul contracts over 128 (or L) — full MXU tiles — and O2 lands
already packed in the (L, D) head-concatenated layout the out-projection
wants. The zero-masking is exact (fp32 accumulation of exact zeros), so
results match the einsum path to bf16 rounding.

Padded sequence rows (L_pad > kv_len) are masked as KEY columns, so they
never influence real tokens; their own outputs are garbage and must be
ignored by the caller (ClipViT pads once for the whole trunk and slices
patch tokens at the end).

Backward (``jax.custom_vjp``) is a second pair-packed Pallas kernel
(``_attention_bwd``): it recomputes scores/softmax in VMEM and emits
d_qkv directly — the standard remat trade, but without the einsum
path's HBM round-trips (q/k/v transposes + two (B,H,L,L) fp32 score
tensors). Unsupported head shapes fall back to differentiating the
einsum reference.

No reference equivalent: the reference uses torch nn.MultiheadAttention
(reference models/clip/_clip/blocks.py:22-42); this is the TPU-native
redesign of the same math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.platform import target_platform
from jax.experimental import pallas as pl

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Longest PADDED sequence the whole-sequence VMEM kernels handle: each
# grid block holds x/qkv/out plus (lp, lp) fp32 score tiles entirely in
# ~16 MB of VMEM, which stops fitting past lp=512 (measured: the full-image
# eval at L=1664 asked for 62 MB). Longer sequences fall back to the
# einsum/flash paths (transformer.py routes L >= 1024 to the tiled
# flash-attention kernel).
MAX_FUSED_SEQ = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def seq_pad() -> int:
    """Trunk sequence padding multiple (default 16 = the bf16 sublane
    multiple; EBC_SEQ_PAD overrides, 128 restores the r4 behavior).

    The flagship window sequence is 229 real tokens; padding to a
    128-multiple (256) taxes every trunk matmul ~12%, while the sublane
    multiple pads only to 240 — Mosaic masks the unaligned lane tails of
    the in-kernel score matrices, so only the attention matmuls keep
    their internal 128-padding while the qkv projection and every
    XLA-side op (MLP, out-proj, LN) shrink to the smaller sequence.
    Measured on chip (flagship int8_static decoder-pre, latency-
    cancelled): 30.55 vs 31.18 ms/image — the r5 headline. Callers that
    pre-pad the trunk (ClipViT) and the kernel wrapper must agree, hence
    one shared knob."""
    import os

    return int(os.environ.get("EBC_SEQ_PAD", "16"))


def attn_block_b(default: int = 2) -> int:
    """Kernel batch-block (windows per grid step) A/B knob."""
    import os

    return int(os.environ.get("EBC_ATTN_BLOCK_B", str(default)))


def supports(num_heads: int, head_dim: int) -> bool:
    """Shapes this kernel handles: 64-wide heads in even pairs (all CLIP
    ViT/text towers: dh=64, H in {8, 12, 16})."""
    return head_dim == 64 and num_heads % 2 == 0


def _pair_attention_body(
    qkv, o_ref, num_heads: int, kv_len: int, sm_scale: float,
    quant_attn: bool = False,
):
    """Shared head-pair lane-packed attention: ``qkv`` (blk, lp, 3D) in
    registers/VMEM -> writes (blk, lp, D) into ``o_ref``.

    ``quant_attn``: run the QK^T and PV matmuls on the int8 MXU (2x the
    bf16 rate on v5e). Quantization is DYNAMIC but free of HBM traffic —
    the operands are already in VMEM, so the per-block max reductions are
    VPU ops on resident data: q/k/v use per-(block, head-pair) symmetric
    max-abs scales; the softmax probabilities are in [0, 1] by
    construction so they use the fixed scale 1/127. Zero-masked lanes
    stay exactly zero through quantization (symmetric, round(0)=0), so
    the head-pair packing identity is preserved exactly."""
    blk, lp, _ = qkv.shape
    d = num_heads * 64
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    m_even = (lanes < 64).astype(qkv.dtype)
    m_odd = (lanes >= 64).astype(qkv.dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), 2)
    kv_mask = cols < kv_len  # padded rows only ever appear as masked keys

    def pair_softmax_unnorm(s):
        """Softmax split for normalize-after-PV: returns the UNNORMALIZED
        probabilities (exp(s - max), in [0, 1]) plus the per-row sum. The
        1/sum division then lands on the (blk, lp, 64..128)-wide PV output
        instead of the (blk, lp, lp) score matrix — one fewer full VPU
        pass over the stack's largest tensor (the softmax stack is the
        trunk's dominant vector cost, r5 ledger). Exact same math up to
        float reassociation (division moved through the matmul's linear
        axis)."""
        s = jnp.where(kv_mask, s * sm_scale, NEG_INF)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        return p, jnp.sum(p, axis=2, keepdims=True)

    def q8(t):
        """(blk, lp, 128) fp -> (int8 values, fp32 scalar scale)."""
        tf = t.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(tf)), 1e-8) / 127.0
        return jnp.clip(jnp.round(tf / s), -127, 127).astype(jnp.int8), s

    dn = (((2,), (2,)), ((0,), (0,)))  # contract lanes, batch dim 0
    dn_o = (((2,), (1,)), ((0,), (0,)))  # (blk,lp,lp) @ (blk,lp,128)
    for c in range(num_heads // 2):
        q2 = qkv[:, :, 128 * c : 128 * (c + 1)]  # (blk, lp, 128)
        k2 = qkv[:, :, d + 128 * c : d + 128 * (c + 1)]
        v2 = qkv[:, :, 2 * d + 128 * c : 2 * d + 128 * (c + 1)]
        if quant_attn:
            qe_q, s_qe = q8(q2 * m_even)
            qo_q, s_qo = q8(q2 * m_odd)
            k_q, s_k = q8(k2)
            s_even = jax.lax.dot_general(
                qe_q, k_q, dn, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (s_qe * s_k)
            s_odd = jax.lax.dot_general(
                qo_q, k_q, dn, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (s_qo * s_k)
            ve_q, s_ve = q8(v2 * m_even)
            vo_q, s_vo = q8(v2 * m_odd)
            # Unnormalized probs are in [0, 1] (exp(s - max) <= 1): fixed
            # 1/127 scale, round lands in [0, 127] so no clip pass, and
            # the 1/rowsum normalization moves to the narrower PV output.
            pe_u, re_ = pair_softmax_unnorm(s_even)
            po_u, ro_ = pair_softmax_unnorm(s_odd)
            pe = jnp.round(pe_u * 127.0).astype(jnp.int8)
            po = jnp.round(po_u * 127.0).astype(jnp.int8)
            o2 = jax.lax.dot_general(
                pe, ve_q, dn_o, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (s_ve / 127.0) / re_ + jax.lax.dot_general(
                po, vo_q, dn_o, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (s_vo / 127.0) / ro_
        else:
            s_even = jax.lax.dot_general(
                q2 * m_even, k2, dn, preferred_element_type=jnp.float32
            )
            s_odd = jax.lax.dot_general(
                q2 * m_odd, k2, dn, preferred_element_type=jnp.float32
            )
            pe_u, re_ = pair_softmax_unnorm(s_even)
            po_u, ro_ = pair_softmax_unnorm(s_odd)
            o2 = jax.lax.dot_general(
                pe_u.astype(qkv.dtype), v2 * m_even, dn_o,
                preferred_element_type=jnp.float32,
            ) / re_ + jax.lax.dot_general(
                po_u.astype(qkv.dtype), v2 * m_odd, dn_o,
                preferred_element_type=jnp.float32,
            ) / ro_
        o_ref[:, :, 128 * c : 128 * (c + 1)] = o2.astype(o_ref.dtype)


def _pair_attention_body_static(
    qkv_q, o_ref, aq, num_heads: int, kv_len: int, sm_scale: float
):
    """int8-native pair-packed attention with CALIBRATED static scales.

    ``qkv_q`` (blk, lp, 3D) int8, already quantized by the caller with
    per-{q,k,v} per-tensor scales; ``aq`` (3,) fp32 holds those dequant
    scales (s_q, s_k, s_v). Unlike the dynamic ``quant_attn`` path there
    are NO in-kernel max reductions and no q/k/v round/clip passes — the
    only remaining elementwise quant work is the softmax-probability
    round (probs are in [0, 1] by construction: fixed 1/127 scale).
    Lane masking uses selects on the int8 operands (exact: 0 stays 0)."""
    blk, lp, _ = qkv_q.shape
    d = num_heads * 64
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    even = lanes < 64
    zero8 = jnp.zeros((), jnp.int8)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), 2)
    kv_mask = cols < kv_len

    s_qk = aq[0] * aq[1] * sm_scale  # dequant + softmax scale, one scalar
    s_pv = aq[2] * (1.0 / 127.0)

    def softmax_q8(s_i32):
        """Unnormalized int8 softmax: exp(s - max) is in [0, 1], so the
        fixed 1/127 scale needs NO clip (round lands in [0, 127]); the
        1/rowsum normalization is returned separately and applied to the
        (blk, lp, 128) PV output instead of the (blk, lp, lp) score
        matrix — two fewer full VPU passes over the stack's largest
        tensor vs normalize-then-quantize."""
        s = jnp.where(kv_mask, s_i32.astype(jnp.float32) * s_qk, NEG_INF)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        r = jnp.sum(p, axis=2, keepdims=True)
        return jnp.round(p * 127.0).astype(jnp.int8), r

    dn = (((2,), (2,)), ((0,), (0,)))  # contract lanes, batch dim 0
    dn_o = (((2,), (1,)), ((0,), (0,)))  # (blk,lp,lp) @ (blk,lp,128)
    for c in range(num_heads // 2):
        q2 = qkv_q[:, :, 128 * c : 128 * (c + 1)]  # (blk, lp, 128) int8
        k2 = qkv_q[:, :, d + 128 * c : d + 128 * (c + 1)]
        v2 = qkv_q[:, :, 2 * d + 128 * c : 2 * d + 128 * (c + 1)]
        s_even = jax.lax.dot_general(
            jnp.where(even, q2, zero8), k2, dn, preferred_element_type=jnp.int32
        )
        s_odd = jax.lax.dot_general(
            jnp.where(even, zero8, q2), k2, dn, preferred_element_type=jnp.int32
        )
        pe, re_ = softmax_q8(s_even)
        po, ro_ = softmax_q8(s_odd)
        o2 = (
            jax.lax.dot_general(
                pe, jnp.where(even, v2, zero8), dn_o,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) / re_
            + jax.lax.dot_general(
                po, jnp.where(even, zero8, v2), dn_o,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) / ro_
        ) * s_pv
        o_ref[:, :, 128 * c : 128 * (c + 1)] = o2.astype(o_ref.dtype)


def _kernel(
    qkv_ref, o_ref, *, num_heads: int, kv_len: int, sm_scale: float,
    quant_attn: bool = False,
):
    _pair_attention_body(
        qkv_ref[...], o_ref, num_heads, kv_len, sm_scale, quant_attn
    )


def _pair_attention_bwd_body(
    qkv, g, dqkv_ref, num_heads: int, kv_len: int, sm_scale: float
):
    """Backward of the pair-packed attention: ``qkv`` (blk, lp, 3D) and the
    output cotangent ``g`` (blk, lp, D) in VMEM -> writes d_qkv
    (blk, lp, 3D) into ``dqkv_ref``.

    Standard softmax-attention backward, per head pair and parity p:

        S_p = (Q2*m_p) @ K2^T * scale   (masked keys -> -inf)
        P_p = softmax(S_p)
        dP  = (g*m_p) @ V2^T            (odd lanes of g*m_p are 0, so the
                                         cross-head V lanes contribute 0)
        dS  = P * (dP - rowsum(dP * P)) * scale
        dQ2 += (dS @ K2) * m_p ; dK2 += dS^T @ (Q2*m_p) ; dV2 += P^T @ (g*m_p)

    Masked key columns have P == 0 exactly, so dS == 0 there and no
    gradient leaks to padded rows — matching the einsum-reference VJP.
    Scores/probabilities never leave VMEM; the HBM traffic is exactly the
    qkv read, the g read, and the dqkv write."""
    blk, lp, _ = qkv.shape
    dt = qkv.dtype  # matmul operands stay bf16 (fp32 MXU is 1/8 rate)
    d = num_heads * 64
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    m_even = (lanes < 64).astype(dt)
    m_odd = (lanes >= 64).astype(dt)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), 2)
    kv_mask = cols < kv_len

    dn_t = (((2,), (2,)), ((0,), (0,)))  # (blk,lp,128)x(blk,lp,128) -> (blk,lp,lp)
    dn_o = (((2,), (1,)), ((0,), (0,)))  # (blk,lq,lk)x(blk,lk,128) -> (blk,lq,128)
    dn_q = (((1,), (1,)), ((0,), (0,)))  # contract the q index of (blk,lq,lk)

    for c in range(num_heads // 2):
        q2 = qkv[:, :, 128 * c : 128 * (c + 1)]
        k2 = qkv[:, :, d + 128 * c : d + 128 * (c + 1)]
        v2 = qkv[:, :, 2 * d + 128 * c : 2 * d + 128 * (c + 1)]
        g2 = g[:, :, 128 * c : 128 * (c + 1)]

        dq2 = jnp.zeros((blk, lp, 128), jnp.float32)
        dk2 = jnp.zeros((blk, lp, 128), jnp.float32)
        dv2 = jnp.zeros((blk, lp, 128), jnp.float32)
        for m_p in (m_even, m_odd):
            qp = q2 * m_p
            gp = g2 * m_p
            s = jax.lax.dot_general(qp, k2, dn_t, preferred_element_type=jnp.float32)
            s = jnp.where(kv_mask, s * sm_scale, NEG_INF)
            mx = jnp.max(s, axis=2, keepdims=True)
            e = jnp.exp(s - mx)
            p = e / jnp.sum(e, axis=2, keepdims=True)
            pb = p.astype(dt)
            dp = jax.lax.dot_general(gp, v2, dn_t, preferred_element_type=jnp.float32)
            ds = (p * (dp - jnp.sum(dp * p, axis=2, keepdims=True)) * sm_scale
                  ).astype(dt)
            dq2 += jax.lax.dot_general(
                ds, k2, dn_o, preferred_element_type=jnp.float32
            ) * m_p.astype(jnp.float32)
            dk2 += jax.lax.dot_general(
                ds, qp, dn_q, preferred_element_type=jnp.float32
            )
            dv2 += jax.lax.dot_general(
                pb, gp, dn_q, preferred_element_type=jnp.float32
            )
        dqkv_ref[:, :, 128 * c : 128 * (c + 1)] = dq2.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, d + 128 * c : d + 128 * (c + 1)] = dk2.astype(
            dqkv_ref.dtype
        )
        dqkv_ref[:, :, 2 * d + 128 * c : 2 * d + 128 * (c + 1)] = dv2.astype(
            dqkv_ref.dtype
        )


def _bwd_kernel(
    qkv_ref, g_ref, dqkv_ref, *, num_heads: int, kv_len: int, sm_scale: float
):
    _pair_attention_bwd_body(
        qkv_ref[...], g_ref[...], dqkv_ref, num_heads, kv_len, sm_scale
    )


def _attention_bwd(qkv, g, num_heads, kv_len, sm_scale, block_b, interpret):
    """d_qkv of the pair-packed attention via one pallas_call."""
    b, l, three_d = qkv.shape
    d = three_d // 3
    lp = _round_up(l, 128)
    if lp != l:
        qkv = jnp.pad(qkv, ((0, 0), (0, lp - l), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, lp - l), (0, 0)))
    bp = _round_up(b, block_b)
    if bp != b:
        qkv = jnp.pad(qkv, ((0, bp - b), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, bp - b), (0, 0), (0, 0)))

    dqkv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_heads=num_heads, kv_len=kv_len, sm_scale=sm_scale
        ),
        out_shape=jax.ShapeDtypeStruct((bp, lp, three_d), qkv.dtype),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, lp, three_d), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, lp, three_d), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(qkv, g)
    return dqkv[:b, :l]


def _forward(qkv, num_heads, kv_len, sm_scale, block_b, interpret):
    b, l, three_d = qkv.shape
    d = three_d // 3
    lp = _round_up(l, 128)
    if lp != l:  # callers should pre-pad; this keeps the op self-contained
        qkv = jnp.pad(qkv, ((0, 0), (0, lp - l), (0, 0)))
    bp = _round_up(b, block_b)
    if bp != b:
        qkv = jnp.pad(qkv, ((0, bp - b), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, kv_len=kv_len, sm_scale=sm_scale
        ),
        out_shape=jax.ShapeDtypeStruct((bp, lp, d), qkv.dtype),
        grid=(bp // block_b,),
        in_specs=[pl.BlockSpec((block_b, lp, three_d), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(qkv)
    return out[:b, :l]


def _reference(qkv, num_heads, kv_len, sm_scale):
    """Einsum path on the same (B, L, 3D) input — backward recompute and
    test oracle."""
    b, l, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, l), 3)
    s = jnp.where(cols < kv_len, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(b, l, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fused_qkv_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    kv_len: int,
    sm_scale: float,
    block_b: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, L, 3D) joint qkv -> (B, L, D) head-concatenated attention output.

    ``kv_len`` <= L: rows at index >= kv_len are treated as padding (masked
    as keys; their query outputs are unspecified).
    """
    if (
        not supports(num_heads, qkv.shape[-1] // 3 // num_heads)
        or _round_up(qkv.shape[1], 128) > MAX_FUSED_SEQ
    ):
        return _reference(qkv, num_heads, kv_len, sm_scale)
    interpret = interpret or target_platform() != "tpu"
    if qkv.dtype == jnp.float32:  # fp32 doubles VMEM; halve the block
        block_b = max(1, block_b // 2)
    return _forward(qkv, num_heads, kv_len, sm_scale, block_b, interpret)


def _fwd(qkv, num_heads, kv_len, sm_scale, block_b, interpret):
    return fused_qkv_attention(qkv, num_heads, kv_len, sm_scale, block_b, interpret), qkv


def _bwd(num_heads, kv_len, sm_scale, block_b, interpret, qkv, g):
    if (
        not supports(num_heads, qkv.shape[-1] // 3 // num_heads)
        or _round_up(qkv.shape[1], 128) > MAX_FUSED_SEQ
    ):
        _, vjp = jax.vjp(
            lambda x: _reference(x, num_heads, kv_len, sm_scale), qkv
        )
        return vjp(g)
    interpret = interpret or target_platform() != "tpu"
    # the bwd body holds ~2.5x the fwd working set (scores + dP + dS)
    bb = 1 if qkv.dtype == jnp.float32 else max(1, block_b // 2)
    return (
        _attention_bwd(qkv, g, num_heads, kv_len, sm_scale, bb, interpret),
    )


fused_qkv_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# LN + qkv projection + attention, one kernel
# ---------------------------------------------------------------------------
#
# The unfused eval layer round-trips three big tensors through HBM per
# layer: the fp32-safe LN output (2x ~200 MB at the flagship shape), the
# quantized/bf16 matmul input, and the (B, L, 3D) qkv tensor (2x ~600 MB).
# W_qkv (768x2304) fits VMEM, so the whole pre-attention chain runs in one
# pallas_call: x is read once, LN statistics and the qkv projection happen
# on-chip (int8 MXU when quantized weights + a calibrated activation scale
# are given, bf16 otherwise), and the pair-packed attention follows
# immediately — only the (B, L, D) attention output is written back.


def _ln_qkv_kernel(
    x_ref, g_ref, b_ref, w_ref, sw_ref, bias_ref, inv_act_ref, aq_ref, o_ref,
    *, num_heads: int, kv_len: int, sm_scale: float, eps: float,
    quant_attn=False,
):
    blk, lp, d = x_ref.shape
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=2, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=2, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].reshape(1, 1, d) + b_ref[...].reshape(1, 1, d)

    dn = (((1,), (0,)), ((), ()))
    if w_ref.dtype == jnp.int8:  # W8A8: per-tensor act scale, int8 MXU
        # the matching dequant (x act_scale) is pre-folded into sw_ref
        yq = jnp.clip(
            jnp.round(y * inv_act_ref[0]), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            yq.reshape(blk * lp, d), w_ref[...], dn,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        acc = jax.lax.dot_general(
            y.astype(o_ref.dtype).reshape(blk * lp, d), w_ref[...], dn,
            preferred_element_type=jnp.float32,
        )
    qkv = acc * sw_ref[...].reshape(1, 3 * d) + bias_ref[...].reshape(1, 3 * d)
    if quant_attn == "static":
        # sw/bias were pre-folded with the per-{q,k,v} inverse calibrated
        # scales, so `qkv` is already in the int8 domain: one round/clip
        # pass and the whole attention runs on the int8 MXU.
        qkv_q = jnp.clip(jnp.round(qkv), -127, 127).astype(jnp.int8)
        _pair_attention_body_static(
            qkv_q.reshape(blk, lp, 3 * d), o_ref, aq_ref[...],
            num_heads, kv_len, sm_scale,
        )
        return
    qkv = qkv.astype(o_ref.dtype).reshape(blk, lp, 3 * d)
    _pair_attention_body(qkv, o_ref, num_heads, kv_len, sm_scale, quant_attn)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "kv_len", "sm_scale", "eps", "block_b",
                     "interpret", "quant_attn"),
)
def _ln_qkv_forward(
    x, ln_scale, ln_bias, w, s_w, bias, inv_act, aq,
    num_heads, kv_len, sm_scale, eps, block_b, interpret, quant_attn=False,
):
    b, l, d = x.shape
    lp = _round_up(l, seq_pad())
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    bp = _round_up(b, block_b)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _ln_qkv_kernel, num_heads=num_heads, kv_len=kv_len,
            sm_scale=sm_scale, eps=eps, quant_attn=quant_attn,
        ),
        out_shape=jax.ShapeDtypeStruct((bp, lp, d), x.dtype),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((3 * d,), lambda i: (0,)),
            pl.BlockSpec((3 * d,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
            pl.BlockSpec((3,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w, s_w, bias, inv_act, aq)
    return out[:b, :l]


def _ln_qkv_bwd_frozen_kernel(
    x_ref, g_ref, gamma_ref, beta_ref, w_ref, bias_ref, dx_ref, dqkv_scr,
    *, num_heads: int, kv_len: int, sm_scale: float, eps: float,
):
    """dx of x -> attention(qkv_proj(LN(x))) when LN/projection params are
    FROZEN (VPT trunk): recompute LN + qkv on-chip, run the pair-packed
    attention backward into VMEM scratch, contract d_qkv with W^T and
    close the (param-frozen) LayerNorm backward — x and g are read once
    and only dx is written. The split XLA path round-trips qkv, d_qkv and
    d_y through HBM per layer."""
    blk, lp, d = x_ref.shape
    dt = dx_ref.dtype
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=2, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=2, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    gamma = gamma_ref[...].reshape(1, 1, d)
    y = xhat * gamma + beta_ref[...].reshape(1, 1, d)

    dn = (((1,), (0,)), ((), ()))
    qkv = (
        jax.lax.dot_general(
            y.astype(dt).reshape(blk * lp, d), w_ref[...], dn,
            preferred_element_type=jnp.float32,
        )
        + bias_ref[...].reshape(1, 3 * d)
    ).astype(dt).reshape(blk, lp, 3 * d)

    _pair_attention_bwd_body(
        qkv, g_ref[...], dqkv_scr, num_heads, kv_len, sm_scale
    )

    # d_y = d_qkv @ W^T, contracted without materializing the transpose
    dn_t = (((1,), (1,)), ((), ()))
    dy = jax.lax.dot_general(
        dqkv_scr[...].reshape(blk * lp, 3 * d), w_ref[...], dn_t,
        preferred_element_type=jnp.float32,
    ).reshape(blk, lp, d)

    # LayerNorm backward (params frozen -> dx only)
    dyh = dy * gamma
    m1 = jnp.mean(dyh, axis=2, keepdims=True)
    m2 = jnp.mean(dyh * xhat, axis=2, keepdims=True)
    dx_ref[...] = (rstd * (dyh - m1 - xhat * m2)).astype(dt)


def _ln_qkv_bwd_frozen(
    x, g, ln_scale, ln_bias, w, bias, num_heads, kv_len, sm_scale, eps,
    block_b, interpret,
):
    from jax.experimental.pallas import tpu as pltpu

    b, l, d = x.shape
    lp = _round_up(l, 128)
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, lp - l), (0, 0)))
    bp = _round_up(b, block_b)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, bp - b), (0, 0), (0, 0)))

    dx = pl.pallas_call(
        functools.partial(
            _ln_qkv_bwd_frozen_kernel, num_heads=num_heads, kv_len=kv_len,
            sm_scale=sm_scale, eps=eps,
        ),
        out_shape=jax.ShapeDtypeStruct((bp, lp, d), x.dtype),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((3 * d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((block_b, lp, 3 * d), x.dtype)],
        interpret=interpret,
    )(x, g, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      w.astype(x.dtype), bias.astype(jnp.float32))
    return dx[:b, :l]


def _ln_qkv_reference(
    x, ln_scale, ln_bias, w, s_w, bias, num_heads, kv_len, sm_scale, eps
):
    """Float oracle on the same inputs (backward recompute / tests); the
    int8 path differs only by quantization rounding."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    qkv = (y.astype(x.dtype) @ w.astype(x.dtype)).astype(jnp.float32)
    qkv = (qkv * s_w + bias).astype(x.dtype)
    return _reference(qkv, num_heads, kv_len, sm_scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_ln_qkv_attention(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    num_heads: int,
    kv_len: int,
    sm_scale: float,
    eps: float = 1e-5,
    block_b: int = 2,
    interpret: bool = False,
    frozen: bool = False,
) -> jnp.ndarray:
    """LayerNorm -> joint qkv projection (bf16) -> pair-packed attention,
    one pallas_call. ``w`` (D, 3D) fp32/bf16 kernel, ``bias`` the qkv
    bias. Rows at index >= kv_len are padding (masked as keys; their
    outputs are unspecified). Differentiable via reference recompute.

    ``frozen``: the LN/projection params are frozen (VPT trunk) — the
    backward runs a single fused Pallas kernel emitting ONLY dx (param
    cotangents are zeros, correct precisely because the caller
    stop_gradients the frozen subtree), instead of round-tripping qkv /
    d_qkv / d_y through HBM per layer."""
    ones = jnp.ones((3 * x.shape[-1],), jnp.float32)
    one = jnp.ones((1,), jnp.float32)
    if (
        not supports(num_heads, w.shape[1] // 3 // num_heads)
        or _round_up(x.shape[1], 128) > MAX_FUSED_SEQ
    ):
        return _ln_qkv_reference(
            x, ln_scale, ln_bias, w.astype(jnp.float32), ones,
            bias.astype(jnp.float32), num_heads, kv_len, sm_scale, eps,
        )
    interpret = interpret or target_platform() != "tpu"
    block_b = attn_block_b(block_b)
    if x.dtype == jnp.float32:  # fp32 weights + qkv exceed VMEM at block 2
        block_b = 1
    return _ln_qkv_forward(
        x, ln_scale, ln_bias, w.astype(x.dtype), ones,
        bias.astype(jnp.float32), one, jnp.ones((3,), jnp.float32),
        num_heads, kv_len, sm_scale, eps, block_b, interpret,
    )


def _lqa_fwd(x, ln_scale, ln_bias, w, bias, *static):
    out = fused_ln_qkv_attention(x, ln_scale, ln_bias, w, bias, *static)
    return out, (x, ln_scale, ln_bias, w, bias)


def _lqa_bwd(
    num_heads, kv_len, sm_scale, eps, block_b, interpret, frozen, res, g
):
    x, ln_scale, ln_bias, w, bias = res
    fits = _round_up(x.shape[1], 128) <= MAX_FUSED_SEQ
    interpret_ = interpret or target_platform() != "tpu"
    # fp32 on a real chip: the kernel's working set (x/g/dx + W + qkv and
    # d_qkv scratch + score tiles, all doubled) exceeds the ~16 MB VMEM
    # budget even at block_b=1 — take the split path instead. Interpret
    # mode (tests/CPU) has no such limit.
    if frozen and x.dtype == jnp.float32 and not interpret_:
        frozen = False
    if frozen and fits and supports(num_heads, w.shape[1] // 3 // num_heads):
        dx = _ln_qkv_bwd_frozen(
            x, g, ln_scale, ln_bias, w, bias, num_heads, kv_len, sm_scale,
            eps, 1 if x.dtype == jnp.float32 else max(1, block_b // 2),
            interpret_,
        )
        # Zeros are exact here: `frozen` is only set when the caller
        # stop_gradients these params, so their cotangents are discarded.
        return (
            dx,
            jnp.zeros_like(ln_scale),
            jnp.zeros_like(ln_bias),
            jnp.zeros_like(w),
            jnp.zeros_like(bias),
        )
    if not fits or not supports(num_heads, w.shape[1] // 3 // num_heads):
        ones = jnp.ones((3 * x.shape[-1],), jnp.float32)
        _, vjp = jax.vjp(
            lambda xx, gs, gb, ww, bb: _ln_qkv_reference(
                xx, gs, gb, ww.astype(jnp.float32), ones,
                bb.astype(jnp.float32), num_heads, kv_len, sm_scale, eps,
            ),
            x, ln_scale, ln_bias, w, bias,
        )
        return vjp(g)

    # Split the recompute: LN + qkv projection backward are plain matmuls
    # XLA runs at MXU rate, while the attention backward (the HBM-heavy
    # einsum part: q/k/v transposes + two (B,H,L,L) fp32 score round-trips)
    # goes through the pair-packed Pallas kernel, scores resident in VMEM.
    def ln_proj(xx, gs, gb, ww, bb):
        xf = xx.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps) * gs + gb
        qkv = (y.astype(xx.dtype) @ ww.astype(xx.dtype)).astype(jnp.float32)
        return (qkv + bb.astype(jnp.float32)).astype(xx.dtype)

    qkv, vjp = jax.vjp(ln_proj, x, ln_scale, ln_bias, w, bias)
    bb_ = 1 if x.dtype == jnp.float32 else max(1, block_b)
    d_qkv = _attention_bwd(
        qkv, g, num_heads, kv_len, sm_scale, bb_, interpret_
    )
    return vjp(d_qkv)


fused_ln_qkv_attention.defvjp(_lqa_fwd, _lqa_bwd)


def _ln_mlp_kernel(
    x_ref, g_ref, b_ref, wfc_ref, sfc_ref, bfc_ref, wpj_ref, spj_ref,
    bpj_ref, inv1_ref, inv2_ref, o_ref,
    *, eps: float, quick: bool,
):
    blk, lp, d = x_ref.shape
    hidden = wfc_ref.shape[1]
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=2, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=2, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].reshape(1, 1, d) + b_ref[...].reshape(1, 1, d)

    dn = (((1,), (0,)), ((), ()))
    yq = jnp.clip(jnp.round(y * inv1_ref[0]), -127, 127).astype(jnp.int8)
    h = jax.lax.dot_general(
        yq.reshape(blk * lp, d), wfc_ref[...], dn,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sfc_ref[...].reshape(1, hidden) + bfc_ref[...].reshape(
        1, hidden
    )
    if quick:  # QuickGELU (CLIP): x * sigmoid(1.702 x)
        h = h * jax.lax.logistic(1.702 * h)
    else:  # nn.gelu's default tanh approximation (plain ViT blocks)
        c = 0.7978845608028654  # sqrt(2/pi)
        h = 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))
    hq = jnp.clip(jnp.round(h * inv2_ref[0]), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        hq, wpj_ref[...], dn, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * spj_ref[...].reshape(1, d) + bpj_ref[...].reshape(1, d)
    o_ref[...] = (xf + out.reshape(blk, lp, d)).astype(o_ref.dtype)


def fused_ln_mlp_int8(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_fc: jnp.ndarray,
    b_fc: jnp.ndarray,
    act1: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    act2: jnp.ndarray,
    quick_gelu: bool = True,
    eps: float = 1e-5,
    block_b: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + proj(gelu(fc(LN(x)))) with both matmuls on the int8 MXU and the
    (B, L, 4D) hidden activations kept entirely in VMEM (inference only).

    ``w_fc``/``w_proj`` are the fp32 master kernels (per-output-column
    quantized here); ``act1``/``act2`` the calibrated per-tensor max-abs /
    127 scales of the LN output and the GELU output. Padded rows pass
    through harmlessly (pure per-token math)."""
    wfc = w_fc.astype(jnp.float32)
    wpj = w_proj.astype(jnp.float32)
    s_fc = jnp.maximum(jnp.max(jnp.abs(wfc), axis=0) / 127.0, 1e-8)
    s_pj = jnp.maximum(jnp.max(jnp.abs(wpj), axis=0) / 127.0, 1e-8)
    wfc_q = jnp.clip(jnp.round(wfc / s_fc), -127, 127).astype(jnp.int8)
    wpj_q = jnp.clip(jnp.round(wpj / s_pj), -127, 127).astype(jnp.int8)
    act1 = jnp.asarray(act1, jnp.float32).reshape(())
    act2 = jnp.asarray(act2, jnp.float32).reshape(())
    interpret = interpret or target_platform() != "tpu"

    b, l, d = x.shape
    hidden = w_fc.shape[1]
    lp = _round_up(l, 128)
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    bp = _round_up(b, block_b)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps, quick=quick_gelu),
        out_shape=jax.ShapeDtypeStruct((bp, lp, d), x.dtype),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((hidden, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_b, lp, d), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(
        x, ln_scale, ln_bias, wfc_q, s_fc * act1, b_fc.astype(jnp.float32),
        wpj_q, s_pj * act2, b_proj.astype(jnp.float32),
        (1.0 / act1).reshape(1), (1.0 / act2).reshape(1),
    )
    return out[:b, :l]


def fused_ln_qkv_attention_int8(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    act_scale: jnp.ndarray,
    num_heads: int,
    kv_len: int,
    sm_scale: float,
    eps: float = 1e-5,
    block_b: int = 2,
    interpret: bool = False,
    quant_attn: bool = False,
    attn_scales=None,
) -> jnp.ndarray:
    """W8A8 variant (inference only, not differentiable): ``w`` is the
    fp32 master kernel, quantized per-output-column here; ``act_scale``
    the calibrated per-tensor scale of the LN output (scalar array).

    ``attn_scales`` (3,): CALIBRATED per-tensor max-abs/127 scales of the
    q, k, v projection outputs — runs QK^T and PV on the int8 MXU with
    static scales (quant_attn="static"): the q/k/v quantization folds
    into the projection's existing dequant multiply (zero extra passes),
    unlike the dynamic ``quant_attn`` whose in-kernel max reductions
    measured slower than the int8 MXU gain."""
    wf = w.astype(jnp.float32)
    s_col = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-8)  # (3D,)
    w_q = jnp.clip(jnp.round(wf / s_col), -127, 127).astype(jnp.int8)
    if (
        not supports(num_heads, w.shape[1] // 3 // num_heads)
        or _round_up(x.shape[1], 128) > MAX_FUSED_SEQ
    ):
        return _ln_qkv_reference(
            x, ln_scale, ln_bias, wf, jnp.ones_like(s_col),
            bias.astype(jnp.float32), num_heads, kv_len, sm_scale, eps,
        )
    act_scale = jnp.asarray(act_scale, jnp.float32).reshape(())
    interpret = interpret or target_platform() != "tpu"
    block_b = attn_block_b(block_b)
    if x.dtype == jnp.float32:
        block_b = 1
    sw = s_col * act_scale  # (3D,) dequant of the int32 qkv accumulator
    bias_f = bias.astype(jnp.float32)
    aq = jnp.ones((3,), jnp.float32)
    if attn_scales is not None:
        # Fold the per-{q,k,v} int8 quantization into the projection's
        # dequant multiply + bias: the kernel then emits qkv directly in
        # the int8 domain (one round/clip, no extra scaling pass).
        aq = jnp.asarray(attn_scales, jnp.float32).reshape(3)
        d = w.shape[0]
        inv_lane = jnp.repeat(1.0 / aq, d)  # (3D,)
        sw = sw * inv_lane
        bias_f = bias_f * inv_lane
        quant_attn = "static"
    return _ln_qkv_forward(
        x, ln_scale, ln_bias, w_q, sw,
        bias_f, (1.0 / act_scale).reshape(1), aq,
        num_heads, kv_len, sm_scale, eps, block_b, interpret,
        quant_attn=quant_attn,
    )
