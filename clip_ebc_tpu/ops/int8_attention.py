"""Static-int8 attention emitted as plain XLA matmuls.

Round-3 measured Mosaic's *in-kernel* int8 ``dot_general`` below the bf16
pair-packed path (STATUS_r3: 3219 vs 3471 w/s), while XLA's own int8
emitter reaches the 2x MXU rate (the Int8Dense MLP matmuls do). This
module is the missing third point of that A/B (VERDICT r3 item 2): the
same static-scale quantization scheme as the fused kernel's
``quant_attn`` path (ops/fused_attention.py ``_pair_attention_body_static``)
but with QK^T and PV handed to XLA as integer einsums, so the MXU
scheduling is XLA's, not Mosaic's. The price is the HBM score tensor the
fused kernel avoids; the bet is the 2x int8 MXU rate on PV (contraction
L) plus XLA's fusion of quantize/dequantize into neighbors outweighs it
at the flagship sequence length (L=261 -> 384 padded).

Scale convention matches the kernel path: ``attn_scales[i] = amax_i/127``
per q/k/v projection output (calibrated ``qkv_amax``, recorded by
MultiheadAttention's calibration pass); P is quantized on [0, 1] with the
fixed scale 1/127.

No reference counterpart (the reference runs torch nn.MultiheadAttention
in fp32/fp16; quantized attention is a TPU-deploy addition).
"""

from __future__ import annotations

import jax.numpy as jnp


def _q8(t: jnp.ndarray, scale) -> jnp.ndarray:
    return jnp.clip(
        jnp.round(t.astype(jnp.float32) * (1.0 / scale)), -127.0, 127.0
    ).astype(jnp.int8)


def xla_int8_qkv_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    kv_len: int,
    sm_scale: float,
    attn_scales: jnp.ndarray,
) -> jnp.ndarray:
    """(B, L, 3D) joint qkv -> (B, L, D) attention output, int8 matmuls.

    ``attn_scales`` (3,) fp32: calibrated per-tensor scales (amax/127) of
    the q, k, v projection outputs. Rows at index >= ``kv_len`` are
    masked as keys (their own outputs are unspecified), matching
    ``fused_qkv_attention``.
    """
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    sq = attn_scales[0]
    sk = attn_scales[1]
    sv = attn_scales[2]

    def heads(t):
        return t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    q8 = heads(_q8(qkv[..., :d], sq))
    k8 = heads(_q8(qkv[..., d : 2 * d], sk))
    v8 = heads(_q8(qkv[..., 2 * d :], sv))

    # int8 x int8 -> int32 on the MXU; dequant folds into the sm_scale
    # multiply XLA fuses into the softmax's elementwise prologue.
    s = jnp.einsum(
        "bhld,bhmd->bhlm", q8, k8, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (sq * sk * sm_scale)
    if kv_len < l:
        s = jnp.where(jnp.arange(l)[None, None, None, :] < kv_len, s, -jnp.inf)
    p = jnp.exp(s - s.max(axis=-1, keepdims=True))
    p = p / p.sum(axis=-1, keepdims=True)
    # P in [0, 1]: fixed 1/127 scale, no clip needed beyond rounding.
    p8 = jnp.round(p * 127.0).astype(jnp.int8)
    o = jnp.einsum(
        "bhlm,bhmd->bhld", p8, v8, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (sv / 127.0)
    return o.transpose(0, 2, 1, 3).reshape(b, l, d).astype(qkv.dtype)
