"""Shared transformer building blocks for ViT / CLIP encoders.

Pre-LN residual attention blocks in batch-major layout ``(B, L, D)``
(the reference uses torch's sequence-major ``(L, B, D)``; batch-major is
the natural layout for XLA batching on TPU). LayerNorm runs in fp32 and
casts back, matching CLIP's fp16-safe LayerNorm
(reference models/clip/_clip/blocks.py:8-14).

The attention inner product can be swapped (``attn_impl``) between the
XLA einsum path and the Pallas flash-attention kernel in
``clip_ebc_tpu.ops.flash_attention``.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


# Below this many tokens XLA's batched einsum attention beats the tiled
# Pallas kernel (measured on v5e: at L=256/dh=64 the kernel's small tiles
# under-utilize the MXU); above it, not materializing the (L, L) scores in
# HBM wins. Shapes are static under jit, so the choice happens at trace time.
FLASH_MIN_SEQ_LEN = 1024


def use_fused_qkv(backend: str) -> bool:
    """Whether the image tower should use the Pallas fused qkv-attention
    kernel (ops/fused_attention.py): explicit "fused", or "auto" on TPU.
    Measured on v5e at the flagship shape it cuts attention from 8.3 to
    ~2 ms/layer (no transposes, no HBM score tensor)."""
    if backend == "fused":
        return True
    if backend == "auto":
        from ..utils.platform import target_platform

        return target_platform() == "tpu"
    return False


def resolve_attn_impl(backend: str):
    """"auto" picks, per traced shape, the Pallas flash-attention kernel on
    TPU for long sequences and the einsum path otherwise (the kernel needs
    a TPU or interpret mode)."""
    if backend in ("sdpa", "fused"):  # "fused" falls back to sdpa where the
        return sdpa_attention        # fused-qkv path doesn't apply (masks)
    if backend == "flash":
        from ..ops.flash_attention import flash_sdpa

        return flash_sdpa
    if backend == "auto":
        from ..utils.platform import target_platform

        if target_platform() != "tpu":
            return sdpa_attention
        from ..ops.flash_attention import flash_sdpa

        def adaptive(q, k, v, mask):
            if q.shape[2] >= FLASH_MIN_SEQ_LEN:
                return flash_sdpa(q, k, v, mask)
            return sdpa_attention(q, k, v, mask)

        return adaptive
    raise ValueError(f"attn_backend must be auto|flash|sdpa, got {backend}")


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32, output cast back to the input dtype."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return out.astype(orig)


def sdpa_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Reference attention: (B, H, L, Dh) einsum softmax path, fp32 softmax."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k).astype(jnp.float32)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def make_dense_cls(quant_int8: bool, quant_mode: str = "dynamic") -> Callable:
    """nn.Dense, or its W8A8 int8 drop-in (ops/quant.py) for inference;
    ``quant_mode="static"`` uses precalibrated per-tensor activation
    scales (see ops.quant.calibrate_int8)."""
    if not quant_int8:
        return nn.Dense
    import functools

    from ..ops.quant import Int8Dense

    return functools.partial(Int8Dense, quant_mode=quant_mode)


class _LNParamLeaf(nn.Module):
    """Declares nn.LayerNorm's scale/bias without computing — scoped so the
    param paths match a real LayerNormF32 ("<name>/LayerNorm_0/...")."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return _LNParamLeaf(self.dim, name="LayerNorm_0")()


class _ProjParams(nn.Module):
    """Declares an nn.Dense-shaped kernel/bias (and, for the static-int8
    path, the same ``quant/act_amax`` variable Int8Dense uses) without
    applying it — the fused LN+qkv kernel consumes the raw weights."""

    features: int
    quant_amax: bool = False

    @nn.compact
    def __call__(self, in_dim: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        amax = None
        if self.quant_amax:
            amax = self.variable(
                "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
            ).value
        return k, b, amax


class MultiHeadAttention(nn.Module):
    """Joint-QKV multi-head attention (torch nn.MultiheadAttention layout:
    a single in-projection so converted checkpoints map 1:1).

    With ``fused_qkv`` (and no mask), the in-projection output feeds the
    Pallas fused-attention kernel directly — no head split/transpose and
    no HBM score tensor (ops/fused_attention.py). ``kv_len`` marks the
    real sequence length when the caller padded ``x`` (rows >= kv_len are
    masked as keys).

    ``pre_ln=(scale, bias, eps)`` moves the preceding LayerNorm *into*
    the kernel together with the qkv matmul (bf16, or int8 when
    ``quant_int8`` + static mode): x is read from HBM once and only the
    attention output is written back (ops/fused_attention.py
    fused_ln_qkv_attention*)."""

    num_heads: int
    dtype: Any = jnp.float32
    attn_impl: Callable = sdpa_attention
    dense_cls: Callable = nn.Dense
    fused_qkv: bool = False
    kv_len: Optional[int] = None
    quant_int8: bool = False
    quant_mode: str = "dynamic"
    # False | True (static scales inside the Pallas kernel) | "xla"
    # (static scales, QK^T/PV emitted as XLA integer einsums —
    # ops/int8_attention.py).
    quant_attn: Any = False
    # The surrounding trunk is frozen (VPT): the fused LN+qkv backward
    # emits dx only, via a single Pallas kernel (ops/fused_attention.py
    # _ln_qkv_bwd_frozen). Only set when the caller stop_gradients the
    # trunk params.
    trunk_frozen: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        pre_ln: Optional[tuple] = None,
    ) -> jnp.ndarray:
        b, l, d = x.shape
        if d % self.num_heads:
            raise ValueError(f"dim {d} not divisible by heads {self.num_heads}")
        dh = d // self.num_heads

        if pre_ln is not None:
            if mask is not None or not self.fused_qkv:
                raise ValueError("pre_ln requires fused_qkv and no mask")
            from ..ops.fused_attention import (
                fused_ln_qkv_attention,
                fused_ln_qkv_attention_int8,
            )

            static_q = self.quant_int8 and self.quant_mode == "static"
            g, bb, eps = pre_ln
            k, bias, amax = _ProjParams(
                3 * d, quant_amax=static_q, name="in_proj"
            )(d)
            kv = self.kv_len or l
            if static_q:
                act_scale = jnp.maximum(amax, 1e-8 * 127.0) / 127.0
                attn_scales = None
                if self.quant_attn:
                    # calibrated q/k/v output ranges (recorded by the
                    # unfused calibration pass below)
                    qkv_amax = self.variable(
                        "quant", "qkv_amax", lambda: jnp.zeros((3,), jnp.float32)
                    ).value
                    attn_scales = jnp.maximum(qkv_amax, 1e-8 * 127.0) / 127.0
                out = fused_ln_qkv_attention_int8(
                    x, g, bb, k, bias, act_scale,
                    self.num_heads, kv, dh**-0.5, eps,
                    attn_scales=attn_scales,
                )
            else:
                out = fused_ln_qkv_attention(
                    x, g, bb, k, bias, self.num_heads, kv, dh**-0.5, eps,
                    frozen=self.trunk_frozen,
                )
            return self.dense_cls(d, dtype=self.dtype, name="out_proj")(out)

        qkv = self.dense_cls(3 * d, dtype=self.dtype, name="in_proj")(x)
        if (
            self.quant_int8
            and not self.is_initializing()
            and self.is_mutable_collection("quant")
        ):
            # Calibration pass: record per-{q,k,v} output max-abs for the
            # static int8 attention (ops/fused_attention.py
            # _pair_attention_body_static). Cheap (one reduction) and
            # always recorded so any calibrated checkpoint can enable
            # quant_attn later without recalibrating.
            amax3 = jnp.max(
                jnp.abs(qkv.astype(jnp.float32)).reshape(b * l, 3, d), axis=(0, 2)
            )
            qkv_amax = self.variable(
                "quant", "qkv_amax", lambda: jnp.zeros((3,), jnp.float32)
            )
            qkv_amax.value = jnp.maximum(qkv_amax.value, amax3)

        if (
            self.quant_attn == "xla"
            and self.quant_int8
            and self.quant_mode == "static"
            and mask is None
            and not self.is_initializing()
            and not self.is_mutable_collection("quant")
        ):
            # Static-int8 attention as XLA integer einsums (the Mosaic-vs-
            # XLA A/B for the attention matmuls; scales calibrated by the
            # amax3 pass above).
            from ..ops.int8_attention import xla_int8_qkv_attention

            qkv_amax = self.variable(
                "quant", "qkv_amax", lambda: jnp.zeros((3,), jnp.float32)
            ).value
            scales = jnp.maximum(qkv_amax, 1e-8 * 127.0) / 127.0
            out = xla_int8_qkv_attention(
                qkv, self.num_heads, self.kv_len or l, dh**-0.5, scales
            )
            return self.dense_cls(d, dtype=self.dtype, name="out_proj")(out)

        if self.fused_qkv and mask is None:
            from ..ops.fused_attention import (
                MAX_FUSED_SEQ,
                fused_qkv_attention,
                supports,
            )

            if supports(self.num_heads, dh) and l <= MAX_FUSED_SEQ:
                out = fused_qkv_attention(
                    qkv, self.num_heads, self.kv_len or l, dh**-0.5
                )
                return self.dense_cls(d, dtype=self.dtype, name="out_proj")(out)

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, l, self.num_heads, dh).transpose(0, 2, 1, 3)

        attn_mask = mask
        if self.kv_len is not None and self.kv_len < l:
            # caller padded the sequence: padded rows must not act as keys
            kmask = jnp.where(
                jnp.arange(l)[None, None, None, :] < self.kv_len, 0.0, -jnp.inf
            ).astype(jnp.float32)
            attn_mask = kmask if mask is None else mask + kmask
        out = self.attn_impl(heads(q), heads(k), heads(v), attn_mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return self.dense_cls(d, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block: x + MHA(ln1(x)); x + MLP(ln2(x))
    (reference models/clip/_clip/blocks.py:22-42).

    On the fused-qkv path (no mask), ln_1 is folded into the Pallas
    LN+qkv+attention kernel. Calibration passes (mutable "quant") take
    the unfused path so Int8Dense records the in_proj activation range
    the static kernel later consumes — same param/variable tree either
    way."""

    num_heads: int
    mlp_ratio: float = 4.0
    act: Callable = quick_gelu
    ln_epsilon: float = 1e-5
    dtype: Any = jnp.float32
    attn_impl: Callable = sdpa_attention
    dense_cls: Callable = nn.Dense
    fused_qkv: bool = False
    kv_len: Optional[int] = None
    quant_int8: bool = False
    quant_mode: str = "dynamic"
    quant_attn: Any = False  # False | True (in-kernel) | "xla" (see MHA)
    trunk_frozen: bool = False
    # "auto" (default): fold ln_1 + the qkv projection into the Pallas
    # attention kernel whenever eligible. "off": keep the projection in
    # XLA (Int8Dense under int8 modes) and hand only the attention to the
    # kernel — the measurement knob for Mosaic-vs-XLA matmul rates
    # (r3 found Mosaic's in-kernel int8 dot below XLA's emitter for the
    # MLP; this lets the qkv projection be A/B'd the same way on chip).
    fuse_ln_mode: str = "auto"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        d = x.shape[-1]
        attn = MultiHeadAttention(
            self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
            dense_cls=self.dense_cls, fused_qkv=self.fused_qkv,
            kv_len=self.kv_len, quant_int8=self.quant_int8,
            quant_mode=self.quant_mode, quant_attn=self.quant_attn,
            trunk_frozen=self.trunk_frozen,
            name="attn",
        )
        from ..ops.fused_attention import MAX_FUSED_SEQ

        fuse_ln = (
            self.fused_qkv
            and self.fuse_ln_mode != "off"
            # "xla" attention reads the qkv tensor from HBM — the fused
            # LN+qkv+attention kernel never materializes it, so the two
            # are mutually exclusive; the projection runs as Int8Dense.
            and self.quant_attn != "xla"
            and mask is None
            and not self.is_initializing()
            and not self.is_mutable_collection("quant")
            # Dynamic int8 has no precalibrated scale the fused kernel could
            # consume; routing in_proj through the bf16 fused kernel would
            # silently de-quantize the projection and change what "--quant
            # int8" means. Keep the flag's semantics: unfused Int8Dense qkv.
            and not (self.quant_int8 and self.quant_mode == "dynamic")
            # Whole-sequence VMEM kernels stop fitting past lp=512 (the
            # full-image eval at L=1664 asked for 62 MB of VMEM). Longer
            # sequences keep the unfused path: Int8Dense projections stay
            # int8, attention goes through attn_impl ("auto" routes
            # L >= 1024 to the tiled flash kernel).
            and x.shape[1] <= MAX_FUSED_SEQ
        )
        if fuse_ln:
            g, bb = _LNParams(d, name="ln_1")()
            x = x + attn(x, pre_ln=(g, bb, self.ln_epsilon))
        else:
            h = LayerNormF32(self.ln_epsilon, name="ln_1")(x)
            x = x + attn(h, mask)

        # NOTE: both MLP fusion attacks measured SLOWER than XLA's plain
        # int8 matmul pair at the flagship shape and stay opt-in knobs:
        # (a) the fully-fused W8A8 Pallas kernel
        # (ops/fused_attention.fused_ln_mlp_int8) — trunk 113 vs 105 ms,
        # Mosaic's in-kernel dot falls short of XLA's int8 emitter (r3);
        # (b) the XLA-level int8-hidden fusion below (ops/quant.
        # int8_mlp_static: act+re-quantize folded into the fc dot's
        # epilogue so the mlp_ratio-wide hidden stays int8 in HBM) —
        # 33.75 vs 31.18 ms/image latency-cancelled on the live chip
        # (r5): the extra round/clip vector work costs more than the
        # saved hidden bytes. EBC_FUSE_MLP=1 re-enables (b); same
        # param/variable tree as the Int8Dense pair either way.
        fuse_mlp = (
            self.quant_int8
            and self.quant_mode == "static"
            and not self.is_initializing()
            and not self.is_mutable_collection("quant")
            and os.environ.get("EBC_FUSE_MLP", "0") == "1"
        )
        h = LayerNormF32(self.ln_epsilon, name="ln_2")(x)
        if fuse_mlp:
            from ..ops.quant import _EPS, int8_mlp_static

            hidden = int(d * self.mlp_ratio)
            k1, b1, a1 = _ProjParams(hidden, quant_amax=True, name="mlp_fc")(d)
            k2, b2, a2 = _ProjParams(d, quant_amax=True, name="mlp_proj")(hidden)
            h = int8_mlp_static(
                h,
                k1, b1, jnp.maximum(a1, _EPS * 127.0) / 127.0,
                k2, b2, jnp.maximum(a2, _EPS * 127.0) / 127.0,
                self.act, out_dtype=self.dtype,
            )
        else:
            h = self.dense_cls(
                int(d * self.mlp_ratio), dtype=self.dtype, name="mlp_fc"
            )(h)
            h = self.act(h)
            h = self.dense_cls(d, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class PatchifyMatmul(nn.Module):
    """ViT patch embedding computed as reshape + one matmul.

    A stride==kernel VALID conv is a pure block reshape followed by a
    (p*p*c, features) matmul; XLA's general conv lowering for stride-16
    patchify measures ~19 TFLOP/s on v5e where the equivalent matmul runs
    near peak (scripts/bisect_vit_module.py). Param name/shape match
    nn.Conv ("kernel" (p, p, c, features) HWIO + optional "bias") so
    converted checkpoints load unchanged. Returns (B, gh*gw, features).

    A 3-D input ``(B, H, W*in_channels)`` is consumed as channel-flattened
    pixels (the sliding-window flat-gather path, ops/sliding_window.py):
    the reshape chain then moves ``p*in_channels``-element contiguous
    chunks instead of ``in_channels``-element ones — on TPU the minor
    (lane) dimension of every relayout copy grows from 3 to 48 for RGB
    ViT-B/16, the difference between ~2% and ~37% lane packing. Bitwise
    identical to the 4-D path (the (p, c) dims are adjacent and merged in
    the same order).
    """

    features: int
    patch: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    in_channels: int = 3  # only used to split a 3-D (flat-pixel) input

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch
        if x.ndim == 3:
            b, h, wc = x.shape
            c = self.in_channels
            w = wc // c
        else:
            b, h, w, c = x.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, c, self.features),
            jnp.float32,
        )
        # promote like nn.Conv: BOTH operands to the compute dtype — without
        # this an fp32 input silently keeps the whole downstream trunk fp32
        # (and the fused LN+qkv kernel's fp32 operands overflow VMEM)
        if x.ndim == 3:
            x = (
                x.astype(self.dtype)
                .reshape(b, gh, p, gw, p * c)
                .transpose(0, 1, 3, 2, 4)
                .reshape(b, gh * gw, p * p * c)
            )
        else:
            x = (
                x.astype(self.dtype)
                .reshape(b, gh, p, gw, p, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, gh * gw, p * p * c)
            )
        out = x @ kernel.astype(self.dtype).reshape(p * p * c, self.features)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias.astype(self.dtype)
        return out


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid_hw: tuple, new_hw: tuple
) -> jnp.ndarray:
    """Resize the patch part of a (1 + H*W, D) positional embedding to a new
    grid, keeping the CLS slot (reference _clip/image_encoder.py:183-198).
    Uses the torch-parity bicubic kernel (a=-0.75) so converted checkpoints
    match the reference at off-size inputs."""
    from ..ops.interpolate import torch_bicubic_resize

    (h, w), (nh, nw) = grid_hw, new_hw
    if (h, w) == (nh, nw):
        return pos_embed
    cls_tok, patch = pos_embed[:1], pos_embed[1:]
    d = patch.shape[-1]
    patch = torch_bicubic_resize(patch.reshape(h, w, d), (nh, nw))
    return jnp.concatenate([cls_tok, patch.reshape(nh * nw, d)], axis=0)
