"""CLIP image encoders (Flax): ViT and ModifiedResNet, features-only.

- ``ClipViT``: conv patchify, CLS token, bicubic pos-embed interpolation
  for arbitrary sizes, pre-LN transformer with QuickGELU; features_only
  output is the patch grid (reference _clip/image_encoder.py:118-225).
  VPT (visual prompt tuning) is integrated here: learnable per-layer
  prompt tokens are inserted before each block and stripped after
  (reference models/clip/model.py:131-189) — prompts are stacked in one
  (depth, num_vpt, width) parameter instead of per-layer attributes.
- ``ClipModifiedResNet``: 3-conv stem + avg-pool, anti-aliased strided
  bottlenecks (avgpool before stride), layer4 stride 1 when
  ``reduction <= 16`` (reference _clip/image_encoder.py:10-115), optional
  AttentionPool2d head when not features_only.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..blocks import BatchNorm
from ..transformer import (
    LayerNormF32,
    PatchifyMatmul,
    ResidualAttentionBlock,
    interpolate_pos_embed,
    quick_gelu,
    sdpa_attention,
)

VIT_CONFIGS = {
    # name: (patch, width, layers, heads, embed_dim)
    "vit_b_32": (32, 768, 12, 12, 512),
    "vit_b_16": (16, 768, 12, 12, 512),
    "vit_l_14": (14, 1024, 24, 16, 768),
    "vit_l_14_336px": (14, 1024, 24, 16, 768),
}

RESNET_CONFIGS = {
    # name: (layers, width, embed_dim, heads)
    "resnet50": ((3, 4, 6, 3), 64, 1024, 32),
    "resnet101": ((3, 4, 23, 3), 64, 512, 32),
    "resnet50x4": ((4, 6, 10, 6), 80, 640, 40),
    "resnet50x16": ((6, 8, 18, 8), 96, 768, 48),
    "resnet50x64": ((3, 15, 36, 10), 128, 1024, 64),
}


class ClipViT(nn.Module):
    variant: str = "vit_b_16"
    input_size: int = 224
    num_vpt: int = 0  # 0 disables VPT
    # The trunk params (LN/projections) are frozen by the surrounding
    # training setup — set ONLY when an optimizer mask / stop_gradient
    # actually freezes them (build_clip_ebc passes freeze_image_encoder);
    # enables the dx-only fused attention backward.
    trunk_frozen: bool = False
    deep_vpt: bool = True
    vpt_drop: float = 0.0
    dtype: Any = jnp.float32
    attn_impl: Any = sdpa_attention
    remat: bool = False  # rematerialize each resblock (memory <-> FLOPs)
    features_only: bool = True  # False -> pooled CLS @ proj (joint-CLIP head)
    quant_int8: bool = False  # W8A8 inference matmuls (ops/quant.py)
    quant_mode: str = "dynamic"  # "static" needs a calibrated "quant" collection
    quant_attn: Any = False  # False | True (in-kernel) | "xla" (needs qkv_amax)
    fuse_ln_mode: str = "auto"  # "off": qkv projection stays in XLA
    # Pallas fused qkv-attention (ops/fused_attention.py): the sequence is
    # padded once to a 128-multiple for the whole trunk and padded rows are
    # masked as keys inside the kernel.
    fused_qkv: bool = False

    @property
    def patch_size(self) -> int:
        return VIT_CONFIGS[self.variant][0]

    @property
    def channels(self) -> int:
        return VIT_CONFIGS[self.variant][1]

    @property
    def encoder_reduction(self) -> int:
        return self.patch_size

    @property
    def clip_embed_dim(self) -> int:
        return VIT_CONFIGS[self.variant][4]

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mode: str = "full"
    ) -> jnp.ndarray:
        """``mode``: "full" = pixels -> features; "embed" = pixels ->
        patch-token grid (B, H/p, W/p, width), patchify only;
        "from_tokens" = consume an "embed"-shaped token grid, skipping
        patchify. The split lets sliding-window eval patchify a large
        image ONCE and unfold windows on the token grid (width-lane
        tensors) instead of on channel-3 pixels — see
        ops/sliding_window.py (token fast path).

        A 3-D "full"/"embed" input (B, H, W*3) is consumed as channel-
        flattened RGB pixels (the sliding-window flat-gather path;
        PatchifyMatmul handles the split) — bitwise identical to the 4-D
        path."""
        patch, width, layers, heads, _ = VIT_CONFIGS[self.variant]
        if mode == "from_tokens":
            b, gh, gw, _w = x.shape
            if _w != width:
                raise ValueError(f"token width {_w} != model width {width}")
            x = x.astype(self.dtype).reshape(b, gh * gw, width)
        else:
            if x.ndim == 3:  # flat pixels (B, H, W*3)
                b, h, wc = x.shape
                w = wc // 3
            else:
                b, h, w, _ = x.shape
            if h % patch or w % patch:
                raise ValueError(f"input {h}x{w} not divisible by patch {patch}")
            gh, gw = h // patch, w // patch

            x = PatchifyMatmul(
                width, patch, use_bias=False, dtype=self.dtype, name="conv1"
            )(x)
            if mode == "embed":
                return x.reshape(b, gh, gw, width)

        scale = width**-0.5
        cls_tok = self.param(
            "class_embedding", nn.initializers.normal(scale), (width,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(x.dtype), (b, 1, width)), x], axis=1
        )

        # Pretraining grid is 224/patch (or 336/14); interp for other sizes
        base = 336 // patch if self.variant.endswith("336px") else 224 // patch
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (base * base + 1, width),
            jnp.float32,
        )
        pos = interpolate_pos_embed(pos, (base, base), (gh, gw))
        x = x + pos[None].astype(x.dtype)
        x = LayerNormF32(1e-5, name="ln_pre")(x)

        use_vpt = self.num_vpt > 0
        if use_vpt:
            depth = layers if self.deep_vpt else 1
            # U(-v, v) with v = sqrt(6/(3*patch + width)), the VPT paper init
            # (reference models/clip/model.py:73-75)
            val = math.sqrt(6.0 / (3 * patch + width))
            vpt = self.param(
                "vpt",
                lambda k, shape, dtype: jax.random.uniform(k, shape, dtype, -val, val),
                (depth, self.num_vpt, width),
                jnp.float32,
            )
            drop = nn.Dropout(self.vpt_drop) if self.vpt_drop > 0 else None
            prompts = jnp.broadcast_to(
                vpt[0].astype(x.dtype), (b, self.num_vpt, width)
            )
            if drop is not None:
                prompts = drop(prompts, deterministic=not train)

        from ..transformer import make_dense_cls

        dense_cls = make_dense_cls(self.quant_int8, self.quant_mode)
        block_cls = nn.remat(ResidualAttentionBlock) if self.remat else ResidualAttentionBlock
        # VPT prompts live at positions [1, 1+num_vpt) for the whole stack:
        # deep VPT *replaces* them before each block, so a single in-place
        # row overwrite per layer is bitwise-equivalent to the reference's
        # strip-then-reinsert (reference models/clip/model.py:142-189) at a
        # fraction of the HBM traffic; shallow VPT lets them flow through
        # with no per-layer sequence surgery at all.
        if use_vpt:
            x = jnp.concatenate([x[:, :1], prompts, x[:, 1:]], axis=1)
        n_real = x.shape[1]
        kv_len = None
        if self.fused_qkv:
            from ...ops.fused_attention import seq_pad

            pad = seq_pad()  # 128 default; EBC_SEQ_PAD=240 trims the trunk
            lp = -(-n_real // pad) * pad
            if lp != n_real:
                x = jnp.pad(x, ((0, 0), (0, lp - n_real), (0, 0)))
                kv_len = n_real
        for i in range(layers):
            block = block_cls(
                num_heads=heads,
                act=quick_gelu,
                ln_epsilon=1e-5,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                dense_cls=dense_cls,
                fused_qkv=self.fused_qkv,
                kv_len=kv_len,
                quant_int8=self.quant_int8,
                quant_mode=self.quant_mode,
                quant_attn=self.quant_attn,
                fuse_ln_mode=self.fuse_ln_mode,
                # Set from the model's actual freeze configuration
                # (ClipEBC.freeze_image_encoder), NOT inferred from VPT —
                # the zero param-cotangents the fused backward returns are
                # only correct when the caller really freezes the trunk.
                trunk_frozen=self.trunk_frozen,
                name=f"resblock_{i}",
            )
            if use_vpt and self.deep_vpt and i > 0:
                prompts = jnp.broadcast_to(
                    vpt[i].astype(x.dtype), (b, self.num_vpt, width)
                )
                if drop is not None:
                    prompts = drop(prompts, deterministic=not train)
                x = jax.lax.dynamic_update_slice(x, prompts, (0, 1, 0))
            x = block(x)
        # ln_post is per-token, so no need to strip the prompts first —
        # slice CLS / patch tokens straight out of the full sequence.
        n_lead = 1 + (self.num_vpt if use_vpt else 0)
        x = LayerNormF32(1e-5, name="ln_post")(x)
        if not self.features_only:
            proj = self.param(
                "proj", nn.initializers.normal(width**-0.5),
                (width, self.clip_embed_dim), jnp.float32,
            )
            return x[:, 0, :] @ proj.astype(x.dtype)
        return x[:, n_lead : n_lead + gh * gw, :].reshape(b, gh, gw, width)


class ClipBottleneck(nn.Module):
    """CLIP's anti-aliased bottleneck: all convs stride 1; avgpool after
    conv2 when stride > 1; downsample = avgpool + 1x1 conv
    (reference _clip/blocks.py:56-101)."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = self.planes * self.expansion
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="bn2")(out, train)
        out = nn.relu(out)
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="bn3")(out, train)
        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride))
            identity = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="down_conv")(identity)
            identity = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="down_bn")(identity, train)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Global attention pool: mean-token query over the grid
    (reference _clip/blocks.py:104-137)."""

    spacial_dim: int
    num_heads: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(c**-0.5),
            (self.spacial_dim + 1, c),
            jnp.float32,
        )
        seq = seq + pos[None, : seq.shape[1]].astype(seq.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(seq[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(seq)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(seq)
        nh = self.num_heads
        dh = c // nh

        def heads(t):
            return t.reshape(b, t.shape[1], nh, dh).transpose(0, 2, 1, 3)

        out = sdpa_attention(heads(q), heads(k), heads(v), None)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)[:, 0]


class ClipModifiedResNet(nn.Module):
    variant: str = "resnet50"
    reduction: int = 32  # <=16 puts layer4 at stride 1
    features_only: bool = True
    input_size: int = 224  # for the attnpool head only
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @property
    def channels(self) -> int:
        _, width, embed_dim, _ = RESNET_CONFIGS[self.variant]
        return width * 32 if self.features_only else embed_dim

    @property
    def encoder_reduction(self) -> int:
        return 16 if self.reduction <= 16 else 32

    @property
    def clip_embed_dim(self) -> int:
        return RESNET_CONFIGS[self.variant][2]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        counts, width, embed_dim, heads = RESNET_CONFIGS[self.variant]
        # 3-conv stem, stride 2 + trailing avg-pool (reference :37-47, :83-89)
        for i, (ch, stride) in enumerate(
            ((width // 2, 2), (width // 2, 1), (width, 1))
        ):
            x = nn.Conv(ch, (3, 3), strides=stride, padding=1, use_bias=False, dtype=self.dtype, name=f"stem_conv{i + 1}")(x)
            x = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name=f"stem_bn{i + 1}")(x, train)
            x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), (2, 2))

        layer4_stride = 1 if self.reduction <= 16 else 2
        strides = (1, 2, 2, layer4_stride)
        for li, (n, s) in enumerate(zip(counts, strides)):
            planes = width * (2**li)
            for bi in range(n):
                x = ClipBottleneck(
                    planes,
                    stride=s if bi == 0 else 1,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)

        if self.features_only:
            return x
        spacial = (self.input_size // 32) ** 2
        return AttentionPool2d(
            spacial, heads, embed_dim, dtype=self.dtype, name="attnpool"
        )(x)
