"""CLIP-EBC: zero-shot-style blockwise count classification (Flax).

Architecture (reference models/clip/model.py:191-217):
  image encoder (ModifiedResNet fine-tuned, or frozen ViT + VPT)
    -> optional bilinear up-scale from encoder_reduction to reduction
    -> residual-block decoder -> 1x1 projection to the CLIP embed dim
    -> L2-normalize, cosine similarity against text-prompt embeddings
       scaled by exp(logit_scale) (init ln(1/0.07))
    -> per-block bin logits -> softmax . anchor_points = density.

Text prompts are built from the bins ("There are five people." etc.),
tokenized once at construction, and encoded by the CLIP text encoder
inside ``__call__`` — under ``stop_gradient`` when frozen, so XLA treats
the text tower as a constant-folding-friendly side branch (the reference
precomputes the features eagerly instead, reference model.py:127-129).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..blocks import ResNetStage, resize_bilinear
from ..heads import expectation_from_logits
from .image_encoder import RESNET_CONFIGS, VIT_CONFIGS, ClipModifiedResNet, ClipViT
from .prompts import bin_prompts
from ..transformer import resolve_attn_impl, use_fused_qkv
from .text_encoder import ClipTextEncoder
from .tokenizer import tokenize

# Text tower shapes per backbone: (width, heads); all have 12 layers.
TEXT_CONFIGS = {
    "resnet50": (512, 8),
    "resnet101": (512, 8),
    "resnet50x4": (640, 10),
    "resnet50x16": (768, 12),
    "resnet50x64": (1024, 16),
    "vit_b_16": (512, 8),
    "vit_b_32": (512, 8),
    "vit_l_14": (768, 12),
    "vit_l_14_336px": (768, 12),
}

# Default decoder configurations (reference models/clip/model.py:234-255).
DECODER_CFGS = {
    "resnet50": ("bottleneck", (2048,)),
    "resnet50x4": ("bottleneck", (1280,)),
    "resnet50x16": ("bottleneck", (1536,)),
    "resnet50x64": ("bottleneck", (2048,)),
    "resnet101": ("bottleneck", (2048, 1024)),
    "vit_b_16": ("basic", (768,)),
    "vit_b_32": ("basic", (768,)),
    "vit_l_14": ("basic", (1024,)),
    "vit_l_14_336px": ("basic", (1024,)),
}


class ClipEBC(nn.Module):
    """CLIP-EBC: blockwise count classification against text-prompt
    embeddings (reference models/clip/model.py).

    FROZEN-TRUNK CONTRACT: when ``freeze_image_encoder=True`` (the VPT
    mode — the factory sets it for every ViT backbone), the image trunk
    is built with ``trunk_frozen=True`` and the fused pair-packed
    attention kernel SKIPS computing cotangents for the trunk's LN/QKV
    projection weights — they come back exact-zero, not merely "to be
    masked later". The bundled ``Trainer`` honors this (it stop_gradient-
    prunes frozen subtrees and masks the optimizer), but a CUSTOM training
    loop that differentiates this module and applies raw grads will see
    silently zero trunk gradients — by design. If you need trunk
    gradients, build with ``freeze_image_encoder=False`` (and accept the
    full backward cost). See ops/fused_attention.py (frozen backward).
    """

    backbone: str
    bins: Sequence[Tuple[float, float]]
    anchor_points: Sequence[float]
    reduction: Optional[int] = None
    freeze_text_encoder: bool = True
    freeze_image_encoder: bool = False  # True for ViT backbones (VPT mode)
    prompt_type: str = "word"
    input_size: int = 224
    num_vpt: int = 32
    deep_vpt: bool = True
    vpt_drop: float = 0.0
    decoder_block: Optional[str] = None
    decoder_cfg: Optional[Sequence[Union[int, str]]] = None
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    attn_backend: str = "auto"  # "auto" | "flash" | "sdpa"
    fused_head: str = "auto"  # "auto" | "on" | "off" (Pallas head at eval)
    quant_int8: bool = False  # W8A8 int8 inference matmuls in the ViT trunk
    quant_mode: str = "dynamic"  # "static" needs a calibrated "quant" collection
    quant_attn: Any = False  # False | True (in-kernel) | "xla" (static mode)
    fuse_ln_mode: str = "auto"  # "off": qkv projection stays in XLA (A/B knob)
    # TPU-optimized variant: run the residual decoder at the encoder's
    # native grid and upsample afterwards. At reduction 8 this cuts the
    # decoder's FLOPs 4x (it costs as much as the whole ViT-B trunk when
    # run post-upsample at 2x grid). Off by default = reference ordering
    # (reference models/clip/model.py:195-198).
    decoder_before_upsample: bool = False

    @property
    def is_vit(self) -> bool:
        return self.backbone in VIT_CONFIGS

    def _use_fused_head(self) -> bool:
        if self.fused_head == "on":
            return True
        if self.fused_head == "off":
            return False
        from ...utils.platform import target_platform

        return target_platform() == "tpu"

    @property
    def encoder_reduction(self) -> int:
        if self.is_vit:
            return VIT_CONFIGS[self.backbone][0]
        return 16 if (self.reduction or 32) <= 16 else 32

    @property
    def out_reduction(self) -> int:
        return self.reduction or self.encoder_reduction

    @property
    def clip_embed_dim(self) -> int:
        if self.is_vit:
            return VIT_CONFIGS[self.backbone][4]
        return RESNET_CONFIGS[self.backbone][2]

    def setup(self):
        if len(self.bins) != len(self.anchor_points):
            raise ValueError("bins and anchor_points must have equal length")
        attn = resolve_attn_impl(self.attn_backend)
        if self.is_vit:
            self.image_encoder = ClipViT(
                variant=self.backbone,
                input_size=self.input_size,
                num_vpt=self.num_vpt,
                trunk_frozen=self.freeze_image_encoder,
                deep_vpt=self.deep_vpt,
                vpt_drop=self.vpt_drop,
                dtype=self.dtype,
                attn_impl=attn,
                quant_int8=self.quant_int8,
                fuse_ln_mode=self.fuse_ln_mode,
                quant_mode=self.quant_mode,
                quant_attn=self.quant_attn,
                fused_qkv=use_fused_qkv(self.attn_backend),
            )
        else:
            self.image_encoder = ClipModifiedResNet(
                variant=self.backbone,
                reduction=self.out_reduction,
                features_only=True,
                dtype=self.dtype,
                axis_name=self.axis_name,
            )

        block, cfg = DECODER_CFGS[self.backbone]
        if self.decoder_block is not None:
            block = self.decoder_block
        if self.decoder_cfg is not None:
            cfg = tuple(self.decoder_cfg)
        decoder_conv_cls = None
        if self.quant_int8:
            import functools

            from ...ops.quant import Int8Conv

            # The decoder is FLOP-bound (~8 TFLOPs for ViT-B at 28^2) and
            # int8 convs run 315 vs 189 TFLOP/s-equiv on v5e
            # (scripts/bisect_conv_quant.py), so it quantizes alongside the
            # trunk matmuls.
            decoder_conv_cls = functools.partial(Int8Conv, quant_mode=self.quant_mode)
        self.image_decoder = ResNetStage(
            cfg, block=block, dtype=self.dtype, axis_name=self.axis_name,
            conv_cls=decoder_conv_cls,
        )
        self._decoder_out = int([c for c in cfg if c != "U"][-1])
        if self._decoder_out != self.clip_embed_dim:
            self.projection = nn.Conv(self.clip_embed_dim, (1, 1), dtype=self.dtype)
        else:
            self.projection = None

        width, heads = TEXT_CONFIGS[self.backbone]
        self.text_encoder = ClipTextEncoder(
            embed_dim=self.clip_embed_dim,
            width=width,
            heads=heads,
            layers=12,
            dtype=self.dtype,
            attn_impl=attn,
        )
        prompts = bin_prompts(self.bins, self.prompt_type)
        self.text_tokens = jnp.asarray(tokenize(list(prompts)))

        self.logit_scale = self.param(
            "logit_scale",
            lambda k: jnp.asarray(math.log(1 / 0.07), jnp.float32),
        )

    def encode_text(self) -> jnp.ndarray:
        """Prompt features (N, D). The reference precomputes these once for
        a frozen text tower (reference models/clip/model.py:127-129); the
        trainer/evaluator call this once and pass the result into
        ``__call__`` via ``text_feats`` so the 12-layer text encoder never
        runs inside the hot step."""
        return self.text_encoder(self.text_tokens)

    def embed_patches(self, x: jnp.ndarray) -> jnp.ndarray:
        """Patch-embed pixels into the ViT token grid (B, H/p, W/p, width)
        — the "embed" half of the split trunk. Sliding-window eval calls
        this ONCE on the full image and unfolds windows on the token grid
        (ops/sliding_window.py token fast path), then feeds the windows
        back through ``__call__(..., pre_embedded=True)``."""
        if not self.is_vit:
            raise ValueError("embed_patches is only defined for ViT backbones")
        return self.image_encoder(x, mode="embed")

    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        text_feats: Optional[jnp.ndarray] = None,
        pre_embedded: bool = False,
    ):
        if pre_embedded:
            feats = self.image_encoder(x, train, mode="from_tokens")
        else:
            feats = self.image_encoder(x, train)
        if self.freeze_image_encoder:
            # VPT: only the prompt tokens train; gradients to the frozen ViT
            # weights are masked in the optimizer, and the features pass
            # through unchanged.
            pass
        scale = self.encoder_reduction / self.out_reduction
        if self.decoder_before_upsample:
            feats = self.image_decoder(feats, train)
            if self.projection is not None:
                feats = self.projection(feats)
            if self.out_reduction != self.encoder_reduction:
                feats = resize_bilinear(feats, scale)
        else:
            if self.out_reduction != self.encoder_reduction:
                feats = resize_bilinear(feats, scale)
            feats = self.image_decoder(feats, train)
            if self.projection is not None:
                feats = self.projection(feats)

        if text_feats is None:
            text_feats = self.text_encoder(self.text_tokens)  # (N, D)
        if self.freeze_text_encoder:
            text_feats = jax.lax.stop_gradient(text_feats)

        if not train and self._use_fused_head():
            from ...ops.fused_head import fused_ebc_head

            b, hh, ww, c = feats.shape
            density = fused_ebc_head(
                feats.reshape(b * hh * ww, c),
                text_feats,
                jnp.exp(self.logit_scale),
                jnp.asarray(self.anchor_points, jnp.float32),
            )
            return density.reshape(b, hh, ww)

        img = feats.astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True).clip(1e-12)
        txt = text_feats.astype(jnp.float32)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True).clip(1e-12)

        logits = jnp.exp(self.logit_scale) * jnp.einsum("bhwc,nc->bhwn", img, txt)
        density = expectation_from_logits(
            logits, jnp.asarray(self.anchor_points, jnp.float32)
        )
        if train:
            return logits, density
        return density


def _vpt_frozen_predicate(path: Tuple[str, ...]) -> bool:
    """Freeze the ViT trunk (all of image_encoder except the VPT prompts)
    and the text tower."""
    if "text_encoder" in path:
        return True
    if "image_encoder" in path and "vpt" not in path:
        return True
    return False


def _text_frozen_predicate(path: Tuple[str, ...]) -> bool:
    return "text_encoder" in path


def build_clip_ebc(
    backbone: str,
    bins,
    anchor_points,
    reduction: Optional[int] = None,
    input_size: int = 224,
    freeze_text_encoder: bool = True,
    prompt_type: str = "word",
    num_vpt: int = 32,
    deep_vpt: bool = True,
    vpt_drop: float = 0.0,
    decoder_block: Optional[str] = None,
    decoder_cfg=None,
    dtype: Any = jnp.float32,
    axis_name: Optional[str] = None,
    attn_backend: str = "auto",
    fused_head: str = "auto",
    decoder_before_upsample: bool = False,
    quant_int8: bool = False,
    quant_mode: str = "dynamic",
    quant_attn: Any = False,
    fuse_ln_mode: str = "auto",
    **_: Any,
) -> ClipEBC:
    """Factory with per-backbone defaults (reference models/clip/model.py:220-270).

    ViT backbones train via VPT with the trunk frozen; ResNet backbones
    fine-tune end-to-end (reference model.py:60-76).

    NOTE (custom training loops): for ViT backbones this sets
    ``freeze_image_encoder=True``, which makes the fused attention
    backward return EXACT-ZERO gradients for the frozen trunk's LN/QKV
    weights (see the ClipEBC docstring). Train through the bundled
    ``Trainer`` (which masks those params) or zero/ignore them yourself.
    """
    if bins is None or anchor_points is None:
        raise ValueError("CLIP-EBC requires bins and anchor_points")
    is_vit = backbone in VIT_CONFIGS
    model = ClipEBC(
        backbone=backbone,
        bins=tuple(tuple(b) for b in bins),
        anchor_points=tuple(anchor_points),
        reduction=reduction,
        freeze_text_encoder=freeze_text_encoder,
        freeze_image_encoder=is_vit,
        prompt_type=prompt_type,
        input_size=input_size,
        num_vpt=num_vpt if is_vit else 0,
        deep_vpt=deep_vpt,
        vpt_drop=vpt_drop,
        decoder_block=decoder_block,
        decoder_cfg=decoder_cfg,
        dtype=dtype,
        axis_name=axis_name,
        attn_backend=attn_backend,
        fused_head=fused_head,
        decoder_before_upsample=decoder_before_upsample,
        quant_int8=quant_int8,
        fuse_ln_mode=fuse_ln_mode,
        quant_mode=quant_mode,
        quant_attn=quant_attn,
    )
    # Attach the optimizer mask (consumed by Trainer).
    if is_vit:
        object.__setattr__(model, "frozen_param_predicate", _vpt_frozen_predicate)
    elif freeze_text_encoder:
        object.__setattr__(model, "frozen_param_predicate", _text_frozen_predicate)
    return model
