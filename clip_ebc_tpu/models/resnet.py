"""Torchvision-style ResNet encoders + residual decoder (the *_ae family).

The reference pulls these encoders from timm and performs stride surgery on
layer4 when ``reduction <= 16`` (reference models/encoder_decoder/resnet.py:38-50,
models/encoder/timm_models.py:20-33). Here the encoder is a native Flax
module with the stride choice made at construction time — no surgery needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, ResNetStage, resize_bilinear

_LAYERS = {
    "resnet18": ((2, 2, 2, 2), "basic"),
    "resnet34": ((3, 4, 6, 3), "basic"),
    "resnet50": ((3, 4, 6, 3), "bottleneck"),
    "resnet101": ((3, 4, 23, 3), "bottleneck"),
    "resnet152": ((3, 8, 36, 3), "bottleneck"),
}

# Decoder stacks per variant (reference models/encoder_decoder/resnet.py:11-26).
_DECODER_CFGS = {
    "resnet18": (512, 256, 128),
    "resnet34": (512, 256, 128),
    "resnet50": (512, 256, 256, 128),
    "resnet101": (512, 512, 256, 256, 128),
    "resnet152": (512, 512, 512, 256, 256, 128),
}


class _TVBasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1, use_bias=False, dtype=self.dtype)(x)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(out, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=self.strides, use_bias=False, dtype=self.dtype)(x)
            identity = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(identity, train)
        return nn.relu(out + identity)


class _TVBottleneck(nn.Module):
    """ResNet V1.5 bottleneck: stride on the 3x3 conv."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1, use_bias=False, dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False, dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(out, train)
        if self.strides != 1 or x.shape[-1] != self.features * self.expansion:
            identity = nn.Conv(self.features * self.expansion, (1, 1), strides=self.strides, use_bias=False, dtype=self.dtype)(x)
            identity = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(identity, train)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Features-only ResNet; ``encoder_reduction`` is 16 when layer4 runs at
    stride 1 (the ``reduction <= 16`` configuration), else 32."""

    variant: str = "resnet34"
    layer4_stride: int = 2
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @property
    def channels(self) -> int:
        _, kind = _LAYERS[self.variant]
        return 512 * (4 if kind == "bottleneck" else 1)

    @property
    def encoder_reduction(self) -> int:
        return 32 if self.layer4_stride == 2 else 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        counts, kind = _LAYERS[self.variant]
        block = _TVBasicBlock if kind == "basic" else _TVBottleneck
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        strides = (1, 2, 2, self.layer4_stride)
        for w, s, n in zip(widths, strides, counts):
            for i in range(n):
                x = block(w, strides=s if i == 0 else 1, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


class PlainResNetBackbone(nn.Module):
    """Plain (non-AE) ResNet Classifier/Regressor backbone: encoder +
    bilinear rescale to the requested reduction — the native equivalent of
    the reference's timm escape hatch with stride surgery
    (reference models/encoder/timm_models.py:20-54)."""

    variant: str = "resnet50"
    reduction: int = 32
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @property
    def channels(self) -> int:
        _, kind = _LAYERS[self.variant]
        return 512 * (4 if kind == "bottleneck" else 1)

    @property
    def encoder_reduction(self) -> int:
        return 16 if self.reduction <= 16 else 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        enc = ResNetEncoder(
            variant=self.variant,
            layer4_stride=1 if self.reduction <= 16 else 2,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="encoder",
        )
        x = enc(x, train)
        if self.encoder_reduction != self.reduction:
            x = resize_bilinear(x, self.encoder_reduction / self.reduction)
        return x


class ResNetAutoEncoder(nn.Module):
    """ResNet encoder + residual decoder (reference encoder_decoder/resnet.py:29-76)."""

    variant: str = "resnet34"
    reduction: int = 32
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @property
    def channels(self) -> int:
        return _DECODER_CFGS[self.variant][-1]

    @property
    def encoder_reduction(self) -> int:
        return 16 if self.reduction <= 16 else 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, kind = _LAYERS[self.variant]
        enc = ResNetEncoder(
            variant=self.variant,
            layer4_stride=1 if self.reduction <= 16 else 2,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="encoder",
        )
        x = enc(x, train)
        if self.encoder_reduction != self.reduction:
            x = resize_bilinear(x, self.encoder_reduction / self.reduction)
        x = ResNetStage(
            _DECODER_CFGS[self.variant],
            block=kind,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="decoder",
        )(x, train)
        return x
