"""VGG backbones: plain feature encoder and the DMCount-style autoencoder.

- ``VGGEncoder``: VGG features only, 512 channels, native reduction 16,
  bilinearly re-scaled to the requested reduction
  (reference models/encoder/vgg.py:10-25).
- ``VGGAutoEncoder``: VGG features + 512->256->128 3x3 regression head —
  the ``vgg19_ae`` DMCount/BL baseline
  (reference models/encoder_decoder/vgg.py:13-41).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import VGG_CFGS, ConvBNAct, VGGStage, resize_bilinear


class VGGEncoder(nn.Module):
    cfg_key: str = "E"
    use_bn: bool = False
    reduction: int = 8
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    # backbone contract: output channel count and native stride
    channels: int = 512
    encoder_reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = VGGStage(
            VGG_CFGS[self.cfg_key],
            use_bn=self.use_bn,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="features",
        )(x, train)
        if self.encoder_reduction != self.reduction:
            x = resize_bilinear(x, self.encoder_reduction / self.reduction)
        return x


class VGGAutoEncoder(nn.Module):
    cfg_key: str = "E"
    use_bn: bool = False
    reduction: int = 8
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    channels: int = 128
    encoder_reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = VGGStage(
            VGG_CFGS[self.cfg_key],
            use_bn=self.use_bn,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="features",
        )(x, train)
        if self.encoder_reduction != self.reduction:
            x = resize_bilinear(x, self.encoder_reduction / self.reduction)
        # reg head: plain convs with bias, no BN (reference encoder_decoder/vgg.py:21-26)
        x = ConvBNAct(256, (3, 3), use_bias=True, dtype=self.dtype, name="reg0")(x, train)
        x = ConvBNAct(128, (3, 3), use_bias=True, dtype=self.dtype, name="reg1")(x, train)
        return x


_VGG_KEYS = {"vgg11": "A", "vgg13": "B", "vgg16": "D", "vgg19": "E"}


def make_vgg(name: str, reduction: int, dtype=jnp.float32, axis_name=None):
    """Factory for vgg{11,13,16,19}[_bn][_ae] backbone modules."""
    base = name
    ae = base.endswith("_ae")
    if ae:
        base = base[: -len("_ae")]
    bn = base.endswith("_bn")
    if bn:
        base = base[: -len("_bn")]
    if base not in _VGG_KEYS:
        raise ValueError(f"unknown VGG variant {name!r}")
    cls = VGGAutoEncoder if ae else VGGEncoder
    return cls(
        cfg_key=_VGG_KEYS[base],
        use_bn=bn,
        reduction=reduction,
        dtype=dtype,
        axis_name=axis_name,
    )
