"""CSRNet and CANNet crowd-counting backbones.

- CSRNet: VGG16 front-end (through conv4_3, reduction 8) + dilated-conv
  back-end (reference models/encoder_decoder/csrnet.py:11-54).
- CANNet: CSRNet + multi-scale ContextualModule attention between front-
  and back-end (reference models/encoder_decoder/cannet.py:13-86).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import VGGStage, resize_bilinear, resize_to, kaiming_normal_out

EPS = 1e-6

# VGG16 through conv4_3: three pools -> reduction 8
ENCODER_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)
DECODER_CFG = (512, 512, 512, 256, 128, 64)


class ContextualModule(nn.Module):
    """Scale-aware context: adaptive-avg-pool pyramids re-upsampled and
    gated by sigmoid contrast weights (reference cannet.py:13-45)."""

    features: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        weight_net = nn.Conv(c, (1, 1), dtype=self.dtype, kernel_init=kaiming_normal_out, name="weight_net")
        scale_feats = []
        weights = []
        for size in self.sizes:
            # adaptive average pool to (size, size): equal-split windows when
            # divisible; use jax.image average via reshape when possible,
            # else fall back to resize (areas differ only on ragged edges).
            pooled = _adaptive_avg_pool(x, size)
            pooled = nn.Conv(
                c, (1, 1), use_bias=False, dtype=self.dtype,
                kernel_init=kaiming_normal_out, name=f"scale_{size}",
            )(pooled)
            up = resize_to(pooled, (h, w))
            scale_feats.append(up)
            weights.append(nn.sigmoid(weight_net(x - up)))
        num = sum(s * wgt for s, wgt in zip(scale_feats, weights))
        den = sum(weights) + EPS
        fused = num / den
        out = jnp.concatenate([fused, x], axis=-1)
        out = nn.Conv(self.features, (1, 1), dtype=self.dtype, kernel_init=kaiming_normal_out, name="bottleneck")(out)
        return nn.relu(out)


def _adaptive_avg_pool(x: jnp.ndarray, size: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    if h % size == 0 and w % size == 0:
        x = x.reshape(b, size, h // size, size, w // size, c)
        return x.mean(axis=(2, 4))
    # torch adaptive pooling with ragged windows: approximate via resize-avg
    return jax.image.resize(x, (b, size, size, c), method="linear").astype(x.dtype)


class CSRNet(nn.Module):
    use_bn: bool = False
    reduction: int = 8
    use_context: bool = False  # True -> CANNet
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    channels: int = 64
    encoder_reduction: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = VGGStage(ENCODER_CFG, use_bn=self.use_bn, dtype=self.dtype, axis_name=self.axis_name, name="features")(x, train)
        if self.use_context:
            x = ContextualModule(512, self.sizes, dtype=self.dtype, name="context")(x)
        if self.encoder_reduction != self.reduction:
            x = resize_bilinear(x, self.encoder_reduction / self.reduction)
        x = VGGStage(DECODER_CFG, use_bn=self.use_bn, dilation=2, dtype=self.dtype, axis_name=self.axis_name, name="backend")(x, train)
        return x
