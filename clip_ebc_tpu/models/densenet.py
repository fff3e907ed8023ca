"""DenseNet features-only backbone (NHWC Flax).

The reference reaches DenseNet through its timm escape hatch
(reference models/encoder/timm_models.py:17-39): ``features_only`` with
``out_indices=[-1]`` taps the post-norm 1024-channel feature map, and for
``reduction <= 16`` removes transition3's avg-pool
(``encoder.features_transition3.pool = nn.Identity()``, reference
timm_models.py:34-36), halving the native 32x reduction to 16x.

Dense layers are BN->ReLU->1x1(bottleneck)->BN->ReLU->3x3(growth) with
channel concatenation; transitions are BN->ReLU->1x1(half)->avgpool2.
Concatenation along the channel (minor) axis is layout-free on TPU NHWC.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, resize_bilinear

# variant: (growth_rate, block_config, stem_features)
_CONFIGS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
}
_BN_SIZE = 4  # bottleneck width multiplier (torch DenseNet default)


def _final_channels(variant: str) -> int:
    growth, blocks, ch = _CONFIGS[variant]
    for i, n in enumerate(blocks):
        ch += n * growth
        if i < len(blocks) - 1:
            ch //= 2
    return ch


class _DenseLayer(nn.Module):
    growth: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="bn1")(x, train)
        h = nn.relu(h)
        h = nn.Conv(_BN_SIZE * self.growth, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="bn2")(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseNetBackbone(nn.Module):
    """Features-only DenseNet with the reference's reduction semantics:
    native 32x; ``reduction <= 16`` drops transition3's pool (16x); final
    bilinear rescale covers any remaining mismatch like the reference's
    TIMMEncoder.forward (reference models/encoder/timm_models.py:46-50)."""

    variant: str = "densenet121"
    reduction: int = 32
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @property
    def channels(self) -> int:
        return _final_channels(self.variant)

    @property
    def encoder_reduction(self) -> int:
        return 16 if self.reduction <= 16 else 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        growth, blocks, stem = _CONFIGS[self.variant]
        x = nn.Conv(stem, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="stem")(x)
        x = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="stem_bn")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for bi, n in enumerate(blocks):
            for li in range(n):
                x = _DenseLayer(
                    growth, dtype=self.dtype, axis_name=self.axis_name,
                    name=f"block{bi + 1}_layer{li + 1}",
                )(x, train)
            if bi < len(blocks) - 1:
                x = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name=f"trans{bi + 1}_bn")(x, train)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False, dtype=self.dtype, name=f"trans{bi + 1}_conv")(x)
                if not (bi == 2 and self.reduction <= 16):  # reference timm_models.py:34-36
                    x = nn.avg_pool(x, (2, 2), (2, 2))
        x = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="final_bn")(x, train)
        x = nn.relu(x)
        if self.encoder_reduction != self.reduction:
            x = resize_bilinear(x, self.encoder_reduction / self.reduction)
        return x
