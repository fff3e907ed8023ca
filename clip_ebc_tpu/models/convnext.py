"""ConvNeXt-style example backbone for the custom-backbone registry.

The reference reaches arbitrary third-party encoders through timm's
``features_only`` escape hatch (reference models/encoder/timm_models.py:42-54).
The TPU-native equivalent is ``register_backbone``: any Flax module obeying
the backbone contract can be trained through ``get_model`` by name. This
module is the shipped, tested demonstration of that contract — a small
ConvNeXt-flavored encoder (a model family the reference does NOT provide).

The backbone contract (see ``models/__init__.get_backbone``):

- constructor/factory signature ``factory(input_size, reduction, dtype,
  axis_name)`` — ``axis_name`` is the data-parallel mesh axis for
  cross-replica normalization (unused here: LayerNorm has no batch stats,
  which also makes this example multi-host-trivial);
- ``__call__(x, train=False)``: NHWC image -> NHWC feature map whose
  spatial stride is exactly ``reduction``;
- attributes ``channels`` (feature width, read by ``Classifier`` /
  ``Regressor`` heads) and ``encoder_reduction`` (native stride before any
  head-side resampling; equals ``reduction`` here).

TPU notes: 7x7 depthwise convs lower to cheap VPU ops; the 1x1
expand/project pair is a pure matmul pair on the MXU; LayerNorm runs in
fp32 for bf16 stability (same policy as the ViT towers).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class _ConvNeXtBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,),
            jnp.float32,
        )
        return x + (gamma * h.astype(jnp.float32)).astype(x.dtype)


class ConvNeXtBackbone(nn.Module):
    """Small ConvNeXt encoder: stem stride 4, then stride-2 downsample
    stages until the total stride equals ``reduction`` (8/16/32)."""

    reduction: int = 8
    depths: Sequence[int] = (2, 2, 4)
    dims: Sequence[int] = (48, 96, 192)
    dtype: Any = jnp.float32
    axis_name: Any = None  # no batch statistics — nothing to sync

    @property
    def channels(self) -> int:
        n_stages = {8: 2, 16: 3, 32: 4}[self.reduction]
        return self.dims[min(n_stages, len(self.dims)) - 1]

    @property
    def encoder_reduction(self) -> int:
        return self.reduction

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.reduction not in (8, 16, 32):
            raise ValueError(f"reduction must be 8/16/32, got {self.reduction}")
        n_stages = {8: 2, 16: 3, 32: 4}[self.reduction]
        x = nn.Conv(self.dims[0], (4, 4), strides=4, dtype=self.dtype, name="stem")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x)
        x = x.astype(self.dtype)
        for s in range(n_stages):
            di = min(s, len(self.dims) - 1)
            if s > 0:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=jnp.float32, name=f"down_norm_{s}"
                )(x).astype(self.dtype)
                x = nn.Conv(
                    self.dims[di], (2, 2), strides=2, dtype=self.dtype,
                    name=f"down_{s}",
                )(x)
            for b in range(self.depths[min(di, len(self.depths) - 1)]):
                x = _ConvNeXtBlock(
                    self.dims[di], dtype=self.dtype, name=f"stage{s}_block{b}"
                )(x)
        return x


def _register() -> None:
    from . import register_backbone

    @register_backbone("convnext_nano")
    def make_convnext_nano(input_size, reduction, dtype, axis_name):
        return ConvNeXtBackbone(reduction=reduction, dtype=dtype, axis_name=axis_name)
