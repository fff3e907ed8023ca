"""Prediction heads: blockwise bin classifier and density regressor.

- ``Classifier``: backbone -> 1x1 conv(s) -> per-block bin logits; expected
  count per block = softmax(logits) . anchor_points
  (reference models/model.py:37-75).
- ``Regressor``: backbone -> 1x1 conv -> ReLU -> density
  (reference models/model.py:17-34).

Outputs are NHWC: logits ``(B, H, W, N)``, density ``(B, H, W)``. The
softmax-expectation is computed in fp32 regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .blocks import kaiming_normal_out


def expectation_from_logits(
    logits: jnp.ndarray, anchor_points: jnp.ndarray
) -> jnp.ndarray:
    """softmax over the last axis . anchors, in fp32: (..., N) -> (...)."""
    probs = nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.sum(probs * anchor_points.astype(jnp.float32), axis=-1)


class Classifier(nn.Module):
    backbone: nn.Module
    bins: Sequence[Tuple[float, float]]
    anchor_points: Sequence[float]
    dtype: Any = jnp.float32

    def setup(self):
        if len(self.bins) != len(self.anchor_points):
            raise ValueError(
                f"bins and anchor_points must have equal length, got "
                f"{len(self.bins)} and {len(self.anchor_points)}"
            )
        for (lo, hi), a in zip(self.bins, self.anchor_points):
            if not (lo <= a <= hi):
                raise ValueError(f"anchor {a} not within bin ({lo}, {hi})")
        n = len(self.bins)
        # 512-d bottleneck when the backbone is wide (reference models/model.py:55-62)
        if self.backbone.channels > 512:
            self.cls_hidden = nn.Conv(
                512, (1, 1), dtype=self.dtype, kernel_init=kaiming_normal_out
            )
            self.cls_out = nn.Conv(
                n, (1, 1), dtype=self.dtype, kernel_init=kaiming_normal_out
            )
        else:
            self.cls_hidden = None
            self.cls_out = nn.Conv(
                n, (1, 1), dtype=self.dtype, kernel_init=kaiming_normal_out
            )

    @property
    def reduction(self) -> int:
        return self.backbone.reduction

    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        x = self.backbone(x, train)
        if self.cls_hidden is not None:
            x = nn.relu(self.cls_hidden(x))
        logits = self.cls_out(x)  # (B, H, W, N)
        density = expectation_from_logits(
            logits, jnp.asarray(self.anchor_points, jnp.float32)
        )
        if train:
            return logits, density
        return density


class Regressor(nn.Module):
    backbone: nn.Module
    dtype: Any = jnp.float32

    @property
    def reduction(self) -> int:
        return self.backbone.reduction

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.backbone(x, train)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, kernel_init=kaiming_normal_out)(x)
        density = nn.relu(x.astype(jnp.float32))[..., 0]  # (B, H, W)
        if train:
            return None, density
        return density
