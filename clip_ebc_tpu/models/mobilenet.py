"""MobileNetV2 features-only backbone (NHWC Flax).

The reference reaches MobileNetV2 through its timm escape hatch
(reference models/encoder/timm_models.py:17-39): ``features_only`` with
``out_indices=[-1]`` taps the 320-channel output of the last inverted
residual stage (before the 1280-wide classifier conv), and for
``reduction <= 16`` performs stride surgery on the first depthwise conv
of the 160-channel stage (``encoder.blocks[5][0].conv_dw.stride=(1,1)``,
reference timm_models.py:30-32), halving the native 32x reduction to 16x.

Here the stride choice is made at construction time — no surgery — and
the depthwise convs use ``feature_group_count`` so XLA lowers them to
TPU-native grouped convolutions.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, resize_bilinear

# (expand_ratio t, out channels c, repeats n, first stride s) — the
# MobileNetV2 paper table 2 / torchvision inverted_residual_setting.
_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),  # stage index 5: stride-1 surgery target
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    """expand 1x1 -> depthwise 3x3 (stride) -> project 1x1, ReLU6 on the
    first two, residual when stride 1 and channels match."""

    features: int
    strides: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        out = x
        if self.expand_ratio != 1:
            out = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(out)
            out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="expand_bn")(out, train)
            out = jax.nn.relu6(out)
        out = nn.Conv(
            hidden, (3, 3), strides=self.strides, padding=1,
            feature_group_count=hidden, use_bias=False, dtype=self.dtype, name="dw",
        )(out)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="dw_bn")(out, train)
        out = jax.nn.relu6(out)
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="project")(out)
        out = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="project_bn")(out, train)
        if self.strides == 1 and in_ch == self.features:
            out = out + x
        return out


class MobileNetV2Backbone(nn.Module):
    """Features-only MobileNetV2 with the reference's reduction semantics:
    native 32x; ``reduction <= 16`` puts the 160-channel stage at stride 1
    (16x); a final bilinear rescale covers any remaining mismatch, exactly
    like the reference's TIMMEncoder.forward
    (reference models/encoder/timm_models.py:46-50)."""

    reduction: int = 32
    width_mult: float = 1.0
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @property
    def channels(self) -> int:
        return max(int(320 * self.width_mult), 8)

    @property
    def encoder_reduction(self) -> int:
        return 16 if self.reduction <= 16 else 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def c(ch):  # width multiplier, rounded to multiples of 8 like torchvision
            ch = ch * self.width_mult
            return max(int(ch + 4) // 8 * 8, 8) if self.width_mult != 1.0 else int(ch)

        x = nn.Conv(c(32), (3, 3), strides=2, padding=1, use_bias=False, dtype=self.dtype, name="stem")(x)
        x = BatchNorm(dtype=self.dtype, axis_name=self.axis_name, name="stem_bn")(x, train)
        x = jax.nn.relu6(x)
        for si, (t, ch, n, s) in enumerate(_STAGES):
            if si == 5 and self.reduction <= 16:
                s = 1  # reference timm_models.py:30-32 stride surgery
            for bi in range(n):
                x = InvertedResidual(
                    c(ch),
                    strides=s if bi == 0 else 1,
                    expand_ratio=t,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"stage{si}_{bi}",
                )(x, train)
        if self.encoder_reduction != self.reduction:
            x = resize_bilinear(x, self.encoder_reduction / self.reduction)
        return x
