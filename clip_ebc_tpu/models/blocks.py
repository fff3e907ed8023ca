"""Shared Flax building blocks (NHWC, fp32 params, configurable compute dtype).

TPU-native counterparts of the reference's torch building blocks
(reference models/utils.py): VGG stage builder with "M"/"U" tokens,
decoder BasicBlock/Bottleneck (channel-matching 1x1 downsample), bilinear
upsampling. All convs are NHWC so XLA can tile them directly onto the MXU;
BatchNorm supports a cross-replica ``axis_name`` for SyncBN-equivalent
statistics under shard_map (reference converts to SyncBatchNorm at
reference trainer.py:147).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Kaiming-normal fan-out (ReLU gain), the reference's decoder/head conv init
# (reference models/utils.py:366-371).
kaiming_normal_out = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)
# Linear layers: normal(std=0.01) (reference models/utils.py:376-379).
head_dense_init = jax.nn.initializers.normal(0.01)


def resize_bilinear(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Bilinear resize of NHWC by a scale factor (half-pixel centers,
    matching torch ``align_corners=False``)."""
    b, h, w, c = x.shape
    nh, nw = int(h * scale), int(w * scale)
    if (nh, nw) == (h, w):
        return x
    return jax.image.resize(x, (b, nh, nw, c), method="bilinear").astype(x.dtype)


def resize_to(x: jnp.ndarray, size: Tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    return jax.image.resize(x, (b, size[0], size[1], c), method=method).astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics (momentum 0.1 => flax momentum 0.9)
    and optional cross-replica stat sync via ``axis_name``."""

    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )(x)


class ConvBNAct(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    use_bn: bool = False
    act: bool = True
    use_bias: Optional[bool] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    kernel_init: Any = kaiming_normal_out
    conv_cls: Any = None  # e.g. ops.quant.Int8Conv; None = nn.Conv

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kh, kw = self.kernel_size
        pad = ((kh - 1) // 2 * self.dilation, (kw - 1) // 2 * self.dilation)
        use_bias = (not self.use_bn) if self.use_bias is None else self.use_bias
        conv_cls = nn.Conv if self.conv_cls is None else self.conv_cls
        x = conv_cls(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=(pad, pad) if kh > 1 or kw > 1 else "VALID",
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="Conv_0",  # stable scope: checkpoints are conv_cls-agnostic
        )(x)
        if self.use_bn:
            x = BatchNorm(dtype=self.dtype, axis_name=self.axis_name)(x, train)
        if self.act:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """Decoder residual block (reference models/utils.py:254-304):
    3x3 -> BN -> ReLU -> 3x3 -> BN, plus 1x1+BN shortcut when channels change."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    conv_cls: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, conv_cls=self.conv_cls)
        out = ConvBNAct(self.features, (3, 3), use_bn=True, **kw)(x, train)
        out = ConvBNAct(self.features, (3, 3), use_bn=True, act=False, **kw)(out, train)
        if x.shape[-1] != self.features:
            identity = ConvBNAct(self.features, (1, 1), use_bn=True, act=False, **kw)(x, train)
        return nn.relu(out + identity)


class BottleneckBlock(nn.Module):
    """Decoder bottleneck (reference models/utils.py:306-360): 1x1 -> 3x3 ->
    1x1(features*expansion), 1x1+BN shortcut on channel change.

    Note the reference quirk: the shortcut projects to ``features`` (not
    ``features*expansion``) and triggers on ``in != features``; with
    expansion=1 (how the decoders use it) both conventions coincide, and
    that is the only configuration we support.
    """

    features: int
    expansion: int = 1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    conv_cls: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.expansion != 1:
            raise NotImplementedError("decoder bottlenecks use expansion=1")
        identity = x
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, conv_cls=self.conv_cls)
        out = ConvBNAct(self.features, (1, 1), use_bn=True, **kw)(x, train)
        out = ConvBNAct(self.features, (3, 3), use_bn=True, **kw)(out, train)
        out = ConvBNAct(self.features * self.expansion, (1, 1), use_bn=True, act=False, **kw)(out, train)
        if x.shape[-1] != self.features * self.expansion:
            identity = ConvBNAct(self.features * self.expansion, (1, 1), use_bn=True, act=False, **kw)(x, train)
        return nn.relu(out + identity)


class VGGStage(nn.Module):
    """VGG feature stack from a token config: ints are 3x3 conv+ReLU,
    "M" is 2x2 max-pool stride 2, "U" is 2x bilinear upsample
    (reference models/utils.py:405-419)."""

    cfg: Sequence[Union[int, str]]
    use_bn: bool = False
    dilation: int = 1
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif v == "U":
                x = resize_bilinear(x, 2.0)
            else:
                x = ConvBNAct(
                    int(v),
                    (3, 3),
                    dilation=self.dilation,
                    use_bn=self.use_bn,
                    use_bias=True,  # torchvision VGG convs keep bias even with BN
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                )(x, train)
        return x


class ResNetStage(nn.Module):
    """Decoder stack from a token config: ints are residual blocks, "U" is
    2x bilinear upsample (reference models/utils.py:422-444)."""

    cfg: Sequence[Union[int, str]]
    block: str = "basic"  # "basic" | "bottleneck"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    conv_cls: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for v in self.cfg:
            if v == "U":
                x = resize_bilinear(x, 2.0)
            elif self.block == "basic":
                x = BasicBlock(int(v), dtype=self.dtype, axis_name=self.axis_name, conv_cls=self.conv_cls)(x, train)
            else:
                x = BottleneckBlock(int(v), dtype=self.dtype, axis_name=self.axis_name, conv_cls=self.conv_cls)(x, train)
        return x


# VGG configurations A/B/D/E (reference models/utils.py:27-32). Note only
# four "M" tokens: the trailing fifth torchvision pool is dropped, so the
# native reduction is 16.
VGG_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512],
}
