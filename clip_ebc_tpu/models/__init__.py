"""Model factory (reference models/__init__.py:10-44).

``get_model(name, ...)`` routes:
  - ``clip_*``            -> CLIP_EBC (zero-shot-style bin classifier)
  - bins/anchors given    -> Classifier(backbone)
  - otherwise             -> Regressor(backbone)
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from .csrnet import CSRNet
from .densenet import _CONFIGS as _DENSENET_CONFIGS
from .densenet import DenseNetBackbone
from .heads import Classifier, Regressor, expectation_from_logits
from .mobilenet import MobileNetV2Backbone
from .resnet import PlainResNetBackbone, ResNetAutoEncoder, ResNetEncoder
from .vgg import VGGAutoEncoder, VGGEncoder, make_vgg
from .vit import ViTEncoder, _VIT_CONFIGS

CLIP_BACKBONES = (
    "resnet50",
    "resnet50x4",
    "resnet50x16",
    "resnet50x64",
    "resnet101",
    "vit_b_16",
    "vit_b_32",
    "vit_l_14",
    "vit_l_14_336px",
)

_VGG_NAMES = tuple(
    f"vgg{n}{bn}{ae}" for n in (11, 13, 16, 19) for bn in ("", "_bn") for ae in ("", "_ae")
)
_RESNET_AE_NAMES = tuple(f"resnet{n}_ae" for n in (18, 34, 50, 101, 152))
_RESNET_NAMES = tuple(f"resnet{n}" for n in (18, 34, 50, 101, 152))

# Custom backbone registry — the TPU-native replacement for the reference's
# timm escape hatch (reference models/encoder/timm_models.py): any Flax
# module factory with the backbone contract (``__call__(x, train)`` NHWC ->
# NHWC features; ``channels``/``encoder_reduction`` attributes) can be
# registered and used by name through get_model.
_BACKBONE_REGISTRY = {}


def register_backbone(name: str):
    """Decorator: register ``factory(input_size, reduction, dtype, axis_name)``."""

    def wrap(factory):
        _BACKBONE_REGISTRY[name.lower()] = factory
        return factory

    return wrap


def get_backbone(
    name: str,
    input_size: int,
    reduction: int,
    dtype: Any = jnp.float32,
    axis_name: Optional[str] = None,
):
    name = name.lower()
    if name in _VGG_NAMES:
        return make_vgg(name, reduction=reduction, dtype=dtype, axis_name=axis_name)
    if name in _RESNET_AE_NAMES:
        return ResNetAutoEncoder(
            variant=name[: -len("_ae")], reduction=reduction, dtype=dtype, axis_name=axis_name
        )
    if name in _RESNET_NAMES:
        return PlainResNetBackbone(
            variant=name, reduction=reduction, dtype=dtype, axis_name=axis_name
        )
    if name in ("mobilenetv2", "mobilenet_v2"):
        return MobileNetV2Backbone(reduction=reduction, dtype=dtype, axis_name=axis_name)
    if name in _DENSENET_CONFIGS:
        return DenseNetBackbone(
            variant=name, reduction=reduction, dtype=dtype, axis_name=axis_name
        )
    if name in ("csrnet", "csrnet_bn", "cannet", "cannet_bn"):
        return CSRNet(
            use_bn=name.endswith("_bn"),
            reduction=reduction,
            use_context=name.startswith("cannet"),
            dtype=dtype,
            axis_name=axis_name,
        )
    if name in _VIT_CONFIGS:
        from .transformer import resolve_attn_impl, use_fused_qkv

        return ViTEncoder(
            variant=name, image_size=input_size, reduction=reduction, dtype=dtype,
            attn_impl=resolve_attn_impl("auto"), fused_qkv=use_fused_qkv("auto"),
        )
    if name in _BACKBONE_REGISTRY:
        return _BACKBONE_REGISTRY[name](
            input_size=input_size, reduction=reduction, dtype=dtype, axis_name=axis_name
        )
    raise ValueError(f"unknown backbone {name!r}")


def get_model(
    backbone: str,
    input_size: int,
    reduction: int,
    bins: Optional[Sequence[Tuple[float, float]]] = None,
    anchor_points: Optional[Sequence[float]] = None,
    dtype: Any = jnp.float32,
    axis_name: Optional[str] = None,
    **kwargs: Any,
):
    backbone = backbone.lower()
    if backbone.startswith("clip_"):
        name = backbone[len("clip_") :]
        if name not in CLIP_BACKBONES:
            raise ValueError(f"CLIP backbone must be one of {CLIP_BACKBONES}, got {name}")
        from .clip.model import build_clip_ebc
        return build_clip_ebc(
            backbone=name,
            bins=bins,
            anchor_points=anchor_points,
            reduction=reduction,
            input_size=input_size,
            dtype=dtype,
            axis_name=axis_name,
            **kwargs,
        )
    if bins is None and anchor_points is None:
        return Regressor(
            backbone=get_backbone(backbone, input_size, reduction, dtype, axis_name),
            dtype=dtype,
        )
    if bins is None or anchor_points is None:
        raise ValueError("bins and anchor_points must both be given or both be None")
    return Classifier(
        backbone=get_backbone(backbone, input_size, reduction, dtype, axis_name),
        bins=tuple(tuple(b) for b in bins),
        anchor_points=tuple(anchor_points),
        dtype=dtype,
    )


__all__ = [
    "get_model",
    "get_backbone",
    "register_backbone",
    "Classifier",
    "Regressor",
    "expectation_from_logits",
    "VGGEncoder",
    "VGGAutoEncoder",
    "ResNetEncoder",
    "ResNetAutoEncoder",
    "PlainResNetBackbone",
    "MobileNetV2Backbone",
    "DenseNetBackbone",
    "CSRNet",
    "ViTEncoder",
    "CLIP_BACKBONES",
]

# Shipped registry example: a ConvNeXt-style backbone (a family the
# reference lacks) registered through the same escape hatch users get —
# proof the contract works end-to-end (see models/convnext.py).
from .convnext import ConvNeXtBackbone  # noqa: E402
from .convnext import _register as _register_convnext  # noqa: E402

_register_convnext()
__all__.append("ConvNeXtBackbone")
