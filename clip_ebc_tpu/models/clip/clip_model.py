"""Joint CLIP model: pooled image tower + text tower + cosine logits.

CLIP-EBC itself only ever uses the towers separately (features-only image
grid vs text prompts); this joint module is the counterpart of the
reference's full CLIP class (reference models/clip/_clip/model.py), useful
for checkpoint validation (zero-shot similarity sanity checks after
conversion) and as a standalone encoder.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .image_encoder import RESNET_CONFIGS, VIT_CONFIGS, ClipModifiedResNet, ClipViT
from .model import TEXT_CONFIGS
from .text_encoder import ClipTextEncoder


class Clip(nn.Module):
    backbone: str = "vit_b_16"
    input_size: int = 224
    dtype: Any = jnp.float32

    @property
    def embed_dim(self) -> int:
        if self.backbone in VIT_CONFIGS:
            return VIT_CONFIGS[self.backbone][4]
        return RESNET_CONFIGS[self.backbone][2]

    def setup(self):
        if self.backbone in VIT_CONFIGS:
            self.visual = ClipViT(
                variant=self.backbone, input_size=self.input_size,
                features_only=False, dtype=self.dtype,
            )
        else:
            self.visual = ClipModifiedResNet(
                variant=self.backbone, features_only=False,
                input_size=self.input_size, dtype=self.dtype,
            )
        width, heads = TEXT_CONFIGS[self.backbone]
        self.text = ClipTextEncoder(
            embed_dim=self.embed_dim, width=width, heads=heads, layers=12,
            dtype=self.dtype,
        )
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(math.log(1 / 0.07), jnp.float32)
        )

    def encode_image(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.visual(images, train)

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.text(tokens)

    def __call__(self, images: jnp.ndarray, tokens: jnp.ndarray, train: bool = False):
        """Returns (logits_per_image, logits_per_text)."""
        img = self.encode_image(images, train).astype(jnp.float32)
        txt = self.encode_text(tokens).astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True).clip(1e-12)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True).clip(1e-12)
        logits = jnp.exp(self.logit_scale) * img @ txt.T
        return logits, logits.T
