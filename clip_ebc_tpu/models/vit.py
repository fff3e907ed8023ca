"""Plain (torchvision-style) ViT feature encoders.

Classification head removed; output is the patch-feature grid, bilinearly
rescaled when ``reduction != patch_size`` (reference models/encoder/vit.py:
151-159, 313-314). Positional embeddings interpolate bicubically for
off-size inputs.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import resize_bilinear
from .transformer import (
    LayerNormF32,
    ResidualAttentionBlock,
    interpolate_pos_embed,
    sdpa_attention,
)

_VIT_CONFIGS = {
    # name: (patch, layers, heads, hidden, mlp_dim)
    "vit_b_16": (16, 12, 12, 768, 3072),
    "vit_b_32": (32, 12, 12, 768, 3072),
    "vit_l_16": (16, 24, 16, 1024, 4096),
    "vit_l_32": (32, 24, 16, 1024, 4096),
    "vit_h_14": (14, 32, 16, 1280, 5120),
}


class ViTEncoder(nn.Module):
    variant: str = "vit_b_16"
    image_size: int = 224  # pretraining grid; pos-embeds interp from here
    reduction: Optional[int] = None
    dtype: Any = jnp.float32
    attn_impl: Any = sdpa_attention
    fused_qkv: bool = False  # Pallas fused qkv attention (ops/fused_attention.py)

    @property
    def patch_size(self) -> int:
        return _VIT_CONFIGS[self.variant][0]

    @property
    def channels(self) -> int:
        return _VIT_CONFIGS[self.variant][3]

    @property
    def encoder_reduction(self) -> int:
        return self.patch_size

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        patch, layers, heads, hidden, mlp_dim = _VIT_CONFIGS[self.variant]
        b, h, w, _ = x.shape
        if h % patch or w % patch:
            raise ValueError(f"input {h}x{w} not divisible by patch {patch}")
        gh, gw = h // patch, w // patch

        from .transformer import PatchifyMatmul

        x = PatchifyMatmul(hidden, patch, dtype=self.dtype, name="patchify")(x)

        cls_tok = self.param(
            "class_token", nn.initializers.zeros, (1, 1, hidden), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(x.dtype), (b, 1, hidden)), x], axis=1
        )

        base_grid = self.image_size // patch
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (base_grid * base_grid + 1, hidden),
            jnp.float32,
        )
        pos = interpolate_pos_embed(pos, (base_grid, base_grid), (gh, gw))
        x = x + pos[None].astype(x.dtype)

        n_real = x.shape[1]
        kv_len = None
        if self.fused_qkv:
            lp = -(-n_real // 128) * 128
            if lp != n_real:
                x = jnp.pad(x, ((0, 0), (0, lp - n_real), (0, 0)))
                kv_len = n_real

        mlp_ratio = mlp_dim / hidden
        for i in range(layers):
            x = ResidualAttentionBlock(
                num_heads=heads,
                mlp_ratio=mlp_ratio,
                act=nn.gelu,
                ln_epsilon=1e-6,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                fused_qkv=self.fused_qkv,
                kv_len=kv_len,
                name=f"block_{i}",
            )(x)
        x = LayerNormF32(1e-6, name="ln_final")(x)

        x = x[:, 1 : 1 + gh * gw, :].reshape(b, gh, gw, hidden)
        red = self.reduction or patch
        if red != patch:
            x = resize_bilinear(x, patch / red)
        return x
