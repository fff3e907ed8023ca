"""CLIP text encoder (Flax).

Token embedding + positional embedding -> causal-masked pre-LN
transformer (QuickGELU) -> final LayerNorm -> EOT-token pooling through a
learned projection (reference models/clip/_clip/text_encoder.py:45-53).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..transformer import LayerNormF32, ResidualAttentionBlock, quick_gelu


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask (upper triangle = -inf)."""
    mask = jnp.full((length, length), -jnp.inf, dtype)
    return jnp.triu(mask, k=1)


class ClipTextEncoder(nn.Module):
    embed_dim: int
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    dtype: Any = jnp.float32
    attn_impl: Any = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(N, context_length) int tokens -> (N, embed_dim) features."""
        from ..transformer import sdpa_attention

        attn = self.attn_impl or sdpa_attention
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding", dtype=self.dtype)(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        mask = causal_mask(x.shape[1])[None, None]  # (1, 1, L, L) over heads
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                num_heads=self.heads,
                act=quick_gelu,
                ln_epsilon=1e-5,
                dtype=self.dtype,
                attn_impl=attn,
                name=f"resblock_{i}",
            )(x, mask)
        x = LayerNormF32(1e-5, name="ln_final")(x)
        # EOT pooling: the EOT token holds the largest id in each sequence
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot_idx]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        return pooled @ proj.astype(pooled.dtype)
