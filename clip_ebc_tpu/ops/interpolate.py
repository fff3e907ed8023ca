"""Torch-parity bicubic resize.

``jax.image.resize('bicubic')`` uses the Keys kernel with a=-0.5 (PIL's
choice); torch's ``F.interpolate(mode='bicubic')`` uses a=-0.75 with
border-replicate sampling. CLIP-EBC interpolates ViT positional
embeddings with the torch kernel (reference _clip/image_encoder.py:183-198,
models/encoder/vit.py:350-415), so converted checkpoints evaluated at
off-size inputs need this exact kernel for count parity.

Static shapes: tap indices/weights are numpy constants folded into the
jaxpr, so the resize is two gather+weighted-sum contractions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _cubic_taps(in_size: int, out_size: int, a: float = -0.75):
    """Per-output-pixel 4-tap source indices and weights (half-pixel
    centers, border-replicated), as numpy constants."""
    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(x)
    t = x - x0

    def kernel(s):
        s = np.abs(s)
        return np.where(
            s <= 1.0,
            ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0,
            np.where(s < 2.0, a * (((s - 5.0) * s + 8.0) * s - 4.0), 0.0),
        )

    offsets = np.array([-1.0, 0.0, 1.0, 2.0])
    idx = (x0[:, None] + offsets[None, :]).astype(np.int64)
    w = kernel(t[:, None] - offsets[None, :])
    idx = np.clip(idx, 0, in_size - 1)
    return idx, w.astype(np.float32)


def torch_bicubic_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Resize (H, W, C) -> (size[0], size[1], C) with torch's bicubic
    semantics (a=-0.75, align_corners=False)."""
    h, w, _ = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    orig_dtype = x.dtype
    out = x.astype(jnp.float32)
    if h != oh:
        idx, wt = _cubic_taps(h, oh)
        out = jnp.einsum("otwc,ot->owc", out[jnp.asarray(idx)], jnp.asarray(wt))
    if w != ow:
        idx, wt = _cubic_taps(w, ow)
        gathered = out[:, jnp.asarray(idx)]  # (oh, ow, 4, c)
        out = jnp.einsum("hotc,ot->hoc", gathered, jnp.asarray(wt))
    return out.astype(orig_dtype)
