"""DACE loss: distribution-aware cross-entropy over count bins + count loss.

Semantics follow reference losses/dace_loss.py: the block-summed target
density is binned into a class map (later bins overwrite earlier ones on
overlap, reference dace_loss.py:42-47), per-block CE is summed over the
map and averaged over the batch, and a weighted count loss (MAE / MSE /
DMCount) is added.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .dmcount import DMCountConfig, dmcount_loss


def bin_class_map(
    density: jnp.ndarray, bins: Sequence[Tuple[float, float]]
) -> jnp.ndarray:
    """Map per-block counts to bin indices: inclusive [low, high] masks with
    later bins taking precedence (reference dace_loss.py:42-47)."""
    classes = jnp.zeros(density.shape, jnp.int32)
    for idx, (low, high) in enumerate(bins):
        hi = jnp.asarray(jnp.inf if math.isinf(high) else high, jnp.float32)
        mask = (density >= low) & (density <= hi)
        classes = jnp.where(mask, idx, classes)
    return classes


def cross_entropy_sum_mean(logits: jnp.ndarray, classes: jnp.ndarray) -> jnp.ndarray:
    """-log p[class], summed over the spatial map, averaged over batch
    (reference dace_loss.py:55). logits: (B, H, W, N)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, classes[..., None], axis=-1)[..., 0]
    return (-picked).sum(axis=(1, 2)).mean()


def dace_loss(
    pred_logits: jnp.ndarray,  # (B, H, W, N)
    pred_density: jnp.ndarray,  # (B, H, W)
    target_density: jnp.ndarray,  # (B, H, W) block-summed
    points: jnp.ndarray,  # (B, P, 2)
    point_mask: jnp.ndarray,  # (B, P)
    bins: Sequence[Tuple[float, float]],
    weight_count_loss: float = 1.0,
    count_loss: str = "mae",
    dm_cfg: Optional[DMCountConfig] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    if pred_density.shape != target_density.shape:
        raise ValueError(
            f"pred/target density shape mismatch: {pred_density.shape} vs "
            f"{target_density.shape}"
        )
    count_loss = count_loss.lower()
    if count_loss not in ("mae", "mse", "dmcount"):
        raise ValueError(f"count_loss must be mae|mse|dmcount, got {count_loss}")

    target_density = target_density.astype(jnp.float32)
    pred_density = pred_density.astype(jnp.float32)

    classes = bin_class_map(target_density, bins)
    ce = cross_entropy_sum_mean(pred_logits, classes)

    if count_loss == "dmcount":
        if dm_cfg is None:
            raise ValueError("dm_cfg is required when count_loss='dmcount'")
        cl, info = dmcount_loss(pred_density, target_density, points, point_mask, dm_cfg)
        info["ce_loss"] = jax.lax.stop_gradient(ce)
    else:
        diff = pred_density - target_density
        per_image = (
            jnp.abs(diff) if count_loss == "mae" else diff * diff
        ).sum(axis=(1, 2))
        cl = per_image.mean()
        info = {
            "ce_loss": jax.lax.stop_gradient(ce),
            f"{count_loss}_loss": jax.lax.stop_gradient(cl),
        }

    loss = ce + weight_count_loss * cl
    info["loss"] = jax.lax.stop_gradient(loss)
    return loss, info
