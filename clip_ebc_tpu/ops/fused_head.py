"""Pallas fused EBC head (inference path).

Fuses the CLIP-EBC blockwise head — L2-normalize image features, cosine
similarity against the (pre-normalized) text embeddings, logit scaling,
softmax over bins, anchor-point expectation — into one VMEM pass
(reference models/clip/model.py:200-212 runs these as separate torch ops).
Per feature block the kernel reads C floats and writes 1, instead of
round-tripping an (N, K) logits tensor through HBM.

Used for ``train=False`` only: the training path needs the logits tensor
anyway for the cross-entropy term, so there is nothing to save.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(feat_ref, text_ref, scale_ref, anchors_ref, out_ref, *, k_valid: int):
    f = feat_ref[...].astype(jnp.float32)  # (block_n, C)
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    f = f / jnp.maximum(norm, 1e-12)
    t = text_ref[...].astype(jnp.float32)  # (Kp, C), rows pre-normalized
    logits = jax.lax.dot_general(
        f, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale_ref[0]  # (block_n, Kp)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < k_valid, logits, NEG_INF)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    density = jnp.sum(p * anchors_ref[...], axis=1, keepdims=True) / jnp.sum(
        p, axis=1, keepdims=True
    )
    out_ref[...] = density


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def fused_ebc_head(
    features: jnp.ndarray,  # (N, C) image features (unnormalized)
    text_features: jnp.ndarray,  # (K, C) text features (unnormalized)
    logit_scale: jnp.ndarray,  # scalar, already exp()'d
    anchor_points: jnp.ndarray,  # (K,)
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns the (N,) per-block expected counts."""
    n, c = features.shape
    k = text_features.shape[0]
    kp = max(_round_up(k, 128), 128)
    np_ = _round_up(n, block_n)

    t = text_features.astype(jnp.float32)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    t = jnp.pad(t, ((0, kp - k), (0, 0)))
    anchors = jnp.pad(anchor_points.astype(jnp.float32), (0, kp - k)).reshape(1, kp)
    feats = jnp.pad(features, ((0, np_ - n), (0, 0)))
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, k_valid=k),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec((kp, c), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
        interpret=interpret,
    )(feats, t, scale, anchors)
    return out[:n, 0]


def ebc_head_reference(features, text_features, logit_scale, anchor_points):
    """XLA reference implementation (same math, separate ops)."""
    f = features.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    t = text_features.astype(jnp.float32)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    logits = logit_scale * f @ t.T
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(p * anchor_points, axis=-1)
