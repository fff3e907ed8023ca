"""Fused qkv-attention kernel (ops/fused_attention.py).

Oracle is the einsum reference on the same (B, L, 3D) layout; the packed
head-pair zero-masking must be exact, so tolerances are bf16 rounding only.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.ops.fused_attention import (
    _forward,
    _reference,
    fused_qkv_attention,
    supports,
)


def _qkv(b, l, d, dtype=jnp.float32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, l, 3 * d)), dtype
    )


def test_matches_reference_exact_len():
    b, l, h, d = 3, 256, 12, 768
    qkv = _qkv(b, l, d)
    out = _forward(qkv, h, l, (d // h) ** -0.5, block_b=2, interpret=True)
    ref = _reference(qkv, h, l, (d // h) ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_matches_reference_padded_rows():
    """kv_len < L: padded rows must not affect real tokens."""
    b, l, kv, h, d = 2, 256, 229, 12, 768
    qkv = _qkv(b, l, d, seed=1)
    out = _forward(qkv, h, kv, (d // h) ** -0.5, block_b=2, interpret=True)
    ref = _reference(qkv[:, :kv], h, kv, (d // h) ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out[:, :kv]), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_padding_rows_are_ignored_as_keys():
    """Corrupting padded rows must not change real-token outputs."""
    b, l, kv, h, d = 1, 128, 100, 8, 512
    qkv = np.asarray(_qkv(b, l, d, seed=2))
    qkv2 = qkv.copy()
    qkv2[:, kv:] = 1e3  # garbage in the pad region
    sm = (d // h) ** -0.5
    o1 = _forward(jnp.asarray(qkv), h, kv, sm, block_b=1, interpret=True)
    o2 = _forward(jnp.asarray(qkv2), h, kv, sm, block_b=1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(o1[:, :kv]), np.asarray(o2[:, :kv]), rtol=1e-6, atol=1e-6
    )


def test_bf16_close():
    b, l, h, d = 2, 128, 12, 768
    qkv = _qkv(b, l, d, jnp.bfloat16, seed=3)
    out = _forward(qkv, h, l, (d // h) ** -0.5, block_b=2, interpret=True)
    ref = _reference(qkv.astype(jnp.float32), h, l, (d // h) ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_unsupported_shapes_fall_back():
    assert supports(12, 64) and supports(8, 64)
    assert not supports(11, 64) and not supports(12, 96)
    b, l, h, d = 1, 64, 3, 96 * 3  # dh=96 -> reference path
    qkv = _qkv(b, l, d, seed=4)
    out = fused_qkv_attention(qkv, h, l, (d // h) ** -0.5)
    ref = _reference(qkv, h, l, (d // h) ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_gradients_flow():
    """custom_vjp backward (reference recompute) gives finite grads matching
    the einsum path."""
    b, l, h, d = 1, 64, 8, 512
    qkv = _qkv(b, l, d, seed=5)
    sm = (d // h) ** -0.5

    g1 = jax.grad(
        lambda x: fused_qkv_attention(x, h, l, sm, 4, True).sum()
    )(qkv)
    g2 = jax.grad(lambda x: _reference(x, h, l, sm).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_vpt", [0, 32])
def test_clip_vit_padded_trunk_matches_sdpa(num_vpt):
    """The fused/padded trunk (fused_qkv=True, kernel forced to interpret
    mode so it runs on CPU) must equal the unpadded sdpa trunk with the
    same params."""
    from clip_ebc_tpu.models.clip.image_encoder import ClipViT

    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 96, 96, 3)), jnp.float32
    )
    base = ClipViT(variant="vit_b_16", input_size=96, num_vpt=num_vpt)
    v = base.init(jax.random.PRNGKey(0), x, False)
    ref = base.apply(v, x, False)

    # monkeypatch the kernel entry to interpret mode so fused_qkv=True runs
    # on CPU through the same code path as TPU
    import clip_ebc_tpu.ops.fused_attention as FA
    import functools

    orig = FA.fused_qkv_attention
    try:
        FA.fused_qkv_attention = functools.partial(orig, interpret=True)
        fused = ClipViT(variant="vit_b_16", input_size=96, num_vpt=num_vpt,
                        fused_qkv=True)
        got = fused.apply(v, x, False)
    finally:
        FA.fused_qkv_attention = orig

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
