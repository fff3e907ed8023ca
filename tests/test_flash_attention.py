"""Flash attention kernel vs reference einsum attention (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.ops.flash_attention import _reference, flash_attention, flash_sdpa


def make_qkv(rng, b=2, h=3, l=197, dh=64):
    q = rng.normal(size=(b, h, l, dh)).astype(np.float32)
    k = rng.normal(size=(b, h, l, dh)).astype(np.float32)
    v = rng.normal(size=(b, h, l, dh)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_reference_unpadded():
    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng, l=256)
    out = flash_attention(q, k, v, None, False, 128, 128, True)
    ref = _reference(q, k, v, q.shape[-1] ** -0.5, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_reference_ragged_length():
    rng = np.random.default_rng(1)
    q, k, v = make_qkv(rng, l=197)  # ViT-B @224: 197 tokens, needs padding
    out = flash_attention(q, k, v, None, False, 128, 128, True)
    ref = _reference(q, k, v, q.shape[-1] ** -0.5, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_causal():
    rng = np.random.default_rng(2)
    q, k, v = make_qkv(rng, l=77, h=2)  # CLIP text: 77 tokens causal
    out = flash_attention(q, k, v, None, True, 128, 128, True)
    ref = _reference(q, k, v, q.shape[-1] ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_multiblock_online_softmax():
    rng = np.random.default_rng(3)
    q, k, v = make_qkv(rng, b=1, h=2, l=300, dh=64)  # crosses block boundaries
    out = flash_attention(q, k, v, None, False, 128, 128, True)
    ref = _reference(q, k, v, q.shape[-1] ** -0.5, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_causal_multiblock():
    rng = np.random.default_rng(4)
    q, k, v = make_qkv(rng, b=1, h=1, l=260, dh=64)
    out = flash_attention(q, k, v, None, True, 128, 128, True)
    ref = _reference(q, k, v, q.shape[-1] ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16():
    rng = np.random.default_rng(5)
    q, k, v = make_qkv(rng, l=128)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, None, False, 128, 128, True)
    ref = _reference(q, k, v, q.shape[-1] ** -0.5, False)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
    )


def test_flash_gradients_match_reference():
    rng = np.random.default_rng(6)
    q, k, v = make_qkv(rng, b=1, h=2, l=130, dh=64)

    def loss_flash(q_, k_, v_):
        return flash_attention(q_, k_, v_, None, False, 128, 128, True).sum()

    def loss_ref(q_, k_, v_):
        return _reference(q_, k_, v_, q.shape[-1] ** -0.5, False).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_flash_sdpa_adapter_in_mha():
    """MultiHeadAttention with flash_sdpa == with the einsum path."""
    from clip_ebc_tpu.models.transformer import MultiHeadAttention, sdpa_attention

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 197, 64)), jnp.float32)

    def flash_interp(q, k, v, mask):
        return flash_attention(q, k, v, None, mask is not None, 128, 128, True)

    ref_mod = MultiHeadAttention(num_heads=4, attn_impl=sdpa_attention)
    params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = ref_mod.apply({"params": params}, x)
    flash_mod = MultiHeadAttention(num_heads=4, attn_impl=flash_interp)
    out = flash_mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
