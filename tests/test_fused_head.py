import numpy as np
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.ops.fused_head import ebc_head_reference, fused_ebc_head


def test_fused_head_matches_reference():
    rng = np.random.default_rng(0)
    n, c, k = 700, 512, 5  # non-multiple n exercises padding
    feats = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(k, c)), jnp.float32)
    scale = jnp.asarray(np.exp(np.log(1 / 0.07)), jnp.float32)
    anchors = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.3], jnp.float32)
    out = fused_ebc_head(feats, text, scale, anchors, block_n=256, interpret=True)
    ref = ebc_head_reference(feats, text, scale, anchors)
    assert out.shape == (n,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fused_head_bf16_features():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(256, 768)), jnp.bfloat16)
    text = jnp.asarray(rng.normal(size=(17, 768)), jnp.float32)
    scale = jnp.asarray(10.0, jnp.float32)
    anchors = jnp.asarray(np.arange(17), jnp.float32)
    out = fused_ebc_head(feats, text, scale, anchors, block_n=256, interpret=True)
    ref = ebc_head_reference(feats.astype(jnp.float32), text, scale, anchors)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_fused_head_density_bounds():
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    anchors = jnp.asarray([0.0, 1.0, 2.0, 5.0], jnp.float32)
    out = np.asarray(fused_ebc_head(feats, text, jnp.asarray(5.0), anchors, interpret=True))
    assert (out >= 0).all() and (out <= 5.0).all()
