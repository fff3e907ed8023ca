"""PatchifyMatmul: reshape+matmul patch embedding must equal the
stride==kernel VALID conv it replaces, with the same param names/shapes so
converted checkpoints are unaffected (see models/transformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from clip_ebc_tpu.models.transformer import PatchifyMatmul


def test_patchify_matches_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    conv = nn.Conv(24, (16, 16), strides=(16, 16), padding="VALID")
    pm = PatchifyMatmul(24, 16, use_bias=True)
    v = conv.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(conv.apply(v, x)).reshape(2, 2 * 3, 24)
    got = np.asarray(pm.apply(v, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_patchify_no_bias_param_tree():
    x = jnp.zeros((1, 16, 16, 3))
    v = PatchifyMatmul(8, 16, use_bias=False).init(jax.random.PRNGKey(0), x)
    assert set(v["params"]) == {"kernel"}
    assert v["params"]["kernel"].shape == (16, 16, 3, 8)


def test_patchify_non_square_grid():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), jnp.float32)
    conv = nn.Conv(16, (32, 32), strides=(32, 32), padding="VALID")
    v = conv.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(conv.apply(v, x)).reshape(1, 2 * 3, 16)
    got = np.asarray(PatchifyMatmul(16, 32).apply(v, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
