import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from clip_ebc_tpu.ops.interpolate import torch_bicubic_resize


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((14, 14), (28, 28)), ((14, 14), (7, 7)), ((14, 14), (20, 11)), ((5, 9), (13, 4))],
)
def test_torch_bicubic_parity(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(*in_hw, 3)).astype(np.float32)
    ours = np.asarray(torch_bicubic_resize(jnp.asarray(x), out_hw))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None],
            size=out_hw, mode="bicubic", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_identity_passthrough():
    x = jnp.ones((4, 4, 2))
    assert torch_bicubic_resize(x, (4, 4)) is x


def test_pos_embed_interpolation_uses_torch_kernel():
    from clip_ebc_tpu.models.transformer import interpolate_pos_embed

    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(size=(1 + 14 * 14, 8)), jnp.float32)
    out = interpolate_pos_embed(pos, (14, 14), (28, 28))
    assert out.shape == (1 + 28 * 28, 8)
    ref = (
        F.interpolate(
            torch.from_numpy(np.array(pos[1:]).reshape(14, 14, 8)).permute(2, 0, 1)[None],
            size=(28, 28), mode="bicubic", align_corners=False,
        )[0].permute(1, 2, 0).reshape(28 * 28, 8).numpy()
    )
    np.testing.assert_allclose(np.asarray(out[1:]), ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pos[0]))
