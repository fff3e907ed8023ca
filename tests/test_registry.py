import jax
import jax.numpy as jnp
import numpy as np
import torch
import pytest

from clip_ebc_tpu.models import get_model, register_backbone
from clip_ebc_tpu.models.convert import detect_clip_arch


def test_register_custom_backbone():
    from flax import linen as nn

    class Tiny(nn.Module):
        reduction: int = 8
        channels: int = 16
        encoder_reduction: int = 8
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(16, (3, 3), strides=8, padding=1, dtype=self.dtype)(x)
            return x

    @register_backbone("tinynet")
    def make_tiny(input_size, reduction, dtype, axis_name):
        return Tiny(reduction=reduction, dtype=dtype)

    bins = [(0.0, 0.0), (1.0, float("inf"))]
    model = get_model("tinynet", input_size=32, reduction=8, bins=bins, anchor_points=[0.0, 1.3])
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    out = model.apply(v, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 4, 4)


def _fake_vit_sd(width=768, patch=16, layers=12, grid=14):
    sd = {
        "visual.conv1.weight": torch.zeros(width, 3, patch, patch),
        "visual.class_embedding": torch.zeros(width),
        "visual.positional_embedding": torch.zeros(grid * grid + 1, width),
    }
    for i in range(layers):
        sd[f"visual.transformer.resblocks.{i}.ln_1.weight"] = torch.zeros(width)
    return sd


def test_detect_clip_arch_vit():
    assert detect_clip_arch(_fake_vit_sd()) == "vit_b_16"
    assert detect_clip_arch(_fake_vit_sd(patch=32)) == "vit_b_32"
    assert detect_clip_arch(_fake_vit_sd(width=1024, patch=14, layers=24, grid=16)) == "vit_l_14"
    assert detect_clip_arch(_fake_vit_sd(width=1024, patch=14, layers=24, grid=24)) == "vit_l_14_336px"


def test_detect_clip_arch_resnet():
    sd = {"visual.conv1.weight": torch.zeros(32, 3, 3, 3)}
    for li, n in zip((1, 2, 3, 4), (3, 4, 6, 3)):
        for b in range(n):
            sd[f"visual.layer{li}.{b}.conv1.weight"] = torch.zeros(1)
    assert detect_clip_arch(sd) == "resnet50"


def test_detect_clip_arch_rejects_garbage():
    with pytest.raises(ValueError):
        detect_clip_arch({"foo": torch.zeros(1)})


def test_plain_resnet_backbones_by_name():
    """Plain (non-AE) ResNets route through get_backbone with the
    stride-1-layer4 rule (reference models/encoder/timm_models.py:20-39)."""
    import jax
    import jax.numpy as jnp

    from clip_ebc_tpu.models import get_model

    bins = [(0.0, 0.0), (1.0, float("inf"))]
    anchors = [0.0, 2.0]
    m8 = get_model("resnet18", 64, 8, bins=bins, anchor_points=anchors)
    v = m8.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = m8.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 8, 8)  # encoder at 16 (stride-1 layer4), up to 8

    m32 = get_model("resnet18", 64, 32, bins=bins, anchor_points=anchors)
    v32 = m32.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out32 = m32.apply(v32, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out32.shape == (1, 2, 2)

    # torchvision checkpoints land under backbone/encoder like the AE path
    assert "encoder" in v["params"]["backbone"]
