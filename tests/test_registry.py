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


def test_registered_convnext_trains_a_step():
    """The shipped ConvNeXt registry example (models/convnext.py) must
    train end-to-end through get_model + Trainer — the full demonstration
    of the custom-backbone escape hatch (reference
    models/encoder/timm_models.py:42-54 equivalent)."""
    from clip_ebc_tpu.config import ExperimentConfig
    from clip_ebc_tpu.data.loader import Batch
    from clip_ebc_tpu.losses import make_loss_fn
    from clip_ebc_tpu.training import Trainer

    cfg = ExperimentConfig(
        dataset="shb", model="convnext_nano", input_size=32, reduction=8,
        truncation=4, count_loss="mae", batch_size=8, lr=1e-3,
        warmup_epochs=2, warmup_lr=1e-4,
    ).normalize()
    model = get_model(cfg.model, cfg.input_size, cfg.reduction, cfg.bins, cfg.bin_anchors)
    trainer = Trainer(cfg, model, make_loss_fn(cfg))

    rng = np.random.default_rng(0)
    b = 8
    density = np.zeros((b, 4, 4), np.float32)
    points = np.zeros((b, 8, 2), np.float32)
    mask = np.zeros((b, 8), bool)
    for i in range(b):
        n = int(rng.integers(1, 5))
        pts = rng.uniform(0, 32, (n, 2)).astype(np.float32)
        points[i, :n], mask[i, :n] = pts, True
        for x, y in pts:
            density[i, int(y) // 8, int(x) // 8] += 1.0
    batch = Batch(
        images=rng.normal(size=(b, 32, 32, 3)).astype(np.float32),
        points=points, point_mask=mask, density=density,
    )
    from clip_ebc_tpu.parallel.mesh import shard_batch

    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    b_dev = shard_batch(trainer.mesh, batch)
    lr = jnp.asarray(1e-3, jnp.float32)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    losses = []
    for _ in range(3):
        state, info = trainer._step(state, b_dev, lr, trainer.text_features(state))
        losses.append(float(info["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it actually learns
    assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(state.params)[0]), np.asarray(p0))
