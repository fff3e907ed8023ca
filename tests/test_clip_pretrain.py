"""Synthetic count-supervised CLIP pretraining (training/clip_pretrain.py).

Covers the VERDICT r3 item 3 machinery on CPU at tiny shapes: the
pretrain step runs and optimizes, the exported prepared artifact overlays
a ClipEBC via the standard --pretrained path, and the pos-embed
interpolation bridges pretrain/fine-tune input sizes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ebc_tpu.models import get_model
from clip_ebc_tpu.models.pretrained import apply_pretrained
from clip_ebc_tpu.training.clip_pretrain import (
    PretrainConfig,
    clip_to_ebc_overlay,
    make_pretrain_dataset,
    pretrain_clip,
    save_pretrained,
)

BINS = ((0.0, 0.0), (1.0, 1.0), (2.0, float("inf")))


@pytest.fixture(scope="module")
def tiny_pretrain():
    cfg = PretrainConfig(
        backbone="vit_b_16", input_size=32, bins=BINS, steps=4,
        batch_size=4, dataset_size=8, lr=1e-4, warmup_steps=1,
        dtype="float32", seed=0,
    )
    variables, info = pretrain_clip(cfg)
    return cfg, variables, info


def test_pretrain_dataset_bin_balanced():
    cfg = PretrainConfig(input_size=32, bins=BINS, dataset_size=30)
    images, labels = make_pretrain_dataset(cfg, np.random.default_rng(0))
    assert images.shape == (30, 32, 32, 3) and images.dtype == np.uint8
    assert set(np.unique(labels)) <= {0, 1, 2}
    assert len(np.unique(labels)) == 3  # every bin sampled


def test_pretrain_step_runs_and_is_finite(tiny_pretrain):
    _, variables, info = tiny_pretrain
    assert np.isfinite(info["first_loss"]) and np.isfinite(info["last_loss"])
    assert 0.0 <= info["last_acc"] <= 1.0
    # both towers + logit_scale present and finite
    p = variables["params"]
    assert "visual" in p and "text" in p and "logit_scale" in p
    for leaf in jax.tree_util.tree_leaves(p):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pretrained_artifact_overlays_clip_ebc(tiny_pretrain, tmp_path):
    cfg, variables, _ = tiny_pretrain
    npz = str(tmp_path / "clip_pretrain.npz")
    save_pretrained(npz, variables, cfg.backbone)

    model = get_model(
        "clip_vit_b_16", cfg.input_size, 8, bins=list(BINS),
        anchor_points=[0.0, 1.0, 2.5], num_vpt=2, prompt_type="word",
    )
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3)), train=False)
    # byte tokenizer is self-consistent for a self-pretrained tower
    out = apply_pretrained(model, dict(init), npz, allow_byte_tokenizer=True)

    # tower weights actually landed (not fresh init)
    got = np.asarray(
        out["params"]["image_encoder"]["resblock_0"]["attn"]["out_proj"]["kernel"])
    want = np.asarray(
        variables["params"]["visual"]["resblock_0"]["attn"]["out_proj"]["kernel"])
    np.testing.assert_array_equal(got, want)
    got_t = np.asarray(
        out["params"]["text_encoder"]["token_embedding"]["embedding"])
    want_t = np.asarray(
        variables["params"]["text"]["token_embedding"]["embedding"])
    np.testing.assert_array_equal(got_t, want_t)

    # and the EBC forward runs with the loaded towers
    density = model.apply(out, jnp.zeros((1, 32, 32, 3)), train=False)
    assert np.isfinite(np.asarray(density)).all()


def test_overlay_bridges_input_sizes_via_canonical_pos_embed(tiny_pretrain):
    """Pretrain at 32px, fine-tune at 64px: both modules keep the CANONICAL
    (224/16)^2+1 positional embedding and interpolate per forward, so the
    overlay transfers unchanged across input sizes."""
    cfg, variables, _ = tiny_pretrain
    overlay, _ = clip_to_ebc_overlay(variables)
    pos = overlay["image_encoder"]["positional_embedding"]
    assert pos.shape[0] == 1 + (224 // 16) ** 2
    model = get_model(
        "clip_vit_b_16", 64, 8, bins=list(BINS),
        anchor_points=[0.0, 1.0, 2.5], num_vpt=2,
    )
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)), train=False)
    from clip_ebc_tpu.models import convert as C

    merged = C.merge_params(dict(init["params"]), overlay)
    variables = {"params": merged}
    if "batch_stats" in init:  # the EBC decoder's BN stats stay fresh
        variables["batch_stats"] = init["batch_stats"]
    density = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(density)).all()


def test_text_spread_penalty_separates_bin_embeddings(tiny_pretrain):
    """The off-diagonal text-cosine penalty (PretrainConfig.text_spread) is
    the synthetic stand-in for OpenAI-scale contrastive spread: a few
    hundred synthetic steps otherwise leave the count-prompt embeddings
    nearly collinear (measured off-diag cos ~0.99 in r3), which starves the
    downstream frozen-text cosine head. Check the penalty is reported and
    actually reduces the off-diagonal cosine vs the spread-free run."""
    cfg0, _, info = tiny_pretrain  # text_spread=1.0 default
    assert "text_offdiag_cos2" in info
    cfg = PretrainConfig(
        backbone="vit_b_16", input_size=32, bins=BINS, steps=8,
        batch_size=4, dataset_size=8, lr=1e-3, warmup_steps=1,
        dtype="float32", seed=0, text_spread=5.0,
    )
    _, info_spread = pretrain_clip(cfg)
    cfg_off = PretrainConfig(
        backbone="vit_b_16", input_size=32, bins=BINS, steps=8,
        batch_size=4, dataset_size=8, lr=1e-3, warmup_steps=1,
        dtype="float32", seed=0, text_spread=0.0,
    )
    _, info_off = pretrain_clip(cfg_off)
    assert np.isfinite(info_spread["text_offdiag_cos2"])
    assert info_spread["text_offdiag_cos2"] < info_off["text_offdiag_cos2"]
