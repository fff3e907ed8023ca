import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.models import get_model

BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, float("inf"))]
ANCHORS = [0.0, 1.0, 2.0, 3.0, 4.3]


def small_clip_vit(reduction=16, **kw):
    return get_model(
        "clip_vit_b_16", input_size=32, reduction=reduction,
        bins=BINS, anchor_points=ANCHORS, num_vpt=4, **kw,
    )


def test_tokenizer_fallback_roundtrip():
    from clip_ebc_tpu.models.clip.tokenizer import ByteFallbackTokenizer, tokenize

    tok = ByteFallbackTokenizer()
    out = tokenize(["There are five people.", "hi"], tokenizer=tok)
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot_token
    # EOT holds the max id -> argmax pooling lands on it
    assert out[0].max() == tok.eot_token
    assert (out[1] == 0).sum() > 70  # padded


def test_tokenizer_bpe_with_tiny_vocab(tmp_path):
    """Exercise real BPE machinery with a miniature merge table."""
    from clip_ebc_tpu.models.clip.tokenizer import ClipTokenizer

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("#version\nt h\nth e</w>\np e\npe o\npeo p\npeop l\npeopl e</w>\n")
    tok = ClipTokenizer(str(vocab))
    ids = tok.encode("the people")
    assert tok.decode(ids).strip() == "the people"
    # 'the' fully merges into one token
    assert len(tok.encode("the")) == 1


def test_clip_vit_ebc_shapes_and_vpt():
    model = small_clip_vit()
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    # deep VPT: stacked (depth, num_vpt, width)
    assert params["image_encoder"]["vpt"].shape == (12, 4, 768)
    (logits, density), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 2, 2, 5)
    assert density.shape == (2, 2, 2)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 2, 2)


def test_clip_vit_shallow_vpt():
    model = get_model(
        "clip_vit_b_16", input_size=32, reduction=16, bins=BINS,
        anchor_points=ANCHORS, num_vpt=3, deep_vpt=False,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    assert variables["params"]["image_encoder"]["vpt"].shape == (1, 3, 768)
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 2, 2)


def test_clip_vit_reduction8_upsamples():
    model = small_clip_vit(reduction=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 4, 4)


def test_clip_resnet50_ebc():
    model = get_model(
        "clip_resnet50", input_size=64, reduction=32, bins=BINS, anchor_points=ANCHORS
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    (logits, density), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (1, 2, 2, 5)
    # reduction<=16 -> layer4 stride 1
    model16 = get_model(
        "clip_resnet50", input_size=64, reduction=16, bins=BINS, anchor_points=ANCHORS
    )
    v16 = model16.init(jax.random.PRNGKey(0), x, train=True)
    out = model16.apply(v16, x, train=False)
    assert out.shape == (1, 4, 4)


def test_frozen_predicates():
    model = small_clip_vit()
    pred = model.frozen_param_predicate
    assert pred(("image_encoder", "resblock_0", "attn", "in_proj", "kernel"))
    assert pred(("text_encoder", "resblock_0", "mlp_fc", "kernel"))
    assert not pred(("image_encoder", "vpt"))
    assert not pred(("image_decoder", "BasicBlock_0", "ConvBNAct_0", "Conv_0", "kernel"))
    assert not pred(("projection", "kernel"))
    assert not pred(("logit_scale",))

    rn = get_model(
        "clip_resnet50", input_size=64, reduction=32, bins=BINS, anchor_points=ANCHORS
    )
    assert rn.frozen_param_predicate(("text_encoder", "token_embedding", "embedding"))
    assert not rn.frozen_param_predicate(("image_encoder", "layer1_0", "conv1", "kernel"))


def test_clip_density_bounded_by_anchors():
    model = small_clip_vit()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=True)
    out = np.asarray(model.apply(variables, x, train=False))
    assert out.min() >= 0 and out.max() <= max(ANCHORS)


def test_clip_vpt_training_updates_only_unfrozen():
    from clip_ebc_tpu.config import ExperimentConfig
    from clip_ebc_tpu.data.loader import Batch
    from clip_ebc_tpu.losses import make_loss_fn
    from clip_ebc_tpu.training import Trainer

    # cfg reduction=8/truncation=4 yields the same 5-bin table as BINS for
    # the loss; the model itself runs at reduction 16 (2x2 blocks at 32px).
    cfg = ExperimentConfig(
        dataset="shb", model="clip_vit_b_16", input_size=32, reduction=8,
        truncation=4, count_loss="mae", batch_size=8, lr=1e-2,
        warmup_epochs=1, warmup_lr=1e-2,
    ).normalize()
    model = get_model(
        cfg.model, cfg.input_size, 16, BINS, ANCHORS, num_vpt=2
    )
    trainer = Trainer(cfg, model, make_loss_fn(cfg))
    rng = np.random.default_rng(1)
    b = 8
    batch = Batch(
        images=rng.normal(size=(b, 32, 32, 3)).astype(np.float32),
        points=np.zeros((b, 4, 2), np.float32),
        point_mask=np.zeros((b, 4), bool),
        density=np.zeros((b, 2, 2), np.float32),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)

    class L:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            yield batch

    state, metrics = trainer.train_epoch(state, L(), epoch=1)
    p1 = jax.tree_util.tree_map(np.asarray, state.params)
    # frozen: ViT trunk + text tower unchanged
    np.testing.assert_array_equal(
        p0["image_encoder"]["resblock_0"]["attn"]["in_proj"]["kernel"],
        p1["image_encoder"]["resblock_0"]["attn"]["in_proj"]["kernel"],
    )
    np.testing.assert_array_equal(
        p0["text_encoder"]["resblock_0"]["mlp_fc"]["kernel"],
        p1["text_encoder"]["resblock_0"]["mlp_fc"]["kernel"],
    )
    # trainable: VPT prompts, decoder, logit_scale move
    assert not np.array_equal(p0["image_encoder"]["vpt"], p1["image_encoder"]["vpt"])
    assert not np.allclose(p0["logit_scale"], p1["logit_scale"])


def test_joint_clip_model():
    from clip_ebc_tpu.models.clip import Clip
    from clip_ebc_tpu.models.clip.tokenizer import ByteFallbackTokenizer, tokenize

    model = Clip(backbone="vit_b_16", input_size=32)
    imgs = jnp.zeros((2, 32, 32, 3))
    toks = jnp.asarray(tokenize(["a photo", "a crowd"], tokenizer=ByteFallbackTokenizer()))
    variables = model.init(jax.random.PRNGKey(0), imgs, toks)
    li, lt = model.apply(variables, imgs, toks)
    assert li.shape == (2, 2) and lt.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-5)
    emb = model.apply(variables, imgs, method=model.encode_image)
    assert emb.shape == (2, 512)


def test_decoder_before_upsample_variant():
    model = get_model(
        "clip_vit_b_16", input_size=32, reduction=8, bins=BINS,
        anchor_points=ANCHORS, num_vpt=2, decoder_before_upsample=True,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 4, 4)  # same output grid as the reference ordering


def test_clip_vit_l_14_336px_builds_and_runs():
    """Reference supports ViT-L/14@336px (reference models/clip/__init__.py:27);
    all downstream configs existed — this guards the factory whitelist."""
    model = get_model(
        "clip_vit_l_14_336px", input_size=28, reduction=14, bins=BINS,
        anchor_points=ANCHORS, num_vpt=2,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)), train=True)
    # ViT-L: 24 layers, width 1024, patch 14
    assert variables["params"]["image_encoder"]["vpt"].shape == (24, 2, 1024)
    out = model.apply(variables, jnp.zeros((1, 28, 28, 3)), train=False)
    assert out.shape == (1, 2, 2)
