import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_ebc_tpu.models import get_model


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    if train:
        out, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        return out
    return model.apply(variables, x, train=False)


BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, float("inf"))]
ANCHORS = [0.0, 1.0, 2.0, 3.0, 4.3]


def test_vgg19_ae_classifier_shapes():
    model = get_model("vgg19_ae", input_size=64, reduction=8, bins=BINS, anchor_points=ANCHORS)
    x = jnp.zeros((2, 64, 64, 3))
    logits, density = _init_and_apply(model, x, train=True)
    assert logits.shape == (2, 8, 8, 5)
    assert density.shape == (2, 8, 8)
    out = _init_and_apply(model, x, train=False)
    assert out.shape == (2, 8, 8)


def test_vgg16_bn_encoder_classifier():
    model = get_model("vgg16_bn", input_size=32, reduction=16, bins=BINS, anchor_points=ANCHORS)
    x = jnp.zeros((1, 32, 32, 3))
    out = _init_and_apply(model, x)
    assert out.shape == (1, 2, 2)


def test_regressor_nonnegative():
    model = get_model("vgg11_ae", input_size=32, reduction=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
    out = _init_and_apply(model, x)
    assert out.shape == (1, 4, 4)
    assert (np.asarray(out) >= 0).all()


def test_density_is_anchor_expectation():
    model = get_model("vgg11", input_size=32, reduction=16, bins=BINS, anchor_points=ANCHORS)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    logits, density = model.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    probs = jax.nn.softmax(logits, axis=-1)
    expected = (probs * jnp.asarray(ANCHORS)).sum(-1)
    np.testing.assert_allclose(np.asarray(density), np.asarray(expected), rtol=1e-5)
    # density per block bounded by anchor range
    assert density.min() >= 0 and density.max() <= max(ANCHORS)


def test_resnet_ae_reductions():
    for reduction, hw in [(32, 2), (16, 4), (8, 8)]:
        model = get_model("resnet18_ae", input_size=64, reduction=reduction, bins=BINS, anchor_points=ANCHORS)
        x = jnp.zeros((1, 64, 64, 3))
        out = _init_and_apply(model, x)
        assert out.shape == (1, hw, hw), reduction


def test_resnet50_ae_builds():
    model = get_model("resnet50_ae", input_size=64, reduction=32, bins=BINS, anchor_points=ANCHORS)
    out = _init_and_apply(model, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2, 2)


def test_csrnet_and_cannet():
    for name in ("csrnet", "cannet"):
        model = get_model(name, input_size=48, reduction=8, bins=BINS, anchor_points=ANCHORS)
        out = _init_and_apply(model, jnp.zeros((1, 48, 48, 3)))
        assert out.shape == (1, 6, 6), name


def test_vit_encoder_classifier():
    model = get_model("vit_b_16", input_size=32, reduction=16, bins=BINS, anchor_points=ANCHORS)
    x = jnp.zeros((1, 32, 32, 3))
    out = _init_and_apply(model, x)
    assert out.shape == (1, 2, 2)


def test_vit_pos_embed_interpolation_offsize():
    # image_size=32 pretraining grid, fed 48x48 -> 3x3 grid via interp
    model = get_model("vit_b_16", input_size=32, reduction=16, bins=BINS, anchor_points=ANCHORS)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    out = model.apply(variables, jnp.zeros((1, 48, 48, 3)), train=False)
    assert out.shape == (1, 3, 3)


def test_classifier_wide_backbone_gets_bottleneck():
    # resnet50_ae channels=128 (<512): single conv; vit_b_16 channels 768 > 512
    model = get_model("vit_b_16", input_size=32, reduction=16, bins=BINS, anchor_points=ANCHORS)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    params = variables["params"]
    assert "cls_hidden" in params  # bottleneck present


def test_factory_validation():
    with pytest.raises(ValueError):
        get_model("nosuchnet", input_size=32, reduction=8)
    with pytest.raises(ValueError):
        get_model("vgg19_ae", input_size=32, reduction=8, bins=BINS, anchor_points=None)
    with pytest.raises(ValueError):
        get_model("clip_nosuch", input_size=32, reduction=8, bins=BINS, anchor_points=ANCHORS)


def test_bf16_compute_dtype():
    model = get_model(
        "vgg11_ae", input_size=32, reduction=8, bins=BINS, anchor_points=ANCHORS,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    # params stay fp32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    out = model.apply(variables, x, train=False)
    # expectation head computes in fp32
    assert out.dtype == jnp.float32
