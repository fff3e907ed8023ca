"""Whole-model and loss parity against the reference implementation itself.

These tests import the reference's OWN modules (see reference_loader.py),
build the real reference compositions — vgg19_ae Classifier
(reference models/model.py:37-75 + encoder_decoder/vgg.py:13-41),
CLIP_EBC ViT-B/16 and ResNet50 (reference models/clip/model.py:191-217),
DACELoss/DMLoss (reference losses/) — copy their randomly-initialized
weights into our Flax models through the production converter path
(``apply_pretrained``), and assert the full forward/loss agrees.
Component parity (test_convert.py, test_clip_resnet_oracle.py) cannot
catch composition drift (upsample order, normalization, decoder wiring);
these can.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_loader import load_reference, randomize_  # noqa: E402

from clip_ebc_tpu.models import get_model  # noqa: E402
from clip_ebc_tpu.models.pretrained import apply_pretrained  # noqa: E402

BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, 3.0), (4.0, float("inf"))]
ANCHORS = [0.0, 1.0, 2.4, 5.1]

# The reference's format_count crashes on finite multi-value bins with word
# prompts (precedence bug, reference models/clip/utils.py:39 — documented in
# our prompts.py); fine-granularity configs only use single-value bins + an
# inf tail, so CLIP parity tests use that shape.
CLIP_BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, float("inf"))]
CLIP_ANCHORS = [0.0, 1.0, 2.0, 4.2]


def _nhwc(x: "torch.Tensor") -> jnp.ndarray:
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def _sync_tokens(ref_model, bins=None) -> None:
    """Make the reference model consume exactly our prompt tokens (the
    reference's format_count has a precedence bug we fixed; parity needs
    identical text inputs)."""
    from clip_ebc_tpu.models.clip.prompts import bin_prompts
    from clip_ebc_tpu.models.clip.tokenizer import tokenize

    toks = tokenize(list(bin_prompts(tuple(tuple(b) for b in (bins or BINS)), "word")))
    ref_model.text_prompts = torch.as_tensor(np.asarray(toks))


def test_vgg19_ae_classifier_full_model_parity():
    ns = load_reference()
    backbone = ns.ed_vgg.VGG(ns.utils.make_vgg_layers(ns.utils.vgg_cfgs["E"]), reduction=8)
    ref = ns.model.Classifier(backbone, bins=BINS, anchor_points=ANCHORS)
    randomize_(ref, seed=0)
    ref.eval()

    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref_density = ref(x)  # (2, 1, 8, 8)

    model = get_model("vgg19_ae", 64, 8, bins=BINS, anchor_points=ANCHORS)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = apply_pretrained(model, dict(variables), dict(ref.state_dict()),
                                 allow_byte_tokenizer=True)
    out = model.apply(variables, _nhwc(x), train=False)  # (2, 8, 8)

    np.testing.assert_allclose(
        np.asarray(out), ref_density.numpy()[:, 0], atol=5e-5, rtol=1e-4
    )


def test_clip_ebc_vit_b16_full_model_parity():
    ns = load_reference()
    ref = ns.clip_model._clip_ebc(
        backbone="vit_b_16", input_size=224, reduction=8,
        bins=CLIP_BINS, anchor_points=CLIP_ANCHORS,
        freeze_text_encoder=False,  # precomputed features would predate randomize_
        num_vpt=4, deep_vpt=True, vpt_drop=0.0, prompt_type="word",
    )
    randomize_(ref, seed=2)
    _sync_tokens(ref, CLIP_BINS)
    ref.eval()

    # 32x32 input: 2x2 patch grid exercises the 14->2 bicubic pos-embed
    # interpolation on both sides (reference _clip/image_encoder.py:183-198).
    x = torch.randn(1, 3, 32, 32, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        ref_density = ref(x)  # (1, 1, 4, 4)

    model = get_model(
        "clip_vit_b_16", 224, 8, bins=CLIP_BINS, anchor_points=CLIP_ANCHORS,
        num_vpt=4, deep_vpt=True, vpt_drop=0.0, prompt_type="word",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    variables = apply_pretrained(model, dict(variables), dict(ref.state_dict()),
                                 allow_byte_tokenizer=True)
    out = model.apply(variables, _nhwc(x), train=False)

    np.testing.assert_allclose(
        np.asarray(out), ref_density.numpy()[:, 0], atol=1e-4, rtol=1e-3
    )


def test_clip_ebc_resnet50_full_model_parity():
    ns = load_reference()
    ref = ns.clip_model._clip_ebc(
        backbone="resnet50", input_size=224, reduction=8,
        bins=CLIP_BINS, anchor_points=CLIP_ANCHORS,
        freeze_text_encoder=False, prompt_type="word",
    )
    randomize_(ref, seed=4)
    _sync_tokens(ref, CLIP_BINS)
    ref.eval()

    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        ref_density = ref(x)  # (1, 1, 8, 8)

    model = get_model(
        "clip_resnet50", 224, 8, bins=CLIP_BINS, anchor_points=CLIP_ANCHORS,
        prompt_type="word",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = apply_pretrained(model, dict(variables), dict(ref.state_dict()),
                                 allow_byte_tokenizer=True)
    out = model.apply(variables, _nhwc(x), train=False)

    np.testing.assert_allclose(
        np.asarray(out), ref_density.numpy()[:, 0], atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("count_loss", ["mae", "dmcount"])
def test_dace_loss_value_parity(count_loss, rng):
    """DACE (+DMCount) loss values match the reference's own loss modules
    on a fixed batch (reference losses/dace_loss.py:49-69, dm_loss.py:100-124)."""
    ns = load_reference()
    b, grid, n_bins, reduction = 3, 8, len(BINS), 8
    input_size = grid * reduction

    # integer block counts so binning is unambiguous
    counts = rng.integers(0, 5, size=(b, grid, grid)).astype(np.float32)
    logits = rng.normal(size=(b, grid, grid, n_bins)).astype(np.float32)
    pred_density = rng.uniform(0.0, 3.0, size=(b, grid, grid)).astype(np.float32)

    # points consistent with nothing in particular — DM path just needs them
    n_pts = [int(counts[i].sum()) for i in range(b)]
    pts = [
        rng.uniform(0, input_size, size=(n, 2)).astype(np.float32) for n in n_pts
    ]

    ref_loss_fn = ns.dace_loss.DACELoss(
        bins=BINS, reduction=reduction, weight_count_loss=1.0,
        count_loss=count_loss, input_size=input_size,
    )
    ref_loss, ref_info = ref_loss_fn(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(pred_density[:, None]),
        torch.from_numpy(counts[:, None]),
        [torch.from_numpy(p) for p in pts],
    )

    from clip_ebc_tpu.losses import DMCountConfig, dace_loss

    p_max = max(max(n_pts), 1)
    points = np.zeros((b, p_max, 2), np.float32)
    mask = np.zeros((b, p_max), bool)
    for i, p in enumerate(pts):
        points[i, : len(p)] = p
        mask[i, : len(p)] = True

    loss, info = dace_loss(
        jnp.asarray(logits), jnp.asarray(pred_density), jnp.asarray(counts),
        jnp.asarray(points), jnp.asarray(mask),
        bins=tuple(tuple(x) for x in BINS),
        weight_count_loss=1.0, count_loss=count_loss,
        dm_cfg=DMCountConfig(input_size=input_size, reduction=reduction),
    )

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-3)
    for k in ("ce_loss", "loss"):
        np.testing.assert_allclose(float(info[k]), float(ref_info[k]), rtol=2e-3)
    if count_loss == "dmcount":
        for k in ("ot_loss", "tv_loss", "count_loss"):
            np.testing.assert_allclose(
                float(info[k]), float(ref_info[k]), rtol=5e-3, atol=5e-4
            )
