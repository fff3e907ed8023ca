"""Pretrained-weight loading: converter placement + full CLI path.

Covers the driver wiring the reference gets from its download-at-import
machinery (reference models/clip/_clip/prepare.py:43-95,
models/encoder/vit.py:16-22): ``--pretrained`` on the trainer CLI must
leave the converted weights bit-identical in the training state.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from reference_loader import load_reference, randomize_  # noqa: E402

from clip_ebc_tpu.models import convert as C  # noqa: E402
from clip_ebc_tpu.models import get_model  # noqa: E402
from clip_ebc_tpu.models.pretrained import apply_pretrained  # noqa: E402

BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, float("inf"))]
ANCHORS = [0.0, 1.0, 3.1]


def _leaves(tree, prefix=""):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaves(v, f"{prefix}{k}/")
        else:
            yield f"{prefix}{k}", v


def _synthetic_torchvision_resnet18_sd(rng):
    """Hand-shaped torchvision resnet18 state dict (no torchvision in env)."""
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32)
        )

    sd["conv1.weight"] = t(64, 3, 7, 7)
    bn("bn1", 64)
    inp = 64
    for li, planes in enumerate((64, 128, 256, 512), start=1):
        for bi in range(2):
            p = f"layer{li}.{bi}"
            cin = inp if bi == 0 else planes
            sd[f"{p}.conv1.weight"] = t(planes, cin, 3, 3)
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = t(planes, planes, 3, 3)
            bn(f"{p}.bn2", planes)
            if bi == 0 and cin != planes:
                sd[f"{p}.downsample.0.weight"] = t(planes, cin, 1, 1)
                bn(f"{p}.downsample.1", planes)
        inp = planes
    return sd


def test_apply_pretrained_torchvision_resnet_into_resnet_ae(rng):
    sd = _synthetic_torchvision_resnet18_sd(rng)
    model = get_model("resnet18_ae", 64, 8, bins=BINS, anchor_points=ANCHORS)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = apply_pretrained(model, dict(variables), sd)

    # spot-check stem + a downsample conv land bit-identically
    np.testing.assert_array_equal(
        np.asarray(out["params"]["backbone"]["encoder"]["Conv_0"]["kernel"]),
        C.conv_kernel(sd["conv1.weight"]),
    )
    np.testing.assert_array_equal(
        np.asarray(
            out["batch_stats"]["backbone"]["encoder"]["_TVBasicBlock_2"]
            ["BatchNorm_2"]["BatchNorm_0"]["mean"]
        ),
        sd["layer2.0.downsample.1.running_mean"].numpy(),
    )
    # decoder/head stay fresh; forward still runs
    d = model.apply(out, jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(d)).all()


def test_apply_pretrained_truncated_vgg16_into_csrnet(rng):
    """CSRNet's front-end is VGG16 through conv4_3 — a full torchvision
    VGG16 checkpoint must load with the tail convs dropped (reference
    encoder_decoder/csrnet.py:11-12)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
    sd = {}
    idx, cin = 0, 3
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.normal(size=(v, cin, 3, 3)).astype(np.float32)
        )
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.normal(size=(v,)).astype(np.float32)
        )
        idx += 2  # conv + relu
        cin = v

    model = get_model("csrnet", 64, 8, bins=BINS, anchor_points=ANCHORS)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = apply_pretrained(model, dict(variables), sd)
    feats = out["params"]["backbone"]["features"]
    assert "ConvBNAct_9" in feats and "ConvBNAct_10" not in feats
    np.testing.assert_array_equal(
        np.asarray(feats["ConvBNAct_0"]["Conv_0"]["kernel"]),
        C.conv_kernel(sd["features.0.weight"]),
    )


def test_apply_pretrained_rejects_clip_into_cnn(rng):
    model = get_model("vgg11", 64, 8, bins=BINS, anchor_points=ANCHORS)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    sd = {"visual.conv1.weight": torch.zeros(8, 3, 4, 4)}
    with pytest.raises(ValueError, match="clip_"):
        apply_pretrained(model, dict(variables), sd)


def _make_crowd_dir(root, n=4, hw=(96, 128)):
    for split in ("train", "val"):
        os.makedirs(f"{root}/shb/{split}/images", exist_ok=True)
        os.makedirs(f"{root}/shb/{split}/labels", exist_ok=True)
        for i in range(1, n + 1):
            r = np.random.default_rng(i)
            Image.fromarray(
                r.integers(0, 255, (*hw, 3)).astype(np.uint8)
            ).save(f"{root}/shb/{split}/images/{i}.jpg")
            np.save(
                f"{root}/shb/{split}/labels/{i}.npy",
                r.uniform(0, [hw[1], hw[0]], size=(5, 2)).astype(np.float32),
            )


def test_trainer_cli_pretrained_bitmatch(tmp_path, monkeypatch):
    """--pretrained pushes a reference-trained vgg11_ae Classifier through
    the full trainer CLI (parse -> model -> loader -> init -> load ->
    checkpoint); with the epoch body stubbed out, the converted weights
    must land bit-identically in the saved checkpoint."""
    from clip_ebc_tpu.training import Trainer

    monkeypatch.setattr(
        Trainer, "train_epoch",
        lambda self, state, loader, epoch: (state, {"loss": 0.0}),
    )
    ns = load_reference()
    from clip_ebc_tpu.config import get_bins_and_anchors

    # the CLI derives bins from the config table; the checkpoint's head
    # must match that width
    cli_bins, cli_anchors = get_bins_and_anchors(8, 4, "shb", "fine", "average")
    backbone = ns.ed_vgg.VGG(ns.utils.make_vgg_layers(ns.utils.vgg_cfgs["A"]), reduction=8)
    ref = ns.model.Classifier(backbone, bins=cli_bins, anchor_points=cli_anchors)
    randomize_(ref, seed=7)
    ckpt_pt = tmp_path / "ref_classifier.pth"
    torch.save(ref.state_dict(), str(ckpt_pt))

    data_root = tmp_path / "data"
    ckpt_dir = tmp_path / "ckpt"
    _make_crowd_dir(str(data_root), n=8)  # batch of 8: 8-device test mesh

    from clip_ebc_tpu.cli.trainer import main

    main([
        "--model", "vgg11_ae", "--dataset", "shb",
        "--input_size", "64", "--reduction", "8", "--truncation", "4",
        "--count_loss", "mae", "--batch_size", "8", "--num_workers", "1",
        "--total_epochs", "1", "--save_freq", "1", "--eval_start", "99",
        "--data_root", str(data_root), "--ckpt_dir", str(ckpt_dir),
        "--pretrained", str(ckpt_pt), "--eval_disable_size_check",
    ])

    # restore the saved state and compare against the converter output
    model = get_model("vgg11_ae", 64, 8, bins=cli_bins, anchor_points=cli_anchors)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    from clip_ebc_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(ckpt_dir))
    restored = mgr.restore_weights_from_state(
        os.path.join(str(ckpt_dir), "latest"),
        {"params": template["params"], "batch_stats": {}},
    )
    conv_params, _ = C.convert_reference_classifier(dict(ref.state_dict()))
    got = dict(_leaves(restored["params"]))
    for path, want in _leaves(conv_params):
        np.testing.assert_array_equal(
            np.asarray(got[path], np.float32), np.asarray(want, np.float32),
            err_msg=path,
        )


def test_clip_pretrained_requires_real_bpe_vocab(rng):
    """Loading a pretrained CLIP text tower with the byte-fallback
    tokenizer active must FAIL unless explicitly overridden — byte
    token ids are meaningless to the pretrained text embedding space
    (deployment prerequisite: $CLIP_BPE_VOCAB)."""
    from tests.reference_loader import load_reference

    ns = load_reference()
    clip_bins = [(0.0, 0.0), (1.0, 1.0), (2.0, float("inf"))]
    clip_anchors = [0.0, 1.0, 2.5]
    ref = ns.clip_model._clip_ebc(
        backbone="vit_b_16", bins=clip_bins, anchor_points=clip_anchors,
        input_size=224, reduction=8, num_vpt=4, deep_vpt=True, vpt_drop=0.0,
        prompt_type="word",
    )
    model = get_model(
        "clip_vit_b_16", 224, 8, bins=clip_bins, anchor_points=clip_anchors,
        num_vpt=4, prompt_type="word",
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    with pytest.raises(ValueError, match="BPE"):
        apply_pretrained(model, dict(variables), dict(ref.state_dict()))
    # explicit override keeps working (synthetic-weight tests)
    out = apply_pretrained(model, dict(variables), dict(ref.state_dict()),
                           allow_byte_tokenizer=True)
    assert "params" in out
