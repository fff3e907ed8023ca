"""MobileNetV2 / DenseNet backbones: factory reduction semantics + weight
conversion parity vs torch composites built to torchvision's exact module
layout (the reference reaches both families through timm,
reference models/encoder/timm_models.py:17-39)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clip_ebc_tpu.models import get_model  # noqa: E402
from clip_ebc_tpu.models import convert as C  # noqa: E402
from clip_ebc_tpu.models.densenet import DenseNetBackbone  # noqa: E402
from clip_ebc_tpu.models.mobilenet import MobileNetV2Backbone, _STAGES  # noqa: E402

BINS = [(0.0, 0.0), (1.0, float("inf"))]
ANCHORS = [0.0, 2.0]


# ---------------------------------------------------------------------------
# factory semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["mobilenetv2", "densenet121"])
def test_backbone_reduction_semantics(name):
    """reduction<=16 halves the native 32x via stride surgery; a bilinear
    rescale covers the rest (reference timm_models.py:20-50)."""
    for reduction, hw in ((32, 2), (16, 4), (8, 8)):
        m = get_model(name, 64, reduction, bins=BINS, anchor_points=ANCHORS)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        out = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
        assert out.shape == (1, hw, hw), (name, reduction)


def test_backbone_channels():
    assert MobileNetV2Backbone().channels == 320
    assert DenseNetBackbone(variant="densenet121").channels == 1024
    assert DenseNetBackbone(variant="densenet161").channels == 2208
    assert DenseNetBackbone(variant="densenet169").channels == 1664
    assert DenseNetBackbone(variant="densenet201").channels == 1920


# ---------------------------------------------------------------------------
# torch composites with torchvision's exact state-dict naming
# ---------------------------------------------------------------------------


class TorchInvertedResidual(tnn.Module):
    """torchvision.models.mobilenetv2.InvertedResidual layout: the `conv`
    Sequential is [expand ConvBNReLU6][dw ConvBNReLU6][project][BN] (the
    expand stage is omitted when expand_ratio == 1)."""

    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = inp * expand_ratio
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(
                tnn.Sequential(
                    tnn.Conv2d(inp, hidden, 1, bias=False),
                    tnn.BatchNorm2d(hidden),
                    tnn.ReLU6(inplace=True),
                )
            )
        layers.extend(
            [
                tnn.Sequential(
                    tnn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden, bias=False),
                    tnn.BatchNorm2d(hidden),
                    tnn.ReLU6(inplace=True),
                ),
                tnn.Conv2d(hidden, oup, 1, bias=False),
                tnn.BatchNorm2d(oup),
            ]
        )
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def build_torch_mobilenet_v2():
    feats = [
        tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32), tnn.ReLU6()
        )
    ]
    inp = 32
    for t, c, n, s in _STAGES:
        for bi in range(n):
            feats.append(TorchInvertedResidual(inp, c, s if bi == 0 else 1, t))
            inp = c
    model = tnn.Module()
    model.features = tnn.Sequential(*feats)
    return model


class TorchDenseLayer(tnn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(in_ch)
        self.conv1 = tnn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        h = self.conv1(TF.relu(self.norm1(x)))
        h = self.conv2(TF.relu(self.norm2(h)))
        return torch.cat([x, h], 1)


def build_torch_densenet121():
    growth, blocks, ch = 32, (6, 12, 24, 16), 64
    features = tnn.Module()
    features.conv0 = tnn.Conv2d(3, ch, 7, 2, 3, bias=False)
    features.norm0 = tnn.BatchNorm2d(ch)
    for bi, n in enumerate(blocks, start=1):
        block = tnn.Module()
        for li in range(1, n + 1):
            block.add_module(f"denselayer{li}", TorchDenseLayer(ch, growth))
            ch += growth
        features.add_module(f"denseblock{bi}", block)
        if bi < len(blocks):
            trans = tnn.Module()
            trans.norm = tnn.BatchNorm2d(ch)
            trans.conv = tnn.Conv2d(ch, ch // 2, 1, bias=False)
            features.add_module(f"transition{bi}", trans)
            ch //= 2
    features.norm5 = tnn.BatchNorm2d(ch)
    model = tnn.Module()
    model.features = features
    return model


def torch_densenet_forward(model, x, keep_trans3_pool=True):
    f = model.features
    x = TF.max_pool2d(TF.relu(f.norm0(f.conv0(x))), 3, 2, 1)
    for bi in range(1, 5):
        block = getattr(f, f"denseblock{bi}")
        li = 1
        while hasattr(block, f"denselayer{li}"):
            x = getattr(block, f"denselayer{li}")(x)
            li += 1
        if bi < 4:
            t = getattr(f, f"transition{bi}")
            x = t.conv(TF.relu(t.norm(x)))
            if bi != 3 or keep_trans3_pool:
                x = TF.avg_pool2d(x, 2, 2)
    return TF.relu(f.norm5(x))


def _randomize(mod, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0, 0.05, generator=g)
            elif isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3, generator=g)
                m.running_var.uniform_(0.7, 1.3, generator=g)
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.uniform_(-0.1, 0.1, generator=g)


def _overlay(ours, sd_converter, sd):
    p, s = sd_converter(sd)
    params = C.merge_params(dict(ours["params"]), p)
    stats = C.merge_params(dict(ours["batch_stats"]), s)
    return {"params": params, "batch_stats": stats}


def test_mobilenet_v2_conversion_parity():
    tm = build_torch_mobilenet_v2()
    _randomize(tm, 0)
    tm.eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    assert C.detect_checkpoint_kind(sd) == "torchvision_mobilenet_v2"

    x = np.random.default_rng(0).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm.features(torch.from_numpy(x)).numpy()  # (B, 320, 2, 2)

    ours = MobileNetV2Backbone(reduction=32)
    v0 = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    v = _overlay(v0, C.convert_torchvision_mobilenet_v2, sd)
    out = ours.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("reduction", [32, 16])
def test_densenet121_conversion_parity(reduction):
    tm = build_torch_densenet121()
    _randomize(tm, 1)
    tm.eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    assert C.detect_checkpoint_kind(sd) == "torchvision_densenet"

    x = np.random.default_rng(1).normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = torch_densenet_forward(
            tm, torch.from_numpy(x), keep_trans3_pool=reduction > 16
        ).numpy()

    ours = DenseNetBackbone(variant="densenet121", reduction=reduction)
    v0 = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    v = _overlay(v0, C.convert_torchvision_densenet, sd)
    out = ours.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_apply_pretrained_routes_mobilenet():
    """The driver-level --pretrained path places MobileNetV2 weights under
    the Classifier's backbone subtree."""
    from clip_ebc_tpu.models.pretrained import apply_pretrained

    tm = build_torch_mobilenet_v2()
    _randomize(tm, 2)
    sd = {k: v for k, v in tm.state_dict().items()}

    model = get_model("mobilenetv2", 64, 32, bins=BINS, anchor_points=ANCHORS)
    v0 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    v = apply_pretrained(model, v0, sd)
    got = np.asarray(v["params"]["backbone"]["stem"]["kernel"])
    want = C.conv_kernel(sd["features.0.0.weight"])
    np.testing.assert_array_equal(got, want)
