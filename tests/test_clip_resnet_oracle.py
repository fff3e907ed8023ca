"""CLIP ModifiedResNet conversion parity vs torch composites.

Builds the reference's structural pieces from torch stdlib modules (the
anti-aliased bottleneck and the attention pool are small compositions of
Conv2d/BatchNorm2d/AvgPool2d/attention), converts the weights, and checks
our Flax modules reproduce the outputs exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clip_ebc_tpu.models import convert as C  # noqa: E402


class TorchClipBottleneck(tnn.Module):
    """CLIP's anti-aliased bottleneck assembled from torch stdlib
    (structure per reference _clip/blocks.py:56-101)."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity(),
                tnn.Conv2d(inplanes, planes * 4, 1, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        out = TF.relu(self.bn1(self.conv1(x)))
        out = TF.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        identity = self.downsample(x) if self.downsample is not None else x
        return TF.relu(out + identity)


def _randomize_bn(mod):
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)


@pytest.mark.parametrize("stride,inplanes,planes", [(1, 64, 16), (2, 64, 32)])
def test_clip_bottleneck_parity(stride, inplanes, planes):
    torch.manual_seed(0)
    blk = TorchClipBottleneck(inplanes, planes, stride).eval()
    _randomize_bn(blk)
    x = torch.randn(2, inplanes, 16, 16)
    with torch.no_grad():
        ref = blk(x)

    # torch module keys -> CLIP checkpoint naming the converter expects
    sd = {}
    for k, v in blk.state_dict().items():
        k = k.replace("downsample.1.", "downsample.0#.").replace("downsample.2.", "downsample.1.")
        k = k.replace("downsample.0#.", "downsample.0.")
        sd[f"visual.layer1.0.{k}"] = v
    b = C._TreeBuilder()
    for ci in (1, 2, 3):
        b.param(f"conv{ci}/kernel", C.conv_kernel(sd[f"visual.layer1.0.conv{ci}.weight"]))
        b.bn(f"bn{ci}", sd, f"visual.layer1.0.bn{ci}")
    if f"visual.layer1.0.downsample.0.weight" in sd:
        b.param("down_conv/kernel", C.conv_kernel(sd["visual.layer1.0.downsample.0.weight"]))
        b.bn("down_bn", sd, "visual.layer1.0.downsample.1")

    from clip_ebc_tpu.models.clip.image_encoder import ClipBottleneck

    mod = ClipBottleneck(planes, stride=stride)
    out = mod.apply(
        {"params": b.params, "batch_stats": b.stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), atol=3e-5
    )


def test_attention_pool_parity():
    """AttentionPool2d vs torch F.multi_head_attention_forward with
    separate q/k/v projections (reference _clip/blocks.py:104-137)."""
    torch.manual_seed(1)
    c, heads, out_dim, hw = 32, 4, 16, 4
    q_proj = tnn.Linear(c, c)
    k_proj = tnn.Linear(c, c)
    v_proj = tnn.Linear(c, c)
    c_proj = tnn.Linear(c, out_dim)
    pos = torch.randn((hw * hw + 1, c)) / c**0.5
    x = torch.randn(2, c, hw, hw)

    with torch.no_grad():
        seq = x.flatten(start_dim=2).permute(2, 0, 1)  # (HW, N, C)
        seq = torch.cat([seq.mean(dim=0, keepdim=True), seq], dim=0)
        seq = seq + pos[:, None, :]
        ref, _ = TF.multi_head_attention_forward(
            query=seq[:1], key=seq, value=seq,
            embed_dim_to_check=c, num_heads=heads,
            q_proj_weight=q_proj.weight, k_proj_weight=k_proj.weight,
            v_proj_weight=v_proj.weight, in_proj_weight=None,
            in_proj_bias=torch.cat([q_proj.bias, k_proj.bias, v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=c_proj.weight, out_proj_bias=c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False,
        )
        ref = ref.squeeze(0)

    params = {
        "positional_embedding": pos.numpy(),
        "q_proj": {"kernel": q_proj.weight.detach().numpy().T, "bias": q_proj.bias.detach().numpy()},
        "k_proj": {"kernel": k_proj.weight.detach().numpy().T, "bias": k_proj.bias.detach().numpy()},
        "v_proj": {"kernel": v_proj.weight.detach().numpy().T, "bias": v_proj.bias.detach().numpy()},
        "c_proj": {"kernel": c_proj.weight.detach().numpy().T, "bias": c_proj.bias.detach().numpy()},
    }
    from clip_ebc_tpu.models.clip.image_encoder import AttentionPool2d

    mod = AttentionPool2d(spacial_dim=hw * hw, num_heads=heads, output_dim=out_dim)
    out = mod.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-5)


def test_contextual_module_parity():
    """CANNet's ContextualModule vs a torch composite (adaptive avg pool,
    sigmoid contrast gating, bottleneck; reference cannet.py:13-45).
    Uses a divisible grid so both adaptive-pool definitions coincide."""
    torch.manual_seed(2)
    c, hw = 8, 12
    sizes = [1, 2, 3, 6]
    scales = tnn.ModuleList([tnn.Conv2d(c, c, 1, bias=False) for _ in sizes])
    weight_net = tnn.Conv2d(c, c, 1)
    bottleneck = tnn.Conv2d(2 * c, c, 1)
    x = torch.randn(1, c, hw, hw)

    with torch.no_grad():
        feats, weights = [], []
        for s, conv in zip(sizes, scales):
            p = TF.interpolate(conv(TF.adaptive_avg_pool2d(x, s)), size=(hw, hw), mode="bilinear")
            feats.append(p)
            weights.append(torch.sigmoid(weight_net(x - p)))
        fused = sum(f * w for f, w in zip(feats, weights)) / (sum(weights) + 1e-6)
        ref = TF.relu(bottleneck(torch.cat([fused, x], dim=1)))

    params = {
        "weight_net": {"kernel": weight_net.weight.detach().numpy().transpose(2, 3, 1, 0),
                        "bias": weight_net.bias.detach().numpy()},
        "bottleneck": {"kernel": bottleneck.weight.detach().numpy().transpose(2, 3, 1, 0),
                        "bias": bottleneck.bias.detach().numpy()},
    }
    for s, conv in zip(sizes, scales):
        params[f"scale_{s}"] = {"kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0)}

    from clip_ebc_tpu.models.csrnet import ContextualModule

    mod = ContextualModule(features=c, sizes=tuple(sizes))
    out = mod.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), atol=3e-5
    )
