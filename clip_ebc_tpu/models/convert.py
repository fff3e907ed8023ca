"""PyTorch -> Flax weight conversion.

Replaces the reference's checkpoint-preparation machinery
(reference models/clip/_clip/prepare.py, utils.py:98-206 and the
torchvision ``load_state_dict_from_url`` calls). Since this environment
has no network egress, converters operate on a *local* state dict
(``torch.load``-able file or an already-loaded mapping) rather than
downloading.

Conventions:
- torch Conv2d weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
- torch Linear weight (O, I) -> flax Dense kernel (I, O)
- torch MultiheadAttention in_proj rows [q; k; v] -> transposed kernel
  columns [q, k, v], matching MultiHeadAttention's split order
- BatchNorm weight/bias -> scale/bias (params), running_mean/var ->
  mean/var (batch_stats)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        # .numpy() returns a VIEW of the live torch storage — copy, or a
        # later in-place mutation (e.g. optimizer.step()) silently changes
        # the converted tree under us
        return np.array(t.detach().cpu().numpy(), np.float32)
    return np.asarray(t, np.float32)


def conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def dense_kernel(w) -> np.ndarray:
    return _np(w).T


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pt/.pth file; unwraps jit archives and common wrappers."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        return dict(model.state_dict())
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        return dict(obj.state_dict())
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                return dict(obj[key])
        return dict(obj)
    raise ValueError(f"cannot extract a state dict from {path}")


class _TreeBuilder:
    def __init__(self) -> None:
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def put(self, tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def param(self, path: str, value) -> None:
        self.put(self.params, path, value)

    def stat(self, path: str, value) -> None:
        self.put(self.stats, path, value)

    def bn(self, dst: str, sd: Mapping[str, Any], src: str) -> None:
        """torch BN at ``src`` -> our BatchNorm wrapper at ``dst``."""
        inner = f"{dst}/BatchNorm_0"
        self.param(f"{inner}/scale", _np(sd[f"{src}.weight"]))
        self.param(f"{inner}/bias", _np(sd[f"{src}.bias"]))
        self.stat(f"{inner}/mean", _np(sd[f"{src}.running_mean"]))
        self.stat(f"{inner}/var", _np(sd[f"{src}.running_var"]))

    def ln(self, dst: str, sd: Mapping[str, Any], src: str) -> None:
        self.param(f"{dst}/LayerNorm_0/scale", _np(sd[f"{src}.weight"]))
        self.param(f"{dst}/LayerNorm_0/bias", _np(sd[f"{src}.bias"]))

    def attn(self, dst: str, sd: Mapping[str, Any], src: str) -> None:
        """torch nn.MultiheadAttention -> MultiHeadAttention."""
        self.param(f"{dst}/in_proj/kernel", dense_kernel(sd[f"{src}.in_proj_weight"]))
        self.param(f"{dst}/in_proj/bias", _np(sd[f"{src}.in_proj_bias"]))
        self.param(f"{dst}/out_proj/kernel", dense_kernel(sd[f"{src}.out_proj.weight"]))
        self.param(f"{dst}/out_proj/bias", _np(sd[f"{src}.out_proj.bias"]))

    def resblock(self, dst: str, sd: Mapping[str, Any], src: str) -> None:
        """CLIP ResidualAttentionBlock (attn + ln_1/2 + mlp c_fc/c_proj)."""
        self.ln(f"{dst}/ln_1", sd, f"{src}.ln_1")
        self.ln(f"{dst}/ln_2", sd, f"{src}.ln_2")
        self.attn(f"{dst}/attn", sd, f"{src}.attn")
        self.param(f"{dst}/mlp_fc/kernel", dense_kernel(sd[f"{src}.mlp.c_fc.weight"]))
        self.param(f"{dst}/mlp_fc/bias", _np(sd[f"{src}.mlp.c_fc.bias"]))
        self.param(f"{dst}/mlp_proj/kernel", dense_kernel(sd[f"{src}.mlp.c_proj.weight"]))
        self.param(f"{dst}/mlp_proj/bias", _np(sd[f"{src}.mlp.c_proj.bias"]))

    def out(self) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        return self.params, self.stats


# ---------------------------------------------------------------------------
# torchvision VGG -> VGGStage ("features" submodule of VGGEncoder/AutoEncoder)
# ---------------------------------------------------------------------------


def convert_vgg_features(
    sd: Mapping[str, Any], use_bn: bool, prefix: str = "features"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision ``features.*`` conv/BN weights -> VGGStage tree.

    Works for the truncated configs too (the reference drops the final
    pool; conv indices are unaffected, reference models/utils.py:27-32).
    """
    b = _TreeBuilder()
    conv_keys = sorted(
        (int(m.group(1)) for k in sd if (m := re.fullmatch(rf"{prefix}\.(\d+)\.weight", k)) and sd[k].ndim == 4),
    )
    for j, idx in enumerate(conv_keys):
        b.param(f"ConvBNAct_{j}/Conv_0/kernel", conv_kernel(sd[f"{prefix}.{idx}.weight"]))
        b.param(f"ConvBNAct_{j}/Conv_0/bias", _np(sd[f"{prefix}.{idx}.bias"]))
        if use_bn:
            b.bn(f"ConvBNAct_{j}/BatchNorm_0", sd, f"{prefix}.{idx + 1}")
    return b.out()


# ---------------------------------------------------------------------------
# OpenAI CLIP -> ClipViT / ClipModifiedResNet / ClipTextEncoder
# ---------------------------------------------------------------------------


def convert_clip_vit(
    sd: Mapping[str, Any], include_proj: bool = False
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """``visual.*`` of a CLIP ViT checkpoint -> ClipViT. ``include_proj``
    adds the pooled head's projection (features_only=False models only)."""
    b = _TreeBuilder()
    b.param("conv1/kernel", conv_kernel(sd["visual.conv1.weight"]))
    b.param("class_embedding", _np(sd["visual.class_embedding"]))
    b.param("positional_embedding", _np(sd["visual.positional_embedding"]))
    b.ln("ln_pre", sd, "visual.ln_pre")
    b.ln("ln_post", sd, "visual.ln_post")
    if include_proj and "visual.proj" in sd:
        b.param("proj", _np(sd["visual.proj"]))  # already (width, embed)
    i = 0
    while f"visual.transformer.resblocks.{i}.ln_1.weight" in sd:
        b.resblock(f"resblock_{i}", sd, f"visual.transformer.resblocks.{i}")
        i += 1
    return b.out()


def convert_clip_resnet(
    sd: Mapping[str, Any], include_attnpool: bool = False
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """``visual.*`` of a CLIP ModifiedResNet checkpoint."""
    b = _TreeBuilder()
    if include_attnpool and "visual.attnpool.positional_embedding" in sd:
        ap = "visual.attnpool"
        b.param("attnpool/positional_embedding", _np(sd[f"{ap}.positional_embedding"]))
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            b.param(f"attnpool/{proj}/kernel", dense_kernel(sd[f"{ap}.{proj}.weight"]))
            b.param(f"attnpool/{proj}/bias", _np(sd[f"{ap}.{proj}.bias"]))
    for i in (1, 2, 3):
        b.param(f"stem_conv{i}/kernel", conv_kernel(sd[f"visual.conv{i}.weight"]))
        b.bn(f"stem_bn{i}", sd, f"visual.bn{i}")
    for li in range(1, 5):
        bi = 0
        while f"visual.layer{li}.{bi}.conv1.weight" in sd:
            src = f"visual.layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            for ci in (1, 2, 3):
                b.param(f"{dst}/conv{ci}/kernel", conv_kernel(sd[f"{src}.conv{ci}.weight"]))
                b.bn(f"{dst}/bn{ci}", sd, f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                b.param(f"{dst}/down_conv/kernel", conv_kernel(sd[f"{src}.downsample.0.weight"]))
                b.bn(f"{dst}/down_bn", sd, f"{src}.downsample.1")
            bi += 1
    return b.out()


def convert_clip_text(sd: Mapping[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    b = _TreeBuilder()
    b.param("token_embedding/embedding", _np(sd["token_embedding.weight"]))
    b.param("positional_embedding", _np(sd["positional_embedding"]))
    b.ln("ln_final", sd, "ln_final")
    b.param("text_projection", _np(sd["text_projection"]))
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        b.resblock(f"resblock_{i}", sd, f"transformer.resblocks.{i}")
        i += 1
    return b.out()


def convert_clip_ebc(
    sd: Mapping[str, Any], is_vit: bool
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full CLIP checkpoint -> the pretrained subtrees of a ClipEBC model
    (image_encoder + text_encoder + logit_scale); the decoder/projection
    stay at their fresh initialization."""
    img_p, img_s = (convert_clip_vit if is_vit else convert_clip_resnet)(sd)
    txt_p, txt_s = convert_clip_text(sd)
    params: Dict[str, Any] = {"image_encoder": img_p, "text_encoder": txt_p}
    if "logit_scale" in sd:
        params["logit_scale"] = _np(sd["logit_scale"]).reshape(())
    stats: Dict[str, Any] = {}
    if img_s:
        stats["image_encoder"] = img_s
    if txt_s:
        stats["text_encoder"] = txt_s
    return params, stats


# ---------------------------------------------------------------------------
# torchvision ViT -> ViTEncoder (plain ViT backbones)
# ---------------------------------------------------------------------------


def convert_torchvision_vit(sd: Mapping[str, Any]) -> Dict[str, Any]:
    b = _TreeBuilder()
    b.param("patchify/kernel", conv_kernel(sd["conv_proj.weight"]))
    b.param("patchify/bias", _np(sd["conv_proj.bias"]))
    b.param("class_token", _np(sd["class_token"]))
    b.param("pos_embedding", _np(sd["encoder.pos_embedding"])[0])
    b.ln("ln_final", sd, "encoder.ln")
    i = 0
    while f"encoder.layers.encoder_layer_{i}.ln_1.weight" in sd:
        src = f"encoder.layers.encoder_layer_{i}"
        dst = f"block_{i}"
        b.ln(f"{dst}/ln_1", sd, f"{src}.ln_1")
        b.ln(f"{dst}/ln_2", sd, f"{src}.ln_2")
        b.attn(f"{dst}/attn", sd, f"{src}.self_attention")
        b.param(f"{dst}/mlp_fc/kernel", dense_kernel(sd[f"{src}.mlp.linear_1.weight"]))
        b.param(f"{dst}/mlp_fc/bias", _np(sd[f"{src}.mlp.linear_1.bias"]))
        b.param(f"{dst}/mlp_proj/kernel", dense_kernel(sd[f"{src}.mlp.linear_2.weight"]))
        b.param(f"{dst}/mlp_proj/bias", _np(sd[f"{src}.mlp.linear_2.bias"]))
        i += 1
    return b.params


# ---------------------------------------------------------------------------
# torchvision ResNet -> ResNetEncoder (stem Conv_0/BatchNorm_0 + _TVBlock_j)
# ---------------------------------------------------------------------------


def convert_torchvision_resnet(
    sd: Mapping[str, Any], prefix: str = ""
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision/timm ResNet state dict -> ResNetEncoder param tree.

    Replaces the reference's ``timm.create_model(..., pretrained=True)``
    path (reference models/encoder/timm_models.py:20-39,
    encoder_decoder/resnet.py:38-50). Stride surgery needs no weight
    changes, so the same checkpoint serves both reduction configurations.
    """
    b = _TreeBuilder()
    p = (prefix + ".") if prefix else ""
    b.param("Conv_0/kernel", conv_kernel(sd[f"{p}conv1.weight"]))
    b.bn("BatchNorm_0", sd, f"{p}bn1")
    is_bottleneck = f"{p}layer1.0.conv3.weight" in sd
    block = "_TVBottleneck" if is_bottleneck else "_TVBasicBlock"
    n_convs = 3 if is_bottleneck else 2
    j = 0
    for li in (1, 2, 3, 4):
        bi = 0
        while f"{p}layer{li}.{bi}.conv1.weight" in sd:
            src = f"{p}layer{li}.{bi}"
            dst = f"{block}_{j}"
            for ci in range(n_convs):
                b.param(f"{dst}/Conv_{ci}/kernel", conv_kernel(sd[f"{src}.conv{ci + 1}.weight"]))
                b.bn(f"{dst}/BatchNorm_{ci}", sd, f"{src}.bn{ci + 1}")
            if f"{src}.downsample.0.weight" in sd:
                b.param(
                    f"{dst}/Conv_{n_convs}/kernel",
                    conv_kernel(sd[f"{src}.downsample.0.weight"]),
                )
                b.bn(f"{dst}/BatchNorm_{n_convs}", sd, f"{src}.downsample.1")
            j += 1
            bi += 1
    return b.out()


# ---------------------------------------------------------------------------
# torchvision MobileNetV2 / DenseNet -> MobileNetV2Backbone / DenseNetBackbone
# ---------------------------------------------------------------------------

# Stage repeats of MobileNetV2 (mobilenet._STAGES); torchvision flattens the
# 17 inverted-residual blocks as features.1..17.
_MOBILENET_REPEATS = (1, 2, 3, 4, 3, 3, 1)


def convert_torchvision_mobilenet_v2(
    sd: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision ``mobilenet_v2`` state dict -> MobileNetV2Backbone tree.

    Replaces the reference's ``timm.create_model("mobilenetv2_100",
    pretrained=True)`` path (reference models/encoder/timm_models.py:17-39).
    The final 1280-wide classifier conv (features.18) is dropped — the
    backbone taps the 320-channel stage output, matching timm
    ``features_only`` with ``out_indices=[-1]``. Stride surgery needs no
    weight changes, so one checkpoint serves both reductions.
    """
    b = _TreeBuilder()
    b.param("stem/kernel", conv_kernel(sd["features.0.0.weight"]))
    b.bn("stem_bn", sd, "features.0.1")
    f = 1
    for si, n in enumerate(_MOBILENET_REPEATS):
        for bi in range(n):
            src, dst = f"features.{f}.conv", f"stage{si}_{bi}"
            if f"{src}.2.weight" in sd and sd[f"{src}.2.weight"].ndim == 4:
                # expand -> depthwise -> project (expand_ratio > 1)
                b.param(f"{dst}/expand/kernel", conv_kernel(sd[f"{src}.0.0.weight"]))
                b.bn(f"{dst}/expand_bn", sd, f"{src}.0.1")
                b.param(f"{dst}/dw/kernel", conv_kernel(sd[f"{src}.1.0.weight"]))
                b.bn(f"{dst}/dw_bn", sd, f"{src}.1.1")
                b.param(f"{dst}/project/kernel", conv_kernel(sd[f"{src}.2.weight"]))
                b.bn(f"{dst}/project_bn", sd, f"{src}.3")
            else:  # expand_ratio == 1 (first block): depthwise -> project
                b.param(f"{dst}/dw/kernel", conv_kernel(sd[f"{src}.0.0.weight"]))
                b.bn(f"{dst}/dw_bn", sd, f"{src}.0.1")
                b.param(f"{dst}/project/kernel", conv_kernel(sd[f"{src}.1.weight"]))
                b.bn(f"{dst}/project_bn", sd, f"{src}.2")
            f += 1
    return b.out()


def convert_torchvision_densenet(
    sd: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision ``densenet121/161/169/201`` state dict ->
    DenseNetBackbone tree (reference reaches these via timm,
    models/encoder/timm_models.py:17-39; pool removal needs no weight
    changes)."""
    b = _TreeBuilder()
    b.param("stem/kernel", conv_kernel(sd["features.conv0.weight"]))
    b.bn("stem_bn", sd, "features.norm0")
    bi = 1
    while f"features.denseblock{bi}.denselayer1.norm1.weight" in sd:
        li = 1
        while f"features.denseblock{bi}.denselayer{li}.norm1.weight" in sd:
            src = f"features.denseblock{bi}.denselayer{li}"
            dst = f"block{bi}_layer{li}"
            b.bn(f"{dst}/bn1", sd, f"{src}.norm1")
            b.param(f"{dst}/conv1/kernel", conv_kernel(sd[f"{src}.conv1.weight"]))
            b.bn(f"{dst}/bn2", sd, f"{src}.norm2")
            b.param(f"{dst}/conv2/kernel", conv_kernel(sd[f"{src}.conv2.weight"]))
            li += 1
        if f"features.transition{bi}.norm.weight" in sd:
            b.bn(f"trans{bi}_bn", sd, f"features.transition{bi}.norm")
            b.param(
                f"trans{bi}_conv/kernel",
                conv_kernel(sd[f"features.transition{bi}.conv.weight"]),
            )
        bi += 1
    b.bn("final_bn", sd, "features.norm5")
    return b.out()


# ---------------------------------------------------------------------------
# reference decoder stacks (make_resnet_layers Sequential) -> ResNetStage
# ---------------------------------------------------------------------------


def convert_resnet_stage(
    sd: Mapping[str, Any], prefix: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference ``make_resnet_layers`` Sequential (reference
    models/utils.py:422-444) -> ResNetStage. Sequential indices skip the
    param-less Upsample entries; our per-type block counter does not."""
    b = _TreeBuilder()
    idxs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(rf"{re.escape(prefix)}\.(\d+)\.conv1\.weight", k))
    )
    for j, i in enumerate(idxs):
        src = f"{prefix}.{i}"
        is_bottleneck = f"{src}.conv3.weight" in sd
        dst = ("BottleneckBlock" if is_bottleneck else "BasicBlock") + f"_{j}"
        n_convs = 3 if is_bottleneck else 2
        for ci in range(n_convs):
            b.param(
                f"{dst}/ConvBNAct_{ci}/Conv_0/kernel",
                conv_kernel(sd[f"{src}.conv{ci + 1}.weight"]),
            )
            b.bn(f"{dst}/ConvBNAct_{ci}/BatchNorm_0", sd, f"{src}.bn{ci + 1}")
        if f"{src}.downsample.0.weight" in sd:
            b.param(
                f"{dst}/ConvBNAct_{n_convs}/Conv_0/kernel",
                conv_kernel(sd[f"{src}.downsample.0.weight"]),
            )
            b.bn(f"{dst}/ConvBNAct_{n_convs}/BatchNorm_0", sd, f"{src}.downsample.1")
    return b.out()


# ---------------------------------------------------------------------------
# full reference-trained checkpoints -> our model trees
# ---------------------------------------------------------------------------


def convert_reference_clip_ebc(
    sd: Mapping[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """A *trained* reference CLIP_EBC state dict (reference
    models/clip/model.py:40-129: image_encoder/vpt_i/image_decoder/
    projection/text_encoder/logit_scale) -> ClipEBC params+stats."""
    vis = {
        "visual." + k[len("image_encoder.") :]: v
        for k, v in sd.items()
        if k.startswith("image_encoder.")
    }
    is_vit = "visual.class_embedding" in vis
    img_p, img_s = (convert_clip_vit if is_vit else convert_clip_resnet)(vis)

    vpt_idxs = sorted(
        int(m.group(1)) for k in sd if (m := re.fullmatch(r"vpt_(\d+)", k))
    )
    if vpt_idxs:
        if vpt_idxs != list(range(len(vpt_idxs))):
            raise ValueError(f"non-contiguous VPT layers in checkpoint: {vpt_idxs}")
        img_p["vpt"] = np.stack([_np(sd[f"vpt_{i}"]) for i in vpt_idxs])

    txt = {
        k[len("text_encoder.") :]: v
        for k, v in sd.items()
        if k.startswith("text_encoder.")
    }
    txt_p, txt_s = convert_clip_text(txt)

    params: Dict[str, Any] = {"image_encoder": img_p, "text_encoder": txt_p}
    stats: Dict[str, Any] = {}
    if img_s:
        stats["image_encoder"] = img_s
    if txt_s:
        stats["text_encoder"] = txt_s

    dec_p, dec_s = convert_resnet_stage(sd, "image_decoder")
    if dec_p:
        params["image_decoder"] = dec_p
    if dec_s:
        stats["image_decoder"] = dec_s
    if "projection.weight" in sd:
        params["projection"] = {
            "kernel": conv_kernel(sd["projection.weight"]),
            "bias": _np(sd["projection.bias"]),
        }
    if "logit_scale" in sd:
        params["logit_scale"] = _np(sd["logit_scale"]).reshape(())
    return params, stats


def convert_reference_classifier(
    sd: Mapping[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """A *trained* reference Classifier/Regressor over a VGG(-AE) backbone
    (reference models/model.py:17-75, encoder_decoder/vgg.py:13-41) ->
    our Classifier/Regressor tree."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    bb_params: Dict[str, Any] = {}
    bb_stats: Dict[str, Any] = {}
    if any(k.startswith("backbone.features.") for k in sd):
        use_bn = any(
            re.fullmatch(r"backbone\.features\.\d+\.running_mean", k) for k in sd
        )
        f_p, f_s = convert_vgg_features(sd, use_bn, prefix="backbone.features")
        bb_params["features"] = f_p
        if f_s:
            bb_stats["features"] = f_s
    else:
        raise ValueError(
            "unsupported reference backbone: only VGG features.* checkpoints "
            "are convertible (got keys like "
            f"{sorted(sd)[:3]})"
        )
    # reg_layer Sequential: convs at indices 0 and 2 -> reg0/reg1
    for j, i in enumerate(
        sorted(
            int(m.group(1))
            for k in sd
            if (m := re.fullmatch(r"backbone\.reg_layer\.(\d+)\.weight", k))
        )
    ):
        bb_params[f"reg{j}"] = {
            "Conv_0": {
                "kernel": conv_kernel(sd[f"backbone.reg_layer.{i}.weight"]),
                "bias": _np(sd[f"backbone.reg_layer.{i}.bias"]),
            }
        }
    params["backbone"] = bb_params
    if bb_stats:
        stats["backbone"] = bb_stats

    if "classifier.weight" in sd:  # single 1x1 conv head (channels <= 512)
        params["cls_out"] = {
            "kernel": conv_kernel(sd["classifier.weight"]),
            "bias": _np(sd["classifier.bias"]),
        }
    elif "classifier.0.weight" in sd:  # 512-bottleneck head
        params["cls_hidden"] = {
            "kernel": conv_kernel(sd["classifier.0.weight"]),
            "bias": _np(sd["classifier.0.bias"]),
        }
        params["cls_out"] = {
            "kernel": conv_kernel(sd["classifier.2.weight"]),
            "bias": _np(sd["classifier.2.bias"]),
        }
    elif "regressor.0.weight" in sd:
        params["Conv_0"] = {
            "kernel": conv_kernel(sd["regressor.0.weight"]),
            "bias": _np(sd["regressor.0.bias"]),
        }
    return params, stats


def detect_checkpoint_kind(sd: Mapping[str, Any]) -> str:
    """Classify a torch state dict into one of the convertible families."""
    keys = set(sd)
    if any(k.startswith("visual.") for k in keys):
        return "clip"
    if any(k.startswith("image_encoder.") for k in keys) and any(
        k.startswith("text_encoder.") for k in keys
    ):
        return "reference_clip_ebc"
    if any(k.startswith("backbone.") for k in keys):
        return "reference_classifier"
    if "conv_proj.weight" in keys:
        return "torchvision_vit"
    if "conv1.weight" in keys and "layer1.0.conv1.weight" in keys:
        return "torchvision_resnet"
    if "features.0.0.weight" in keys and "features.1.conv.0.0.weight" in keys:
        return "torchvision_mobilenet_v2"
    if "features.denseblock1.denselayer1.norm1.weight" in keys:
        return "torchvision_densenet"
    if any(re.fullmatch(r"features\.\d+\.weight", k) for k in keys):
        return "torchvision_vgg"
    raise ValueError(
        "unrecognized checkpoint family; expected an OpenAI CLIP, "
        "torchvision VGG/ViT/ResNet, or reference CLIP-EBC/Classifier "
        f"state dict (sample keys: {sorted(keys)[:5]})"
    )


def detect_clip_arch(sd: Mapping[str, Any]) -> str:
    """Infer the CLIP backbone name from a full checkpoint's state dict —
    the counterpart of the reference's build_model arch sniffing
    (reference models/clip/_clip/model.py:177-214)."""
    if "visual.conv1.weight" in sd and "visual.class_embedding" in sd:
        w = sd["visual.conv1.weight"]
        patch, width = int(w.shape[-1]), int(w.shape[0])
        n_layers = len(
            {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
        )
        if width == 1024 and patch == 14:
            grid = int(round((int(sd["visual.positional_embedding"].shape[0]) - 1) ** 0.5))
            return "vit_l_14_336px" if grid * 14 == 336 else "vit_l_14"
        if width == 768 and n_layers == 12:
            return f"vit_b_{patch}"
        raise ValueError(f"unrecognized CLIP ViT (width={width}, patch={patch})")
    if "visual.layer1.0.conv1.weight" in sd:
        stem = int(sd["visual.conv1.weight"].shape[0])  # width // 2
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{i}.")})
            for i in (1, 2, 3, 4)
        )
        from .clip.image_encoder import RESNET_CONFIGS

        for name, (layers, width, _, _) in RESNET_CONFIGS.items():
            if counts == layers and stem == width // 2:
                return name
        raise ValueError(f"unrecognized CLIP ResNet (layers={counts}, stem={stem})")
    raise ValueError("state dict does not look like a CLIP checkpoint")


# ---------------------------------------------------------------------------
# prepared-artifact serialization (cli/prepare.py output format)
# ---------------------------------------------------------------------------


def _flatten_tree(tree: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, Mapping):
            out.update(_flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_tree(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_prepared_tree(path: str, params: Mapping[str, Any],
                       stats: Mapping[str, Any] | None = None,
                       meta: Mapping[str, str] | None = None) -> None:
    """Write converted Flax trees as a single compressed .npz — the
    TPU-native counterpart of the reference's split ``.pth`` files
    (reference models/clip/_clip/prepare.py:55-58). Keys are
    '/'-joined paths prefixed ``params/`` or ``stats/``; ``meta``
    strings (e.g. the backbone name) go under ``meta/``."""
    flat = _flatten_tree(params, "params")
    if stats:
        flat.update(_flatten_tree(stats, "stats"))
    for k, v in (meta or {}).items():
        flat[f"meta/{k}"] = np.asarray(str(v))
    np.savez_compressed(path, **flat)


def load_prepared_tree(
    path: str,
) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, str]]:
    """Inverse of :func:`save_prepared_tree`; returns (params, stats, meta)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params_flat = {k[len("params/"):]: v for k, v in flat.items()
                   if k.startswith("params/")}
    stats_flat = {k[len("stats/"):]: v for k, v in flat.items()
                  if k.startswith("stats/")}
    meta = {k[len("meta/"):]: str(v) for k, v in flat.items()
            if k.startswith("meta/")}
    if not params_flat:
        raise ValueError(f"{path} is not a prepared-tree artifact "
                         "(no 'params/' entries)")
    return _unflatten_tree(params_flat), _unflatten_tree(stats_flat), meta


# ---------------------------------------------------------------------------
# tree utilities
# ---------------------------------------------------------------------------


def merge_params(dst: Dict[str, Any], src: Mapping[str, Any], strict_shapes: bool = True) -> Dict[str, Any]:
    """Recursively overlay ``src`` onto a copy of ``dst`` (a freshly
    initialized param tree), checking shapes."""
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, Mapping):
            base = out.get(k, {})
            if not isinstance(base, Mapping):
                raise KeyError(f"converted subtree {k!r} does not exist in the model")
            out[k] = merge_params(dict(base), v, strict_shapes)
        else:
            if k not in out:
                raise KeyError(f"converted param {k!r} does not exist in the model")
            if strict_shapes and tuple(np.shape(out[k])) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch for {k!r}: model {np.shape(out[k])} vs "
                    f"checkpoint {np.shape(v)}"
                )
            out[k] = v
    return out
