"""High-level pretrained-weight initialization for the drivers.

The reference always builds on pretrained towers: OpenAI CLIP checkpoints
are downloaded and split at first import (reference
models/clip/_clip/prepare.py:43-95, _clip/__init__.py:31-36) and
torchvision VGG/ViT weights are pulled by URL (reference
models/encoder/vit.py:16-22, models/utils.py:16-24). This environment has
no egress, so ``apply_pretrained`` instead takes a *local* torch
checkpoint, sniffs its family, converts it with ``models.convert``, and
overlays it onto freshly-initialized Flax variables:

- OpenAI CLIP (``visual.*``)          -> ClipEBC towers (+logit_scale)
- reference trained CLIP_EBC          -> full ClipEBC (incl. VPT/decoder)
- reference trained Classifier/Regr.  -> full Classifier/Regressor
- torchvision VGG  (``features.*``)   -> backbone/features
- torchvision ViT  (``conv_proj.*``)  -> backbone (pos-embed interp)
- torchvision ResNet (``layerN.*``)   -> backbone[/encoder]
- torchvision MobileNetV2 / DenseNet  -> backbone (timm escape-hatch names)

Everything not covered by the checkpoint (decoder, projection, heads, VPT
prompts) keeps its fresh initialization — same semantics as the
reference's partially-pretrained model builds.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Mapping, Tuple, Union

import numpy as np

from . import convert as C

logger = logging.getLogger("clip_ebc_tpu")


def _as_state_dict(src: Union[str, Mapping[str, Any]]) -> Dict[str, Any]:
    if isinstance(src, (str,)):
        return C.load_torch_state_dict(src)
    return dict(src)


def _trim_to(dst: Mapping[str, Any], src: Dict[str, Any], what: str) -> Dict[str, Any]:
    """Drop top-level entries of ``src`` absent from ``dst`` (truncated
    fronts like CSRNet's 10-conv VGG16 slice); the destination must be
    fully covered."""
    missing = [k for k in dst if k not in src]
    if missing:
        raise ValueError(f"{what}: checkpoint lacks {missing[:4]} for the model")
    dropped = [k for k in src if k not in dst]
    if dropped:
        logger.info("%s: dropping %d trailing checkpoint entries (%s...)",
                    what, len(dropped), dropped[0])
    return {k: v for k, v in src.items() if k in dst}


def _interp_vit_pos_embed(params: Dict[str, Any], dst: Mapping[str, Any]) -> None:
    """Bicubically resize a torchvision ViT ``pos_embedding`` to the model's
    grid when sizes differ (reference models/encoder/vit.py:350-415)."""
    key = "pos_embedding"
    if key not in params or key not in dst:
        return
    src_n, dst_n = params[key].shape[0], np.shape(dst[key])[0]
    if src_n == dst_n:
        return
    import jax.numpy as jnp

    from .transformer import interpolate_pos_embed

    g_src = int(round((src_n - 1) ** 0.5))
    g_dst = int(round((dst_n - 1) ** 0.5))
    if g_src * g_src + 1 != src_n or g_dst * g_dst + 1 != dst_n:
        raise ValueError(f"cannot interpolate pos embedding {src_n} -> {dst_n}")
    params[key] = np.asarray(
        interpolate_pos_embed(jnp.asarray(params[key]), (g_src, g_src), (g_dst, g_dst)),
        np.float32,
    )


def convert_for_model(
    model, sd: Mapping[str, Any], variables: Mapping[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert ``sd`` and *place* it at the right subtree for ``model``.
    Returns (params_overlay, stats_overlay) shaped like the model's trees."""
    from .clip.model import ClipEBC

    kind = C.detect_checkpoint_kind(sd)
    params0 = variables["params"]

    if kind == "clip":
        if not isinstance(model, ClipEBC):
            raise ValueError("a CLIP checkpoint requires a clip_* model")
        arch = C.detect_clip_arch(sd)
        if arch != model.backbone:
            raise ValueError(
                f"checkpoint is CLIP {arch!r} but the model was built with "
                f"backbone {model.backbone!r}"
            )
        return C.convert_clip_ebc(sd, is_vit=model.is_vit)

    if kind == "reference_clip_ebc":
        if not isinstance(model, ClipEBC):
            raise ValueError("a reference CLIP_EBC checkpoint requires a clip_* model")
        return C.convert_reference_clip_ebc(sd)

    if kind == "reference_classifier":
        return C.convert_reference_classifier(sd)

    # Torchvision backbone checkpoints land under the model's backbone.
    if "backbone" not in params0:
        raise ValueError(
            f"a {kind} checkpoint initializes a backbone, but this model has "
            "no 'backbone' subtree"
        )
    bb = params0["backbone"]

    if kind == "torchvision_vgg":
        use_bn = any(re.fullmatch(r"features\.\d+\.running_mean", k) for k in sd)
        f_p, f_s = C.convert_vgg_features(sd, use_bn)
        if "features" not in bb:
            raise ValueError("model backbone has no 'features' stage for VGG weights")
        f_p = _trim_to(bb["features"], f_p, "vgg features")
        stats = (
            {"backbone": {"features": _trim_to(bb["features"], f_s, "vgg bn stats")}}
            if f_s
            else {}
        )
        return {"backbone": {"features": f_p}}, stats

    if kind == "torchvision_resnet":
        r_p, r_s = C.convert_torchvision_resnet(sd)
        if "encoder" in bb:  # ResNetAutoEncoder
            return {"backbone": {"encoder": r_p}}, {"backbone": {"encoder": r_s}}
        return {"backbone": r_p}, {"backbone": r_s}

    if kind == "torchvision_vit":
        v_p = C.convert_torchvision_vit(sd)
        _interp_vit_pos_embed(v_p, bb)
        return {"backbone": v_p}, {}

    if kind == "torchvision_mobilenet_v2":
        m_p, m_s = C.convert_torchvision_mobilenet_v2(sd)
        return {"backbone": m_p}, {"backbone": m_s}

    if kind == "torchvision_densenet":
        d_p, d_s = C.convert_torchvision_densenet(sd)
        return {"backbone": d_p}, {"backbone": d_s}

    raise AssertionError(kind)


def apply_pretrained(
    model,
    variables: Mapping[str, Any],
    checkpoint: Union[str, Mapping[str, Any]],
    allow_byte_tokenizer: bool = False,
) -> Dict[str, Any]:
    """Overlay a converted torch checkpoint onto fresh ``variables``
    (``{"params": ..., "batch_stats": ...}``); returns new variables.
    Shapes are strictly checked by ``merge_params``.

    Loading a pretrained CLIP text tower without the real BPE vocab is a
    HARD ERROR: byte-fallback token ids are meaningless to pretrained text
    embeddings, so every prompt feature — and therefore every count — would
    be silently garbage. Pass ``allow_byte_tokenizer=True`` (CLI:
    ``--allow_byte_tokenizer``) only for synthetic-weight tests.

    A ``.npz`` path is treated as a prepared artifact from
    ``cli/prepare.py`` (already-converted Flax trees; no torch needed):
    the full ``clip_{name}.npz`` overlays a ClipEBC's towers exactly like
    the torch checkpoint it was prepared from."""
    if isinstance(checkpoint, str) and checkpoint.endswith(".npz"):
        from .clip.model import ClipEBC

        p_over, s_over, meta = C.load_prepared_tree(checkpoint)
        if not ("image_encoder" in p_over and "text_encoder" in p_over):
            raise ValueError(
                f"{checkpoint} is a tower-only prepared artifact; pass the "
                "full clip_{name}.npz (or consume the tower tree directly "
                "via models.convert.load_prepared_tree)")
        if not isinstance(model, ClipEBC):
            raise ValueError("a prepared CLIP artifact requires a clip_* model")
        arch = meta.get("backbone")
        if arch and arch != model.backbone:
            raise ValueError(
                f"prepared artifact is CLIP {arch!r} but the model was built "
                f"with backbone {model.backbone!r}")
        kind = "clip"
    else:
        sd = _as_state_dict(checkpoint)
        kind = C.detect_checkpoint_kind(sd)
        p_over, s_over = convert_for_model(model, sd, variables)
    if kind in ("clip", "reference_clip_ebc"):
        from .clip.tokenizer import ByteFallbackTokenizer, get_tokenizer

        if isinstance(get_tokenizer(), ByteFallbackTokenizer):
            msg = (
                "Loading converted CLIP text-tower weights while the BPE "
                "vocab is ABSENT: prompts are byte-fallback tokenized, which "
                "is incompatible with pretrained text embeddings — text "
                "features would be garbage. Set $CLIP_BPE_VOCAB to "
                "bpe_simple_vocab_16e6.txt.gz (ships with OpenAI CLIP)."
            )
            if not allow_byte_tokenizer:
                raise ValueError(
                    msg + " Pass --allow_byte_tokenizer to override "
                    "(synthetic-weight testing only)."
                )
            logger.warning(msg)
    out: Dict[str, Any] = dict(variables)
    out["params"] = C.merge_params(dict(variables["params"]), p_over)
    if s_over:
        stats = variables.get("batch_stats") or {}
        out["batch_stats"] = C.merge_params(dict(stats), s_over)
    n = sum(np.size(x) for x in _leaves(p_over))
    logger.info("loaded pretrained %s checkpoint: %d params overlaid", kind, n)
    return out


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, Mapping):
            yield from _leaves(v)
        else:
            yield v
