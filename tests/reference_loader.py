"""Standalone loader for the reference implementation's torch-only modules.

The reference package's __init__ chain imports torchvision/timm and
triggers OpenAI checkpoint downloads at import time (reference
models/clip/_clip/__init__.py:31-36) — none of which work in this
environment. This helper loads the torch-only reference modules under a
synthetic package name (``refm``/``refl``) WITHOUT executing the real
package __init__ files, stubbing exactly two things:

- ``refm.clip._clip``: the weight-download package. The stub exposes the
  same ``{backbone}_img`` / ``{backbone}_txt`` factory surface but builds
  the REAL reference classes (VisionTransformer / ModifiedResNet /
  CLIPTextEncoder, loaded from the real files) from hardcoded OpenAI
  configs, at random init and WITHOUT the permanent adjust_pos_embed so
  the per-forward bicubic interpolation path runs (matching our Flax
  modules). ``tokenize`` bridges to our tokenizer so both sides see
  identical tokens.
- ``refm.encoder``: the timm adapter package (only ``_timm_encoder`` is
  referenced at import time by models/model.py).

Everything else — CLIP_EBC, Classifier/Regressor, the VGG autoencoder,
DACELoss/DMLoss/sinkhorn — is the reference's own code, byte for byte.
"""

from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference"

# OpenAI CLIP architecture configs (normally materialized from the
# downloaded checkpoints by reference models/clip/_clip/prepare.py:43-95).
CLIP_CONFIGS = {
    "resnet50": dict(
        vision_layers=(3, 4, 6, 3), vision_width=64, vision_heads=32,
        embed_dim=1024, image_resolution=224, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12,
    ),
    "resnet101": dict(
        vision_layers=(3, 4, 23, 3), vision_width=64, vision_heads=32,
        embed_dim=512, image_resolution=224, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12,
    ),
    "vit_b_16": dict(
        vision_patch_size=16, vision_width=768, vision_layers=12,
        vision_heads=12, embed_dim=512, image_resolution=224,
        context_length=77, vocab_size=49408, transformer_width=512,
        transformer_heads=8, transformer_layers=12,
    ),
    "vit_b_32": dict(
        vision_patch_size=32, vision_width=768, vision_layers=12,
        vision_heads=12, embed_dim=512, image_resolution=224,
        context_length=77, vocab_size=49408, transformer_width=512,
        transformer_heads=8, transformer_layers=12,
    ),
}

_NS = None


def _ensure_pkg(name: str, path: str) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__path__ = [path]
    m.__package__ = name
    sys.modules[name] = m
    return m


def load_reference():
    """Load (once) and return a namespace of reference modules."""
    global _NS
    if _NS is not None:
        return _NS

    _ensure_pkg("refm", f"{REF}/models")
    _ensure_pkg("refm.clip", f"{REF}/models/clip")
    stub = _ensure_pkg("refm.clip._clip", f"{REF}/models/clip/_clip")
    _ensure_pkg("refm.encoder_decoder", f"{REF}/models/encoder_decoder")
    enc_stub = _ensure_pkg("refm.encoder", f"{REF}/models/encoder")
    enc_stub._timm_encoder = None  # referenced by models/model.py at import
    _ensure_pkg("refl", f"{REF}/losses")

    ie = importlib.import_module("refm.clip._clip.image_encoder")
    te = importlib.import_module("refm.clip._clip.text_encoder")

    def _img_factory(name):
        cfg = CLIP_CONFIGS[name]

        def build(features_only=False, out_indices=None, input_size=None,
                  reduction=32, **kw):
            if name.startswith("vit"):
                return ie.VisionTransformer(
                    input_resolution=cfg["image_resolution"],
                    patch_size=cfg["vision_patch_size"],
                    output_dim=cfg["embed_dim"],
                    width=cfg["vision_width"],
                    layers=cfg["vision_layers"],
                    heads=cfg["vision_heads"],
                    features_only=features_only,
                )
            return ie.ModifiedResNet(
                layers=cfg["vision_layers"],
                output_dim=cfg["embed_dim"],
                input_resolution=cfg["image_resolution"],
                width=cfg["vision_width"],
                heads=cfg["vision_heads"],
                features_only=features_only,
                out_indices=out_indices,
                reduction=reduction,
            )

        return build

    def _txt_factory(name):
        cfg = CLIP_CONFIGS[name]

        def build(**kw):
            return te.CLIPTextEncoder(
                embed_dim=cfg["embed_dim"],
                context_length=cfg["context_length"],
                vocab_size=cfg["vocab_size"],
                transformer_width=cfg["transformer_width"],
                transformer_heads=cfg["transformer_heads"],
                transformer_layers=cfg["transformer_layers"],
            )

        return build

    for n in CLIP_CONFIGS:
        setattr(stub, f"{n}_img", _img_factory(n))
        setattr(stub, f"{n}_txt", _txt_factory(n))

    def tokenize(texts):
        import torch

        from clip_ebc_tpu.models.clip.tokenizer import tokenize as our_tokenize

        return torch.as_tensor(our_tokenize(list(texts)))

    stub.tokenize = tokenize

    _NS = types.SimpleNamespace(
        utils=importlib.import_module("refm.utils"),
        model=importlib.import_module("refm.model"),
        clip_model=importlib.import_module("refm.clip.model"),
        ed_vgg=importlib.import_module("refm.encoder_decoder.vgg"),
        dace_loss=importlib.import_module("refl.dace_loss"),
        dm_loss=importlib.import_module("refl.dm_loss"),
        image_encoder=ie,
        text_encoder=te,
    )
    return _NS


def randomize_(model, seed: int = 0) -> None:
    """Give every parameter/buffer well-defined random values (several
    reference params are ``torch.empty`` and rely on checkpoint loading)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.data = torch.empty_like(p).normal_(0.0, 0.02, generator=g)
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.data = torch.empty_like(b).uniform_(0.5, 1.5, generator=g)
            elif name.endswith("running_mean"):
                b.data = torch.empty_like(b).normal_(0.0, 0.1, generator=g)
