"""CLIP weight-preparation CLI — the TPU-native counterpart of the
reference's first-import checkpoint machinery.

The reference downloads 9 OpenAI CLIP checkpoints with sha256
verification (reference models/clip/_clip/utils.py:34-76, URL table at
utils.py:34-60) and splits each into full/image/text state_dicts plus
JSON arch configs on first import (reference
models/clip/_clip/prepare.py:43-95, _clip/__init__.py:31-36).

This CLI does the same job TPU-first: it takes OpenAI ``.pt`` files
(user-supplied in a zero-egress deployment, or downloaded here when the
network permits), verifies them against the same sha256 manifest,
converts them to Flax parameter trees via ``models.convert``, and writes:

    <out>/weights/clip_{name}.npz                (full: image+text+logit_scale)
    <out>/weights/clip_image_encoder_{name}.npz
    <out>/weights/clip_text_encoder_{name}.npz
    <out>/configs/clip_{name}.json               (arch metadata)
    <out>/configs/clip_image_encoder_{name}.json
    <out>/configs/clip_text_encoder_{name}.json

The full ``clip_{name}.npz`` round-trips through
``models.pretrained.apply_pretrained`` (the trainer's ``--pretrained``
flag accepts it directly), so ``prepare`` -> ``train --pretrained`` is
the deployment path; no torch import is needed at train time once the
artifact exists.

Usage:
    python -m clip_ebc_tpu.cli.prepare --src ~/.cache/clip --out prepared/
    python -m clip_ebc_tpu.cli.prepare --src ViT-B-16.pt --models ViT-B/16
    python -m clip_ebc_tpu.cli.prepare --download --models RN50 ViT-B/16
"""

from __future__ import annotations

import argparse
import hashlib
import json
import logging
import os
import sys
import urllib.request
from typing import Dict, List, Optional, Tuple

logger = logging.getLogger("clip_ebc_tpu")

# OpenAI release URLs; the sha256 of each file is the penultimate path
# segment (the reference relies on the same property,
# reference models/clip/_clip/utils.py:53). Mirrors utils.py:34-60.
MODEL_URLS: Dict[str, str] = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}

# OpenAI name -> this framework's backbone name
# (reference models/clip/_clip/prepare.py:11-21).
MODEL_NAME_MAP: Dict[str, str] = {
    "RN50": "resnet50",
    "RN101": "resnet101",
    "RN50x4": "resnet50x4",
    "RN50x16": "resnet50x16",
    "RN50x64": "resnet50x64",
    "ViT-B/32": "vit_b_32",
    "ViT-B/16": "vit_b_16",
    "ViT-L/14": "vit_l_14",
    "ViT-L/14@336px": "vit_l_14_336px",
}


def available_models() -> List[str]:
    return list(MODEL_URLS)


def expected_sha256(name: str) -> str:
    return MODEL_URLS[name].split("/")[-2]


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(name: str, root: str) -> str:
    """Download one OpenAI checkpoint with sha256 verification — same
    semantics as reference models/clip/_clip/utils.py:52-76 (reuse a
    matching local file; hard error on post-download mismatch)."""
    url = MODEL_URLS[name]
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, os.path.basename(url))
    expected = expected_sha256(name)
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if sha256_file(target) == expected:
            return target
        logger.warning("%s exists but its sha256 does not match; re-downloading",
                       target)
    logger.info("downloading %s -> %s", url, target)
    tmp = target + ".part"
    with urllib.request.urlopen(url) as src, open(tmp, "wb") as dst:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            dst.write(buf)
    if sha256_file(tmp) != expected:
        os.unlink(tmp)
        raise RuntimeError(
            f"{name}: downloaded file's sha256 does not match the manifest")
    os.replace(tmp, target)
    return target


def verify_checkpoint(name: str, path: str) -> None:
    got = sha256_file(path)
    want = expected_sha256(name)
    if got != want:
        raise ValueError(
            f"{name}: sha256 mismatch for {path}\n  expected {want}\n  got      {got}\n"
            "(corrupt or wrong file; pass --no-verify only for non-release "
            "checkpoints)")


def _arch_configs(sd, arch: str) -> Tuple[dict, dict, dict]:
    """Derive the (full, image, text) JSON arch configs from the state
    dict — counterpart of the reference's build_model sniffing + config
    dump (reference models/clip/_clip/model.py:177-214, prepare.py:60-95)."""
    embed_dim = int(sd["text_projection"].shape[1])
    context_length = int(sd["positional_embedding"].shape[0])
    vocab_size = int(sd["token_embedding.weight"].shape[0])
    transformer_width = int(sd["ln_final.weight"].shape[0])
    transformer_heads = transformer_width // 64
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})

    if "visual.class_embedding" in sd:  # ViT tower
        vision_width = int(sd["visual.conv1.weight"].shape[0])
        vision_patch_size = int(sd["visual.conv1.weight"].shape[-1])
        vision_layers = len({
            k.split(".")[3] for k in sd
            if k.startswith("visual.transformer.resblocks.")})
        grid = int(round((int(sd["visual.positional_embedding"].shape[0]) - 1) ** 0.5))
        image_resolution = grid * vision_patch_size
        vision_heads = vision_width // 64
    else:  # ModifiedResNet tower
        vision_patch_size = None
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{i}.")})
            for i in (1, 2, 3, 4))
        vision_layers = list(counts)
        vision_width = int(sd["visual.layer1.0.conv1.weight"].shape[0])
        spacial = int(round((int(
            sd["visual.attnpool.positional_embedding"].shape[0]) - 1) ** 0.5))
        image_resolution = spacial * 32
        vision_heads = vision_width * 32 // 64

    full = {
        "embed_dim": embed_dim,
        "image_resolution": image_resolution,
        "vision_layers": vision_layers,
        "vision_width": vision_width,
        "vision_patch_size": vision_patch_size,
        "context_length": context_length,
        "vocab_size": vocab_size,
        "transformer_width": transformer_width,
        "transformer_heads": transformer_heads,
        "transformer_layers": transformer_layers,
        "backbone": arch,
    }
    image = {
        "embed_dim": embed_dim,
        "image_resolution": image_resolution,
        "vision_layers": vision_layers,
        "vision_width": vision_width,
        "vision_patch_size": vision_patch_size,
        "vision_heads": vision_heads,
        "backbone": arch,
    }
    text = {
        "embed_dim": embed_dim,
        "context_length": context_length,
        "vocab_size": vocab_size,
        "transformer_width": transformer_width,
        "transformer_heads": transformer_heads,
        "transformer_layers": transformer_layers,
        "backbone": arch,
    }
    return full, image, text


def prepare_one(ckpt_path: str, out_dir: str,
                name: Optional[str] = None, verify: bool = True) -> str:
    """Convert one OpenAI CLIP checkpoint into the prepared npz + JSON
    artifacts. Returns the detected backbone name."""
    from ..models import convert as C

    if name is not None and verify:
        verify_checkpoint(name, ckpt_path)
    elif name is None and verify:
        # Identify an unnamed file by its hash when it IS a release ckpt.
        got = sha256_file(ckpt_path)
        for n in MODEL_URLS:
            if expected_sha256(n) == got:
                name = n
                break
        if name is None:
            logger.warning(
                "%s does not match any release checkpoint's sha256; "
                "converting without manifest verification", ckpt_path)

    sd = C.load_torch_state_dict(ckpt_path)
    arch = C.detect_clip_arch(sd)
    if name is not None and MODEL_NAME_MAP[name] != arch:
        raise ValueError(
            f"{ckpt_path} was named {name} but its state dict is {arch}")
    is_vit = arch.startswith("vit")

    weight_dir = os.path.join(out_dir, "weights")
    config_dir = os.path.join(out_dir, "configs")
    os.makedirs(weight_dir, exist_ok=True)
    os.makedirs(config_dir, exist_ok=True)

    full_p, full_s = C.convert_clip_ebc(sd, is_vit=is_vit)
    img_p, img_s = (C.convert_clip_vit if is_vit else C.convert_clip_resnet)(
        sd, True)  # include the pooled head's projection for standalone use
    txt_p, txt_s = C.convert_clip_text(sd)

    meta = {"backbone": arch, "source_sha256": sha256_file(ckpt_path)}
    C.save_prepared_tree(
        os.path.join(weight_dir, f"clip_{arch}.npz"), full_p, full_s,
        {**meta, "split": "full"})
    C.save_prepared_tree(
        os.path.join(weight_dir, f"clip_image_encoder_{arch}.npz"), img_p, img_s,
        {**meta, "split": "image"})
    C.save_prepared_tree(
        os.path.join(weight_dir, f"clip_text_encoder_{arch}.npz"), txt_p, txt_s,
        {**meta, "split": "text"})

    full_cfg, img_cfg, txt_cfg = _arch_configs(sd, arch)
    for fname, cfg in (
        (f"clip_{arch}.json", full_cfg),
        (f"clip_image_encoder_{arch}.json", img_cfg),
        (f"clip_text_encoder_{arch}.json", txt_cfg),
    ):
        with open(os.path.join(config_dir, fname), "w") as f:
            json.dump(cfg, f, indent=4)
    logger.info("prepared %s -> %s/weights/clip_%s.npz", ckpt_path, out_dir, arch)
    return arch


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Verify, split, and convert OpenAI CLIP checkpoints "
                    "into Flax prepared artifacts")
    p.add_argument("--src", type=str, default=None,
                   help="a .pt checkpoint file, or a directory of them "
                        "(e.g. a mounted ~/.cache/clip)")
    p.add_argument("--models", type=str, nargs="*", default=None,
                   help="OpenAI names to prepare (default: every manifest "
                        f"model found under --src); choices: {available_models()}")
    p.add_argument("--download", action="store_true",
                   help="download missing checkpoints (requires egress)")
    p.add_argument("--download_root", type=str,
                   default=os.path.expanduser("~/.cache/clip"))
    p.add_argument("--out", type=str, default="prepared",
                   help="output directory (weights/ + configs/ created inside)")
    p.add_argument("--no-verify", dest="verify", action="store_false",
                   help="skip sha256 manifest verification")
    return p


def main(argv: Optional[List[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    args = build_parser().parse_args(argv)

    jobs: List[Tuple[Optional[str], str]] = []  # (manifest name | None, path)
    if args.src and os.path.isfile(args.src):
        name = args.models[0] if args.models else None
        if name is not None and name not in MODEL_URLS:
            raise SystemExit(f"unknown model {name!r}; choices: {available_models()}")
        jobs.append((name, args.src))
    elif args.src and os.path.isdir(args.src):
        wanted = args.models if args.models else available_models()
        for name in wanted:
            if name not in MODEL_URLS:
                raise SystemExit(
                    f"unknown model {name!r}; choices: {available_models()}")
            path = os.path.join(args.src, os.path.basename(MODEL_URLS[name]))
            if os.path.isfile(path):
                jobs.append((name, path))
            elif args.models:  # explicitly requested -> hard error
                raise SystemExit(f"{name}: {path} not found under --src")
        if not jobs:
            raise SystemExit(f"no manifest checkpoints found under {args.src}")
    elif args.download:
        for name in (args.models or available_models()):
            if name not in MODEL_URLS:
                raise SystemExit(
                    f"unknown model {name!r}; choices: {available_models()}")
            jobs.append((name, download(name, args.download_root)))
    else:
        raise SystemExit("pass --src FILE|DIR, or --download")

    for name, path in jobs:
        prepare_one(path, args.out, name=name, verify=args.verify)
    print(f"prepared {len(jobs)} checkpoint(s) -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
