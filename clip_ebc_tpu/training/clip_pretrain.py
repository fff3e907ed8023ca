"""Synthetic count-supervised CLIP pretraining.

The reference never trains CLIP's text tower: CLIP-EBC fine-tunes from
OpenAI-pretrained towers and freezes the text side (reference
models/clip/model.py:127-129). Round-3 diagnosis (STATUS r3,
CONVERGENCE_r03_CLIP.json) proved — bit-for-bit against the reference's
own torch stack — that WITHOUT pretrained weights the EBC cosine head
scores blocks against frozen *random* text embeddings and plateaus ~8x
above an all-zero predictor. This module supplies the missing existence
proof in a zero-egress environment (VERDICT r3 item 3): pretrain the
joint ``Clip`` (models/clip/clip_model.py) on rendered crowd crops paired
with the SAME bin prompts the EBC head uses (models/clip/prompts.py
``bin_prompts``), so count semantics land in the text embedding space,
then run the standard EBC fine-tune with the text tower frozen.

The objective is CLIP-style: image CLS embeddings vs the bin-prompt text
embeddings, symmetric temperature-scaled cosine logits, cross-entropy
against the crop's true count bin. Both towers (and logit_scale) train.
Tokenization uses whatever tokenizer is active — self-consistent between
pretrain and fine-tune, so the byte-fallback tokenizer is CORRECT here
(unlike with OpenAI checkpoints, where it is a hard error).

The pretrained towers export as a prepared ``.npz``
(models/convert.save_prepared_tree) with ``image_encoder``/``text_encoder``
trees — the exact artifact the trainer's ``--pretrained`` flag consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    backbone: str = "vit_b_16"
    input_size: int = 224
    bins: Sequence[Tuple[float, float]] = ()
    prompt_type: str = "word"
    steps: int = 1500
    batch_size: int = 64
    dataset_size: int = 2048
    lr: float = 1e-4
    warmup_steps: int = 100
    seed: int = 0
    dtype: str = "bfloat16"
    # Auxiliary penalty on squared off-diagonal cosines between the bin
    # text embeddings. OpenAI-scale contrastive training produces count
    # prompts with well-spread text features; a few hundred synthetic
    # steps do not (measured: off-diag cos ~0.99, and the downstream
    # frozen-text cosine head then plateaus exactly like the random-text
    # control). This term is the synthetic stand-in for that spread;
    # 0 disables.
    text_spread: float = 1.0


def _count_for_bin(rng: np.random.Generator, lo: float, hi: float) -> int:
    """Sample a crop count inside a bin; open-ended bins sample lo..lo+4."""
    if lo == hi:
        return int(lo)
    if np.isinf(hi):
        return int(lo) + int(rng.integers(0, 5))
    return int(rng.integers(int(lo), int(hi) + 1))


def make_pretrain_dataset(cfg: PretrainConfig, rng: np.random.Generator
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Render ``dataset_size`` crops with bin-balanced counts.

    Returns (uint8 images (N, S, S, 3), int32 bin labels (N,)) — uint8 so
    the whole set uploads once (ImageNet normalization runs on device).
    """
    from ..data.synthetic import render_crowd_scene

    n, s = cfg.dataset_size, cfg.input_size
    images = np.empty((n, s, s, 3), np.uint8)
    labels = np.empty((n,), np.int32)
    bins = list(cfg.bins)
    for i in range(n):
        b = int(rng.integers(0, len(bins)))
        count = _count_for_bin(rng, *bins[b])
        img, _ = render_crowd_scene(rng, size=(s, s), count=count)
        images[i] = img
        labels[i] = b
    return images, labels


def pretrain_clip(cfg: PretrainConfig, progress: bool = False,
                  data: Optional[Tuple[np.ndarray, np.ndarray]] = None
                  ) -> Tuple[Dict, Dict[str, float]]:
    """Train the joint Clip on count-prompt classification.

    Returns (variables, info) where ``info`` carries the first/last loss
    and final train accuracy.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..data.crowd import IMAGENET_MEAN, IMAGENET_STD
    from ..models.clip.clip_model import Clip
    from ..models.clip.prompts import bin_prompts
    from ..models.clip.tokenizer import tokenize

    if not cfg.bins:
        raise ValueError("PretrainConfig.bins must be set (the EBC bin table)")
    rng = np.random.default_rng(cfg.seed)
    if data is None:
        data = make_pretrain_dataset(cfg, rng)
    images_u8, labels = data

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = Clip(backbone=cfg.backbone, input_size=cfg.input_size, dtype=dtype)
    tokens = jnp.asarray(tokenize(list(bin_prompts(cfg.bins, cfg.prompt_type))))

    key = jax.random.PRNGKey(cfg.seed)
    variables = model.init(
        key, jnp.zeros((1, cfg.input_size, cfg.input_size, 3), dtype), tokens)
    params = variables["params"]

    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps),
         optax.cosine_decay_schedule(cfg.lr, max(cfg.steps - cfg.warmup_steps, 1))],
        [cfg.warmup_steps],
    )
    tx = optax.adam(schedule)
    opt_state = tx.init(params)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    @jax.jit
    def step(params, opt_state, batch_u8, batch_labels):
        x = (batch_u8.astype(jnp.float32) / 255.0 - mean) / std

        def loss_fn(p):
            img = model.apply({"params": p}, x.astype(dtype),
                              method="encode_image").astype(jnp.float32)
            txt = model.apply({"params": p}, tokens,
                              method="encode_text").astype(jnp.float32)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True).clip(1e-12)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True).clip(1e-12)
            logits = jnp.exp(p["logit_scale"]) * img @ txt.T
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, batch_labels[:, None], axis=-1)
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == batch_labels).astype(jnp.float32))
            n = txt.shape[0]
            cos = txt @ txt.T
            spread = ((cos - jnp.eye(n)) ** 2).sum() / (n * (n - 1))
            return nll.mean() + cfg.text_spread * spread, (acc, spread)

        (loss, (acc, spread)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, loss, acc,
                spread)

    # whole dataset rides on device once (uint8); batches are gathers
    dev_images = jnp.asarray(images_u8)
    dev_labels = jnp.asarray(labels)

    @jax.jit
    def gather(idx):
        return jnp.take(dev_images, idx, axis=0), jnp.take(dev_labels, idx, axis=0)

    first_loss = last_loss = last_acc = None
    for it in range(cfg.steps):
        idx = jnp.asarray(
            rng.integers(0, len(labels), cfg.batch_size), jnp.int32)
        bx, by = gather(idx)
        params, opt_state, loss, acc, spread = step(params, opt_state, bx, by)
        if it == 0:
            first_loss = float(loss)
        if progress and (it % 100 == 0 or it == cfg.steps - 1):
            print(f"  step {it}: loss={float(loss):.4f} acc={float(acc):.3f} "
                  f"txt_offdiag_cos2={float(spread):.4f}",
                  flush=True)
    last_loss, last_acc = float(loss), float(acc)

    info = {"first_loss": first_loss, "last_loss": last_loss,
            "last_acc": last_acc, "text_offdiag_cos2": float(spread)}
    return {"params": params}, info


def clip_to_ebc_overlay(clip_variables: Dict) -> Tuple[Dict, Dict]:
    """Map a trained ``Clip``'s trees onto ClipEBC's subtree names:
    visual -> image_encoder (minus the pooled ``proj``), text ->
    text_encoder, plus logit_scale.

    No positional-embedding surgery is needed: both modules allocate the
    CANONICAL (224/patch)^2+1 embedding and bicubically interpolate per
    forward (models/clip/image_encoder.py), so pretrain and fine-tune may
    use different input sizes and the trees still match exactly."""
    params = dict(clip_variables["params"])
    visual = {k: v for k, v in params["visual"].items() if k != "proj"}
    overlay = {
        "image_encoder": visual,
        "text_encoder": dict(params["text"]),
        "logit_scale": np.asarray(params["logit_scale"], np.float32),
    }
    stats = {}
    bs = clip_variables.get("batch_stats") or {}
    if "visual" in bs:
        stats["image_encoder"] = dict(bs["visual"])
    return overlay, stats


def save_pretrained(path: str, clip_variables: Dict, backbone: str) -> None:
    """Write the prepared-artifact npz the trainer's --pretrained consumes."""
    from ..models import convert as C

    overlay, stats = clip_to_ebc_overlay(clip_variables)
    C.save_prepared_tree(path, overlay, stats,
                         {"backbone": backbone, "split": "full",
                          "source": "synthetic_count_pretrain"})
