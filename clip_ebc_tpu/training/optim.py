"""Optimizer: Adam with L2 weight decay + warmup/cosine-restart LR.

Matches the reference's torch Adam semantics (weight decay added to the
gradient before the moment update, reference utils/train_utils.py:81-85)
— i.e. coupled L2, not AdamW — and the per-epoch LambdaLR schedule.

The transform produces a *unit-LR* update (``scale(-1)``); the train step
multiplies by the current learning rate, which the driver computes once
per epoch from :func:`make_schedule` — the functional analog of
``scheduler.step()``.

Frozen parameter subtrees (e.g. the CLIP image/text encoders under VPT)
are excluded via ``optax.multi_transform`` with a path predicate — the
functional analog of the reference's ``requires_grad`` filter.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import optax

from .schedule import warmup_cosine_restarts


def make_optimizer(
    weight_decay: float = 1e-4,
    frozen_predicate: Optional[Callable[[Tuple[str, ...]], bool]] = None,
) -> optax.GradientTransformation:
    """Unit-LR Adam(wd) with an optional frozen-subtree mask.

    frozen_predicate receives the parameter path (tuple of str keys) and
    returns True for parameters that must not train.
    """
    adam = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-1.0),
    )
    if frozen_predicate is None:
        return adam

    def label_tree(params):
        paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)

        def label_for(path):
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            return "frozen" if frozen_predicate(keys) else "train"

        labels = [label_for(path) for path, _ in paths_and_leaves]
        return jax.tree_util.tree_unflatten(treedef, labels)

    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, label_tree
    )


def make_schedule(cfg) -> Callable[[int], float]:
    """Epoch -> lr from an ExperimentConfig (reference train_utils.py:21-59)."""
    return warmup_cosine_restarts(
        base_lr=cfg.lr,
        warmup_epochs=cfg.warmup_epochs,
        warmup_lr=cfg.warmup_lr,
        T_0=cfg.T_0,
        T_mult=cfg.T_mult,
        eta_min=cfg.eta_min,
    )
