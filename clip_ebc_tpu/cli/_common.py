"""Shared helpers for the inference drivers (test_nwpu, predict).

Keeps the checkpoint-restore branching and the int8_static calibration
recipe in ONE place so the two drivers cannot drift.
"""

from __future__ import annotations

import os
from typing import Iterable


def check_quant_support(quant: str, model_name: str) -> None:
    """--quant only quantizes the CLIP trunk + decoder; get_model silently
    ignores unknown kwargs for CNN backbones (reference-compatible loose
    kwargs), which would turn --quant into a no-op — reject instead."""
    if quant != "none" and not model_name.lower().startswith("clip_"):
        raise SystemExit(
            f"--quant {quant} is only supported for clip_* models "
            f"(got --model {model_name}); the CNN backbones have no "
            "quantized path"
        )


def load_weights(args, model, template):
    """Resolve --pretrained / --weight_path into an inference variables
    dict.

    Semantics: --pretrained converts+overlays a torch checkpoint onto the
    fresh init; --weight_path then restores a full trained snapshot, which
    REPLACES every weight (it is a complete state, not a delta) — the
    pretrained overlay only matters when no --weight_path is given."""
    from ..training.checkpoint import CheckpointManager

    if args.pretrained is None and args.weight_path is None:
        raise SystemExit("one of --weight_path / --pretrained is required")

    variables = None
    if args.pretrained:
        from ..models.pretrained import apply_pretrained

        template = apply_pretrained(
            model, dict(template), args.pretrained,
            allow_byte_tokenizer=getattr(args, "allow_byte_tokenizer", False),
        )
        variables = {"params": template["params"]}
        if template.get("batch_stats"):
            variables["batch_stats"] = template["batch_stats"]

    if args.weight_path is not None:
        weight_path = os.path.abspath(args.weight_path)
        weights_t = {"params": template["params"]}
        if "batch_stats" in template:
            weights_t["batch_stats"] = template["batch_stats"]
        if os.path.isdir(os.path.join(weight_path, "latest")):
            mgr = CheckpointManager(weight_path)
            restored = mgr.restore_weights_from_state(
                os.path.join(weight_path, "latest"), weights_t
            )
        else:  # weights-only snapshot (best/*)
            mgr = CheckpointManager(os.path.dirname(weight_path) or ".")
            restored = mgr.restore_weights(weight_path, weights_t)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
    return variables


def calibrate_static_int8(
    args, model_kw, bins, anchors, variables, images: Iterable,
):
    """Populate the ``"quant"`` collection for a quant_mode="static" model:
    run a dynamic-quant twin (same params) over window batches extracted
    from ``images`` (arrays, already normalized), recording per-matmul
    activation max-abs (ops.quant.calibrate_int8)."""
    import jax
    import numpy as np

    from ..models import get_model
    from ..ops.quant import calibrate_int8
    from ..ops.sliding_window import window_grid

    dyn = get_model(
        args.model, args.input_size, args.reduction, bins, anchors,
        quant_mode="dynamic", **model_kw,
    )
    win = getattr(args, "window_size", None) or args.input_size
    batches = []
    for image in images:
        image = np.asarray(image)
        h, w = image.shape[:2]
        if h < win or w < win:  # pad tiny images up to one window
            pad = np.zeros((max(h, win), max(w, win), 3), image.dtype)
            pad[:h, :w] = image
            image, (h, w) = pad, pad.shape[:2]
        coords = window_grid((h, w), (win, win), (win, win))[:16]
        batches.append(
            np.stack([image[y : y + win, x : x + win] for y, x in coords])
        )
    apply_fn = jax.jit(lambda v, b: dyn.apply(v, b, train=False, mutable=["quant"]))
    variables = calibrate_int8(apply_fn, variables, batches)
    print(f"calibrated int8 scales on {len(batches)} image(s)")
    return variables
