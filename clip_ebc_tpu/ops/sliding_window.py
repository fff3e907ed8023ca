"""Sliding-window inference as one compiled program.

The reference builds the window list in Python, runs one batched forward,
then assembles the overlap-average on the host in numpy
(reference utils/eval_utils.py:26-96). Here the whole thing is device-side
and XLA-compiled:

- window starts are a static grid (edge-clamped like the reference);
- windows are gathered with vmapped ``dynamic_slice``;
- the window batch is padded up to a bucket size so the model forward
  compiles once per bucket instead of once per distinct window count;
- overlap assembly exploits that the window grid is a compile-time
  constant: per-window output indices are precomputed in numpy and the
  whole assembly is ONE parallel scatter-add (plus a *static* hit-count
  map baked in as a constant), or a scatter-max for the "max" strategy
  (documented in the reference README but never implemented there — see
  reference README.md:192). This replaces the reference's host-side numpy
  loop (reference eval_utils.py:79-96) with a single fused device op.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_grid(
    image_hw: Tuple[int, int], window: Tuple[int, int], stride: Tuple[int, int]
) -> np.ndarray:
    """Static (N, 2) array of (y, x) window starts, edge-clamped
    (reference eval_utils.py:59-69)."""
    (h, w), (wh, ww), (sh, sw) = image_hw, window, stride
    if wh > h or ww > w:
        raise ValueError(f"window {window} larger than image {image_hw}")
    rows = int(np.ceil((h - wh) / sh) + 1)
    cols = int(np.ceil((w - ww) / sw) + 1)
    starts = []
    for i in range(rows):
        y = min(i * sh, h - wh)
        for j in range(cols):
            x = min(j * sw, w - ww)
            starts.append((y, x))
    return np.asarray(starts, np.int32)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "window", "stride", "reduction", "strategy", "bucket", "mesh",
    ),
)
def sliding_window_predict(
    apply_fn: Callable,  # (variables, windows[N,wh,ww,3]) -> density[N,wh/r,ww/r]
    variables,  # model weights, passed as a traced argument (NOT closed
    # over: closure constants would bake the full parameter set into the
    # compiled program)
    image: jnp.ndarray,  # (H, W, 3)
    window: Tuple[int, int],
    stride: Tuple[int, int],
    reduction: int,
    strategy: str = "average",
    bucket: int = 16,
    mesh=None,
) -> jnp.ndarray:
    """Predict the full-image density map ((H/r, W/r)) by sliding windows.

    With ``mesh``, the window batch is sharded across the mesh's 'data'
    axis — one large image fans out over the whole pod (the TPU-native
    sequence-scaling equivalent of the reference's host-side window loop),
    and GSPMD gathers the per-window densities back for assembly.
    """
    h, w, _ = image.shape
    wh, ww = window
    starts = jnp.asarray(window_grid((h, w), window, stride))
    n = starts.shape[0]
    if mesh is not None:
        bucket = max(bucket, mesh.shape["data"])
        bucket = _round_up(bucket, mesh.shape["data"])
    n_pad = _round_up(n, bucket)
    starts_padded = jnp.concatenate(
        [starts, jnp.zeros((n_pad - n, 2), jnp.int32)], axis=0
    )
    def gather(yx):
        return jax.lax.dynamic_slice(image, (yx[0], yx[1], 0), (wh, ww, image.shape[2]))

    windows = jax.vmap(gather)(starts_padded)  # (n_pad, wh, ww, 3)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        windows = jax.lax.with_sharding_constraint(
            windows, NamedSharding(mesh, P("data"))
        )
    preds = apply_fn(variables, windows)  # (n_pad, wh/r, ww/r)
    bh, bw = wh // reduction, ww // reduction
    if preds.shape[-2:] != (bh, bw):
        raise ValueError(
            f"model produced {preds.shape[-2:]} blocks for window {window} "
            f"at reduction {reduction}"
        )
    return assemble_windows(
        preds[:n], (h, w), window, stride, reduction, strategy
    )


def assemble_windows(
    preds: jnp.ndarray,  # (n, wh/r, ww/r) per-window densities, grid order
    image_hw: Tuple[int, int],
    window: Tuple[int, int],
    stride: Tuple[int, int],
    reduction: int,
    strategy: str = "average",
) -> jnp.ndarray:
    """Overlap-average (or -max) assembly of per-window densities into the
    full (H/r, W/r) map. The window grid is static, so every window's flat
    output indices — and the overlap hit-count map — are compile-time numpy
    constants; assembly is ONE parallel scatter (no serial scan)."""
    (h, w) = image_hw
    bh, bw = window[0] // reduction, window[1] // reduction
    hr, wr = h // reduction, w // reduction
    preds = preds.astype(jnp.float32)
    starts_np = np.asarray(window_grid((h, w), window, stride)) // reduction  # (n, 2)
    oy, ox = np.mgrid[0:bh, 0:bw]  # (bh, bw)
    flat_idx = (
        (starts_np[:, 0, None, None] + oy) * wr + (starts_np[:, 1, None, None] + ox)
    ).astype(np.int32)  # (n, bh, bw)
    preds_valid = preds.reshape(-1)

    if strategy == "average":
        cnt = np.zeros(hr * wr, np.float32)
        np.add.at(cnt, flat_idx.reshape(-1), 1.0)
        acc = jnp.zeros(hr * wr, jnp.float32).at[flat_idx.reshape(-1)].add(
            preds_valid, mode="drop", unique_indices=False
        )
        return (acc / jnp.asarray(np.maximum(cnt, 1.0))).reshape(hr, wr)

    if strategy == "max":
        acc = jnp.full(hr * wr, -jnp.inf, jnp.float32).at[flat_idx.reshape(-1)].max(
            preds_valid, mode="drop"
        )
        return jnp.where(jnp.isfinite(acc), acc, 0.0).reshape(hr, wr)

    raise ValueError(f"strategy must be 'average' or 'max', got {strategy}")


def resize_density_map(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of a (H, W) density map, rescaled to preserve total
    mass (reference eval_utils.py:19-23)."""
    total = x.sum()
    out = jax.image.resize(x, size, method="bilinear")
    new_total = out.sum()
    scale = jnp.where(new_total > 0, total / new_total, 0.0)
    return out * scale
