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


def _axis_plan(total: int, win: int, stride: int):
    """One axis of the window grid: (count, n_regular, clamped_start).

    ``count`` positions at ``i*stride`` except possibly the last, which is
    edge-clamped to ``total - win`` (reference eval_utils.py:59-69). When
    the last position falls exactly on the stride grid there is no clamped
    window (``clamped_start is None`` and ``n_regular == count``)."""
    count = int(np.ceil((total - win) / stride) + 1)
    last = total - win
    if (count - 1) * stride == last:
        return count, count, None
    return count, count - 1, last


def _dense_ok(window: Tuple[int, int], stride: Tuple[int, int]) -> bool:
    import os

    if os.environ.get("EBC_DENSE_WINDOWS", "1") == "0":  # A/B safety valve
        return False
    return window[0] % stride[0] == 0 and window[1] % stride[1] == 0


def default_bucket() -> int:
    """Window-count pad multiple (EBC_SW_BUCKET, default 16).

    The window batch pads up to a multiple of ``bucket`` so mixed-size
    datasets compile few distinct trunk programs (n_pad values). On a
    FIXED eval shape the padding is pure waste — the flagship 2048x3072
    image has 140 windows, padded to 144 = +2.9% trunk compute — so
    fixed-shape deployments can drop the bucket (e.g. EBC_SW_BUCKET=4:
    140 stays 140 and the kernel batch-block divides it) at the cost of
    one program per distinct window count."""
    import os

    return int(os.environ.get("EBC_SW_BUCKET", "16"))


def gather_windows_dense(
    image: jnp.ndarray, window: Tuple[int, int], stride: Tuple[int, int]
) -> jnp.ndarray:
    """Gather the sliding-window batch with reshapes/concats only — no
    dynamic_slice, no gather HLO.

    Requires ``stride`` to divide ``window`` (true for both the flagship
    224/224 eval config, reference run.sh:25, and the test_nwpu 224/112
    default, reference test_nwpu.py:75). The regular grid is an unfold:
    split each axis into stride-blocks, then window ``i`` is the concat of
    blocks ``i..i+k-1`` (k = window//stride) — ``k`` shifted views
    concatenated. Edge-clamped last row/col are plain static slices. XLA
    lowers all of it as dense copies at HBM speed; the r5 ledger measured
    the vmapped-dynamic_slice gather + scatter assembly at ~18 ms/image
    (~100x the bandwidth floor), motivating this path.

    Window order matches :func:`window_grid` (row-major).
    """
    h, w, c = image.shape
    (wh, ww), (sh, sw) = window, stride
    ky, kx = wh // sh, ww // sw
    rows, rows_reg, y_last = _axis_plan(h, wh, sh)
    cols, cols_reg, x_last = _axis_plan(w, ww, sw)
    # bands along y: (rows, wh, w, c)
    a = image[: (rows_reg - 1 + ky) * sh].reshape(rows_reg - 1 + ky, sh, w, c)
    bands = jnp.concatenate([a[i : i + rows_reg] for i in range(ky)], axis=1)
    if y_last is not None:
        bands = jnp.concatenate([bands, image[None, y_last : y_last + wh]], axis=0)
    # windows along x within every band: (rows, wh, cols_reg, ww, c)
    b = bands[:, :, : (cols_reg - 1 + kx) * sw].reshape(
        rows, wh, cols_reg - 1 + kx, sw, c
    )
    wins = jnp.concatenate([b[:, :, j : j + cols_reg] for j in range(kx)], axis=3)
    wins = wins.transpose(0, 2, 1, 3, 4)  # (rows, cols_reg, wh, ww, c)
    if x_last is not None:
        last_col = bands[:, :, x_last : x_last + ww]  # (rows, wh, ww, c)
        wins = jnp.concatenate([wins, last_col[:, None]], axis=1)
    return wins.reshape(rows * cols, wh, ww, c)


def gather_windows_flat(
    image2d: jnp.ndarray, window: Tuple[int, int], stride: Tuple[int, int]
) -> jnp.ndarray:
    """:func:`gather_windows_dense` on a channel-flattened image.

    ``image2d`` is ``(H, W*C)`` and ``window``/``stride`` carry the
    x-extent already multiplied by C; returns ``(n, wh, ww*C)`` flat
    windows in :func:`window_grid` order. Same reshape/concat/transpose
    unfold, but every copy's minor (lane) dimension is ``ww*C`` (672 for
    flagship RGB 224px windows) instead of C=3, and consumers take the
    flat windows directly (ClipViT/PatchifyMatmul 3-D input) so the
    channel split never rematerializes a c-minor tensor. Measured neutral
    -0.39 ms at the flagship shape when the source image is device-
    resident as (H, W, 3) (the flatten just relocates the c-minor
    relayout — see ``_flat_gather_ok``); the intended use is hosts that
    upload pixels pre-flattened."""
    h, wc = image2d.shape
    (wh, wwc), (sh, swc) = window, stride
    ky, kx = wh // sh, wwc // swc
    rows, rows_reg, y_last = _axis_plan(h, wh, sh)
    cols, cols_reg, x_last = _axis_plan(wc, wwc, swc)
    a = image2d[: (rows_reg - 1 + ky) * sh].reshape(rows_reg - 1 + ky, sh, wc)
    bands = jnp.concatenate([a[i : i + rows_reg] for i in range(ky)], axis=1)
    if y_last is not None:
        bands = jnp.concatenate([bands, image2d[None, y_last : y_last + wh]], axis=0)
    b = bands[:, :, : (cols_reg - 1 + kx) * swc].reshape(
        rows, wh, cols_reg - 1 + kx, swc
    )
    wins = jnp.concatenate([b[:, :, j : j + cols_reg] for j in range(kx)], axis=3)
    wins = wins.transpose(0, 2, 1, 3)  # (rows, cols_reg, wh, wwc)
    if x_last is not None:
        last_col = bands[:, :, x_last : x_last + wwc]  # (rows, wh, wwc)
        wins = jnp.concatenate([wins, last_col[:, None]], axis=1)
    return wins.reshape(rows * cols, wh, wwc)


def _flat_gather_ok(window, stride, patch: int) -> bool:
    """Flat-pixel gather gate: dense-unfold geometry + a ViT trunk
    (``patch > 0`` — callers pass it only for trunks whose forward accepts
    3-D flat-pixel windows).

    OPT-IN (EBC_FLAT_GATHER=1): the r5 chip A/B at the flagship shape
    measured it 0.39 ms/image SLOWER than the 4-D pixel unfold (29.86 vs
    29.47 ms latency-cancelled, AB_DECPRE_r05.json) — the device-resident
    image is (H, W, 3), so flattening it inside the program just moves the
    c-minor relayout instead of deleting it, while XLA already fuses the
    4-D unfold into the patchify chain. Kept for hosts that upload the
    image pre-flattened (same row-major bytes as (H, W*3)), where the
    in-program reshape disappears."""
    import os

    if os.environ.get("EBC_FLAT_GATHER", "0") != "1":
        return False
    return patch > 0 and _dense_ok(window, stride)


def _token_gather_ok(
    image_hw: Tuple[int, int],
    window: Tuple[int, int],
    stride: Tuple[int, int],
    patch: int,
) -> bool:
    """The token fast path needs every window start to land on the global
    ``patch`` grid: image dims, window, and stride all patch-multiples
    (then the edge-clamped starts H-wh / W-ww are too), plus the dense
    unfold's stride-divides-window condition on the token grid.

    OPT-IN (EBC_TOKEN_GATHER=1): the r5 chip A/B measured the token path
    0.8 ms/image SLOWER than the pixel unfold at the flagship shape
    (30.17 vs 29.35 ms latency-cancelled, AB_DECPRE_r05.json) — XLA
    already fuses the pixel unfold into the patchify reshape chain, so
    skipping the ~12% overlap recompute doesn't pay for the separate
    global-embed pass. Kept for grids with real overlap (stride < window
    multiplies the patchify recompute 4x at stride=window/2, where the
    balance can differ)."""
    import os

    if os.environ.get("EBC_TOKEN_GATHER", "0") != "1":
        return False
    (h, w), (wh, ww), (sh, sw) = image_hw, window, stride
    return (
        patch > 0
        and h % patch == 0 and w % patch == 0
        and wh % patch == 0 and ww % patch == 0
        and sh % patch == 0 and sw % patch == 0
        and _dense_ok(window, stride)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "window", "stride", "reduction", "strategy", "bucket", "mesh",
        "embed_fn", "token_apply_fn", "patch",
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
    bucket: int = None,  # None -> default_bucket() (EBC_SW_BUCKET, 16)
    mesh=None,
    embed_fn: Callable = None,  # (variables, image[1,H,W,3]) -> tokens
    # (1, H/p, W/p, width): the trunk's patchify, run ONCE on the image
    token_apply_fn: Callable = None,  # (variables, tokens[N,wh/p,ww/p,width])
    # -> density[N,wh/r,ww/r]: the trunk minus patchify
    patch: int = 0,  # ViT patch size; 0 disables the token path
) -> jnp.ndarray:
    """Predict the full-image density map ((H/r, W/r)) by sliding windows.

    With ``mesh``, the window batch is sharded across the mesh's 'data'
    axis — one large image fans out over the whole pod (the TPU-native
    sequence-scaling equivalent of the reference's host-side window loop),
    and GSPMD gathers the per-window densities back for assembly.

    Token fast path (ViT trunks): when ``embed_fn``/``token_apply_fn``/
    ``patch`` are given and the whole window grid is patch-aligned
    (flagship 224/224 eval on snap-32 NWPU sizes qualifies), the image is
    patch-embedded ONCE and windows are unfolded on the token grid. This
    (a) skips the ~12% patchify recompute on window overlap, and (b) moves
    every unfold copy from channel-3 pixel tensors (3/128 lane utilization
    on TPU) to width-lane token tensors — the pixel gather was the single
    biggest above-floor stage in the r5 ledger (LEDGER_DECPRE_r05.json).
    Per-window results are identical to per-window patchify because
    patchify is a per-patch linear map on a non-overlapping grid.
    """
    h, w, _ = image.shape
    wh, ww = window
    starts = jnp.asarray(window_grid((h, w), window, stride))
    n = starts.shape[0]
    if bucket is None:
        bucket = default_bucket()
    if mesh is not None:
        bucket = max(bucket, mesh.shape["data"])
        bucket = _round_up(bucket, mesh.shape["data"])
    n_pad = _round_up(n, bucket)
    use_tokens = (
        embed_fn is not None
        and token_apply_fn is not None
        and _token_gather_ok((h, w), window, stride, patch)
    )
    if use_tokens:
        tokens = embed_fn(variables, image[None])[0]  # (h/p, w/p, width)
        wins = gather_windows_dense(
            tokens, (wh // patch, ww // patch), (stride[0] // patch, stride[1] // patch)
        )  # (n, wh/p, ww/p, width)
        windows = jnp.concatenate(
            [wins, jnp.zeros((n_pad - n,) + wins.shape[1:], wins.dtype)], axis=0
        ) if n_pad > n else wins
    elif _flat_gather_ok(window, stride, patch):
        # channel-flattened unfold: every relayout copy gets a wide lane
        # dim (ww*3) instead of 3; ClipViT consumes (n, wh, ww*3) directly
        c = image.shape[2]
        wins = gather_windows_flat(
            image.reshape(h, w * c), (wh, ww * c), (stride[0], stride[1] * c)
        )  # (n, wh, ww*c)
        windows = jnp.concatenate(
            [wins, jnp.zeros((n_pad - n,) + wins.shape[1:], wins.dtype)], axis=0
        ) if n_pad > n else wins
    elif _dense_ok(window, stride):
        # reshape/concat unfold — no dynamic_slice (see gather_windows_dense)
        wins = gather_windows_dense(image, window, stride)
        windows = jnp.concatenate(
            [wins, jnp.zeros((n_pad - n,) + wins.shape[1:], wins.dtype)], axis=0
        ) if n_pad > n else wins
    else:
        starts_padded = jnp.concatenate(
            [starts, jnp.zeros((n_pad - n, 2), jnp.int32)], axis=0
        )

        def gather(yx):
            return jax.lax.dynamic_slice(
                image, (yx[0], yx[1], 0), (wh, ww, image.shape[2])
            )

        windows = jax.vmap(gather)(starts_padded)  # (n_pad, wh, ww, 3)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        windows = jax.lax.with_sharding_constraint(
            windows, NamedSharding(mesh, P("data"))
        )
    if use_tokens:
        preds = token_apply_fn(variables, windows)  # (n_pad, wh/r, ww/r)
    else:
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
    if (
        strategy == "average"
        and _dense_ok(window, stride)
        and stride[0] % reduction == 0
        and stride[1] % reduction == 0
    ):
        return _assemble_windows_dense(preds, image_hw, window, stride, reduction)
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


def _assemble_windows_dense(
    preds: jnp.ndarray,  # (n, bh, bw) float32, grid order
    image_hw: Tuple[int, int],
    window: Tuple[int, int],
    stride: Tuple[int, int],
    reduction: int,
) -> jnp.ndarray:
    """Scatter-free overlap-average assembly (stride divides window).

    TPU scatters serialize; but the grid is static, so decompose it into
    ``k*k`` *phases* (k = window//stride): windows whose row index is
    congruent mod k are spaced exactly one window apart — non-overlapping —
    so each phase reassembles with a transpose+reshape and lands with one
    padded add. Clamped last row/col land as padded band adds. The overlap
    hit-count map is a compile-time constant divisor, exactly as in the
    scatter path; results are bit-identical summation order per pixel up
    to float add reassociation."""
    h, w = image_hw
    (wh, ww), (sh, sw) = window, stride
    bh, bw = wh // reduction, ww // reduction
    srh, srw = sh // reduction, sw // reduction
    hr, wr = h // reduction, w // reduction
    ky, kx = wh // sh, ww // sw
    rows, rows_reg, y_last = _axis_plan(h, wh, sh)
    cols, cols_reg, x_last = _axis_plan(w, ww, sw)
    y_last_r = None if y_last is None else y_last // reduction
    x_last_r = None if x_last is None else x_last // reduction
    grid = preds.reshape(rows, cols, bh, bw)

    def place(block: jnp.ndarray, y0: int, x0: int) -> jnp.ndarray:
        return jnp.pad(
            block,
            ((y0, hr - y0 - block.shape[0]), (x0, wr - x0 - block.shape[1])),
        )

    acc = jnp.zeros((hr, wr), jnp.float32)
    # regular-grid phases
    for p in range(ky):
        ny = len(range(p, rows_reg, ky))
        if ny == 0:
            continue
        for q in range(kx):
            nx = len(range(q, cols_reg, kx))
            if nx == 0:
                continue
            blk = grid[p:rows_reg:ky, q:cols_reg:kx]  # (ny, nx, bh, bw)
            blk = blk.transpose(0, 2, 1, 3).reshape(ny * bh, nx * bw)
            acc = acc + place(blk, p * srh, q * srw)
    # clamped last row (regular cols), by x-phase
    if y_last_r is not None:
        for q in range(kx):
            nx = len(range(q, cols_reg, kx))
            if nx == 0:
                continue
            blk = grid[rows - 1, q:cols_reg:kx]  # (nx, bh, bw)
            blk = blk.transpose(1, 0, 2).reshape(bh, nx * bw)
            acc = acc + place(blk, y_last_r, q * srw)
    # clamped last col (regular rows), by y-phase
    if x_last_r is not None:
        for p in range(ky):
            ny = len(range(p, rows_reg, ky))
            if ny == 0:
                continue
            blk = grid[p:rows_reg:ky, cols - 1]  # (ny, bh, bw)
            blk = blk.reshape(ny * bh, bw)
            acc = acc + place(blk, p * srh, x_last_r)
    # clamped corner
    if y_last_r is not None and x_last_r is not None:
        acc = acc + place(grid[rows - 1, cols - 1], y_last_r, x_last_r)

    starts_np = np.asarray(window_grid((h, w), window, stride)) // reduction
    oy, ox = np.mgrid[0:bh, 0:bw]
    flat_idx = (
        (starts_np[:, 0, None, None] + oy) * wr + (starts_np[:, 1, None, None] + ox)
    ).astype(np.int32)
    cnt = np.zeros(hr * wr, np.float32)
    np.add.at(cnt, flat_idx.reshape(-1), 1.0)
    return acc / jnp.asarray(np.maximum(cnt, 1.0).reshape(hr, wr))


def resize_density_map(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of a (H, W) density map, rescaled to preserve total
    mass (reference eval_utils.py:19-23)."""
    total = x.sum()
    out = jax.image.resize(x, size, method="bilinear")
    new_total = out.sum()
    scale = jnp.where(new_total > 0, total / new_total, 0.0)
    return out * scale
