"""Cross-image window packing for sliding-window evaluation.

The per-image pipeline (``sliding_window_predict``) pads each image's
window count up to a bucket and compiles one forward program per distinct
padded count. On mixed-size datasets that is doubly wasteful: small images
(ShanghaiTech A is ~12-20 windows at stride 224) pay up to ~40% bucket
padding, and every distinct image shape recompiles the expensive trunk
program. The reference has the same structure per image, on the host
(reference utils/eval_utils.py:26-96).

Here windows from CONSECUTIVE images share fixed-size forward batches:

- per image, a cheap per-shape jitted ``gather-place`` slices ``chunk``
  windows out of the image and writes them into a device-side staging
  buffer at a *traced* offset (no recompile per position);
- whenever the buffer holds ``batch_windows`` windows, ONE fixed-shape
  forward runs — the expensive trunk program compiles exactly once for
  the entire dataset and never executes partially empty;
- per image, a cheap per-shape jitted slice+scatter assembles its density
  map from the forward outputs its windows span.

The padding waste drops from per-image (bucket - n % bucket) to per-image
(chunk - n % chunk) with ``chunk`` small (default 16), and the device is
always running full ``batch_windows`` batches regardless of image sizes.
"""

from __future__ import annotations

import functools
from typing import Callable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sliding_window import assemble_windows, window_grid


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Module-level program caches.
#
# jax.jit caches compiled programs PER FUNCTION OBJECT: a jit created inside
# WindowPacker.__init__ makes every packer instance recompile all of its
# programs from scratch. On a local host that is a few hundred ms of wasted
# tracing; through an RPC relay every compile is a multi-second round trip
# and a per-stream packer measured ~47 s/stream of pure recompilation
# (PACKED_EVAL_r05.json). Keying the jitted helpers on the packer's static
# config (and the forward on its callable identity) makes packer instances
# share programs exactly like `sliding_window_predict` does.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fwd_program(forward: Callable, W: int):
    """Forward on the first W staging slots (the buffer is 2W deep so a
    whole image places in ONE dispatch even when it straddles a batch
    boundary); the slice fuses into the jitted forward."""
    return jax.jit(lambda ctx, buf: forward(ctx, buf[:W]))


@functools.lru_cache(maxsize=None)
def _shift_program(W: int):
    """Drain: shift the staging buffer down by one batch. NOT donated: the
    buffer may still be under async read by the forward dispatch."""

    @jax.jit
    def shift(buf):
        return jnp.concatenate([buf[W:], jnp.zeros_like(buf[W:])])

    return shift


@functools.lru_cache(maxsize=None)
def _gather_place_program(window: Tuple[int, int]):
    """Per-(image-shape, segment-length) fused gather+place: slice a whole
    SEGMENT of windows out of the image and write it into the staging
    buffer in ONE dispatch. starts/off are traced so window positions and
    buffer offsets never recompile; only the segment length (static, one
    per distinct batch-boundary split) does. Keeping gather and place in
    one program matters on dispatch-expensive runtimes (an RPC relay pays
    a fixed ~30 ms round trip per call, and re-ships call operands — one
    call per 16-window chunk made the packer slower than the per-image
    path it exists to beat; see PACKED_EVAL_r05.json)."""
    wh, ww = window

    @functools.partial(jax.jit, static_argnames=("n_seg",))
    def gather_place(buf, image, starts, off, n_seg):
        def one(yx):
            return jax.lax.dynamic_slice(
                image, (yx[0], yx[1], 0), (wh, ww, image.shape[2])
            )

        seg = jax.vmap(one)(starts[:n_seg]).astype(buf.dtype)
        return jax.lax.dynamic_update_slice(buf, seg, (off, 0, 0, 0))

    return gather_place


@functools.lru_cache(maxsize=None)
def _collect_program(
    window: Tuple[int, int], stride: Tuple[int, int], reduction: int,
    strategy: str,
):
    """Slice an image's rows out of (up to a few) stacked forward batches
    + scatter-assemble, one jitted program per (n_batches, n, image_hw)
    combination — all cheap programs."""

    @functools.partial(jax.jit, static_argnames=("n", "image_hw"))
    def collect(batches, start, n, image_hw):
        stacked = (
            batches[0] if len(batches) == 1 else jnp.concatenate(batches)
        )
        rows = jax.lax.dynamic_slice(
            stacked, (start, 0, 0), (n, stacked.shape[1], stacked.shape[2])
        )
        return assemble_windows(
            rows, image_hw, window, stride, reduction, strategy
        )

    return collect


class WindowPacker:
    """Streams images through a shared fixed-size window-batch forward.

    ``forward(ctx, windows)`` maps a ``(batch_windows, wh, ww, C)`` batch
    to ``(batch_windows, wh/r, ww/r)`` densities. Feed images with
    :meth:`add`; completed density maps come back from the returned
    iterators in submission order (densities for image i become available
    once the forward batch containing its last window has been
    dispatched). Call :meth:`flush` after the last image.
    """

    def __init__(
        self,
        forward: Callable,
        ctx,
        window: Tuple[int, int],
        stride: Tuple[int, int],
        reduction: int,
        strategy: str = "average",
        batch_windows: int = 128,
        chunk: int = 16,
        dtype=None,  # None: match the first image's dtype (like the
        # per-image path, which feeds images to the model verbatim)
    ) -> None:
        if batch_windows % chunk:
            raise ValueError("batch_windows must be a multiple of chunk")
        window, stride = tuple(window), tuple(stride)  # hashable cache keys
        self.forward = forward
        self.ctx = ctx
        self.window = window
        self.stride = stride
        self.reduction = reduction
        self.strategy = strategy
        self.W = batch_windows
        self.C = chunk
        self._dtype = dtype
        self._buf = None  # (2*W, wh, ww, 3) staging ring; allocated on first add()
        self._fill = 0  # host-tracked, always a multiple of C
        self._stream_pos = 0  # global window-slot counter
        self._outputs: dict = {}  # batch index -> (W, bh, bw) density batch
        self._batch_idx = 0
        self._pending = []  # (image_hw, base_pos, n) in submission order

        # All jitted programs come from module-level caches keyed on the
        # static config — new packer instances REUSE compiled programs
        # (see the cache functions above for why this matters).
        self._fwd = _fwd_program(forward, self.W)
        self._shift = _shift_program(self.W)
        self._gather_place = _gather_place_program(window)
        self._collect_jit = _collect_program(
            window, stride, reduction, strategy
        )

    def _run_batch(self) -> None:
        preds = self._fwd(self.ctx, self._buf)
        self._outputs[self._batch_idx] = preds
        self._batch_idx += 1
        self._buf = self._shift(self._buf)
        self._fill = max(self._fill - self.W, 0)  # 0 on a flush() tail

    def add(self, image: jnp.ndarray) -> None:
        """Queue one (H, W, 3) image; its windows are packed immediately.

        Dispatch budget (what makes this viable on RPC runtimes): ONE
        fused gather+place call per W-sized run of the image's windows —
        so one call for any image up to ``batch_windows`` windows — plus
        the shared forward/shift pair per completed batch. Programs
        compile per (image shape, tail length), not per position."""
        h, w = int(image.shape[0]), int(image.shape[1])
        starts = window_grid((h, w), self.window, self.stride)  # (n, 2)
        n = starts.shape[0]
        n_pad = _round_up(n, self.C)
        if n_pad != n:  # pad by repeating the last window (slots unused)
            starts = np.concatenate(
                [starts, np.repeat(starts[-1:], n_pad - n, axis=0)]
            )
        image = jnp.asarray(image)
        if self._buf is None:
            wh, ww = self.window
            self._buf = jnp.zeros(
                (2 * self.W, wh, ww, 3), self._dtype or image.dtype
            )
        self._pending.append(((h, w), self._stream_pos, n))
        for j0 in range(0, n_pad, self.W):  # W-chunks + one static tail
            n_seg = min(self.W, n_pad - j0)
            seg_starts = jnp.asarray(starts[j0 : j0 + n_seg])
            self._buf = self._gather_place(
                self._buf, image, seg_starts, jnp.int32(self._fill), n_seg
            )
            self._fill += n_seg
            while self._fill >= self.W:
                self._run_batch()
        self._stream_pos += n_pad

    def flush(self) -> None:
        """Run the current partially-filled batch (tail slots hold stale
        windows whose outputs are never collected). The stream position
        realigns to the batch boundary, so adding more images after a
        flush is valid (at the cost of the flushed batch's empty tail)."""
        if self._fill:
            self._run_batch()
        self._stream_pos = self._batch_idx * self.W

    def ready(self) -> Iterator[Tuple[Tuple[int, int], jnp.ndarray]]:
        """Yield (image_hw, density) for every queued image whose windows
        have all been forwarded, in submission order."""
        while self._pending:
            image_hw, base, n = self._pending[0]
            if base + n > self._batch_idx * self.W:
                return
            self._pending.pop(0)
            b0 = base // self.W
            b1 = (base + n - 1) // self.W
            batches = tuple(self._outputs[b] for b in range(b0, b1 + 1))
            density = self._collect_jit(
                batches, jnp.int32(base - b0 * self.W), n, image_hw
            )
            # prune forward outputs no remaining image needs (images are
            # consumed in submission order, so anything before the oldest
            # pending image's first batch is dead)
            floor = (
                self._pending[0][1] // self.W if self._pending else b1 + 1
            )
            for b in list(self._outputs):
                if b < floor:
                    del self._outputs[b]
            yield image_hw, density


def packed_predict_densities(
    forward: Callable,
    ctx,
    images,
    window: Tuple[int, int],
    stride: Tuple[int, int],
    reduction: int,
    strategy: str = "average",
    batch_windows: int = 128,
    chunk: int = 16,
    dtype=None,
) -> Iterator[jnp.ndarray]:
    """Generator: density maps for an iterable of (H, W, 3) images, in
    order, with windows packed across images into ``batch_windows``-sized
    forward batches.

    ``dtype=None`` (default) keeps each image's own dtype through the
    forward — matching ``Evaluator.predict_densities_packed`` and the
    per-image path, so fp32 runs give identical results through every
    entry point (ADVICE r3: this helper used to silently cast to bf16)."""
    packer = WindowPacker(
        forward, ctx, window, stride, reduction, strategy,
        batch_windows, chunk, dtype,
    )
    for image in images:
        packer.add(image)
        for _, density in packer.ready():
            yield density
    packer.flush()
    for _, density in packer.ready():
        yield density
