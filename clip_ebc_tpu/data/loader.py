"""Batching and input pipeline.

TPU-first differences from the reference's torch DataLoader stack
(reference utils/data_utils.py):

- Ragged point lists become dense ``(B, P_max, 2)`` arrays plus a
  ``(B, P_max)`` validity mask, where P_max is a fixed per-config pad so
  every training step has the same shape (no recompiles). The reference
  passes Python lists of variable-length tensors into the loss
  (reference datasets/utils.py:37-38), which cannot be jitted.
- Per-host sharding: each host enumerates only its slice of the epoch
  permutation (replaces torch DistributedSampler at reference
  utils/data_utils.py:47).
- Prefetching uses a thread pool by default; ``num_workers > 0`` switches
  to a persistent process pool (spawn), the analog of torch DataLoader
  workers — the numpy augmentation pipeline holds the GIL for most of its
  time (measured: thread count has NO effect on host crops/s), so real
  training runs need processes to feed the chip.
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from . import transforms as T
from .density import block_sum


@dataclass
class Batch:  # registered as a jax pytree below so it can cross jit boundaries
    """One training batch (all fixed-shape numpy arrays).

    images:  (B, H, W, 3) float32, ImageNet-normalized
    points:  (B, P_max, 2) float32, padded with zeros
    point_mask: (B, P_max) bool, True where the point is real
    density: (B, Hr, Wr) float32 block-summed dot map (Hr = H/reduction)
    """

    images: np.ndarray
    points: np.ndarray
    point_mask: np.ndarray
    density: np.ndarray

    @property
    def gt_counts(self) -> np.ndarray:
        return self.point_mask.sum(axis=1).astype(np.float32)


import jax.tree_util as _jtu

_jtu.register_dataclass(
    Batch,
    data_fields=["images", "points", "point_mask", "density"],
    meta_fields=[],
)


def pad_points(
    point_lists: Sequence[np.ndarray], max_points: int
) -> tuple[np.ndarray, np.ndarray]:
    """Pad a list of (N_i, 2) arrays to (B, max_points, 2) + mask.

    Points beyond ``max_points`` are dropped deterministically (first
    max_points kept); crowd crops at train sizes rarely exceed a few
    thousand, so callers should size the pad from the dataset's max
    block-count statistics.
    """
    batch = len(point_lists)
    out = np.zeros((batch, max_points, 2), dtype=np.float32)
    mask = np.zeros((batch, max_points), dtype=bool)
    for i, pts in enumerate(point_lists):
        pts = np.asarray(pts, dtype=np.float32).reshape(-1, 2)
        n = min(len(pts), max_points)
        out[i, :n] = pts[:n]
        mask[i, :n] = True
    return out, mask


def make_train_transforms(cfg) -> T.Compose:
    """Default train augmentation stack (reference utils/data_utils.py:16-24):
    RandomResizedCrop -> HFlip -> RandomApply[ColorJitter, GaussianBlur,
    PepperSaltNoise]."""
    return T.Compose(
        [
            T.RandomResizedCrop(
                (cfg.input_size, cfg.input_size), scale=(cfg.min_scale, cfg.max_scale)
            ),
            T.RandomHorizontalFlip(0.5),
            T.RandomApply(
                [
                    T.ColorJitter(cfg.brightness, cfg.contrast, cfg.saturation, cfg.hue),
                    T.GaussianBlur(cfg.kernel_size),
                    T.PepperSaltNoise(cfg.saltiness, cfg.spiciness),
                ],
                p=[cfg.jitter_prob, cfg.blur_prob, cfg.noise_prob],
            ),
        ]
    )


def make_eval_transforms(cfg):
    """Eval pre-shaping (reference utils/data_utils.py:26-32)."""
    if not cfg.sliding_window:
        return None
    if cfg.resize_to_multiple:
        return T.Resize2Multiple(cfg.window_size, cfg.stride)
    if cfg.zero_pad_to_multiple:
        return T.ZeroPad2Multiple(cfg.window_size, cfg.stride)
    return None


def _pool_init(pickled_dataset):
    """Process-pool initializer: unpickle the dataset once per worker.

    Workers only run numpy/PIL/native-C++ augmentation: pin OpenMP to one
    thread (the native resize kernel is OMP-parallel — N workers x
    all-cores OMP would oversubscribe the host N-fold) and force any
    incidental jax import onto the CPU backend so no TPU client is ever
    created in a worker. The one-time spawn cost per worker is the
    package import (~seconds), amortized over the whole run."""
    import os
    import pickle

    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    global _POOL_DATASET
    _POOL_DATASET = pickle.loads(pickled_dataset)


def _pool_load(args):
    """Load one item in a worker process (index + pre-drawn seed so the
    result is independent of worker scheduling, same as the thread path)."""
    i, ds_index, seed = args
    rng = np.random.default_rng(seed)
    return i, _POOL_DATASET.__getitem__(int(ds_index), rng=rng)


class TrainLoader:
    """Shuffled, per-host-sharded, prefetching train loader.

    Yields ``Batch`` objects of ``batch_size`` items, each item contributing
    ``dataset.num_crops`` crops (flattened into the batch dimension, like the
    reference collate at reference datasets/utils.py:31-63). The density map
    is pre-pooled to reduction blocks on the host — the loss only ever
    consumes the block-summed map, so shipping the full-resolution dot map
    to the device would waste HBM bandwidth.

    ``num_workers > 0`` runs item loading in a persistent spawn-based
    process pool (the torch-DataLoader-workers analog, reference
    utils/data_utils.py:47): the augmentation pipeline is GIL-bound, so
    threads alone cannot feed a chip. Identical batches either way (seeds
    are pre-drawn per item).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        reduction: int,
        max_points: Optional[int] = None,
        seed: int = 0,
        num_threads: int = 4,
        host_id: int = 0,
        num_hosts: int = 1,
        drop_last: bool = True,
        num_workers: int = 0,
    ) -> None:
        if batch_size % max(dataset.num_crops, 1):
            raise ValueError(
                f"batch_size {batch_size} must be divisible by num_crops "
                f"{dataset.num_crops}"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.items_per_batch = batch_size // dataset.num_crops
        self.reduction = reduction
        if max_points is None:
            # Auto-size the OT point pad from the dataset's max annotation
            # count (rounded up to a power of two for shape stability):
            # the reference's OT consumes EVERY GT point (reference
            # losses/dm_loss.py:48), so a fixed cap silently skews the OT
            # term on extreme-density crops (QNRF/NWPU reach >12k points).
            # The separable Sinkhorn's cost is ~linear in P, so a generous
            # pad is cheap. The value depends only on the dataset, so every
            # host in a multi-host run computes the same (static) shape.
            n = dataset.max_point_count() if hasattr(dataset, "max_point_count") else 0
            max_points = max(256, 1 << (int(n) - 1).bit_length()) if n else 256
        self.max_points = max_points
        self.seed = seed
        self.num_threads = num_threads
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._pool = None  # lazily-created persistent process pool
        self.epoch = 0
        # OT point-pad truncation accounting (KNOWN_DIFFERENCES #4): the
        # reference's OT consumes every GT point (reference dm_loss.py:48);
        # ours pads to max_points and silently dropping more would skew the
        # OT term without any signal. Count and warn once per epoch.
        self.dropped_points = 0
        self._warned_epoch: Optional[int] = None

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.dropped_points = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_hosts
        if self.drop_last:
            return n // self.items_per_batch
        return (n + self.items_per_batch - 1) // self.items_per_batch

    def _epoch_indices(self) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 1_000_003 + self.epoch)
        perm = rng.permutation(len(self.dataset))
        # Same-size shards per host: truncate to a multiple of num_hosts.
        usable = (len(perm) // self.num_hosts) * self.num_hosts
        return perm[:usable][self.host_id :: self.num_hosts]

    def _get_pool(self):
        if self._pool is None:
            import concurrent.futures
            import multiprocessing as mp
            import pickle

            self._pool = concurrent.futures.ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context("spawn"),  # no forked TPU/JAX state
                initializer=_pool_init,
                initargs=(pickle.dumps(self.dataset),),
            )
        return self._pool

    def close(self) -> None:
        """Shut down the worker pool (no-op in thread mode)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def _iter_process_pool(self, indices, item_seeds, n_items) -> Iterator[Batch]:
        import concurrent.futures as cf
        from concurrent.futures.process import BrokenProcessPool

        pool = self._get_pool()
        # Bounded submission window: enough in flight to keep every worker
        # busy plus one assembled batch, but NOT the whole epoch — completed
        # Futures would otherwise pin every consumed item for the epoch's
        # lifetime (tens of GB on NWPU-scale datasets), and an abandoned
        # generator (e.g. the one-batch init_state draw) would leave a full
        # epoch of discarded work queued in the persistent pool.
        window = max(2 * self.items_per_batch, 4 * self.num_workers)
        ready: dict[int, object] = {}
        pending: set = set()
        submitted = 0

        def top_up():
            nonlocal submitted
            while submitted < n_items and len(pending) + len(ready) < window:
                i = submitted
                pending.add(
                    pool.submit(
                        _pool_load, (i, int(indices[i]), int(item_seeds[i]))
                    )
                )
                submitted += 1

        nxt = 0
        n_batches = len(self)
        try:
            top_up()
            for b in range(n_batches):
                items = []
                hi = min((b + 1) * self.items_per_batch, n_items)
                while nxt < hi:
                    while nxt not in ready:
                        done, pending = cf.wait(
                            pending, return_when=cf.FIRST_COMPLETED
                        )
                        for f in done:
                            i, item = f.result()  # raises worker exceptions
                            ready[i] = item
                        top_up()
                    items.append(ready.pop(nxt))
                    nxt += 1
                    top_up()
                yield self._collate(items)
        except BrokenProcessPool as e:
            # A worker DIED (segfault/OOM-kill, not a Python exception —
            # those propagate via f.result() with the pool intact). The
            # executor is permanently broken: drop it so the next epoch
            # rebuilds a fresh pool instead of failing forever.
            self.close()
            raise RuntimeError(
                "a loader worker process died (not a Python exception — "
                "likely OOM-killed or crashed in native code); the pool "
                "was reset and the next epoch will rebuild it"
            ) from e
        finally:
            # Generator closed early (init draw, exception, profiling run):
            # drop the in-flight window so the next epoch starts clean.
            if self._pool is not None:
                for f in pending:
                    f.cancel()

    def __iter__(self) -> Iterator[Batch]:
        indices = self._epoch_indices()
        item_rng = np.random.default_rng(
            (self.seed + 1) * 7_777_777 + self.epoch * 131 + self.host_id
        )
        # Pre-draw one child seed per item so results don't depend on
        # thread scheduling.
        item_seeds = item_rng.integers(0, 2**63 - 1, size=len(indices))

        n_items_total = min(len(self) * self.items_per_batch, len(indices))
        if self.num_workers > 0 and n_items_total > 0:
            yield from self._iter_process_pool(indices, item_seeds, n_items_total)
            return

        def load(i: int):
            rng = np.random.default_rng(item_seeds[i])
            return self.dataset.__getitem__(int(indices[i]), rng=rng)

        n_batches = len(self)
        work: "queue.Queue[int]" = queue.Queue()
        results: dict[int, object] = {}
        results_lock = threading.Lock()
        results_ready = threading.Condition(results_lock)
        # drop_last=False: the final batch may be short (one recompile)
        n_items = min(n_batches * self.items_per_batch, len(indices))
        for i in range(n_items):
            work.put(i)

        def worker():
            while True:
                try:
                    i = work.get_nowait()
                except queue.Empty:
                    return
                try:
                    item = load(i)
                except Exception as e:  # surface loader errors to the consumer
                    item = e
                with results_ready:
                    results[i] = item
                    results_ready.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(self.num_threads, max(n_items, 1)))
        ]
        for t in threads:
            t.start()

        for b in range(n_batches):
            items = []
            lo = b * self.items_per_batch
            hi = min((b + 1) * self.items_per_batch, n_items)
            for i in range(lo, hi):
                with results_ready:
                    while i not in results:
                        results_ready.wait()
                    item = results.pop(i)
                if isinstance(item, Exception):
                    raise item
                items.append(item)
            yield self._collate(items)

    def _collate(self, items) -> Batch:
        from . import native

        images = np.concatenate([im for im, _, _ in items], axis=0)
        point_lists = [p for _, pts, _ in items for p in pts]
        dropped = sum(max(0, len(p) - self.max_points) for p in point_lists)
        if dropped:
            self.dropped_points += dropped
            if self._warned_epoch != self.epoch:
                self._warned_epoch = self.epoch
                logging.getLogger("clip_ebc_tpu").warning(
                    "OT point pad truncation: %d point(s) beyond max_points=%d "
                    "dropped in a batch (epoch %d). Count/CE supervision is "
                    "unaffected, but the OT term ignores the dropped points — "
                    "raise --max_points to cover the densest crops.",
                    dropped, self.max_points, self.epoch,
                )
        points, mask = (
            native.pad_points(point_lists, self.max_points)
            if native.HAVE_NATIVE
            else pad_points(point_lists, self.max_points)
        )
        if native.HAVE_NATIVE and getattr(self.dataset, "sigma", None) is None:
            # Fused rasterize+block-sum straight from the point lists
            # (identical semantics to rasterize -> block_sum; tested).
            h, w = images.shape[1:3]
            density_blocks = np.stack(
                [native.rasterize_blocks(p, h, w, self.reduction) for p in point_lists]
            )
        else:
            densities = np.concatenate([d for _, _, d in items], axis=0)
            density_blocks = block_sum(densities, self.reduction)
        return Batch(
            images=images.astype(np.float32),
            points=points,
            point_mask=mask,
            density=density_blocks.astype(np.float32),
        )
