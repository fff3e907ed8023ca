"""Validation / test evaluation loop.

Per-image (batch 1, arbitrary size) counting with optional sliding-window
decomposition, reporting MAE/RMSE (reference eval.py:11-40).

Variable image sizes vs XLA static shapes: each distinct image shape
compiles once. Preprocessed datasets snap sizes to multiples of 32
(reference preprocess.py:14-53), and the sliding-window path additionally
buckets the window count, so the number of distinct programs stays small.
``pad_to_multiple`` optionally right/bottom zero-pads images to a coarser
grid to cut recompiles further (counts are taken over the valid region
only).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sliding_window import sliding_window_predict
from ..utils.metrics import CountErrorAccumulator


class Evaluator:
    """Wraps a model + params into per-image count prediction."""

    def __init__(
        self,
        model,
        reduction: int,
        sliding_window: bool = False,
        window_size: Optional[int] = None,
        stride: Optional[int] = None,
        strategy: str = "average",
        pad_to_multiple: int = 0,
        mesh=None,
    ) -> None:
        self.model = model
        self.reduction = reduction
        self.sliding_window = sliding_window
        self.window = (window_size, window_size) if window_size else None
        self.stride = (stride, stride) if stride else None
        self.strategy = strategy
        self.pad_to_multiple = pad_to_multiple
        self.mesh = mesh  # shard the window batch across the pod
        # Persistent decode pool for repeated evaluate() calls (per-epoch
        # validation): spawn + package import costs seconds per worker,
        # so it is paid once per (dataset, procs), not per epoch.
        self._decode_pool = None
        self._decode_pool_key = None

        @jax.jit
        def forward(variables, images):
            out = model.apply(variables, images, train=False)
            return out.astype(jnp.float32)

        self._forward = forward

        # Text-feature hoist: at eval the prompt features are constant per
        # weight set, so encode them once per `variables` instead of running
        # the text tower inside every (window-batch) forward. The hoisted
        # features travel as TRACED data inside the forward's first argument
        # (a ``(variables, text_feats)`` tuple) so the callable handed to
        # ``sliding_window_predict`` as its jit-static ``apply_fn`` is ONE
        # stable function for the Evaluator's lifetime — a fresh `variables`
        # tree each eval epoch must not recompile the window pipeline.
        self._hoist_text = hasattr(type(model), "encode_text")
        if self._hoist_text:
            self._encode_text = jax.jit(
                lambda v: model.apply(v, method="encode_text")
            )

            @jax.jit
            def forward_ctx(ctx, images):
                variables, text_feats = ctx
                out = model.apply(variables, images, train=False, text_feats=text_feats)
                return out.astype(jnp.float32)

            self._forward_ctx = forward_ctx
            self._text_for = None  # identity of the variables the cache is for
            self._text_feats = None

        # Token fast path (ViT trunks, ops/sliding_window.py): patchify
        # the image once + unfold windows on the token grid. OPT-IN via
        # EBC_TOKEN_GATHER=1 (lost the flagship-shape chip A/B — see
        # _token_gather_ok). Functions are defined once here — they ride
        # into the jitted window pipeline as static args, so identity must
        # be stable across images/epochs.
        self._token_fns = None
        if getattr(model, "is_vit", False) and hasattr(type(model), "embed_patches"):
            patch = model.encoder_reduction

            if self._hoist_text:

                @jax.jit
                def embed_fn(ctx, img):
                    return model.apply(ctx[0], img, method="embed_patches")

                @jax.jit
                def token_forward(ctx, tokens):
                    variables, text_feats = ctx
                    out = model.apply(
                        variables, tokens, train=False, text_feats=text_feats,
                        pre_embedded=True,
                    )
                    return out.astype(jnp.float32)

            else:

                @jax.jit
                def embed_fn(v, img):
                    return model.apply(v, img, method="embed_patches")

                @jax.jit
                def token_forward(v, tokens):
                    out = model.apply(v, tokens, train=False, pre_embedded=True)
                    return out.astype(jnp.float32)

            self._token_fns = (embed_fn, token_forward, patch)

    def decode_pool(self, dataset, decode_procs: int):
        """Persistent decode ProcessPoolExecutor, reused across
        ``evaluate()`` calls with the same (dataset, procs) — mirrors
        TrainLoader._get_pool so per-epoch validation doesn't respawn
        workers (+re-import the package) every call."""
        key = (id(dataset), decode_procs)
        if self._decode_pool is not None and self._decode_pool_key != key:
            self._decode_pool.shutdown(wait=False, cancel_futures=True)
            self._decode_pool = None
        if self._decode_pool is None:
            self._decode_pool = _make_decode_pool(dataset, decode_procs)
            self._decode_pool_key = key
        return self._decode_pool

    def close(self) -> None:
        """Shut down the persistent decode pool (if any)."""
        if self._decode_pool is not None:
            self._decode_pool.shutdown(wait=False, cancel_futures=True)
            self._decode_pool = None
            self._decode_pool_key = None

    def _forward_fn(self, variables):
        """Return ``(forward, ctx)`` — a stable (ctx, images) -> density
        callable plus its traced context, with hoisted text features folded
        into ctx when the model supports them.

        ``forward`` is passed to the jitted ``sliding_window_predict`` as a
        *static* argument (hashed by object identity), so it must be the
        same object across images AND across eval epochs; anything that
        varies per weight set (the text features) rides in ``ctx``."""
        if not self._hoist_text:
            return self._forward, variables
        if self._text_for is not variables:
            self._text_feats = self._encode_text(variables)
            self._text_for = variables
        return self._forward_ctx, (variables, self._text_feats)

    def predict_density(self, variables, image: np.ndarray) -> jnp.ndarray:
        """(H, W, 3) -> (H/r, W/r) density map."""
        # Images smaller than one window pad up so the grid exists, and
        # pad_to_multiple buckets eval shapes; padding is ImageNet-
        # normalized black (-mean/std per channel), not 0.
        image, (h, w) = self._pad_image(image)
        nh, nw = image.shape[:2]
        image = jnp.asarray(image)

        if self.mesh is not None and jax.process_count() > 1:
            # Multi-host: all processes run eval on the same image; a
            # host-local numpy arg cannot feed a global-mesh computation.
            from ..parallel.mesh import replicate_array

            image = replicate_array(self.mesh, np.asarray(image))
        forward, ctx = self._forward_fn(variables)
        if self.sliding_window:
            tk = self._token_fns
            density = sliding_window_predict(
                forward,
                ctx,
                image,
                window=self.window,
                stride=self.stride,
                reduction=self.reduction,
                strategy=self.strategy,
                mesh=self.mesh,
                embed_fn=tk[0] if tk else None,
                token_apply_fn=tk[1] if tk else None,
                patch=tk[2] if tk else 0,
            )
        else:
            density = forward(ctx, image[None])[0]

        if (nh, nw) != (h, w):
            density = density[: h // self.reduction, : w // self.reduction]
        return density

    def predict_count(self, variables, image: np.ndarray) -> float:
        return float(self.predict_density(variables, image).sum())

    def _pad_image(self, image: np.ndarray):
        """Apply the window-minimum / pad_to_multiple padding policy;
        returns (padded image, original (h, w))."""
        h, w = image.shape[:2]
        nh, nw = h, w
        if self.sliding_window and self.window is not None:
            nh, nw = max(nh, self.window[0]), max(nw, self.window[1])
        pad = self.pad_to_multiple
        if pad:
            nh, nw = -(-nh // pad) * pad, -(-nw // pad) * pad
        if (nh, nw) != (h, w):
            from ..config import IMAGENET_MEAN, IMAGENET_STD

            black = -(np.asarray(IMAGENET_MEAN) / np.asarray(IMAGENET_STD))
            padded = np.broadcast_to(
                black.astype(image.dtype), (nh, nw, image.shape[2])
            ).copy()
            padded[:h, :w] = image
            image = padded
        return image, (h, w)

    def predict_densities_packed(
        self, variables, images, batch_windows: int = 128, chunk: int = 16
    ):
        """Generator of (H/r, W/r) density maps for an iterable of images,
        with windows packed ACROSS images into fixed ``batch_windows``-size
        forward batches (ops/packed_eval.py): the trunk program compiles
        once for the whole stream and never runs partially empty — the
        mixed-size serving path.

        With a ``mesh``, the fixed window batch is sharded across the
        mesh's devices (batch axis), so the packed stream rides the same
        data-parallel layout as the per-image path — ``batch_windows``
        must divide evenly by the mesh size."""
        if not self.sliding_window:
            raise ValueError("packed prediction requires sliding_window=True")
        from ..ops.packed_eval import WindowPacker

        forward, ctx = self._forward_fn(variables)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_dev = self.mesh.devices.size
            if batch_windows % n_dev:
                raise ValueError(
                    f"batch_windows {batch_windows} must be divisible by the "
                    f"mesh's {n_dev} devices for packed eval under a mesh")
            sharding = NamedSharding(self.mesh, PartitionSpec("data"))
            base_forward = forward

            def forward(fctx, windows):  # noqa: F811 — mesh-sharded wrapper
                return base_forward(fctx, jax.device_put(windows, sharding))
        packer = WindowPacker(
            forward, ctx, self.window, self.stride, self.reduction,
            self.strategy, batch_windows=batch_windows, chunk=chunk,
        )
        valid = []  # original (h, w) per submitted image, FIFO

        def drain():
            for (ph, pw), density in packer.ready():
                h, w = valid.pop(0)
                if (ph, pw) != (h, w):
                    density = density[: h // self.reduction, : w // self.reduction]
                yield density

        for image in images:
            padded, hw = self._pad_image(np.asarray(image))
            valid.append(hw)
            packer.add(jnp.asarray(padded))
            yield from drain()
        packer.flush()
        yield from drain()


def _eval_pool_init(pickled_dataset):
    """Decode-pool worker init (mirrors data/loader._pool_init)."""
    import os
    import pickle

    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    global _EVAL_DATASET
    _EVAL_DATASET = pickle.loads(pickled_dataset)


def _eval_pool_load(i):
    images, labels, _ = _EVAL_DATASET[i]
    return i, images[0], float(len(labels[0]))


def _make_decode_pool(dataset, decode_procs):
    import concurrent.futures as cf
    import multiprocessing as mp
    import pickle

    return cf.ProcessPoolExecutor(
        max_workers=decode_procs,
        mp_context=mp.get_context("spawn"),
        initializer=_eval_pool_init,
        initargs=(pickle.dumps(dataset),),
    )


def _decoded_items(dataset, n, prefetch, decode_procs, pool=None):
    """Yield (image, gt_count) for items 0..n-1, decoding ahead of the
    consumer: on a background thread by default, or across
    ``decode_procs`` worker processes (bounded in-flight window, ordered
    delivery) — full-image eval decode is GIL-bound numpy/PIL like the
    train augs, so real eval runs over thousands of NWPU-scale images
    need processes to keep the chip busy.

    ``pool`` lets the caller pass a PERSISTENT executor (see
    ``Evaluator.decode_pool``): per-epoch validation during training must
    not pay worker spawn + full package import every call (ADVICE r3
    item 5). Without one, a throwaway pool is created and torn down."""
    if decode_procs > 0 and n > 0:
        import concurrent.futures as cf

        owns_pool = pool is None
        if owns_pool:
            pool = _make_decode_pool(dataset, decode_procs)
        window = max(prefetch, 2 * decode_procs)
        ready: dict[int, tuple] = {}
        pending: set = set()
        submitted = 0

        def top_up():
            nonlocal submitted
            while submitted < n and len(pending) + len(ready) < window:
                pending.add(pool.submit(_eval_pool_load, submitted))
                submitted += 1

        try:
            top_up()
            for nxt in range(n):
                while nxt not in ready:
                    done, pending = cf.wait(
                        pending, return_when=cf.FIRST_COMPLETED
                    )
                    for f in done:
                        i, image, gt = f.result()
                        ready[i] = (image, gt)
                    top_up()
                yield ready.pop(nxt)
                top_up()
        finally:
            # Early close (exception, partial consumption): drop the
            # in-flight window so a persistent pool starts the next
            # epoch clean; tear down throwaway pools entirely.
            for f in pending:
                f.cancel()
            if owns_pool:
                pool.shutdown(wait=False, cancel_futures=True)
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))

    def producer():
        for i in range(n):
            try:
                images, labels, _ = dataset[i]
                q.put((images[0], float(len(labels[0]))))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
                return

    threading.Thread(target=producer, daemon=True).start()
    for _ in range(n):
        item = q.get()
        if isinstance(item, Exception):
            raise item
        yield item


def evaluate(
    evaluator: Evaluator,
    variables,
    dataset,
    progress: bool = False,
    prefetch: int = 2,
    decode_procs: int = 0,
) -> Dict[str, float]:
    """Run over a labeled dataset (num_crops=1, eval transforms) and report
    MAE/RMSE of total counts (reference eval.py:25-40).

    Image decode + transforms for upcoming items run ahead of the device:
    a background thread by default, or ``decode_procs`` worker processes
    (see :func:`_decoded_items`).
    """
    acc = CountErrorAccumulator()
    n = len(dataset)
    pool = (evaluator.decode_pool(dataset, decode_procs)
            if decode_procs > 0 and n > 0 else None)
    items = _decoded_items(dataset, n, prefetch, decode_procs, pool=pool)

    indices = range(n)
    if progress:
        try:
            from tqdm import tqdm

            indices = tqdm(indices, desc="eval")
        except ImportError:
            pass
    # One-deep async pipeline: dispatch image i's prediction (JAX dispatch
    # returns immediately), then fetch image i-1's count — the device
    # computes i while the host decodes/uploads i+1 and fetches i-1.
    pending = None  # (device count scalar, gt)
    for _ in indices:
        image, gt = next(items)
        count = evaluator.predict_density(variables, image).sum()
        if pending is not None:
            acc.update(float(pending[0]), pending[1])
        pending = (count, gt)
    if pending is not None:
        acc.update(float(pending[0]), pending[1])
    return acc.result()


def evaluate_packed(
    evaluator: Evaluator,
    variables,
    dataset,
    batch_windows: int = 128,
    chunk: int = 16,
    progress: bool = False,
) -> Dict[str, float]:
    """`evaluate` with cross-image window packing: windows from
    consecutive images share fixed-size forward batches
    (Evaluator.predict_densities_packed), so mixed-size datasets neither
    pay per-image bucket padding nor recompile the trunk per image shape.
    Requires a sliding-window Evaluator; counts/metrics match `evaluate`
    up to forward-batch composition."""
    import queue
    import threading

    acc = CountErrorAccumulator()
    n = len(dataset)
    q: "queue.Queue" = queue.Queue(maxsize=4)

    def producer():
        for i in range(n):
            try:
                images, labels, _ = dataset[i]
                q.put((images[0], float(len(labels[0]))))
            except Exception as e:
                q.put(e)
                return

    threading.Thread(target=producer, daemon=True).start()

    gts = []

    def images():
        for _ in range(n):
            item = q.get()
            if isinstance(item, Exception):
                raise item
            image, gt = item
            gts.append(gt)
            yield image

    densities = evaluator.predict_densities_packed(
        variables, images(), batch_windows=batch_windows, chunk=chunk
    )
    done = 0
    for density in densities:
        acc.update(float(density.sum()), gts[done])
        done += 1
        if progress and done % 50 == 0:
            print(f"eval {done}/{n}")
    assert done == n, f"packed eval produced {done} of {n} densities"
    return acc.result()
