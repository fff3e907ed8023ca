"""The pjit data-parallel train step.

One compiled function advances (params, batch_stats, opt_state) by one
optimizer step on a globally-sharded batch. Under GSPMD the gradient
all-reduce, the cross-batch BatchNorm statistics, and the loss-metric
mean all materialize as XLA collectives over ICI — the TPU-native
replacement for DDP + SyncBatchNorm + reduce_mean
(reference trainer.py:147, train.py:62, utils/ddp_utils.py:9-13).

Note the reference re-syncs with a barrier after every step
(reference train.py:67); under SPMD every step is already globally
synchronous, so no explicit barrier exists anywhere in this stack.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..data.loader import Batch
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .optim import make_optimizer, make_schedule
from .state import TrainState


def _stop_frozen(params, frozen_predicate):
    """stop_gradient on frozen subtrees so XLA prunes their entire backward
    pass — the functional analog of the reference's requires_grad=False
    compute skip. The optimizer mask alone (optim.py) zeroes the *updates*
    but still pays for the gradients."""

    def mask(path, leaf):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        return jax.lax.stop_gradient(leaf) if frozen_predicate(keys) else leaf

    return jax.tree_util.tree_map_with_path(mask, params)


def make_train_step(model, loss_fn) -> Callable:
    """Build the pure train step: (state, batch, lr[, text_feats]) ->
    (state, metrics). ``text_feats`` carries hoisted frozen prompt features
    (see ClipEBC.encode_text)."""
    frozen = getattr(model, "frozen_param_predicate", None)

    def train_step(state: TrainState, batch: Batch, lr: jnp.ndarray, text_feats=None):
        def compute_loss(params):
            if frozen is not None:
                params = _stop_frozen(params, frozen)
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            kwargs = {} if text_feats is None else {"text_feats": text_feats}
            out = model.apply(
                variables,
                batch.images,
                train=True,
                mutable=["batch_stats"] if state.batch_stats else [],
                **kwargs,
            )
            (logits, pred_density), mutated = out
            loss, info = loss_fn(logits, pred_density, batch)
            return loss, (info, mutated)

        grad_fn = jax.value_and_grad(compute_loss, has_aux=True)
        (_, (info, mutated)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads, lr)
        if state.batch_stats:
            new_state = new_state.replace(batch_stats=mutated["batch_stats"])
        return new_state, info

    return train_step


class Trainer:
    """Owns the mesh, the jitted step, and state placement."""

    def __init__(self, cfg, model, loss_fn, mesh=None) -> None:
        self.cfg = cfg
        self.model = model
        self.loss_fn = loss_fn
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_shape)
        n_data = self.mesh.shape.get("data", 1)
        global_batch = cfg.batch_size * jax.process_count()
        if global_batch % n_data:
            raise ValueError(
                f"global train batch {global_batch} (batch_size={cfg.batch_size} "
                f"per host x {jax.process_count()} hosts) must be divisible by "
                f"the {n_data}-way 'data' mesh axis; adjust --batch_size or "
                f"pass a smaller mesh"
            )
        self.schedule = make_schedule(cfg)
        frozen = getattr(model, "frozen_param_predicate", None)
        self.tx = make_optimizer(weight_decay=cfg.weight_decay, frozen_predicate=frozen)
        self._step = jax.jit(make_train_step(model, loss_fn), donate_argnums=(0,))
        # Hoist frozen text features out of the per-step computation
        # (reference precompute at models/clip/model.py:127-129).
        self._hoist_text = bool(
            getattr(model, "freeze_text_encoder", False)
            and hasattr(type(model), "encode_text")
        )
        if self._hoist_text:
            self._encode_text = jax.jit(
                lambda variables: model.apply(variables, method="encode_text")
            )

    def text_features(self, state: TrainState):
        """Frozen prompt features for the current params (None if the model
        has no frozen text tower)."""
        if not self._hoist_text:
            return None
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return self._encode_text(variables)

    def init_state(self, rng_key, sample_batch: Batch) -> TrainState:
        variables = self.model.init(
            rng_key, jnp.asarray(sample_batch.images[:1]), train=True
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState.create(params=params, batch_stats=batch_stats, tx=self.tx)
        # Replicate across the mesh; the batch will be sharded along 'data'.
        # Multi-host: every process computed the identical init (same seed),
        # assembled into global replicated arrays.
        from ..parallel.mesh import replicate_array

        return jax.tree_util.tree_map(
            lambda x: replicate_array(self.mesh, x), state
        )

    def train_epoch(
        self, state: TrainState, loader, epoch: int
    ) -> Tuple[TrainState, Dict[str, float]]:
        """One epoch over the loader; returns averaged loss metrics
        (reference train.py:14-69)."""
        lr = jnp.asarray(self.schedule(epoch - 1), jnp.float32)  # epochs are 1-based
        text_feats = self.text_features(state)  # once per epoch, not per step
        loader.set_epoch(epoch)
        # Pipeline: upload batch i+1 while step i runs, and defer all metric
        # fetches to epoch end so no step blocks on the host (per-step
        # float() would serialize H2D, compute, and D2H).
        infos = []
        it = iter(loader)
        nxt = next(it, None)
        nxt = shard_batch(self.mesh, nxt) if nxt is not None else None
        n = 0
        while nxt is not None:
            batch, nxt = nxt, next(it, None)
            if nxt is not None:
                nxt = shard_batch(self.mesh, nxt)
            state, info = self._step(state, batch, lr, text_feats)
            infos.append(info)
            n += 1
        totals: Dict[str, float] = {}
        for info in infos:
            for k, v in info.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        metrics = {k: v / max(n, 1) for k, v in totals.items()}
        metrics["lr"] = float(lr)
        return state, metrics
