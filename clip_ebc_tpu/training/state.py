"""Train state: params + BN stats + optimizer state, as a pytree."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, lr) -> "TrainState":
        """One optimizer step; ``lr`` scales the unit-LR update (the driver
        feeds the per-epoch schedule value, like the reference's per-epoch
        LambdaLR)."""
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, params, batch_stats, tx) -> "TrainState":
        return cls(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            tx=tx,
        )
