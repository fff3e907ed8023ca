"""Device mesh and sharding layout.

The reference's only parallelism is single-node data-parallel DDP over
NCCL (reference trainer.py:239, utils/ddp_utils.py:16-22). The TPU-native
equivalent is GSPMD: a 1-D ``Mesh`` over all chips with the batch sharded
on the ``data`` axis and parameters replicated. Gradient all-reduce,
cross-replica BatchNorm statistics and metric reductions all fall out of
XLA's partitioner — no explicit collectives, and they ride ICI.

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``); ``jax.devices()`` then spans the pod and
the same mesh code works unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init over DCN (replaces the reference's
    dist.init_process_group at reference utils/ddp_utils.py:16-22).
    No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU cross-process collectives need gloo (the multi-process test
        # backend; real pods ride ICI/DCN and ignore this).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh; default is all devices on a single 'data' axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != devices.size:
        raise ValueError(f"mesh shape {shape} != #devices {devices.size}")
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'; used for every array in a Batch."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side Batch onto the mesh, sharded along axis 0.

    Single-process: a plain device_put. Multi-host: each process holds only
    its per-host slice of the global batch (the loader shards items by
    host, loader.py), so assemble a global array from process-local data —
    ``device_put`` onto a global NamedSharding is single-process-only.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    n_local = batch.images.shape[0]
    global_batch = n_local * jax.process_count()

    def put(x):
        global_shape = (global_batch,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(sh, np.asarray(x), global_shape)

    return jax.tree_util.tree_map(put, batch)


def replicate_array(mesh: Mesh, x):
    """Replicate a host value across the mesh; multi-host safe (every
    process must pass the same value)."""
    if jax.process_count() == 1:
        return jax.device_put(x, replicated(mesh))
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(replicated(mesh), x, x.shape)
