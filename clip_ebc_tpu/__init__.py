"""CLIP-EBC-TPU: a TPU-native (JAX/Flax/Pallas/pjit) crowd-counting framework.

Re-implements the full capability surface of the CLIP-EBC reference
(Yiming-M/CLIP-EBC; see /root/reference) with a TPU-first design:

- Models are Flax modules in NHWC layout, compute in bfloat16 with fp32
  parameters, compiled once under ``jax.jit``/``pjit`` with static shapes.
- The DMCount loss's Sinkhorn optimal-transport solver is a batched,
  masked ``lax.while_loop`` vmapped over the batch (the reference loops
  over images in Python: reference losses/dm_loss.py:48).
- Data parallelism uses a ``jax.sharding.Mesh`` + ``shard_map``/``pjit``
  with XLA collectives over ICI (the reference uses single-node NCCL DDP:
  reference trainer.py:239, utils/ddp_utils.py:16).
- Sliding-window inference is a single compiled window-batch forward with
  scatter-add overlap averaging on device (the reference assembles on the
  host in numpy: reference utils/eval_utils.py:76-96).
"""

__version__ = "0.1.0"

from . import config
from .config import get_bins_and_anchors, available_datasets, standardize_dataset_name
