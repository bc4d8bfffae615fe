"""Device mesh + sharding helpers (GSPMD data parallelism over ICI).

TPU-native replacement for the reference's NCCL/DDP stack
(src/d_fine/dist_utils.py:13-206 + DDP wrap at train.py:167-179):

- DDP gradient all-reduce          -> batch-sharded pjit'd train step; XLA
                                       inserts the gradient reduction.
- all_reduce(num_boxes)            -> global jnp.sum over the sharded batch.
- SyncBatchNorm                    -> BN stats over the global batch (free).
- DistributedSampler               -> host-side batch sharding via
                                       `shard_pytree_batch`.
- broadcast(early-stop flag)       -> replicated host control flow.

The mesh is 1-D ('data',) today; model/tensor parallelism is unnecessary for
a <=62M-param CNN-DETR (SURVEY.md §2.2), but everything routes through this
module so a 2-D mesh is a one-line change.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place every array in `tree` with its leading dim sharded over the mesh."""

    def place(x):
        spec = P(axis) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)
