"""Multi-host (DCN) helpers: the reference's `all_gather_object` counterpart.

Reference: src/d_fine/dist_utils.py:81-92,127-193 pickles per-rank prediction
dicts and gathers them to rank 0 for metric computation. In JAX, a single
process drives all LOCAL devices (no per-device gather needed), but a
multi-host slice runs one process per host, each evaluating its shard of the
dataset — metric computation on process 0 then needs the full prediction set.

`gather_objects` covers that with a token-free object allgather built on
jax.experimental.multihost_utils; it is an identity on single-process
runs (this sandbox, and any single-host TPU), so the Trainer can call it
unconditionally.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def gather_objects(local_items: List[Any]) -> List[Any]:
    """Concatenate per-process python objects across all JAX processes.

    Single-process: returns `local_items` unchanged. Multi-process: pickles
    the local list, pads to the global max byte-length, allgathers the byte
    tensors (multihost_utils.process_allgather rides DCN), and unpickles in
    process order — the JAX equivalent of torch.distributed's
    all_gather_object (reference dist_utils.py:127-193).
    """
    if jax.process_count() == 1:
        return local_items

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(local_items), dtype=np.uint8)
    n = np.asarray([payload.size], np.int64)
    sizes = multihost_utils.process_allgather(n)  # [P, 1]
    max_n = int(np.max(sizes))
    padded = np.zeros((max_n,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # [P, max_n]
    out: List[Any] = []
    for p in range(gathered.shape[0]):
        size = int(sizes[p][0]) if sizes.ndim == 2 else int(sizes[p])
        out.extend(pickle.loads(gathered[p, :size].tobytes()))
    return out


def is_main_process() -> bool:
    """Rank-0 gating for logging/saving (reference dist_utils.py:69-70)."""
    return jax.process_index() == 0
