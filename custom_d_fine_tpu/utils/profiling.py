"""Profiling + device-memory observability.

The reference's perf observability is wall-clock timing + nvidia-smi polling
(SURVEY.md §5; dl/utils.py:130-157). TPU-native replacements:
- `trace(...)`: jax.profiler trace capture around a callable, with an
  in-process summary of the heaviest XLA ops via jax.profiler.ProfileData
  (no TensorBoard needed).
- `device_memory_stats()`: per-device HBM usage (nvidia-smi equivalent).
- `StepTimer`: pipelined steady-state timing helper implementing the protocol
  from bench.py (this TPU tunnel's block_until_ready does not block; only a
  host fetch synchronizes).
"""

from __future__ import annotations

import time
from collections import defaultdict
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


def device_memory_stats() -> List[Dict[str, float]]:
    import jax

    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out.append({
                "device": str(d),
                "bytes_in_use_mb": s.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": s.get("peak_bytes_in_use", 0) / 1e6,
                "bytes_limit_mb": s.get("bytes_limit", 0) / 1e6,
            })
        except Exception:
            out.append({"device": str(d)})
    return out


def trace(fn: Callable, *args, trace_dir: str = "/tmp/jax_trace", top_k: int = 25):
    """Run fn under a profiler trace; return (result, top-op summary)."""
    import jax

    trace_dir = str(Path(trace_dir))
    with jax.profiler.trace(trace_dir):
        result = fn(*args)
        jax.block_until_ready(result)
    summary = summarize_trace(trace_dir, top_k=top_k)
    return result, summary


def summarize_trace(trace_dir: str, top_k: int = 25) -> List[Tuple[str, float]]:
    """Aggregate per-op durations from the newest .xplane.pb under trace_dir."""
    import jax.profiler as jp

    planes = sorted(Path(trace_dir).rglob("*.xplane.pb"), key=lambda p: p.stat().st_mtime)
    if not planes:
        return []
    data = jp.ProfileData.from_file(str(planes[-1]))
    durations: Dict[str, float] = defaultdict(float)
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for event in line.events:
                durations[event.name] += event.duration_ns / 1e6
    top = sorted(durations.items(), key=lambda kv: -kv[1])[:top_k]
    return top


class StepTimer:
    """Pipelined timing: dispatch N calls, fetch once (see bench.py)."""

    def __init__(self, fn: Callable, sync_leaf: Callable = None):
        self.fn = fn
        self.sync_leaf = sync_leaf or (lambda out: np.asarray(
            __import__("jax").tree_util.tree_leaves(out)[0]))

    def measure(self, *args, n: int = 100, warmup: int = 5) -> float:
        out = self.fn(*args)
        self.sync_leaf(out)
        for _ in range(warmup):
            out = self.fn(*args)
        self.sync_leaf(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = self.fn(*args)
        self.sync_leaf(out)
        return (time.perf_counter() - t0) * 1000 / n
