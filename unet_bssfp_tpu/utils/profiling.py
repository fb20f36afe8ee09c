"""Tracing/profiling harness (SURVEY.md §5.1 TPU equivalent).

Replaces the reference's Lightning ``PyTorchProfiler`` debug hookup
(``src/train.py:38-41,66-68``) and wall-clock prints with ``jax.profiler``
traces (XProf/Perfetto-compatible) and a ``block_until_ready`` step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed step window:
    ``with trace('logs/trace'): run_steps()`` → open in XProf/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup discard; blocks on the result so
    async dispatch doesn't hide device time."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._count = 0

    def time_step(self, fn, *args, **kwargs):
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        # Pull one scalar to host: block_until_ready does not actually block
        # over tunneled TPU backends (observed on axon), a device_get does.
        leaf = jax.tree_util.tree_leaves(out)[-1]
        jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf)
        elapsed = time.perf_counter() - start
        self._count += 1
        if self._count > self.warmup:
            self.times.append(elapsed)
        return out

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "mean_s": sum(ts) / len(ts),
            "median_s": ts[len(ts) // 2],
            "min_s": ts[0],
            "max_s": ts[-1],
            "steps": len(ts),
        }
