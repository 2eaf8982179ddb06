"""Profiling hooks: jax.profiler traces + honest step timing.

The reference has no profiling at all (SURVEY.md §5 'tracing: none');
this is the rebuild's observability layer. `trace` wraps a region in a
jax.profiler trace viewable in TensorBoard/XProf; `StepTimer` measures
steady-state step time with a completion barrier (on hosted-TPU tunnels
`block_until_ready` may not actually wait — a tiny readback does).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """`with trace('/tmp/profile'): step(...)` → XProf trace directory."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(tree: Any) -> None:
    """Completion barrier that works even where block_until_ready lies:
    read back one scalar element from some array leaf."""
    jax.block_until_ready(tree)
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "shape"):
            np.asarray(jax.tree.map(lambda x: x, leaf)).reshape(-1)[:1]
            break


class StepTimer:
    """Rolling step-time statistics with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t = None
        self._count = 0

    def start(self):
        self._t = time.perf_counter()

    def stop(self, result: Optional[Any] = None):
        if result is not None:
            force_completion(result)
        dt = time.perf_counter() - self._t
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")
