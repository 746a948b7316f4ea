"""Profiling & timing harness (new subsystem — the reference has none,
SURVEY.md §5): wall-clock step timing with ``block_until_ready`` and
``jax.profiler`` trace capture for TensorBoard's profile plugin."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def block(tree):
    """Block until every array in a pytree is computed.

    On some remote-device PJRT platforms (the "axon" TPU tunnel in this
    container) ``block_until_ready`` returns before execution finishes, so
    we additionally fence with a tiny device->host transfer.  Device
    streams execute dispatches in order, so materializing one element of
    one output buffer fences every prior dispatch; leaves of a single
    jitted call all come from the same executable.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "block_until_ready")]
    for leaf in leaves:
        leaf.block_until_ready()
    if leaves:
        np.asarray(jax.device_get(leaves[-1].ravel()[:1]))
    return tree


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kwargs) -> Dict[str, float]:
    """Time a jitted function: compile time + steady-state stats (seconds)."""
    t0 = time.perf_counter()
    block(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        block(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "compile_s": compile_s,
        "mean_s": float(times.mean()),
        "median_s": float(np.median(times)),
        "min_s": float(times.min()),
        "std_s": float(times.std()),
        "iters": iters,
    }


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Exponential-moving-average step timer for the train loop."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (
                self.alpha * dt + (1 - self.alpha) * self.ema)
        self._last = now
        return dt
