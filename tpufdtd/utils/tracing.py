"""Profiling/tracing hooks.

The reference instruments with host-walltime section macros and cudaEvents
plus nsys/ncu recipes (SURVEY.md §5). TPU equivalents:
  * `trace(logdir)` — jax.profiler trace context; view in TensorBoard /
    xprof for per-op device timelines (the nsys analogue).
  * `timed_section(timers, name)` — walltime accumulation into a dict, with
    a completion fence that actually works on tunneled devices (a scalar
    readback; plain block_until_ready can return early there).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


def sync(x) -> None:
    """Reliable completion fence: block + data-dependent scalar readback."""
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)
    if leaf:
        a = leaf[0]
        if hasattr(a, "ndim"):
            np.asarray(a[(0,) * a.ndim])


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed_section(timers: Dict[str, float], name: str, fence=None):
    """Accumulate wall time into timers[name] (the reference's START/STOP
    macro pair, openacc.cpp:2-3); `fence` is synced before and after."""
    if fence is not None:
        sync(fence)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if fence is not None:
            sync(fence)
        timers[name] = timers.get(name, 0.0) + time.perf_counter() - t0
