"""Profiling hooks: jax.profiler traces + step-loop accounting.

The reference has no profiling layer (SURVEY.md §5: ad-hoc ``*.prof`` files
only). Here a trace context manager wraps any region into a TensorBoard-
viewable device trace, and ``profile_step_loop`` combines it with the
``StepTimer`` stall accounting from ``rxtpu.train.metrics``.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler device trace into ``logdir``."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_step_loop(step_fn, batches: Iterator, logdir: Optional[str] = None,
                      max_steps: int = 10):
    """Run up to ``max_steps`` of ``step_fn(batch)`` under a trace; returns
    the StepTimer summary (step time + input-stall %)."""
    import jax
    import numpy as np

    from rxtpu.train.metrics import StepTimer

    timer = StepTimer()
    ctx = trace(logdir) if logdir else contextlib.nullcontext()
    with ctx:
        it = iter(batches)
        for _ in range(max_steps):
            with timer.waiting():
                batch = next(it, None)
            if batch is None:
                break
            with timer.stepping():
                out = step_fn(batch)
                # async dispatch returns immediately; without a barrier the
                # stepping window records dispatch latency and the stall %
                # is meaningless. Host readback of the smallest leaf — the
                # only reliable barrier on relay-attached chips
                # (block_until_ready can ack early, CLAUDE.md).
                leaves = [l for l in jax.tree_util.tree_leaves(out)
                          if hasattr(l, "dtype")]
                if leaves:
                    np.asarray(min(leaves, key=lambda l: getattr(l, "size", 1)))
    return timer.summary()
