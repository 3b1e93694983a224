"""Profiling / tracing helpers.

TPU equivalent of the reference's tf.summary.trace_on/trace_export profiling
(/root/reference/karman-2d-phi2/karman_train.py:548-554): jax.profiler traces
(TensorBoard-compatible) plus simple block_until_ready wall-clock timers.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(out_dir: str):
    """Dump a TensorBoard-compatible device trace of the enclosed block."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, warmup: int = 2, iters: int = 10, **kwargs) -> float:
    """Median wall-clock seconds per call with block_until_ready."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
