"""Tracing / benchmarking harness (absent in the reference, SURVEY.md §5.1):
``jax.profiler`` trace capture + block_until_ready wall-clock timing — the
backbone of the throughput benchmark mode the north-star metric requires."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Perfetto-compatible profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn: Callable[[], Any], warmup: int = 2,
                 iters: int = 10) -> Dict[str, float]:
    """Wall-clock a device computation properly: warmup (compile) excluded,
    ``block_until_ready`` on every iteration."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "mean_s": sum(times) / len(times),
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "iters": iters,
    }
