"""Tracing / profiling hooks (SURVEY.md §5: the reference's only timing is
``time.time()`` prints in the lidar scan; lidar_model.py:45, 111-112).

Two layers:
* :func:`trace` — context manager around ``jax.profiler`` for device traces
  (open the output in XProf/TensorBoard to see per-op TPU timings);
* :func:`time_stages` — wall-clock timing of jitted stage functions with
  proper ``block_until_ready`` fencing, for quick per-stage breakdowns
  (linearize / corridor / QP-solve / integrate).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mpc_tpu_trace"):
    """Capture a device profile: ``with trace(): run_step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, warmup: int = 2, iters: int = 10,
           **kwargs) -> float:
    """Median wall-clock seconds per call of a jitted function."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_stages(stages: Dict[str, Callable], warmup: int = 2,
                iters: int = 10) -> Dict[str, float]:
    """Time a dict of thunks; returns {name: median_seconds}."""
    return {name: timeit(fn, warmup=warmup, iters=iters)
            for name, fn in stages.items()}
