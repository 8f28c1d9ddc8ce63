"""Tracing / profiling hooks (SURVEY.md §5: the reference's only timing is
``time.time()`` prints in the lidar scan; lidar_model.py:45, 111-112).

Two layers:
* :func:`trace` — context manager around ``jax.profiler`` for device traces
  (open the output in XProf/TensorBoard to see per-op TPU timings);
* :func:`time_stages` — wall-clock timing of jitted stage functions with a
  **host-transfer completion fence** (see :func:`fence`), for quick per-stage
  breakdowns (linearize / corridor / QP-solve / integrate).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


def fence(out):
    """Block until ``out`` is actually computed; returns ``out``.

    ``jax.block_until_ready`` returns at *dispatch* time on remote-execution
    runtimes (e.g. the axon TPU tunnel), so timing loops fenced with it
    measure queueing, not compute.  The reliable fence is a host transfer of
    a value derived from every output buffer — the same fence ``bench.py``
    uses.  Cost: one tiny device slice + D2H copy per leaf (~µs), negligible
    against any stage worth timing.
    """
    for x in jax.tree.leaves(out):
        if hasattr(x, "dtype"):
            np.asarray(x.ravel()[0] if getattr(x, "ndim", 0) else x)
    return out


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
    """Median wall-clock seconds per call of a jitted function.

    Fenced with :func:`fence` (host transfer), not ``block_until_ready`` —
    the latter under-measures on remote-execution platforms.
    """
    for _ in range(warmup):
        fence(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_stages(stages: Dict[str, Callable], warmup: int = 2,
                iters: int = 10) -> Dict[str, float]:
    """Time a dict of thunks; returns {name: median_seconds}."""
    return {name: timeit(fn, warmup=warmup, iters=iters)
            for name, fn in stages.items()}
