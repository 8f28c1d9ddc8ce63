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


def _float_reduce(out):
    """Scalar data-dependence on every float leaf (prevents DCE)."""
    import jax.numpy as jnp

    s = jnp.float32(0.0)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            s = s + leaf.sum().astype(jnp.float32)
    return s


def scan_marginal_cost(fn: Callable, args: tuple, perturb: Callable,
                       steps: int = 32, repeats: int = 3) -> float:
    """Marginal per-iteration seconds of ``fn(*args)`` measured INSIDE one
    ``lax.scan`` dispatch — the only reliable per-op timing on
    remote-dispatch platforms (e.g. the axon TPU tunnel), where every
    standalone call pays a fixed dispatch floor (~28 ms measured) that
    swamps the op itself.

    Method: run ``steps`` iterations of ``fn`` inside one scan, fenced with
    :func:`fence`; run the same harness with a trivial body; report
    ``(t_fn - t_trivial) / steps``.  ``perturb(args, i) -> args`` must make
    the body iteration-dependent (e.g. shift an index by ``i % 2``) —
    without it XLA hoists the loop-invariant body out of the scan and the
    remote execution service dedups identical submissions, both of which
    fake a near-zero cost.

    Returns best-of-``repeats`` marginal seconds (>= 0).
    """
    import jax.numpy as jnp

    def make(body_fn):
        @jax.jit
        def run(a):
            def body(c, i):
                ai = perturb(a, i)
                return c + body_fn(ai), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(steps))
            return out

        return run

    def trivial(ai):
        # consume the perturbed args cheaply: one element per float leaf
        s = jnp.float32(0.0)
        for leaf in jax.tree.leaves(ai):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                s = s + (leaf.ravel()[0] if leaf.ndim else leaf
                         ).astype(jnp.float32)
        return s

    def best(run):
        fence(run(args))  # compile
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fence(run(args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_floor = best(make(trivial))
    t_fn = best(make(lambda ai: _float_reduce(fn(*ai))))
    return max((t_fn - t_floor) / steps, 0.0)
