"""Sharded fleet rollout: the multi-chip entry point.

``simulate_fleet_sharded`` = the vmapped closed-loop scan of
:mod:`~multi_purpose_mpc_tpu.simulation`, jitted with explicit shardings over
a fleet mesh.  XLA partitions the batch axis across devices; because lanes
are independent there is no communication in the loop — collectives appear
only in :func:`~multi_purpose_mpc_tpu.parallel.mesh.fleet_metrics`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh

from multi_purpose_mpc_tpu.config import MPCConfig, ModelConfig, SimConfig
from multi_purpose_mpc_tpu.models.bicycle import CarState
from multi_purpose_mpc_tpu.ops.grid import GridMap
from multi_purpose_mpc_tpu.ops.path import PathData
from multi_purpose_mpc_tpu.parallel.mesh import (
    fleet_sharding,
    replicate,
    shard_fleet_state,
)
from multi_purpose_mpc_tpu.simulation import SimResult, simulate_fleet


def simulate_fleet_sharded(mesh: Mesh, grid: GridMap, path: PathData,
                           cfg: MPCConfig, model: ModelConfig, sim: SimConfig,
                           state0: CarState) -> SimResult:
    """Run the fleet rollout with the batch axis sharded over ``mesh``.

    ``state0``'s leading axis must be divisible by the mesh size (see
    ``round_up_batch``).  Data placement: lanes sharded, world replicated;
    the jitted program is the same one ``simulate_fleet`` compiles on a
    single chip — GSPMD inserts the partitioning.
    """
    state0 = shard_fleet_state(state0, mesh)
    grid = replicate(grid, mesh)
    path = replicate(path, mesh)
    # GSPMD cannot auto-partition a pallas_call over the sharded batch axis,
    # so the multi-chip path pins the XLA stage-scan solver (wrapping the
    # kernel in shard_map is the planned fast path for real multi-chip runs).
    import dataclasses

    if cfg.solver_backend != "xla":
        cfg = dataclasses.replace(cfg, solver_backend="xla")
    # Sharding is carried by the operands (device_put above); jit propagates
    # it through the scan — no explicit in_shardings needed for this
    # embarrassingly parallel program, and GSPMD emits zero collectives.
    return simulate_fleet(grid, path, cfg, model, sim, state0)
