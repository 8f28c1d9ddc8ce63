"""Sharded fleet rollout: the multi-chip entry point.

``simulate_fleet_sharded`` runs the closed-loop scan with the fleet axis
split over a ``Mesh`` via ``shard_map``: each device executes the full local
rollout — including the fused Pallas kernels on TPU — on its shard of lanes.
Lanes are independent, so the mapped body contains **zero collectives**
(SURVEY.md §2.3); cross-device reductions appear only in
:func:`~multi_purpose_mpc_tpu.parallel.mesh.fleet_metrics`.

``shard_map`` rather than bare GSPMD jit because the hot path is a
``pallas_call`` — a custom kernel the partitioner cannot split; per-shard
manual mapping is the canonical pattern.  On CPU meshes the local body
resolves to the XLA solver automatically (``MPCConfig.solver_backend``
"auto"), which is how the 8-virtual-device tests and the driver's
``dryrun_multichip`` exercise this exact code path.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from multi_purpose_mpc_tpu.config import MPCConfig, ModelConfig, SimConfig
from multi_purpose_mpc_tpu.models.bicycle import CarState
from multi_purpose_mpc_tpu.ops.grid import GridMap
from multi_purpose_mpc_tpu.ops.path import PathData
from multi_purpose_mpc_tpu.parallel.mesh import (
    FLEET_AXIS,
    replicate,
    shard_fleet_state,
)
from multi_purpose_mpc_tpu.simulation import SimResult, simulate_fleet

try:  # jax >= 0.4.35 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def simulate_fleet_sharded(mesh: Mesh, grid: GridMap, path: PathData,
                           cfg: MPCConfig, model: ModelConfig, sim: SimConfig,
                           state0: CarState) -> SimResult:
    """Run the fleet rollout with the batch axis sharded over ``mesh``.

    ``state0``'s leading axis must divide evenly across the mesh (see
    ``round_up_batch``).  World data (grid, path) is replicated.
    """
    state0 = shard_fleet_state(state0, mesh)
    grid = replicate(grid, mesh)
    path = replicate(path, mesh)

    def local_rollout(grid_l, path_l, state_l):
        # full per-device rollout on this shard of lanes (Pallas on TPU)
        return simulate_fleet(grid_l, path_l, cfg, model, sim, state_l)

    fn = shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(P(), P(), P(FLEET_AXIS)),
        # final_state: (B, ...) lanes-leading; logs: (T, B, ...) time-leading
        out_specs=SimResult(final_state=P(FLEET_AXIS),
                            log=P(None, FLEET_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)(grid, path, state0)
