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


def _pin_backends_for_mesh(cfg: MPCConfig, mesh: Mesh) -> MPCConfig:
    """Resolve ``"auto"`` compute backends from the MESH's device platform,
    not ``jax.default_backend()``.  On this environment the axon plugin
    pins the default backend to "tpu" at interpreter start, so a process
    that has already touched the TPU and then builds a virtual CPU mesh
    (``__graft_entry__.dryrun_multichip``, CPU-mesh tests run after TPU
    work) would otherwise route the sharded rollout into the Mosaic
    kernels and fail lowering ("Only interpret mode is supported on CPU
    backend")."""
    import dataclasses

    platform = mesh.devices.flat[0].platform
    updates = {}
    if cfg.solver_backend == "auto":
        updates["solver_backend"] = "pallas" if platform == "tpu" else "xla"
    if cfg.extract_backend == "auto":
        updates["extract_backend"] = ("pallas" if platform == "tpu"
                                      else "gather")
    return dataclasses.replace(cfg, **updates) if updates else cfg


def simulate_fleet_sharded(mesh: Mesh, grid: GridMap, path: PathData,
                           cfg: MPCConfig, model: ModelConfig, sim: SimConfig,
                           state0: CarState) -> SimResult:
    """Run the fleet rollout with the batch axis sharded over ``mesh``.

    ``state0``'s leading axis must divide evenly across the mesh (see
    ``round_up_batch``).  World data (grid, path) is replicated.
    """
    cfg = _pin_backends_for_mesh(cfg, mesh)
    state0 = shard_fleet_state(state0, mesh)

    # the dynamic-grid path's scanline table carries host-concretized window
    # metadata — build it OUTSIDE the traced shard_map body and replicate
    table = None
    if not sim.static_grid:
        from multi_purpose_mpc_tpu.ops.corridor_extract import build_scanline_table

        table = replicate(
            build_scanline_table(grid, path, cfg.n_scan_samples), mesh)

    grid = replicate(grid, mesh)
    path = replicate(path, mesh)

    def local_rollout(grid_l, path_l, state_l, table_l):
        # full per-device rollout on this shard of lanes (Pallas on TPU)
        return simulate_fleet(grid_l, path_l, cfg, model, sim, state_l,
                              table=table_l)

    fn = shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(P(), P(), P(FLEET_AXIS), P()),
        # final_state: (B, ...) lanes-leading; logs: (T, B, ...) time-leading
        out_specs=SimResult(final_state=P(FLEET_AXIS),
                            log=P(None, FLEET_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)(grid, path, state0, table)


def simulate_lidar_fleet_sharded(mesh: Mesh, true_grid: GridMap,
                                 known_grid: GridMap, path: PathData,
                                 cfg: MPCConfig, model: ModelConfig,
                                 sim: SimConfig, lidar, state0: CarState,
                                 clear_free: bool = False,
                                 shared_grid: bool = False,
                                 scan_backend: str = "auto",
                                 writeback_backend: str = "auto",
                                 table=None, cells=None):
    """LiDAR-in-the-loop fleet with lanes (and their maps) sharded over
    ``mesh`` — the multi-chip flavor of
    :func:`~multi_purpose_mpc_tpu.simulation.simulate_lidar_fleet`.

    Two grid semantics, two sharding stories:

    * ``shared_grid=False``: per-lane online maps shard WITH their lanes —
      the (B, H, W) map stack is the HBM-dominant state (Sim_Track at
      B=256: 256 MB), so sharding it is what scales the fleet past one
      chip's memory.  Zero collectives (lanes stay independent).
    * ``shared_grid=True``: ONE cooperatively-built map, replicated, with
      each device pooling its local lanes' observation masks and one
      ``pmax`` (= logical-or, commutative) per mask class merging them over
      ICI every step — every device's grid carry stays bitwise identical.
      The semantics match single-device pooling exactly: hit/clear masks
      are or-reduced over ALL lanes before one elementwise update.

    World inputs (true grid, path, scanline/cell tables) are replicated.
    Returns ``(SimResult, final_known_occ)`` with the occupancy sharded
    per-lane or replicated shared, matching the unsharded function.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from multi_purpose_mpc_tpu.simulation import (_simulate_lidar_fleet,
                                                  resolve_cell_table,
                                                  resolve_lidar_backends)

    cfg = _pin_backends_for_mesh(cfg, mesh)
    if table is None:
        from multi_purpose_mpc_tpu.ops.corridor_extract import build_scanline_table

        tgrid = known_grid  # pure geometry: 2-D frame even for (B, H, W)
        if known_grid.occ.ndim == 3:
            tgrid = known_grid.replace(occ=known_grid.occ[0])
        table = build_scanline_table(tgrid, path, cfg.n_scan_samples)
    scan_backend, writeback_backend = resolve_lidar_backends(
        shared_grid, clear_free, scan_backend, writeback_backend,
        multi_device=True)
    cells = resolve_cell_table(true_grid, path, lidar, cells, scan_backend)

    B = state0.x.shape[0]
    occ0 = known_grid.occ
    if not shared_grid and occ0.ndim == 2:
        occ0 = jnp.broadcast_to(occ0, (B,) + occ0.shape)
    occ_spec = P() if shared_grid else P(FLEET_AXIS)

    state0 = shard_fleet_state(state0, mesh)
    occ0 = jax.device_put(occ0, NamedSharding(mesh, occ_spec))
    true_grid = replicate(true_grid, mesh)
    path = replicate(path, mesh)
    table = replicate(table, mesh)
    if cells is not None:
        cells = jax.device_put(cells, NamedSharding(mesh, P()))

    axis_name = FLEET_AXIS if shared_grid else None

    def local_rollout(tg, pth, tbl, cl, occ_l, state_l):
        kg = known_grid.replace(occ=occ_l)
        return _simulate_lidar_fleet(
            tg, kg, pth, cfg, model, sim, lidar, state_l, tbl, cl,
            clear_free=clear_free, shared_grid=shared_grid,
            scan_backend=scan_backend, writeback_backend=writeback_backend,
            axis_name=axis_name)

    fn = shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), occ_spec, P(FLEET_AXIS)),
        out_specs=(SimResult(final_state=P(FLEET_AXIS),
                             log=P(None, FLEET_AXIS)), occ_spec),
        check_vma=False,
    )
    return jax.jit(fn)(true_grid, path, table, cells, occ0, state0)
