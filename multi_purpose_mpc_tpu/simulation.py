"""Closed-loop simulation drivers (TPU-native simulation.py).

The reference's ``while car.s < reference_path.length`` loop with inline
matplotlib rendering (reference: simulation.py:134-163) becomes a fixed-length
``lax.scan`` with a per-lane done mask; trajectories and solver statuses come
back as device buffers for post-hoc rendering (SURVEY.md §7 shift #5 —
rendering leaves the hot loop).

``simulate_closed_loop`` runs one lane; ``simulate_fleet`` vmaps the same
step over a fleet axis — thousands of cars per chip, zero host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.config import MPCConfig, ModelConfig, SimConfig
from multi_purpose_mpc_tpu.models.bicycle import CarState, drive, init_car_state
from multi_purpose_mpc_tpu.mpc import mpc_step
from multi_purpose_mpc_tpu.ops.grid import GridMap
from multi_purpose_mpc_tpu.ops.path import PathData


class SimLog(NamedTuple):
    """Per-step device-side logs (leading time axis; fleet axis after vmap).

    Replaces the reference's Python lists + live plots
    (simulation.py:129-131, 143-145).
    """

    x: jnp.ndarray
    y: jnp.ndarray
    psi: jnp.ndarray
    v: jnp.ndarray
    delta: jnp.ndarray
    s: jnp.ndarray
    e_y: jnp.ndarray
    status: jnp.ndarray  # raw solver status (SOLVED/MAX_ITER/DIVERGED)
    ok: jnp.ndarray  # control accepted (reference-semantics acceptance)
    r_prim: jnp.ndarray  # QP primal residual per step
    active: jnp.ndarray


class SimResult(NamedTuple):
    final_state: CarState
    log: SimLog


def _post_control(out, path: PathData, model: ModelConfig):
    """Shared plant-step + logging after a control step (single lane)."""
    st = out.state
    active = ~(st.done | st.failed)
    v = jnp.where(active, out.v, 0.0)
    delta = jnp.where(active, out.delta, 0.0)
    st = drive(st, path, v, delta, model.length, model.Ts)
    # end-of-lap: the reference's loop condition (simulation.py:134)
    done = st.done | (st.s >= path.length)
    st = st.replace(done=done)
    log = SimLog(x=st.x, y=st.y, psi=st.psi, v=v, delta=delta, s=st.s,
                 e_y=st.e_y, status=out.status, ok=out.ok, r_prim=out.r_prim,
                 active=active)
    return st, log


def _sim_step(state: CarState, path: PathData, grid: GridMap,
              cfg: MPCConfig, model: ModelConfig, segments=None):
    out = mpc_step(state, path, grid, cfg, model, segments)
    return _post_control(out, path, model)


def _sim_step_batched(state: CarState, path: PathData, grid: GridMap,
                      cfg: MPCConfig, model: ModelConfig, segments=None):
    """Fleet step: batched solver (Pallas kernel on TPU), vmapped rest."""
    from multi_purpose_mpc_tpu.mpc import mpc_step_batched

    out = mpc_step_batched(state, path, grid, cfg, model, segments)
    return jax.vmap(lambda o: _post_control(o, path, model))(out)


def _maybe_segments(grid: GridMap, path: PathData, cfg: MPCConfig,
                    model: ModelConfig, sim: SimConfig):
    """Static-grid fast path: free segments for all waypoints, computed once
    per rollout instead of N x B times per step (identical corridor values)."""
    if not sim.static_grid:
        return None
    from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments

    return extract_all_segments(grid, path, 2.0 * model.safety_margin,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)


@functools.partial(jax.jit, static_argnames=("cfg", "model", "sim"))
def simulate_closed_loop(grid: GridMap, path: PathData, cfg: MPCConfig,
                         model: ModelConfig, sim: SimConfig,
                         state0: Optional[CarState] = None) -> SimResult:
    """Single-lane closed-loop rollout as one compiled scan.

    Internally runs the batched step with batch 1 so a single car still gets
    the fused Pallas solver on TPU (10x the per-lane XLA path's rate)."""
    if state0 is None:
        state0 = init_car_state(path, cfg.N)
    segs = _maybe_segments(grid, path, cfg, model, sim)
    state_b = jax.tree.map(lambda a: a[None], state0)

    def step_fn(state, _):
        return _sim_step_batched(state, path, grid, cfg, model, segs)

    final, log = jax.lax.scan(step_fn, state_b, None, length=sim.max_steps)
    squeeze = lambda t: jax.tree.map(lambda a: jnp.squeeze(a, axis=1), t)
    return SimResult(final_state=jax.tree.map(lambda a: jnp.squeeze(a, 0), final),
                     log=squeeze(log))


@functools.partial(jax.jit, static_argnames=("cfg", "model", "sim"))
def simulate_fleet(grid: GridMap, path: PathData, cfg: MPCConfig,
                   model: ModelConfig, sim: SimConfig,
                   state0: CarState) -> SimResult:
    """Fleet closed-loop rollout: ``state0`` carries a leading batch axis;
    one scan over time, vmapped step over the fleet (SURVEY.md §2.3)."""
    segs = _maybe_segments(grid, path, cfg, model, sim)

    def step_fn(state, _):
        return _sim_step_batched(state, path, grid, cfg, model, segs)

    final, log = jax.lax.scan(step_fn, state0, None, length=sim.max_steps)
    # logs come out (T, B, ...); keep that layout (time-major)
    return SimResult(final_state=final, log=log)


@functools.partial(jax.jit, static_argnames=("cfg", "model", "sim", "lidar",
                                              "clear_free"))
def simulate_lidar_loop(true_grid: GridMap, known_grid: GridMap,
                        path: PathData, cfg: MPCConfig, model: ModelConfig,
                        sim: SimConfig, lidar,
                        state0: Optional[CarState] = None,
                        clear_free: bool = False):
    """LiDAR-in-the-loop closed loop (BASELINE.json config 4).

    The controller never sees ``true_grid``: each step the sensor ray-marches
    the true world (:func:`~..ops.lidar.scan`), the hits are written into the
    carried ``known_grid`` (:func:`~..ops.lidar.update_grid_from_scan`), and
    the MPC's corridor extraction runs against that updated map — the
    reference's out-of-repo ROS pipeline (README.md:76) as one on-device
    scan.  Corridor extraction stays in-loop (the grid changes every step).

    Returns ``(SimResult, final_known_grid)``.
    """
    from multi_purpose_mpc_tpu.ops.lidar import scan as lidar_scan
    from multi_purpose_mpc_tpu.ops.lidar import update_grid_from_scan

    if state0 is None:
        state0 = init_car_state(path, cfg.N)

    state0_b = jax.tree.map(lambda a: a[None], state0)

    def step_fn(carry, _):
        state, occ = carry
        kgrid = known_grid.replace(occ=occ)
        x0, y0, psi0 = state.x[0], state.y[0], state.psi[0]
        s = lidar_scan(true_grid, x0, y0, psi0, lidar)
        kgrid = update_grid_from_scan(kgrid, x0, y0, psi0, s,
                                      lidar, clear_free=clear_free)
        # batch-1 batched step: same solver path as the other rollouts
        st, log = _sim_step_batched(state, path, kgrid, cfg, model,
                                    segments=None)
        return (st, kgrid.occ), log

    (final, occ), log = jax.lax.scan(step_fn, (state0_b, known_grid.occ), None,
                                     length=sim.max_steps)
    squeeze = lambda t: jax.tree.map(lambda a: jnp.squeeze(a, axis=1), t)
    return (SimResult(final_state=jax.tree.map(lambda a: jnp.squeeze(a, 0), final),
                      log=squeeze(log)),
            known_grid.replace(occ=occ))


@functools.partial(jax.jit, static_argnames=("cfg", "model", "sim", "lidar",
                                              "clear_free", "shared_grid"))
def simulate_lidar_fleet(true_grid: GridMap, known_grid: GridMap,
                         path: PathData, cfg: MPCConfig, model: ModelConfig,
                         sim: SimConfig, lidar, state0: CarState,
                         clear_free: bool = False,
                         shared_grid: bool = False):
    """Fleet-scale LiDAR-in-the-loop rollout (BASELINE.json config 4 at
    batch scale): every lane scans the true world each step, writes hits
    into its working map, and runs MPC corridor extraction against that
    updated map — the reference's out-of-repo ROS pipeline (README.md:76)
    vmapped over thousands of cars.

    Grid semantics (two supported modes):
      * ``shared_grid=False`` (default): per-lane known grids — independent
        Monte-Carlo mapping runs.  ``known_grid.occ`` may be (H, W) (tiled
        to every lane) or already (B, H, W).  HBM cost: B x H x W x 4 bytes
        (Sim_Track at B=256: 256 MB).
      * ``shared_grid=True``: ONE known grid cooperatively updated by all
        lanes each step (a mapping fleet pooling observations).  Lane
        writes commute (hits set cells occupied via min), so the update is
        order-independent and deterministic.

    Returns ``(SimResult, final_known_occ)``.
    """
    from multi_purpose_mpc_tpu.ops.lidar import scan as lidar_scan
    from multi_purpose_mpc_tpu.ops.lidar import update_grid_from_scan

    B = state0.x.shape[0]
    occ0 = known_grid.occ
    if not shared_grid and occ0.ndim == 2:
        occ0 = jnp.broadcast_to(occ0, (B,) + occ0.shape)

    grid_axes = GridMap(occ=0, origin=None, resolution=None)

    def step_fn(carry, _):
        state, occ = carry
        scans = jax.vmap(lambda x, y, p: lidar_scan(true_grid, x, y, p, lidar)
                         )(state.x, state.y, state.psi)
        if shared_grid:
            kgrid = known_grid.replace(occ=occ)
            # pooled update: flatten all lanes' hits into one write batch
            hit_xy = scans.hit_xy.reshape(-1, 2)
            from multi_purpose_mpc_tpu.ops.grid import w2m

            hpx, hpy = w2m(kgrid, hit_xy[:, 0], hit_xy[:, 1])
            h, w = kgrid.occ.shape
            hpx = jnp.clip(hpx, 0, w - 1)
            hpy = jnp.clip(hpy, 0, h - 1)
            val = jnp.where(scans.hit.reshape(-1), 0.0, 1.0)
            new_occ = kgrid.occ.at[hpy, hpx].min(val)
            st, log = _sim_step_batched(state, path, kgrid.replace(occ=new_occ),
                                        cfg, model, segments=None)
            return (st, new_occ), log
        # per-lane grids: vmapped write-back + per-lane corridor extraction
        new_occ = jax.vmap(
            lambda o, x, y, p, s: update_grid_from_scan(
                known_grid.replace(occ=o), x, y, p, s, lidar,
                clear_free=clear_free).occ,
            in_axes=(0, 0, 0, 0, 0))(occ, state.x, state.y, state.psi, scans)
        st, log = _sim_step_batched_gridded(state, path, known_grid, new_occ,
                                            cfg, model)
        return (st, new_occ), log

    (final, occ), log = jax.lax.scan(step_fn, (state0, occ0), None,
                                     length=sim.max_steps)
    return SimResult(final_state=final, log=log), occ


def _sim_step_batched_gridded(state: CarState, path: PathData,
                              base_grid: GridMap, occ_b: jnp.ndarray,
                              cfg: MPCConfig, model: ModelConfig):
    """Fleet step where every lane carries its OWN occupancy grid ``occ_b``
    (B, H, W) over shared ``base_grid`` metadata — the per-lane dynamic-map
    variant of :func:`_sim_step_batched`.  Corridor extraction vmaps over
    (lane, grid); the QP solve still runs the batched backend (Pallas kernel
    on TPU)."""
    from multi_purpose_mpc_tpu.mpc import (mpc_corridor, mpc_locate,
                                           mpc_step_batched_with_corridor)

    located = jax.vmap(lambda s: mpc_locate(s, path))(state)
    corridor = jax.vmap(
        lambda w, occ: mpc_corridor(w, path, base_grid.replace(occ=occ), cfg,
                                    model, None),
        in_axes=(0, 0))(located[0], occ_b)
    out = mpc_step_batched_with_corridor(state, path, cfg, model, located,
                                         corridor)
    return jax.vmap(lambda o: _post_control(o, path, model))(out)


def init_fleet(path: PathData, N: int, batch: int,
               e_y0: Optional[jnp.ndarray] = None,
               e_psi0: Optional[jnp.ndarray] = None,
               wp_id0: Optional[jnp.ndarray] = None) -> CarState:
    """Batch of initial states, optionally perturbed per lane (Monte-Carlo)."""
    e_y0 = jnp.zeros(batch) if e_y0 is None else e_y0
    e_psi0 = jnp.zeros(batch) if e_psi0 is None else e_psi0
    wp_id0 = jnp.zeros(batch, jnp.int32) if wp_id0 is None else wp_id0
    return jax.vmap(lambda ey, ep, wp: init_car_state(path, N, ey, ep, wp))(
        e_y0, e_psi0, wp_id0)
