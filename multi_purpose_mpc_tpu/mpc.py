"""LTV-MPC controller as a pure function of the lane state (TPU-native MPC.py).

``mpc_step`` is the whole of the reference's ``MPC.get_control``
(MPC.py:161-222) — localization, frame transform, corridor update, QP
assembly, solve, control extraction, and the infeasibility-replay fallback —
as one jit-able function over a :class:`CarState`, designed to vmap over a
fleet axis and scan over time.

Key reformulations:

* the horizon loop (MPC.py:90-113) becomes a gather + batched linearize;
* OSQP setup/solve (MPC.py:157-183) becomes the structured block-tridiagonal
  ADMM (:mod:`~multi_purpose_mpc_tpu.ops.ltv_qp`) with warm starts;
* exceptions/exit(1) (MPC.py:208-220) become per-lane ``status`` /
  ``infeasibility_count`` / ``failed`` values (SURVEY.md §5);
* kappa predictions from the previous control sequence implement the
  *intended* shift-by-one semantics (SURVEY.md Q1): the reference's
  ``current_control[3::] + current_control[-1:]`` broadcast-add is a bug.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.config import MPCConfig, ModelConfig
from multi_purpose_mpc_tpu.models.bicycle import (
    CarState,
    horizon_linearize,
    locate_waypoint,
    s2t,
    t2s,
)
from multi_purpose_mpc_tpu.ops import admm
from multi_purpose_mpc_tpu.ops.constraints import (
    Corridor,
    SegmentCandidates,
    corridor_from_segments,
    update_path_constraints,
)
from multi_purpose_mpc_tpu.ops.grid import GridMap
from multi_purpose_mpc_tpu.ops.ltv_qp import LTVQP, LTVSolution, solve_ltv_qp
from multi_purpose_mpc_tpu.ops.path import PathData, gather_waypoint_index

_INF = jnp.inf
_EPS = 1e-12


class WeightSet(NamedTuple):
    """Diagonal MPC cost weights as runtime data.

    The reference's whole "multi-purpose" pitch is that path tracking,
    time-optimal driving, and obstacle avoidance are *weight choices* on one
    controller (README.md:17-19, :48).  There the weights are Python
    constants baked into the script (simulation.py:100-103); here they can
    also be per-lane arrays, so a single batched TPU program runs an entire
    tuning grid — every lane a differently-weighted controller on the same
    track (see :func:`~multi_purpose_mpc_tpu.simulation.simulate_fleet`'s
    ``weights`` argument).

    Leaves: ``Q``/``QN`` (3,), ``R`` (2,) float arrays; add a leading fleet
    axis for a sweep.  ``None`` anywhere means "use the static
    :class:`~multi_purpose_mpc_tpu.config.MPCConfig` weights".
    """

    Q: jnp.ndarray  # (..., 3) running state cost diagonal
    R: jnp.ndarray  # (..., 2) input cost diagonal
    QN: jnp.ndarray  # (..., 3) terminal state cost diagonal


def weights_from_config(cfg: MPCConfig) -> WeightSet:
    """The config's static weights as a :class:`WeightSet` (no fleet axis)."""
    return WeightSet(Q=jnp.asarray(cfg.Q, jnp.float32),
                     R=jnp.asarray(cfg.R, jnp.float32),
                     QN=jnp.asarray(cfg.QN, jnp.float32))


class ControlOutput(NamedTuple):
    state: CarState  # updated controller-side state (wp_id, e_y, u_seq, flags)
    v: jnp.ndarray  # () speed command
    delta: jnp.ndarray  # () steering command
    status: jnp.ndarray  # () solver status for this step
    ok: jnp.ndarray  # () bool — control accepted (vs replayed)
    r_prim: jnp.ndarray  # () QP primal residual (observability)
    corridor: Corridor  # horizon corridor (viz / logging)
    X_pred: jnp.ndarray  # (N+1, 3) predicted spatial states (viz / logging)


def assemble_ltv_qp(path: PathData, cfg: MPCConfig, model: ModelConfig,
                    wp_id, e_y, e_psi, kappa_pred, corridor: Corridor,
                    weights: WeightSet | None = None) -> LTVQP:
    """Build the horizon QP from gathered path data + corridor bounds.

    Mirrors ``MPC._init_problem`` (MPC.py:61-155) with the SURVEY.md §3.2
    structure; all quantities are (N, ...) arrays instead of scipy.sparse.

    ``weights`` overrides the config's static Q/R/QN diagonals with runtime
    arrays (single lane here; vmap for a per-lane tuning sweep).
    """
    N = cfg.N
    f, A, B, v_ref, kappa_ref, delta_s, _ = horizon_linearize(path, wp_id, N)

    ur = jnp.stack([v_ref, kappa_ref], -1)  # (N, 2)
    # equality rhs: row 0 pins x0; row n+1 carries uq_n = B_n ur_n - f_n
    x0 = jnp.stack([e_y, e_psi, jnp.zeros_like(e_y)])
    uq = jnp.einsum("nij,nj->ni", B, ur) - f
    beq = jnp.concatenate([-x0[None, :], uq], axis=0)  # (N+1, 3)

    # cost: diagonal Q for stages 0..N-1, QN terminal, R on inputs
    if weights is None:
        weights = weights_from_config(cfg)
    Qd = weights.Q.astype(jnp.float32)
    QNd = weights.QN.astype(jnp.float32)
    Rd = weights.R.astype(jnp.float32)
    P_x = jnp.concatenate([jnp.tile(Qd, (N, 1)), QNd[None, :]], axis=0)
    P_u = jnp.tile(Rd, (N, 1))

    # state reference: corridor center-line e_y for steps 1..N (MPC.py:124-125)
    xr_ey = (corridor.lb + corridor.ub) / 2.0  # (N,)
    xr = jnp.zeros((N + 1, 3), jnp.float32).at[1:, 0].set(xr_ey)
    q_x = -P_x * xr
    q_u = -P_u * ur

    # bounds: general state box (simulation.py:110-111), e_y corridor on
    # steps 1..N, x0's e_y pinned to measurement (MPC.py:119-122)
    lx = jnp.tile(jnp.asarray(cfg.xmin, jnp.float32), (N + 1, 1))
    ux = jnp.tile(jnp.asarray(cfg.xmax, jnp.float32), (N + 1, 1))
    lx = lx.at[0, 0].set(e_y)
    ux = ux.at[0, 0].set(e_y)
    lx = lx.at[1:, 0].set(corridor.lb)
    ux = ux.at[1:, 0].set(corridor.ub)

    # input bounds: v in [v_min, min(v_max, sqrt(ay_max/|kappa_pred|))],
    # kappa in [-kappa_max, kappa_max] (MPC.py:84, 111-113)
    kappa_max = cfg.kappa_max(model.length)
    vmax_dyn = jnp.minimum(cfg.v_max,
                           jnp.sqrt(cfg.ay_max / (jnp.abs(kappa_pred) + _EPS)))
    lu = jnp.tile(jnp.asarray([cfg.v_min, -kappa_max], jnp.float32), (N, 1))
    uu = jnp.stack([vmax_dyn, jnp.full((N,), kappa_max, jnp.float32)], -1)

    return LTVQP(A=A, B=B, beq=beq, q_x=q_x, q_u=q_u, P_x=P_x, P_u=P_u,
                 lx=lx, ux=ux, lu=lu, uu=uu)


def kappa_predictions(u_seq: jnp.ndarray, N: int) -> jnp.ndarray:
    """Predicted curvature over the horizon from the cached control sequence.

    Intended semantics of MPC.py:86-87 (SURVEY.md Q1): the previous kappa
    sequence shifted one step, last entry repeated.
    """
    kappa_prev = u_seq.reshape(N, 2)[:, 1]
    idx = jnp.minimum(jnp.arange(N) + 1, N - 1)
    return kappa_prev[idx]


def mpc_locate(state: CarState, path: PathData):
    """Localization + frame transform (MPC.py:172-177).  vmappable."""
    wp_id = locate_waypoint(path, state.s)
    e_y, e_psi = t2s(path, wp_id, state.x, state.y, state.psi)
    return wp_id, e_y, e_psi


def mpc_corridor(wp_id, path: PathData, grid: GridMap, cfg: MPCConfig,
                 model: ModelConfig,
                 segments: SegmentCandidates | None) -> Corridor:
    """Dynamic corridor for one lane (MPC.py:116-118).  vmappable."""
    sm = model.safety_margin
    if segments is not None:
        return corridor_from_segments(path, segments, wp_id + 1, cfg.N, sm)
    return update_path_constraints(
        grid, path, wp_id + 1, cfg.N, 2.0 * sm, sm,
        n_samples=cfg.n_scan_samples, max_segments=cfg.max_segments)


def mpc_pre_solve(state: CarState, path: PathData, grid: GridMap,
                  cfg: MPCConfig, model: ModelConfig,
                  segments: SegmentCandidates | None = None,
                  located=None, corridor: Corridor | None = None,
                  weights: WeightSet | None = None):
    """Per-lane work before the QP solve: localization, frame transform,
    corridor update, assembly (MPC.py:172-180).  vmappable.  ``located`` /
    ``corridor`` can be supplied by a batched caller (e.g. the Pallas
    corridor kernel); ``weights`` overrides the config cost diagonals."""
    N = cfg.N
    wp_id, e_y, e_psi = located if located is not None else mpc_locate(state, path)
    if corridor is None:
        corridor = mpc_corridor(wp_id, path, grid, cfg, model, segments)

    kappa_pred = kappa_predictions(state.u_seq, N)
    qp = assemble_ltv_qp(path, cfg, model, wp_id, e_y, e_psi, kappa_pred,
                         corridor, weights=weights)
    return qp, (wp_id, e_y, e_psi, corridor)


def mpc_post_solve(state: CarState, sol: LTVSolution, aux,
                   cfg: MPCConfig, model: ModelConfig) -> ControlOutput:
    """Per-lane work after the QP solve: acceptance, control extraction,
    infeasibility replay, state update (MPC.py:183-222).  vmappable."""
    N = cfg.N
    wp_id, e_y, e_psi, corridor = aux

    # Acceptance mirrors the reference (MPC.py:185-216): any finite solution
    # is used — OSQP max-iter returns are numeric and the reference takes
    # them; only infeasible/diverged solves (non-numeric x there, large
    # primal residual / non-finite here) trigger the replay fallback.
    ok = (sol.status != admm.DIVERGED) & (sol.r_prim <= cfg.feas_tol)

    # --- control extraction / infeasibility replay (MPC.py:185-220) ---
    u_seq_new = jnp.where(ok, sol.U.reshape(-1), state.u_seq)
    replay_idx = jnp.minimum(state.infeasibility_count + 1, N - 1)
    u_replay = state.u_seq.reshape(N, 2)[replay_idx]
    v = jnp.where(ok, sol.U[0, 0], u_replay[0])
    kappa = jnp.where(ok, sol.U[0, 1], u_replay[1])
    delta = jnp.arctan(kappa * model.length)  # kappa -> steering (MPC.py:188-189)

    # done lanes idle in place — their (stationary) QPs must not accumulate
    # failures; the reference's loop simply exits at end of path
    infeas = jnp.where(ok, 0, state.infeasibility_count + 1).astype(jnp.int32)
    infeas = jnp.where(state.done, state.infeasibility_count, infeas)
    failed = state.failed | ((infeas >= N - 1) & ~state.done)  # ref exit(1) (MPC.py:218-220)

    new_state = state.replace(wp_id=wp_id, e_y=e_y, e_psi=e_psi,
                              u_seq=u_seq_new, solver=sol.carry,
                              infeasibility_count=infeas, failed=failed)
    return ControlOutput(state=new_state, v=v, delta=delta, status=sol.status,
                         ok=ok, r_prim=sol.r_prim, corridor=corridor,
                         X_pred=sol.X)


def mpc_step(state: CarState, path: PathData, grid: GridMap,
             cfg: MPCConfig, model: ModelConfig,
             segments: SegmentCandidates | None = None) -> ControlOutput:
    """One full control step for one lane (vmap for a fleet).

    Follows the reference call stack (SURVEY.md §3.2): locate waypoint ->
    t2s -> corridor update -> QP assemble -> solve -> extract control or
    replay the cached sequence on failure.

    ``segments``: precomputed per-waypoint free segments
    (:func:`~..ops.constraints.extract_all_segments`).  Pass them whenever the
    grid is static — extraction is lane-independent and this removes N x K
    grid gathers per lane per step from the hot loop.  Omit for dynamic grids
    (e.g. LiDAR-in-the-loop), where extraction must see the updated map.
    """
    qp, aux = mpc_pre_solve(state, path, grid, cfg, model, segments)
    sol: LTVSolution = solve_ltv_qp(qp, cfg.solver, warm=state.solver)
    return mpc_post_solve(state, sol, aux, cfg, model)


def mpc_step_batched(state: CarState, path: PathData, grid: GridMap,
                     cfg: MPCConfig, model: ModelConfig,
                     segments: SegmentCandidates | None = None,
                     table: jnp.ndarray | None = None,
                     weights: WeightSet | None = None) -> ControlOutput:
    """Fleet control step with the solver running over the whole batch at
    once — required for the fused Pallas ADMM kernel
    (:mod:`~multi_purpose_mpc_tpu.ops.admm_pallas`), which keeps a tile of
    lanes VMEM-resident for the entire iteration loop.

    ``cfg.solver_backend`` picks "pallas" (TPU kernel) or "xla"
    (vmapped stage-scan solver).  ``table`` is the optional windowed
    horizon table (:mod:`~multi_purpose_mpc_tpu.ops.horizon_table`): one
    contiguous take replaces the per-step (B, N) row gathers that profiling
    showed dominating the step at batch 4096.

    ``weights``: per-lane :class:`WeightSet` (leading batch axis) for
    controller-tuning sweeps — heterogeneously weighted lanes in one
    program.
    """
    backend = cfg.solver_backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    located = jax.vmap(lambda s: mpc_locate(s, path))(state)
    corridor = None
    horizon = None
    if backend == "pallas" and table is not None:
        from multi_purpose_mpc_tpu.ops.horizon_table import (
            corridor_select_from_block,
            gather_horizon_block,
            solver_inputs_from_block,
        )

        blk = gather_horizon_block(table, located[0])
        corridor = corridor_select_from_block(blk, cfg, model.safety_margin,
                                              lanes=cfg.solver.kernel_lanes)
        horizon = solver_inputs_from_block(blk, cfg.max_segments)
    elif backend == "pallas" and segments is not None:
        # fused selection kernel (static-grid fast path); dynamic grids keep
        # the in-loop vmapped extraction below
        from multi_purpose_mpc_tpu.ops.corridor_pallas import corridor_select_pallas

        corridor = corridor_select_pallas(path, segments, located[0] + 1, cfg,
                                          model.safety_margin,
                                          lanes=cfg.solver.kernel_lanes)

    if corridor is None:
        corridor = jax.vmap(
            lambda w: mpc_corridor(w, path, grid, cfg, model, segments)
        )(located[0])

    return mpc_step_batched_with_corridor(state, path, cfg, model, located,
                                          corridor, backend=backend,
                                          grid=grid, segments=segments,
                                          horizon=horizon, weights=weights)


def mpc_step_batched_with_corridor(state: CarState, path: PathData,
                                   cfg: MPCConfig, model: ModelConfig,
                                   located, corridor: Corridor,
                                   backend: str | None = None,
                                   grid: GridMap = None,
                                   segments: SegmentCandidates | None = None,
                                   horizon=None,
                                   weights: WeightSet | None = None,
                                   ) -> ControlOutput:
    """Fleet control step given an already-computed corridor — the entry
    point for callers that extract corridors themselves (e.g. per-lane
    dynamic grids in the LiDAR-in-the-loop fleet, simulation.py).

    ``horizon``: optional pre-gathered ``(v_ref, kappa_ref, delta_s)``
    (each (B, N)) from the windowed horizon table, skipping the three
    (B, N) row gathers here.  ``weights``: per-lane cost diagonals (tuning
    sweep); the fused kernel bakes the config weights, so sweeps run the
    structured Pallas kernel on per-lane-assembled QPs instead — same
    solver-tier guarantees, one extra HBM round-trip for the QP arrays."""
    if backend is None:
        backend = cfg.solver_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    if backend == "pallas" and weights is not None:
        # per-lane weights: assemble per-lane QPs (XLA) and run the
        # structured VMEM kernel — solve_mpc_qp_fused's in-kernel assembly
        # reads cfg's static weights and cannot express a sweep
        from multi_purpose_mpc_tpu.ops.admm_pallas import solve_ltv_qp_pallas

        pre = jax.vmap(lambda s, loc, cor, w: mpc_pre_solve(
            s, path, grid, cfg, model, segments, located=loc, corridor=cor,
            weights=w))
        qp, aux = pre(state, located, corridor, weights)
        sol = solve_ltv_qp_pallas(qp, state.solver, cfg.solver,
                                  lanes=cfg.solver.kernel_lanes)
    elif backend == "pallas":
        # fully fused path: raw horizon gathers straight into the kernel —
        # assembly, packing, and the ADMM loop all happen in VMEM
        from multi_purpose_mpc_tpu.ops.admm_pallas import solve_mpc_qp_fused

        wp_id, e_y, e_psi = located
        if horizon is not None:
            v_ref, kappa_ref, delta_s = horizon
        else:
            offs = jnp.arange(cfg.N)
            idxs = jax.vmap(
                lambda w: gather_waypoint_index(path, w, offs))(wp_id)
            v_ref = path.v_ref[idxs]
            kappa_ref = path.kappa[idxs]
            delta_s = path.seg_dist[idxs]
        x0 = jnp.stack([e_y, e_psi, jnp.zeros_like(e_y)], axis=-1)
        kp = jax.vmap(lambda u: kappa_predictions(u, cfg.N))(state.u_seq)
        sol = solve_mpc_qp_fused(v_ref, kappa_ref, delta_s,
                                 corridor.lb, corridor.ub, x0, kp,
                                 state.solver, cfg.solver, cfg, model,
                                 lanes=cfg.solver.kernel_lanes)
        aux = (wp_id, e_y, e_psi, corridor)
    else:
        if weights is None:
            pre = jax.vmap(lambda s, loc, cor: mpc_pre_solve(
                s, path, grid, cfg, model, segments, located=loc,
                corridor=cor))
            qp, aux = pre(state, located, corridor)
        else:
            pre = jax.vmap(lambda s, loc, cor, w: mpc_pre_solve(
                s, path, grid, cfg, model, segments, located=loc,
                corridor=cor, weights=w))
            qp, aux = pre(state, located, corridor, weights)
        sol = jax.vmap(lambda q, w: solve_ltv_qp(q, cfg.solver, warm=w))(
            qp, state.solver)

    post = jax.vmap(lambda s, so, a: mpc_post_solve(s, so, a, cfg, model))
    return post(state, sol, aux)


def predict_world_positions(path: PathData, wp_id, X_pred: jnp.ndarray):
    """Map predicted spatial states to world x/y for display
    (reference: MPC.py:224-248; we keep all N+1 points, see SURVEY.md Q6)."""
    N = X_pred.shape[-2] - 1
    idx = gather_waypoint_index(path, wp_id, jnp.arange(N + 1))
    x, y, _ = s2t(path, idx, X_pred[..., 0], X_pred[..., 1])
    return x, y
