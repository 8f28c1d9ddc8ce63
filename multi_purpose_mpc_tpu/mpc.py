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
    floor: jnp.ndarray  # () certified violation floor (0 = QP feasible)
    corridor: Corridor  # horizon corridor (viz / logging)
    X_pred: jnp.ndarray  # (N+1, 3) predicted spatial states (viz / logging)


def assemble_ltv_qp(path: PathData, cfg: MPCConfig, model: ModelConfig,
                    wp_id, e_y, e_psi, kappa_pred, corridor: Corridor,
                    weights: WeightSet | None = None,
                    horizon=None) -> LTVQP:
    """Build the horizon QP from gathered path data + corridor bounds.

    Mirrors ``MPC._init_problem`` (MPC.py:61-155) with the SURVEY.md §3.2
    structure; all quantities are (N, ...) arrays instead of scipy.sparse.

    ``weights`` overrides the config's static Q/R/QN diagonals with runtime
    arrays (single lane here; vmap for a per-lane tuning sweep); ``None``
    leaves fall back to the config per leaf.  ``horizon``: pre-gathered
    ``(v_ref, kappa_ref, delta_s)`` (each (N,)) from the windowed horizon
    table — skips the per-lane row gathers here.
    """
    N = cfg.N
    if horizon is None:
        f, A, B, v_ref, kappa_ref, delta_s, _ = horizon_linearize(path, wp_id, N)
    else:
        from multi_purpose_mpc_tpu.models.bicycle import linearize

        v_ref, kappa_ref, delta_s = horizon
        f, A, B = linearize(v_ref, kappa_ref, delta_s)

    ur = jnp.stack([v_ref, kappa_ref], -1)  # (N, 2)
    # equality rhs: row 0 pins x0; row n+1 carries uq_n = B_n ur_n - f_n
    x0 = jnp.stack([e_y, e_psi, jnp.zeros_like(e_y)])
    uq = jnp.einsum("nij,nj->ni", B, ur) - f
    beq = jnp.concatenate([-x0[None, :], uq], axis=0)  # (N+1, 3)

    # cost: diagonal Q for stages 0..N-1, QN terminal, R on inputs
    # (per-leaf fallback: a partially-None WeightSet keeps config defaults
    # for the None leaves)
    base = weights_from_config(cfg)
    if weights is None:
        weights = base
    Qd = (base.Q if weights.Q is None else weights.Q).astype(jnp.float32)
    QNd = (base.QN if weights.QN is None else weights.QN).astype(jnp.float32)
    Rd = (base.R if weights.R is None else weights.R).astype(jnp.float32)
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


def violation_floor(e_y, e_psi, kappa_ref, delta_s, lb, ub,
                    kappa_max: float) -> jnp.ndarray:
    """Certified lower bound on the corridor violation ANY dynamics-
    consistent horizon trajectory must incur, by interval reachability.

    The QP pins x0 to the measured state (MPC.py:119-120) and e_y evolves as
    e_y(n+1) = e_y(n) + ds_n * e_psi(n) with e_psi driven by the bounded
    curvature input — so when the car sits outside the safety-margin-shrunk
    corridor (obstacle pinch-points), the QP is *structurally infeasible*:
    no control can satisfy the early e_y rows (stage 1 is fully determined
    by x0).  Propagating the unconstrained-input reachable interval of
    (e_y, e_psi) through the LTV dynamics gives a sound per-stage floor
    dist(I(n), [lb_n, ub_n]) <= violation of every feasible-dynamics
    trajectory; the max over stages lower-bounds any solution's primal
    residual.

    Diagnosed on the batch-4096 bench (round 4): ~5% of active steps
    rejected, zero collapsed corridors, residuals plateauing under a 10x
    iteration budget — i.e. genuinely infeasible QPs, not solver failures.
    OSQP hits max-iter on these and returns the least-violation iterate as
    a NUMERIC solution, which the reference then uses (MPC.py:185-216
    replays only on non-numeric x, i.e. a found infeasibility certificate);
    accepting ``r_prim <= feas_tol + floor`` reproduces that behavior while
    staying exactly as strict as before on feasible QPs (floor == 0).

    Returns the scalar floor (vmap for a fleet).
    """
    kmax = jnp.asarray(kappa_max, jnp.float32)

    def step(carry, inp):
        y_lo, y_hi, p_lo, p_hi = carry
        k_ref, ds, lb_n, ub_n = inp
        # e_y(n+1) = e_y(n) + ds * e_psi(n)
        ny_lo = y_lo + ds * p_lo
        ny_hi = y_hi + ds * p_hi
        # e_psi(n+1) = -k_ref^2 ds e_y(n) + e_psi(n) + ds (u_k - k_ref)
        c = -(k_ref * k_ref) * ds
        t_lo = jnp.minimum(c * y_lo, c * y_hi)
        t_hi = jnp.maximum(c * y_lo, c * y_hi)
        np_lo = t_lo + p_lo + ds * (-kmax - k_ref)
        np_hi = t_hi + p_hi + ds * (kmax - k_ref)
        viol = jnp.maximum(0.0, jnp.maximum(lb_n - ny_hi, ny_lo - ub_n))
        return (ny_lo, ny_hi, np_lo, np_hi), viol

    init = (e_y, e_y, e_psi, e_psi)
    # full unroll: the body is ~a dozen scalar-per-lane ops; a rolled
    # 30-iteration scan adds sequential loop overhead to EVERY step on
    # latency-bound paths (single car, small fleets) for no reuse benefit —
    # unrolled, XLA fuses the whole recurrence into the step program
    # (candidate cause of the r4 single-car regression, VERDICT r4 weak #2)
    _, viols = jax.lax.scan(step, init, (kappa_ref, delta_s, lb, ub),
                            unroll=True)
    return jnp.max(viols)


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
                  weights: WeightSet | None = None, horizon=None):
    """Per-lane work before the QP solve: localization, frame transform,
    corridor update, assembly (MPC.py:172-180).  vmappable.  ``located`` /
    ``corridor`` / ``horizon`` can be supplied by a batched caller (e.g. the
    Pallas corridor kernel / windowed horizon table); ``weights`` overrides
    the config cost diagonals."""
    N = cfg.N
    wp_id, e_y, e_psi = located if located is not None else mpc_locate(state, path)
    if corridor is None:
        corridor = mpc_corridor(wp_id, path, grid, cfg, model, segments)

    if horizon is None:
        offs = jnp.arange(N)
        idx = gather_waypoint_index(path, wp_id, offs)
        horizon = (path.v_ref[idx], path.kappa[idx], path.seg_dist[idx])
    kappa_pred = kappa_predictions(state.u_seq, N)
    qp = assemble_ltv_qp(path, cfg, model, wp_id, e_y, e_psi, kappa_pred,
                         corridor, weights=weights, horizon=horizon)
    floor = corridor_violation_floor(e_y, e_psi, horizon, corridor, cfg,
                                     model)
    return qp, (wp_id, e_y, e_psi, corridor, floor)


def corridor_violation_floor(e_y, e_psi, horizon, corridor: Corridor,
                             cfg: MPCConfig, model: ModelConfig):
    """Gated :func:`violation_floor`: the certified-violation relaxation
    applies only while the corridor has positive width everywhere — a
    COLLAPSED corridor (ub == lb == 0, the reference's blocked-path signal,
    reference_path.py:611-619) keeps the strict test so those solves replay
    exactly as the reference does.  Always computed (it also prioritizes
    the escalation pass); acceptance applies it only under
    ``cfg.least_violation_accept``."""
    _, kappa_ref, delta_s = horizon
    floor = violation_floor(e_y, e_psi, kappa_ref, delta_s,
                            corridor.lb, corridor.ub,
                            cfg.kappa_max(model.length))
    width_ok = jnp.all(corridor.ub - corridor.lb > 0.0)
    return jnp.where(width_ok, floor, 0.0)


def mpc_post_solve(state: CarState, sol: LTVSolution, aux,
                   cfg: MPCConfig, model: ModelConfig) -> ControlOutput:
    """Per-lane work after the QP solve: acceptance, control extraction,
    infeasibility replay, state update (MPC.py:183-222).  vmappable."""
    N = cfg.N
    wp_id, e_y, e_psi, corridor, floor = aux

    # Acceptance mirrors the reference (MPC.py:185-216): finite solutions
    # within the feasibility tolerance are used; infeasible solves (OSQP
    # certificate / residual above tolerance here) trigger the replay
    # fallback.  ``cfg.least_violation_accept`` optionally relaxes the test
    # by the CERTIFIED violation floor of structurally infeasible QPs (car
    # outside the margin-shrunk corridor — see the config flag's docstring);
    # on feasible QPs floor == 0 and the test is identical either way.
    floor_eff = floor if cfg.least_violation_accept else jnp.zeros_like(floor)
    ok = ((sol.status != admm.DIVERGED)
          & (sol.r_prim <= cfg.feas_tol + floor_eff))

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
                         ok=ok, r_prim=sol.r_prim, floor=floor,
                         corridor=corridor, X_pred=sol.X)


def escalate_rejects(sol: LTVSolution, floor: jnp.ndarray, feas_tol: float,
                     k: int, resolve) -> LTVSolution:
    """Second-chance solve for would-be-rejected lanes (VERDICT r3 #1).

    Gathers the ``k`` lanes with the largest acceptance margin
    ``r_prim - (feas_tol + floor)`` (``floor`` = the certified violation
    lower bound, so lanes already at their infeasible QP's least-violation
    optimum are NOT selected — escalating them cannot help), re-solves them
    via ``resolve(idx, warm) -> LTVSolution`` with an escalated budget warm-
    started from the main solve's final iterate, and merges back wherever
    the residual improved.  The whole pass rides one ``lax.cond``: steps
    with no reject anywhere skip it entirely, so the common case costs one
    comparison; at batch 4096 with k = 128 a triggered pass adds ~1/32 of a
    solve.

    Diagnosed round 4: ~23% of the headline bench's rejections were
    feasible QPs the production budget (30 x 6 + 10) left just above
    feas_tol (median residual 6.8e-3); continuing 6 more adapted-rho rounds
    from the warm iterate converges essentially all of them.

    The escalated SOLUTION is merged; the escalated warm-start CARRY is
    NOT.  Measured (round 4, real-TPU Sim_Track lap): carrying the
    near-converged escalated iterate forward upgrades the lane into a
    permanent high-accuracy regime — every later solve then converges to
    ~1e-6 instead of the production budget's ~1e-3, and on the reference's
    cost-flat weights (R_kappa = 0) fully-converged solves pick bang-bang
    members of the optimal kappa band, which collapse the
    vmax = sqrt(ay_max/|kappa_pred|) cap: mean lap speed fell 0.92 -> 0.65
    and the lap stopped completing in 250 steps.  The production iteration
    budget is the same implicit kappa regularization OSQP's eps ~1e-3
    provides the reference (see SolverConfig docstring); keeping the
    pre-escalation carry preserves that accuracy class across steps while
    still accepting the recovered control (the reference's replay fallback
    likewise executes controls the warm state never saw, MPC.py:208-216).
    """
    B = sol.r_prim.shape[0]
    k = min(k, B)
    if k <= 0:
        return sol

    margin = sol.r_prim - (feas_tol + floor)

    def run(sol):
        key = jnp.where(margin > 0, margin, -jnp.inf)
        _, idx = jax.lax.top_k(key, k)
        sel = jnp.take(margin, idx) > 0
        warm = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), sol.carry)
        sub = resolve(idx, warm)
        better = sel & (sub.r_prim < jnp.take(sol.r_prim, idx))

        def merge(a, b):
            cur = jnp.take(a, idx, axis=0)
            btk = better.reshape(better.shape + (1,) * (b.ndim - 1))
            return a.at[idx].set(jnp.where(btk, b, cur))

        return jax.tree.map(merge, sol, sub)

    return jax.lax.cond((margin > 0).any(), run, lambda s: s, sol)


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
        # corridor selection stays on the classic 128-lane tile: the packed
        # (8,128) variant is bitwise-correct but measured SLOWER end-to-end
        # (552k vs 671k headline steps/s, r5) -- this kernel is small enough
        # that the tile-stack transposes + per-tile call overhead outweigh
        # the sublane packing, unlike the ADMM solver
        corridor = corridor_select_from_block(blk, cfg, model.safety_margin,
                                              lanes=cfg.solver.kernel_lanes
                                              or 128)
        horizon = solver_inputs_from_block(blk, cfg.max_segments)
    elif backend == "pallas" and segments is not None:
        # fused selection kernel (static-grid fast path); dynamic grids keep
        # the in-loop vmapped extraction below
        from multi_purpose_mpc_tpu.ops.corridor_pallas import corridor_select_pallas

        corridor = corridor_select_pallas(path, segments, located[0] + 1, cfg,
                                          model.safety_margin,
                                          lanes=cfg.solver.kernel_lanes
                                          or 128)

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
        # reads cfg's static weights and cannot express a sweep.  The
        # pre-gathered horizon block (when available) feeds the assembly so
        # sweeps keep the horizon-table optimization.
        from multi_purpose_mpc_tpu.ops.admm_pallas import solve_ltv_qp_pallas

        if horizon is not None:
            pre = jax.vmap(lambda s, loc, cor, w, hz: mpc_pre_solve(
                s, path, grid, cfg, model, segments, located=loc,
                corridor=cor, weights=w, horizon=hz))
            qp, aux = pre(state, located, corridor, weights, horizon)
        else:
            pre = jax.vmap(lambda s, loc, cor, w: mpc_pre_solve(
                s, path, grid, cfg, model, segments, located=loc,
                corridor=cor, weights=w))
            qp, aux = pre(state, located, corridor, weights)
        sol = solve_ltv_qp_pallas(qp, state.solver, cfg.solver,
                                  lanes=cfg.solver.kernel_lanes)
        if cfg.solver.escalate_lanes > 0:
            esc = _escalated_cfg(cfg.solver)

            def resolve(idx, warm, qp=qp):
                qk = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), qp)
                return solve_ltv_qp_pallas(qk, warm, esc,
                                           lanes=cfg.solver.kernel_lanes)

            sol = escalate_rejects(sol, aux[4], cfg.feas_tol,
                                   cfg.solver.escalate_lanes, resolve)
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
        # the certified violation floor comes from the kernel itself
        # (same recurrence as corridor_violation_floor over the same
        # horizon data, computed on the VMEM-resident inputs): the external
        # vmapped recurrence measured ~1 ms/step at B=4096 — 18% of the r5
        # headline step (latency-bound (B,)-wide ops)
        sol, floor = solve_mpc_qp_fused(v_ref, kappa_ref, delta_s,
                                        corridor.lb, corridor.ub, x0, kp,
                                        state.solver, cfg.solver, cfg,
                                        model,
                                        lanes=cfg.solver.kernel_lanes,
                                        return_floor=True)
        aux = (wp_id, e_y, e_psi, corridor, floor)
        if cfg.solver.escalate_lanes > 0:
            esc = _escalated_cfg(cfg.solver)

            def resolve(idx, warm):
                g = lambda a: jnp.take(a, idx, axis=0)
                return solve_mpc_qp_fused(g(v_ref), g(kappa_ref), g(delta_s),
                                          g(corridor.lb), g(corridor.ub),
                                          g(x0), g(kp), warm, esc, cfg,
                                          model,
                                          lanes=cfg.solver.kernel_lanes)

            sol = escalate_rejects(sol, floor, cfg.feas_tol,
                                   cfg.solver.escalate_lanes, resolve)
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
        if cfg.solver.escalate_lanes > 0:
            esc = _escalated_cfg(cfg.solver)

            def resolve(idx, warm, qp=qp):
                qk = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), qp)
                return jax.vmap(lambda q, w: solve_ltv_qp(q, esc, warm=w))(
                    qk, warm)

            sol = escalate_rejects(sol, aux[4], cfg.feas_tol,
                                   cfg.solver.escalate_lanes, resolve)

    post = jax.vmap(lambda s, so, a: mpc_post_solve(s, so, a, cfg, model))
    return post(state, sol, aux)


def _escalated_cfg(solver_cfg):
    """Escalation-budget solver config: continue `escalate_rho_updates`
    more adapted-rho rounds from the main solve's warm iterate (carry_rho
    resumes the adapted step size — safe here: same step's QP).

    polish_iters is DROPPED, deliberately: the goal is to bring a
    just-above-tolerance residual (~1e-2) into the production accuracy
    class (~1e-3, what OSQP's default eps gives the reference), NOT to
    fully converge the QP.  With the 100x-rho polish the escalated solve
    lands at ~1e-6, and on the reference's cost-flat kappa weights
    (R = diag(0.5, 0)) fully-converged solves pick bound-saturating
    members of the optimal kappa band — measured on the real-TPU Sim_Track
    lap: mean speed 0.92 -> 0.65 (the |kappa_pred| term collapses the
    dynamic speed cap) and the lap stops completing.  The production
    iteration budget is the same implicit regularization OSQP's eps ~1e-3
    provides; escalation must stay inside that class."""
    import dataclasses

    return dataclasses.replace(solver_cfg,
                               rho_updates=solver_cfg.escalate_rho_updates,
                               carry_rho=True, escalate_lanes=0,
                               polish_iters=0)


def predict_world_positions(path: PathData, wp_id, X_pred: jnp.ndarray):
    """Map predicted spatial states to world x/y for display
    (reference: MPC.py:224-248; we keep all N+1 points, see SURVEY.md Q6)."""
    N = X_pred.shape[-2] - 1
    idx = gather_waypoint_index(path, wp_id, jnp.arange(N + 1))
    x, y, _ = s2t(path, idx, X_pred[..., 0], X_pred[..., 1])
    return x, y
