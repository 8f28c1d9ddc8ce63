"""QP acceptance semantics: certified infeasibility, escalation, and the
least-violation option (VERDICT r3 #1 diagnosis).

Round-4 finding: the headline bench's ~5% rejected solves were dominated by
STRUCTURALLY INFEASIBLE QPs — the measured state outside the safety-margin-
shrunk corridor at obstacle pinch-points makes the pinned-x0 QP unsatisfiable
(stage-1 e_y = e_y0 + ds*e_psi0 is control-independent).  The f64 oracle
rejects ~2.3% of a clean lap the same way (tests/oracle/sim.py:168-171), so
replaying there IS reference parity (OSQP returns an infeasibility
certificate; MPC.py:185-216).  These tests pin the three mechanisms built on
that diagnosis:

* ``mpc.violation_floor`` — the certified lower bound itself;
* ``mpc.escalate_rejects`` — second-chance solve of feasible-but-unconverged
  lanes, so "reject" comes to mean exactly "infeasible QP";
* ``MPCConfig.least_violation_accept`` — opt-in acceptance of the solver's
  least-violation solution on certified-infeasible QPs.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_purpose_mpc_tpu.config import SimConfig
from multi_purpose_mpc_tpu.mpc import violation_floor
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.simulation import init_fleet, simulate_fleet


@pytest.fixture(scope="module")
def scenario(sim_track):
    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    return dict(sim_track, path=path)


def test_violation_floor_zero_inside_corridor():
    """A state inside a wide corridor is reachable-feasible: floor == 0."""
    N = 10
    f = violation_floor(jnp.float32(0.01), jnp.float32(0.0),
                        jnp.zeros(N), jnp.full(N, 0.05),
                        jnp.full(N, -0.2), jnp.full(N, 0.2), 6.5)
    assert float(f) == 0.0


def test_violation_floor_stage1_exact():
    """Stage-1 e_y is fully determined by x0 (row 0 of B is zero): a car at
    e_y0 with e_psi0 = 0 outside the corridor must violate stage 1 by
    exactly dist(e_y0, [lb, ub]) — the floor is tight there."""
    N = 5
    e_y0, ub = 0.10, 0.05
    f = violation_floor(jnp.float32(e_y0), jnp.float32(0.0),
                        jnp.zeros(N), jnp.full(N, 0.05),
                        jnp.full(N, -0.2), jnp.full(N, ub), 6.5)
    # stage 1: e_y(1) = e_y0 -> violation e_y0 - ub; later stages can
    # recover (floor is the max over stages, stage 1 dominates here)
    assert abs(float(f) - (e_y0 - ub)) < 1e-6


def test_violation_floor_soundness_against_oracle(scenario):
    """Soundness on real scenario QPs: whenever floor > 0, the f64
    interior-point/ADMM oracle also cannot find a feasible point — its
    optimal residual is >= the floor (within f32/f64 slack)."""
    from multi_purpose_mpc_tpu.mpc import mpc_pre_solve
    from multi_purpose_mpc_tpu.models.bicycle import init_car_state
    from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments
    from multi_purpose_mpc_tpu.ops.ltv_qp import materialize_dense
    from tests.oracle.qp import solve_qp_f64

    grid, path = scenario["grid"], scenario["path"]
    cfg, model = scenario["mpc_cfg"], scenario["model_cfg"]
    segs = extract_all_segments(grid, path, 2.0 * model.safety_margin,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)
    # states pushed off-corridor at a spread of waypoints
    rng = np.random.default_rng(5)
    checked = 0
    for wp in rng.integers(0, path.n_wp, 12):
        st = init_car_state(path, cfg.N, e_y=float(rng.uniform(-0.12, 0.12)),
                            wp_id=int(wp))
        qp, aux = jax.jit(lambda s: mpc_pre_solve(s, path, grid, cfg, model,
                                                  segs))(st)
        floor = float(aux[4])
        if floor <= 1e-4:
            continue
        checked += 1
        P, q, A_full, l, u = materialize_dense(qp)
        # infeasible QPs never meet eps, so max_iter IS the cost: the
        # least-violation residual plateaus within hundreds of iterations
        # (measured), and an under-converged oracle only RAISES r — the
        # soundness inequality below stays conservative.  8000 (vs 40000)
        # cuts ~2 min of suite time (r5, VERDICT #8).
        xs, _, _ = solve_qp_f64(P, q, A_full, l, u, eps=1e-9, max_iter=8000)
        r = np.max(np.maximum(A_full @ xs - u, 0)
                   + np.maximum(l - A_full @ xs, 0))
        assert r >= floor - 5e-4, \
            f"wp {wp}: oracle residual {r:.4e} below certified floor {floor:.4e}"
    assert checked >= 2, "no certified-infeasible states sampled"


def test_every_reject_is_certified_infeasible(scenario):
    """The escalation mechanism's end-to-end guarantee: with the pass
    enabled, a rejected step means an infeasible QP (floor > 0), never an
    unconverged feasible one — on a Monte-Carlo fleet across the whole
    obstructed track.  (Escalation is opt-in, not the default: on the
    reference's cost-flat kappa weights converged solves drive measurably
    worse — see SolverConfig.escalate_lanes; this test asserts the
    mechanism, not the default.)"""
    from multi_purpose_mpc_tpu.simulation import feasible_starts

    B, T = 24, 30
    cfg = scenario["mpc_cfg"]
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, escalate_lanes=8))
    rng = np.random.default_rng(11)
    wp0, e_y0 = feasible_starts(scenario["grid"], scenario["path"], cfg,
                                scenario["model_cfg"], B, rng,
                                e_y_scale=0.02)
    fleet0 = init_fleet(scenario["path"], cfg.N, B, e_y0=e_y0, wp_id0=wp0)
    res = simulate_fleet(scenario["grid"], scenario["path"], cfg,
                         scenario["model_cfg"], SimConfig(max_steps=T),
                         fleet0)
    ok = np.asarray(res.log.ok)
    act = np.asarray(res.log.active)
    fl = np.asarray(res.log.floor)
    rej = (~ok) & act
    n_fail = int((rej & (fl <= 0)).sum())
    assert n_fail == 0, \
        f"{n_fail} rejected steps had FEASIBLE QPs (solver failures)"
    assert not np.asarray(res.final_state.failed).any()
    assert np.abs(np.asarray(res.log.e_y)[act]).max() < 0.3


def test_escalation_improves_accept_rate(scenario):
    """escalate_rejects recovers feasible-but-unconverged solves: accept
    rate with the pass >= without, and it never flips an accepted lane."""
    B, T = 16, 10
    cfg_off = scenario["mpc_cfg"]
    cfg_on = dataclasses.replace(
        cfg_off, solver=dataclasses.replace(cfg_off.solver, escalate_lanes=8))
    rng = np.random.default_rng(3)
    fleet0 = init_fleet(
        scenario["path"], cfg_on.N, B,
        e_y0=jnp.asarray(rng.uniform(-0.05, 0.05, B), jnp.float32),
        wp_id0=jnp.asarray(rng.integers(0, scenario["path"].n_wp, B),
                           jnp.int32))
    sim = SimConfig(max_steps=T)
    on = simulate_fleet(scenario["grid"], scenario["path"], cfg_on,
                        scenario["model_cfg"], sim, fleet0)
    off = simulate_fleet(scenario["grid"], scenario["path"], cfg_off,
                         scenario["model_cfg"], sim, fleet0)
    ok_on = np.asarray(on.log.ok)
    ok_off = np.asarray(off.log.ok)
    act = np.asarray(on.log.active)
    assert ok_on[act].mean() >= ok_off[np.asarray(off.log.active)].mean()
    # first step sees identical states: escalation only ever adds accepts
    assert (ok_on[0] | ~ok_off[0]).all()


def test_least_violation_accept_drives_back(scenario):
    """Opt-in least-violation acceptance: certified-infeasible solves are
    accepted (their residual sits at the floor) and the lane is actively
    steered back toward the corridor instead of replaying stale controls."""
    cfg = scenario["mpc_cfg"]
    cfg_lv = dataclasses.replace(cfg, least_violation_accept=True)
    B, T = 12, 12
    rng = np.random.default_rng(9)
    fleet0 = init_fleet(
        scenario["path"], cfg.N, B,
        e_y0=jnp.asarray(rng.uniform(-0.10, 0.10, B), jnp.float32),
        wp_id0=jnp.asarray(rng.integers(0, scenario["path"].n_wp, B),
                           jnp.int32))
    sim = SimConfig(max_steps=T)
    strict = simulate_fleet(scenario["grid"], scenario["path"], cfg,
                            scenario["model_cfg"], sim, fleet0)
    lv = simulate_fleet(scenario["grid"], scenario["path"], cfg_lv,
                        scenario["model_cfg"], sim, fleet0)
    ok_s = np.asarray(strict.log.ok)[np.asarray(strict.log.active)]
    ok_l = np.asarray(lv.log.ok)[np.asarray(lv.log.active)]
    assert ok_l.mean() >= ok_s.mean()
    # the relaxation is exactly the certified floor: rejects under the
    # least-violation flag are solves that missed even that target
    fl = np.asarray(lv.log.floor)
    rp = np.asarray(lv.log.r_prim)
    rej = (~np.asarray(lv.log.ok)) & np.asarray(lv.log.active)
    assert (rp[rej] > cfg.feas_tol + fl[rej]).all()
