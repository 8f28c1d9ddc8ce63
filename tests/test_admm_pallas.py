"""Pallas fused ADMM kernel vs the XLA stage-scan solver (interpret mode on
CPU; the compiled kernel is exercised on real TPU by bench.py / examples)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# interpret-mode Mosaic kernel parity: heavy on CPU (minutes); the
# compiled kernels are gated on the real TPU by `bench.py --check`
# every round, so fast iteration excludes these via -m "not slow"
# (run explicitly with -m kernel)
pytestmark = [pytest.mark.slow, pytest.mark.kernel]

from multi_purpose_mpc_tpu.config import SolverConfig
from multi_purpose_mpc_tpu.ops import admm
from multi_purpose_mpc_tpu.ops.admm_pallas import solve_ltv_qp_pallas
from multi_purpose_mpc_tpu.ops.ltv_qp import (
    init_solver_carry,
    materialize_dense,
    solve_ltv_qp,
)
from tests.oracle.qp import optimality_gap, primal_violation, solve_qp_f64
from tests.test_ltv_qp import _random_qp

CFG = SolverConfig(iterations=30, rho_updates=3)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(11)
    B = 4
    qps = [_random_qp(rng) for _ in range(B)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    warm = jax.vmap(lambda _: init_solver_carry(8))(jnp.arange(B))
    return qps, batched, warm


def test_kernel_matches_xla_solver(batch):
    """Same algorithm, same rho trajectory, same residual quality."""
    qps, batched, warm = batch
    ref = jax.vmap(lambda qp, w: solve_ltv_qp(qp, CFG, warm=w))(batched, warm)
    out = solve_ltv_qp_pallas(batched, warm, CFG, lanes=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    # identical algorithm, different op/loop structure: float noise through
    # 3 rho rounds shifts near-converged residuals by a few e-4 (far below
    # the 5e-3 acceptance tolerance both sides share)
    np.testing.assert_allclose(np.asarray(out.r_prim), np.asarray(ref.r_prim),
                               atol=1e-3)
    # rho adaptation feeds tiny float diffs through sqrt-ratios of
    # near-converged (~1e-4) residuals over several rounds, so only the
    # rough order of magnitude is stable (measured drift up to ~10x on
    # lanes whose residuals sit at float noise)
    ratio = np.asarray(out.carry.rho) / np.asarray(ref.carry.rho)
    assert (ratio > 0.03).all() and (ratio < 30.0).all(), ratio
    # solutions agree up to the flat-direction tolerance; speed commands tight
    np.testing.assert_allclose(np.asarray(out.U[..., 0]),
                               np.asarray(ref.U[..., 0]), atol=2e-3)


def test_kernel_against_f64_oracle(batch):
    """Feasibility + optimality gap vs the float64 oracle per lane."""
    qps, batched, warm = batch
    out = solve_ltv_qp_pallas(batched, warm,
                              SolverConfig(iterations=100, rho_updates=8),
                              lanes=8, interpret=True)
    for i, qp in enumerate(qps):
        P, q, A, l, u = materialize_dense(qp)
        x_ref, _, _ = solve_qp_f64(P, q, A, l, u)
        z = np.concatenate([np.asarray(out.X[i]).reshape(-1),
                            np.asarray(out.U[i]).reshape(-1)])
        assert primal_violation(A, l, u, z) < 2e-3, i
        assert abs(optimality_gap(P, q, z, x_ref)) < 2e-3, i
        assert int(out.status[i]) != admm.DIVERGED


def test_kernel_batch_padding(batch):
    """Batch not divisible by the lane tile gets padded transparently."""
    qps, batched, warm = batch
    b3 = jax.tree.map(lambda a: a[:3], batched)
    w3 = jax.tree.map(lambda a: a[:3], warm)
    out = solve_ltv_qp_pallas(b3, w3, CFG, lanes=8, interpret=True)
    assert out.X.shape[0] == 3
    full = solve_ltv_qp_pallas(batched, warm, CFG, lanes=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out.U[..., 0]),
                               np.asarray(full.U[:3, ..., 0]), atol=1e-4)


def test_kernel_nan_input_flags_diverged(batch):
    qps, batched, warm = batch
    bad = batched.replace(q_x=batched.q_x.at[0, 0, 0].set(jnp.nan))
    out = solve_ltv_qp_pallas(bad, warm, CFG, lanes=8, interpret=True)
    assert int(out.status[0]) == admm.DIVERGED
    # lanes are isolated: the NaN lane must not leak into others
    assert (np.asarray(out.status[1:]) != admm.DIVERGED).all()
    # and its carry is reset so the next solve starts clean
    assert np.isfinite(np.asarray(out.carry.X[0])).all()


def test_fused_assembly_matches_xla_pipeline(sim_track):
    """The fully fused kernel (in-kernel assembly + ADMM) must match the
    XLA assemble + solve pipeline on real scenario states."""
    import jax.numpy as jnp

    from multi_purpose_mpc_tpu.mpc import (
        kappa_predictions,
        mpc_corridor,
        mpc_locate,
        mpc_pre_solve,
    )
    from multi_purpose_mpc_tpu.models.bicycle import init_car_state
    from multi_purpose_mpc_tpu.ops.admm_pallas import solve_mpc_qp_fused
    from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments
    from multi_purpose_mpc_tpu.ops.path import gather_waypoint_index
    from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile

    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    grid = sim_track["grid"]
    cfg = sim_track["mpc_cfg"]
    model = sim_track["model_cfg"]
    sm = model.safety_margin
    segs = extract_all_segments(grid, path, 2 * sm,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)

    B = 8
    states = jax.vmap(
        lambda i: init_car_state(path, cfg.N, e_y=0.005 * i, wp_id=13 * i)
    )(jnp.arange(B))
    located = jax.vmap(lambda s: mpc_locate(s, path))(states)
    corridor = jax.vmap(
        lambda w: mpc_corridor(w, path, grid, cfg, model, segs))(located[0])

    qp, _ = jax.vmap(lambda s, loc, cor: mpc_pre_solve(
        s, path, grid, cfg, model, segs, located=loc, corridor=cor))(
        states, located, corridor)
    ref = jax.vmap(lambda q, w: solve_ltv_qp(q, cfg.solver, warm=w))(
        qp, states.solver)

    wp_id, e_y, e_psi = located
    idxs = jax.vmap(lambda w: gather_waypoint_index(path, w, jnp.arange(cfg.N))
                    )(wp_id)
    x0 = jnp.stack([e_y, e_psi, jnp.zeros_like(e_y)], -1)
    kp = jax.vmap(lambda u: kappa_predictions(u, cfg.N))(states.u_seq)
    out = solve_mpc_qp_fused(path.v_ref[idxs], path.kappa[idxs],
                             path.seg_dist[idxs], corridor.lb, corridor.ub,
                             x0, kp, states.solver, cfg.solver, cfg, model,
                             lanes=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.r_prim),
                               np.asarray(ref.r_prim), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.U[:, 0, 0]),
                               np.asarray(ref.U[:, 0, 0]), atol=3e-3)


def test_fused_kernel_floor_matches_external(sim_track):
    """r5: the certified violation floor computed IN-KERNEL (from the
    VMEM-resident horizon data, solve_mpc_qp_fused(return_floor=True))
    matches mpc.corridor_violation_floor elementwise — including lanes
    pushed OFF-corridor where the floor is strictly positive."""
    import jax.numpy as jnp

    from multi_purpose_mpc_tpu.mpc import (
        corridor_violation_floor,
        kappa_predictions,
        mpc_corridor,
        mpc_locate,
    )
    from multi_purpose_mpc_tpu.models.bicycle import init_car_state
    from multi_purpose_mpc_tpu.ops.admm_pallas import solve_mpc_qp_fused
    from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments
    from multi_purpose_mpc_tpu.ops.path import gather_waypoint_index
    from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile

    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    grid = sim_track["grid"]
    cfg = sim_track["mpc_cfg"]
    model = sim_track["model_cfg"]
    segs = extract_all_segments(grid, path, 2 * model.safety_margin,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)

    B = 8
    # large |e_y| spread pushes some lanes outside the margin-shrunk
    # corridor -> positive floors
    states = jax.vmap(
        lambda i: init_car_state(path, cfg.N, e_y=0.04 * (i - 4),
                                 wp_id=23 * i)
    )(jnp.arange(B))
    located = jax.vmap(lambda s: mpc_locate(s, path))(states)
    corridor = jax.vmap(
        lambda w: mpc_corridor(w, path, grid, cfg, model, segs))(located[0])
    wp_id, e_y, e_psi = located
    idxs = jax.vmap(lambda w: gather_waypoint_index(path, w, jnp.arange(cfg.N))
                    )(wp_id)
    x0 = jnp.stack([e_y, e_psi, jnp.zeros_like(e_y)], -1)
    kp = jax.vmap(lambda u: kappa_predictions(u, cfg.N))(states.u_seq)

    _, floor_k = solve_mpc_qp_fused(
        path.v_ref[idxs], path.kappa[idxs], path.seg_dist[idxs],
        corridor.lb, corridor.ub, x0, kp, states.solver, cfg.solver, cfg,
        model, lanes=8, interpret=True, return_floor=True)
    floor_x = jax.vmap(lambda ey, ep, kr, ds, cor: corridor_violation_floor(
        ey, ep, (None, kr, ds), cor, cfg, model))(
        e_y, e_psi, path.kappa[idxs], path.seg_dist[idxs], corridor)
    np.testing.assert_allclose(np.asarray(floor_k), np.asarray(floor_x),
                               atol=1e-6)
    assert (np.asarray(floor_x) > 0).any(), "no off-corridor lane sampled"


# ---------------------------------------------------------------------------
# Cyclic-reduction stage solver (round 3): same SPD stage system as the
# Schur recursion, stage-batched planes + O(log N) levels.
# ---------------------------------------------------------------------------

CFG_CR = SolverConfig(iterations=30, rho_updates=3, stage_solver="cr")


def test_cr_matches_schur_stage_solver(batch):
    """CR vs Schur inside the same kernel: identical algorithm, different
    (exact) linear-system solver — statuses and accepted controls agree at
    the acceptance scale.  N=8 here means 9 stages padded to 15 = 2^4-1,
    covering the non-power-of-two padding path."""
    qps, batched, warm = batch
    ref = solve_ltv_qp_pallas(batched, warm, CFG, lanes=8, interpret=True)
    out = solve_ltv_qp_pallas(batched, warm, CFG_CR, lanes=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.r_prim), np.asarray(ref.r_prim),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.U[..., 0]),
                               np.asarray(ref.U[..., 0]), atol=2e-3)


def test_cr_against_f64_oracle(batch):
    """CR solution quality vs the float64 oracle (feasibility + gap)."""
    qps, batched, warm = batch
    out = solve_ltv_qp_pallas(
        batched, warm,
        SolverConfig(iterations=100, rho_updates=8, stage_solver="cr"),
        lanes=8, interpret=True)
    for i, qp in enumerate(qps):
        P, q, A, l, u = materialize_dense(qp)
        x_ref, _, _ = solve_qp_f64(P, q, A, l, u)
        z = np.concatenate([np.asarray(out.X[i]).reshape(-1),
                            np.asarray(out.U[i]).reshape(-1)])
        assert primal_violation(A, l, u, z) < 2e-3, i
        assert abs(optimality_gap(P, q, z, x_ref)) < 2e-3, i
        assert int(out.status[i]) != admm.DIVERGED


def test_cr_fused_assembly_scenario(sim_track):
    """Fused-assembly kernel with the CR stage solver on real scenario QPs
    (N=30 -> 31 = 2^5-1 stages, the exact-fit path) vs the Schur variant."""
    import dataclasses

    import jax.numpy as jnp

    from multi_purpose_mpc_tpu.mpc import (
        kappa_predictions,
        mpc_corridor,
        mpc_locate,
    )
    from multi_purpose_mpc_tpu.models.bicycle import init_car_state
    from multi_purpose_mpc_tpu.ops.admm_pallas import solve_mpc_qp_fused
    from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments
    from multi_purpose_mpc_tpu.ops.path import gather_waypoint_index
    from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile

    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    grid = sim_track["grid"]
    cfg = sim_track["mpc_cfg"]
    model = sim_track["model_cfg"]
    segs = extract_all_segments(grid, path, 2 * model.safety_margin,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)

    B = 8
    states = jax.vmap(
        lambda i: init_car_state(path, cfg.N, e_y=0.005 * i, wp_id=13 * i)
    )(jnp.arange(B))
    located = jax.vmap(lambda s: mpc_locate(s, path))(states)
    corridor = jax.vmap(
        lambda w: mpc_corridor(w, path, grid, cfg, model, segs))(located[0])
    wp_id, e_y, e_psi = located
    idxs = jax.vmap(lambda w: gather_waypoint_index(path, w, jnp.arange(cfg.N))
                    )(wp_id)
    x0 = jnp.stack([e_y, e_psi, jnp.zeros_like(e_y)], -1)
    kp = jax.vmap(lambda u: kappa_predictions(u, cfg.N))(states.u_seq)
    args = (path.v_ref[idxs], path.kappa[idxs], path.seg_dist[idxs],
            corridor.lb, corridor.ub, x0, kp, states.solver)

    ref = solve_mpc_qp_fused(*args, cfg.solver, cfg, model,
                             lanes=8, interpret=True)
    cr_cfg = dataclasses.replace(cfg.solver, stage_solver="cr")
    out = solve_mpc_qp_fused(*args, cr_cfg, cfg, model,
                             lanes=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.r_prim),
                               np.asarray(ref.r_prim), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.U[:, 0, 0]),
                               np.asarray(ref.U[:, 0, 0]), atol=3e-3)


def test_packed_lane_layout(batch):
    """2-D sublane-packed lane tiles (lanes=1024 -> (8, 128) trailing block):
    same kernel math as the 1-D layout, different vreg packing.  Dispatched
    as a lax.map of single-tile pallas_calls (multi-tile grids of this
    kernel blow up the Mosaic backend's compile, ops/admm_pallas._lane_shape
    / _dispatch_tiles); interpret mode pins the layout plumbing —
    pad-to-1024, tile-stacking, block specs, unpacking — while
    ``bench.py --check`` covers the compiled kernel on the real TPU."""
    qps, batched, warm = batch
    ref = solve_ltv_qp_pallas(batched, warm, CFG, lanes=8, interpret=True)
    out = solve_ltv_qp_pallas(batched, warm, CFG, lanes=1024, interpret=True)

    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.r_prim), np.asarray(ref.r_prim),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.U[..., 0]),
                               np.asarray(ref.U[..., 0]), atol=2e-3)
