"""Structured LTV-QP solver tests: factorization correctness, parity with the
dense solver and the float64 oracle on realistic MPC QP instances."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.config import MPCConfig, SolverConfig
from multi_purpose_mpc_tpu.mpc import assemble_ltv_qp, kappa_predictions
from multi_purpose_mpc_tpu.ops import admm
from multi_purpose_mpc_tpu.ops.constraints import Corridor
from multi_purpose_mpc_tpu.ops.ltv_qp import (
    LTVQP,
    _build_blocks,
    _factor,
    _solve,
    eq_apply,
    eq_applyT,
    materialize_dense,
    solve_ltv_qp,
)
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from tests.oracle.qp import optimality_gap, primal_violation, solve_qp_f64


def _random_qp(rng, N=8):
    """Random but MPC-shaped LTV QP (magnitudes like the Sim_Track problem)."""
    v_ref = rng.uniform(0.3, 1.0, N).astype(np.float32)
    kappa_ref = rng.uniform(-2.0, 2.0, N).astype(np.float32)
    ds = rng.uniform(0.03, 0.06, N).astype(np.float32)

    A = np.zeros((N, 3, 3), np.float32)
    B = np.zeros((N, 3, 2), np.float32)
    f = np.zeros((N, 3), np.float32)
    for n in range(N):
        A[n] = [[1, ds[n], 0],
                [-kappa_ref[n] ** 2 * ds[n], 1, 0],
                [-kappa_ref[n] / v_ref[n] * ds[n], 0, 1]]
        B[n] = [[0, 0], [0, ds[n]], [-ds[n] / v_ref[n] ** 2, 0]]
        f[n] = [0, 0, ds[n] / v_ref[n]]

    ur = np.stack([v_ref, kappa_ref], -1)
    uq = np.einsum("nij,nj->ni", B, ur) - f
    x0 = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.2, 0.2), 0.0],
                  np.float32)
    beq = np.concatenate([-x0[None], uq], axis=0)

    Qd = np.array([1.0, 0.0, 0.0], np.float32)
    Rd = np.array([0.5, 0.0], np.float32)
    P_x = np.concatenate([np.tile(Qd, (N, 1)), Qd[None]], axis=0)
    P_u = np.tile(Rd, (N, 1))

    lb = rng.uniform(-0.2, -0.05, N).astype(np.float32)
    ub = rng.uniform(0.05, 0.2, N).astype(np.float32)
    xr = np.zeros((N + 1, 3), np.float32)
    xr[1:, 0] = (lb + ub) / 2
    q_x = -P_x * xr
    q_u = -P_u * ur

    inf = np.inf
    lx = np.full((N + 1, 3), -inf, np.float32)
    ux = np.full((N + 1, 3), inf, np.float32)
    lx[0, 0] = x0[0]
    ux[0, 0] = x0[0]
    lx[1:, 0] = lb
    ux[1:, 0] = ub
    lu = np.tile(np.array([0.0, -6.5], np.float32), (N, 1))
    uu = np.tile(np.array([1.0, 6.5], np.float32), (N, 1))

    return LTVQP(A=jnp.asarray(A), B=jnp.asarray(B), beq=jnp.asarray(beq),
                 q_x=jnp.asarray(q_x), q_u=jnp.asarray(q_u),
                 P_x=jnp.asarray(P_x), P_u=jnp.asarray(P_u),
                 lx=jnp.asarray(lx), ux=jnp.asarray(ux),
                 lu=jnp.asarray(lu), uu=jnp.asarray(uu))


def test_eq_operators_match_dense():
    rng = np.random.default_rng(0)
    qp = _random_qp(rng)
    N = qp.N
    P, q, A_full, l, u = materialize_dense(qp)
    Aeq = A_full[:3 * (N + 1)]

    X = rng.normal(size=(N + 1, 3)).astype(np.float32)
    U = rng.normal(size=(N, 2)).astype(np.float32)
    z = np.concatenate([X.reshape(-1), U.reshape(-1)])

    r = np.asarray(eq_apply(qp, jnp.asarray(X), jnp.asarray(U))).reshape(-1)
    np.testing.assert_allclose(r, Aeq @ z, atol=1e-5)

    W = rng.normal(size=(N + 1, 3)).astype(np.float32)
    gx, gu = eq_applyT(qp, jnp.asarray(W))
    g = np.concatenate([np.asarray(gx).reshape(-1), np.asarray(gu).reshape(-1)])
    np.testing.assert_allclose(g, Aeq.T @ W.reshape(-1), atol=1e-5)


def test_block_factorization_solves_M():
    """The stage-scan factorization must solve M w = b for the dense M."""
    rng = np.random.default_rng(1)
    qp = _random_qp(rng)
    N = qp.N
    rho_eq, rho_in, sigma = 100.0, 0.1, 1e-6

    P, q, A_full, l, u = materialize_dense(qp)
    rho_vec = np.concatenate([np.full(3 * (N + 1), rho_eq),
                              np.full(3 * (N + 1) + 2 * N, rho_in)])
    M = P + sigma * np.eye(P.shape[0]) + (A_full.T * rho_vec) @ A_full

    rho_x = jnp.full((N + 1, 3), rho_in, jnp.float32)
    rho_u = jnp.full((N, 2), rho_in, jnp.float32)
    D, C = _build_blocks(qp, rho_eq, rho_x, rho_u, sigma)
    Sinv = _factor(D, C)

    b = rng.normal(size=P.shape[0]).astype(np.float32)
    X_b = b[:3 * (N + 1)].reshape(N + 1, 3)
    U_b = b[3 * (N + 1):].reshape(N, 2)
    b_stage = np.concatenate(
        [X_b, np.concatenate([U_b, np.zeros((1, 2), np.float32)])], axis=1)

    w = np.asarray(_solve(Sinv, C, jnp.asarray(b_stage)))
    w_flat = np.concatenate([w[:, :3].reshape(-1), w[:-1, 3:].reshape(-1)])

    w_dense = np.linalg.solve(M.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(w_flat, w_dense, rtol=2e-4, atol=2e-5)


def test_structured_matches_dense_and_oracle():
    rng = np.random.default_rng(2)
    for trial in range(3):
        qp = _random_qp(rng)
        P, q, A_full, l, u = materialize_dense(qp)
        x_ref, y_ref, _ = solve_qp_f64(P, q, A_full, l, u)

        cfg = SolverConfig(iterations=150, rho_updates=12)
        sol = jax.jit(solve_ltv_qp, static_argnames=("cfg",))(qp, cfg)
        z = np.concatenate([np.asarray(sol.X).reshape(-1),
                            np.asarray(sol.U).reshape(-1)])
        assert int(sol.status) == admm.SOLVED, (trial, float(sol.r_prim),
                                                float(sol.r_dual))
        # feasibility + optimality gap (the cost has flat directions in
        # kappa, so elementwise comparison is ill-posed; see SolverConfig)
        assert primal_violation(A_full, l, u, z) < 2e-3
        assert abs(optimality_gap(P, q, z, x_ref)) < 2e-3
        # the speed command (cost-determined) must be elementwise tight
        v_cols = 3 * (qp.N + 1) + 2 * np.arange(qp.N)
        np.testing.assert_allclose(z[v_cols], x_ref[v_cols], atol=2e-3)


def test_structured_vmap_batch():
    """vmapped solves match per-problem solves — in cost/feasibility terms;
    elementwise equality is ill-posed along the flat curvature direction
    (vmap changes float reduction order)."""
    rng = np.random.default_rng(3)
    qps = [_random_qp(rng) for _ in range(4)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    cfg = SolverConfig(iterations=100, rho_updates=6)
    sols = jax.jit(jax.vmap(lambda qp: solve_ltv_qp(qp, cfg)))(batched)
    for i in range(4):
        single = solve_ltv_qp(qps[i], cfg)
        P, q, A_full, l, u = materialize_dense(qps[i])
        zb = np.concatenate([np.asarray(sols.X[i]).reshape(-1),
                             np.asarray(sols.U[i]).reshape(-1)])
        zs = np.concatenate([np.asarray(single.X).reshape(-1),
                             np.asarray(single.U).reshape(-1)])
        assert primal_violation(A_full, l, u, zb) < 2e-3
        assert abs(optimality_gap(P, q, zb, zs)) < 2e-3
        # speed commands are cost-determined -> elementwise tight
        np.testing.assert_allclose(np.asarray(sols.U[i])[:, 0],
                                   np.asarray(single.U)[:, 0], atol=2e-3)


def test_warm_start_accelerates():
    rng = np.random.default_rng(4)
    qp = _random_qp(rng)
    P, q, A_full, l, u = materialize_dense(qp)
    x_ref, _, _ = solve_qp_f64(P, q, A_full, l, u)
    N = qp.N
    X_ref = x_ref[:3 * (N + 1)].reshape(N + 1, 3).astype(np.float32)
    U_ref = x_ref[3 * (N + 1):].reshape(N, 2).astype(np.float32)

    short = SolverConfig(iterations=10, rho_updates=1)
    cold = solve_ltv_qp(qp, short)
    warm = solve_ltv_qp(qp, short, X0=jnp.asarray(X_ref), U0=jnp.asarray(U_ref))
    err_c = np.abs(np.asarray(cold.U) - U_ref).max()
    err_w = np.abs(np.asarray(warm.U) - U_ref).max()
    assert err_w <= err_c


def test_assembled_sim_track_qp_solves(sim_track):
    """End-to-end assembly on the real Sim_Track path + static corridor."""
    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    cfg: MPCConfig = sim_track["mpc_cfg"]
    model = sim_track["model_cfg"]
    N = cfg.N

    wp_id = jnp.int32(10)
    idx = (10 + 1 + np.arange(N)) % path.n_wp
    corridor = Corridor(ub=path.ub[idx], lb=path.lb[idx],
                        border_ub=path.border_ub[idx],
                        border_lb=path.border_lb[idx])
    kappa_pred = kappa_predictions(jnp.zeros(N * 2), N)
    qp = assemble_ltv_qp(path, cfg, model, wp_id, jnp.float32(0.01),
                         jnp.float32(0.05), kappa_pred, corridor)

    sol = solve_ltv_qp(qp, SolverConfig(iterations=150, rho_updates=12))
    assert int(sol.status) == admm.SOLVED, (float(sol.r_prim), float(sol.r_dual))

    # against f64 oracle on the dense materialization: feasibility +
    # optimality gap + tight speed commands (see flat-direction note)
    P, q, A_full, l, u = materialize_dense(qp)
    x_ref, _, _ = solve_qp_f64(P, q, A_full, l, u)
    z = np.concatenate([np.asarray(sol.X).reshape(-1),
                        np.asarray(sol.U).reshape(-1)])
    assert primal_violation(A_full, l, u, z) < 2e-3
    assert abs(optimality_gap(P, q, z, x_ref)) < 2e-3
    v_cols = 3 * (qp.N + 1) + 2 * np.arange(qp.N)
    np.testing.assert_allclose(z[v_cols], x_ref[v_cols], atol=2e-3)

    # control sanity: v within bounds, kappa within steering limit
    U = np.asarray(sol.U)
    assert (U[:, 0] >= -1e-5).all() and (U[:, 0] <= cfg.v_max + 1e-5).all()
    assert (np.abs(U[:, 1]) <= cfg.kappa_max(model.length) + 1e-4).all()
