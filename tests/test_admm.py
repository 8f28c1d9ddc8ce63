"""Dense ADMM solver tests: KKT certificates, float64-oracle parity, batching."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.config import SolverConfig
from multi_purpose_mpc_tpu.ops.admm import DIVERGED, SOLVED, admm_solve, admm_solve_jit
from tests.oracle.qp import kkt_residuals, random_box_qp, solve_qp_f64

CFG = SolverConfig()
# Generous budget for unstructured random QPs (the MPC hot path uses warm
# starts + problem structure instead of brute iterations).
CFG_THOROUGH = SolverConfig(iterations=150, rho_updates=12)


def _solve_and_check(P, q, A, l, u, atol=5e-3):
    res = admm_solve_jit(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                         jnp.asarray(A, jnp.float32), jnp.asarray(l, jnp.float32),
                         jnp.asarray(u, jnp.float32), CFG_THOROUGH)
    x_ref, y_ref, _ = solve_qp_f64(P, q, A, l, u)
    stat, prim, comp = kkt_residuals(P, q, A, l, u, x_ref, y_ref)
    assert stat < 1e-6 and prim < 1e-6 and comp < 1e-6, "oracle failed KKT"
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=atol)
    assert int(res.status) != DIVERGED
    return res


def test_equality_constrained_qp_analytic():
    """min 1/2 x'Px + q'x s.t. Ax = b has closed-form KKT solution."""
    rng = np.random.default_rng(1)
    n, m = 8, 3
    F = rng.normal(size=(n, n))
    P = F @ F.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)

    KKT = np.block([[P, A.T], [A, np.zeros((m, m))]])
    sol = np.linalg.solve(KKT, np.concatenate([-q, b]))
    x_exact = sol[:n]

    res = admm_solve_jit(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                         jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
                         jnp.asarray(b, jnp.float32), CFG)
    np.testing.assert_allclose(np.asarray(res.x), x_exact, atol=2e-3)


def test_box_qp_projection():
    """min 1/2||x - c||^2 s.t. l <= x <= u  ->  clip(c, l, u)."""
    rng = np.random.default_rng(2)
    n = 16
    c = rng.normal(size=n)
    P = np.eye(n)
    q = -c
    A = np.eye(n)
    l = np.full(n, -0.5)
    u = np.full(n, 0.5)
    res = _solve_and_check(P, q, A, l, u)
    np.testing.assert_allclose(np.asarray(res.x), np.clip(c, -0.5, 0.5), atol=2e-3)


def test_random_qps_against_f64_oracle():
    rng = np.random.default_rng(3)
    for _ in range(5):
        P, q, A, l, u = random_box_qp(rng)
        _solve_and_check(P, q, A, l, u)


def test_infinite_bounds_supported():
    rng = np.random.default_rng(4)
    P, q, A, l, u = random_box_qp(rng, n=10, m=15, eq_rows=3)
    l[8:] = -np.inf
    u[12:] = np.inf
    _solve_and_check(P, q, A, l, u)


def test_vmap_batch_consistency():
    """vmapped solve must equal per-problem solves row-for-row."""
    rng = np.random.default_rng(5)
    probs = [random_box_qp(rng, n=12, m=18, eq_rows=4) for _ in range(4)]
    Ps = jnp.stack([jnp.asarray(p[0], jnp.float32) for p in probs])
    qs = jnp.stack([jnp.asarray(p[1], jnp.float32) for p in probs])
    As = jnp.stack([jnp.asarray(p[2], jnp.float32) for p in probs])
    ls = jnp.stack([jnp.asarray(p[3], jnp.float32) for p in probs])
    us = jnp.stack([jnp.asarray(p[4], jnp.float32) for p in probs])

    batched = jax.jit(jax.vmap(lambda P, q, A, l, u: admm_solve(P, q, A, l, u, CFG)))
    out = batched(Ps, qs, As, ls, us)
    # XLA may reassociate reductions differently under vmap, and tiny float32
    # differences feed the adaptive-rho branch, so require agreement to the
    # solver tolerance rather than bitwise equality.
    for i in range(4):
        single = admm_solve_jit(Ps[i], qs[i], As[i], ls[i], us[i], CFG)
        np.testing.assert_allclose(np.asarray(out.x[i]), np.asarray(single.x),
                                   atol=1e-3)
    # Same program + same batch must be bitwise deterministic.
    out2 = batched(Ps, qs, As, ls, us)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(out2.x))


def test_infeasible_problem_returns_status_not_exception():
    """x >= 1 and x <= -1 cannot hold; solver must flag, not raise
    (reference wraps OSQP failures in a bare except, MPC.py:208)."""
    P = jnp.eye(2, dtype=jnp.float32)
    q = jnp.zeros(2, jnp.float32)
    A = jnp.asarray(np.vstack([np.eye(2), np.eye(2)]), jnp.float32)
    l = jnp.asarray([1.0, 1.0, -np.inf, -np.inf], jnp.float32)
    u = jnp.asarray([np.inf, np.inf, -1.0, -1.0], jnp.float32)
    res = admm_solve_jit(P, q, A, l, u, CFG)
    assert int(res.status) != SOLVED


def test_warm_start_converges_faster():
    rng = np.random.default_rng(6)
    P, q, A, l, u = random_box_qp(rng)
    x_ref, y_ref, _ = solve_qp_f64(P, q, A, l, u)
    short = SolverConfig(iterations=15, rho_updates=1, scaling_iters=0)
    Pj, qj, Aj, lj, uj = (jnp.asarray(v, jnp.float32) for v in (P, q, A, l, u))
    cold = admm_solve_jit(Pj, qj, Aj, lj, uj, short)
    warm = admm_solve(Pj, qj, Aj, lj, uj, short,
                      x0=jnp.asarray(x_ref, jnp.float32),
                      y0=jnp.asarray(y_ref, jnp.float32))
    err_cold = np.abs(np.asarray(cold.x) - x_ref).max()
    err_warm = np.abs(np.asarray(warm.x) - x_ref).max()
    assert err_warm < err_cold
    assert err_warm < 1e-3
