"""Float64 reference QP solver + KKT optimality certificates.

Ground truth for QP tests: the same operator-splitting ADMM algorithm the
framework implements, but run in float64 for many iterations with adaptive
rho, which converges to the unique KKT point of the (convex) QP.  Because no
external QP library is available in this environment, optimality is certified
directly via KKT residuals rather than by comparison to another solver.
"""

from __future__ import annotations

import numpy as np


def solve_qp_f64(P, q, A, l, u, rho=0.1, rho_eq_scale=1e3, sigma=1e-6,
                 alpha=1.6, max_iter=50000, eps=1e-10, x0=None, y0=None):
    """High-accuracy float64 ADMM solve of min 1/2 x'Px + q'x, l <= Ax <= u,
    with adaptive rho (refactorize on update) and optional warm start."""
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    A = np.asarray(A, np.float64)
    l = np.asarray(l, np.float64)
    u = np.asarray(u, np.float64)
    n = q.shape[0]
    m = l.shape[0]

    is_eq = (u - l) < 1e-9

    def factor(rho_s):
        rho_vec = np.where(is_eq, rho_s * rho_eq_scale, rho_s)
        M = P + sigma * np.eye(n) + (A.T * rho_vec) @ A
        return rho_vec, np.linalg.cholesky(M)

    rho_s = rho
    rho_vec, L = factor(rho_s)

    def kkt_solve(rhs):
        return np.linalg.solve(L.T, np.linalg.solve(L, rhs))

    x = np.zeros(n) if x0 is None else np.asarray(x0, np.float64).copy()
    z = np.clip(A @ x, l, u)
    y = np.zeros(m) if y0 is None else np.asarray(y0, np.float64).copy()
    for it in range(max_iter):
        rhs = sigma * x - q + A.T @ (rho_vec * z - y)
        x_t = kkt_solve(rhs)
        z_t = A @ x_t
        x = alpha * x_t + (1 - alpha) * x
        z_pre = alpha * z_t + (1 - alpha) * z
        z_new = np.clip(z_pre + y / rho_vec, l, u)
        y = y + rho_vec * (z_pre - z_new)
        z = z_new
        if it % 50 == 49:
            Ax = A @ x
            r_p = np.max(np.abs(Ax - z))
            r_d = np.max(np.abs(P @ x + q + A.T @ y))
            if r_p < eps and r_d < eps:
                break
            # adaptive rho (OSQP §5.2) on relative residuals
            rp_rel = r_p / max(np.max(np.abs(Ax)), np.max(np.abs(z)), 1e-10)
            qn = np.max(np.abs(q)) if len(q) else 0.0
            rd_rel = r_d / max(np.max(np.abs(P @ x)), qn,
                               np.max(np.abs(A.T @ y)), 1e-10)
            ratio = np.sqrt(rp_rel / max(rd_rel, 1e-14))
            if ratio > 5.0 or ratio < 0.2:
                rho_s = float(np.clip(rho_s * ratio, 1e-6, 1e6))
                rho_vec, L = factor(rho_s)
    return x, y, z


def kkt_residuals(P, q, A, l, u, x, y):
    """KKT residuals for the QP: returns (stationarity, primal, complementarity).

    * stationarity: ||P x + q + A' y||_inf
    * primal:       max violation of l <= A x <= u
    * complementarity: y_i > 0 requires (Ax)_i ~ u_i; y_i < 0 requires ~ l_i
    """
    Ax = A @ x
    stat = np.max(np.abs(P @ x + q + A.T @ y))
    prim = np.max(np.maximum(Ax - u, 0) + np.maximum(l - Ax, 0))
    comp_u = np.abs(np.maximum(y, 0) * (u - Ax))
    comp_l = np.abs(np.maximum(-y, 0) * (Ax - l))
    # Ignore complementarity on infinite bounds (multiplier must be ~0 there,
    # which stationarity already checks).
    comp_u = np.where(np.isfinite(u), comp_u, np.abs(np.maximum(y, 0)))
    comp_l = np.where(np.isfinite(l), comp_l, np.abs(np.maximum(-y, 0)))
    comp = float(np.max(comp_u + comp_l)) if len(y) else 0.0
    return float(stat), float(prim), comp


def optimality_gap(P, q, z, z_ref):
    """Objective gap cost(z) - cost(z_ref) — the right closeness measure for
    QPs with cost-flat directions (see SolverConfig docstring)."""
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    z = np.asarray(z, np.float64)
    z_ref = np.asarray(z_ref, np.float64)

    def cost(v):
        return 0.5 * v @ P @ v + q @ v

    return float(cost(z) - cost(z_ref))


def primal_violation(A, l, u, z):
    Az = np.asarray(A, np.float64) @ np.asarray(z, np.float64)
    return float(np.max(np.maximum(Az - u, 0) + np.maximum(l - Az, 0)))


def random_box_qp(rng, n=20, m=30, eq_rows=5):
    """Random strictly convex *feasible* QP with equality and box rows.

    Bounds are built around A @ x_feas for a sampled feasible point so the
    constraint set is guaranteed nonempty.
    """
    F = rng.normal(size=(n, n))
    P = F @ F.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n)
    center = A @ x_feas
    width = np.abs(rng.normal(size=m)) + 0.1
    l = center - width * rng.uniform(0.1, 1.0, size=m)
    u = center + width * rng.uniform(0.1, 1.0, size=m)
    l[:eq_rows] = center[:eq_rows]
    u[:eq_rows] = center[:eq_rows]
    return P, q, A, l, u


def solve_qp_ip_f64(P, q, A, l, u, max_iter=60, tol=1e-10):
    """Primal-dual interior-point solve of min 1/2 x'Px + q'x, l <= Ax <= u.

    Second, algorithmically INDEPENDENT float64 oracle (the ADMM oracle
    above is first-order and conditions badly on some strictly convex
    configs, e.g. Q2 > 0 — thousands of iterations per QP).  Rows with
    l == u are treated as hard equalities; box rows may be one-sided
    (infinite bounds dropped).  Standard path-following with Mehrotra-style
    centering and fraction-to-boundary steps; each iteration is one dense
    KKT solve — milliseconds at MPC sizes (153 vars).

    Returns (x, info) with info = {"iters", "gap", "r_prim", "r_dual"}.
    """
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    A = np.asarray(A, np.float64)
    l = np.asarray(l, np.float64)
    u = np.asarray(u, np.float64)
    n = q.shape[0]

    is_eq = (u - l) < 1e-12
    Ae = A[is_eq]
    be = u[is_eq]
    Ai = A[~is_eq]
    li = l[~is_eq]
    ui = u[~is_eq]
    has_l = np.isfinite(li)
    has_u = np.isfinite(ui)
    me = Ae.shape[0]

    # strictly feasible-ish start
    x = np.zeros(n)
    y = np.zeros(me)
    t0 = Ai @ x
    sl = np.where(has_l, np.maximum(t0 - li, 1.0), 1.0)
    su = np.where(has_u, np.maximum(ui - t0, 1.0), 1.0)
    zl = np.ones_like(sl)
    zu = np.ones_like(su)
    zl[~has_l] = 0.0
    zu[~has_u] = 0.0
    sl[~has_l] = 1.0
    su[~has_u] = 1.0

    nc = int(has_l.sum() + has_u.sum())

    def residuals(x, y, zl, zu, sl, su):
        rd = P @ x + q + Ae.T @ y - Ai.T @ (zl * has_l) + Ai.T @ (zu * has_u)
        rpe = Ae @ x - be
        t = Ai @ x
        rl = np.where(has_l, t - li - sl, 0.0)
        ru = np.where(has_u, ui - t - su, 0.0)
        return rd, rpe, rl, ru

    for it in range(max_iter):
        rd, rpe, rl, ru = residuals(x, y, zl, zu, sl, su)
        mu = ((sl * zl * has_l).sum() + (su * zu * has_u).sum()) / max(nc, 1)
        if (max(np.abs(rd).max(), np.abs(rpe).max() if me else 0.0,
                np.abs(rl).max() if rl.size else 0.0,
                np.abs(ru).max() if ru.size else 0.0) < tol and mu < tol):
            break

        sigma_c = 0.1 if mu > 1e-12 else 0.0
        mu_t = sigma_c * mu

        # eliminate (sl, zl, su, zu): diagonal row weights on Ai.
        # Newton elimination gives (P + Ai' (dl+du) Ai) dx + Ae' dy =
        #   -(Px + q + Ae'y) + Ai'(mu_t/sl - dl rl) - Ai'(mu_t/su - du ru)
        # (the -Ai'zl + Ai'zu of r_dual cancels against the dzl/dzu terms).
        dl = np.where(has_l, zl / np.maximum(sl, 1e-300), 0.0)
        du = np.where(has_u, zu / np.maximum(su, 1e-300), 0.0)
        gl = np.where(has_l, mu_t / np.maximum(sl, 1e-300) - dl * rl, 0.0)
        gu = np.where(has_u, mu_t / np.maximum(su, 1e-300) - du * ru, 0.0)

        H = P + Ai.T @ (np.diag(dl + du) @ Ai)
        rhs_x = -(P @ x + q + Ae.T @ y) + Ai.T @ (gl - gu)
        K = np.zeros((n + me, n + me))
        K[:n, :n] = H
        K[:n, n:] = Ae.T
        K[n:, :n] = Ae
        rhs = np.concatenate([rhs_x, -rpe])
        sol = np.linalg.solve(K + 1e-12 * np.eye(n + me), rhs)
        dx = sol[:n]
        dy = sol[n:]

        dAix = Ai @ dx
        dsl = np.where(has_l, rl + dAix, 0.0)
        dsu = np.where(has_u, ru - dAix, 0.0)
        dzl = np.where(has_l,
                       (mu_t - zl * dsl) / np.maximum(sl, 1e-300) - zl, 0.0)
        dzu = np.where(has_u,
                       (mu_t - zu * dsu) / np.maximum(su, 1e-300) - zu, 0.0)

        # fraction-to-boundary
        def max_step(v, dv, mask):
            neg = mask & (dv < 0)
            if not neg.any():
                return 1.0
            return min(1.0, 0.995 * np.min(-v[neg] / dv[neg]))

        ap = min(max_step(sl, dsl, has_l), max_step(su, dsu, has_u))
        ad = min(max_step(zl, dzl, has_l), max_step(zu, dzu, has_u))
        a = min(ap, ad)

        x += a * dx
        y += a * dy
        sl = np.where(has_l, sl + a * dsl, sl)
        su = np.where(has_u, su + a * dsu, su)
        zl = np.where(has_l, zl + a * dzl, zl)
        zu = np.where(has_u, zu + a * dzu, zu)

    rd, rpe, rl, ru = residuals(x, y, zl, zu, sl, su)
    mu = ((sl * zl * has_l).sum() + (su * zu * has_u).sum()) / max(nc, 1)
    return x, {"iters": it + 1, "gap": float(mu),
               "r_dual": float(np.abs(rd).max()),
               "r_prim": float(max(np.abs(rpe).max() if me else 0.0,
                                   np.abs(np.minimum(rl, 0)).max() if rl.size else 0.0,
                                   np.abs(np.minimum(ru, 0)).max() if ru.size else 0.0))}
