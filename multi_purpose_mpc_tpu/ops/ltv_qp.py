"""Structured ADMM solver for the horizon-N LTV-MPC QP (the hot path).

The reference assembles a scipy.sparse QP and hands it to OSQP every control
step (reference: MPC.py:128-159).  The QP's structure is *fixed* — only the
values of the stage matrices and bounds change (SURVEY.md §3.2):

    variables  z = [x_0..x_N | u_0..u_{N-1}],  nx = 3, nu = 2
    equality   -x_0 = -x0_meas;  A_n x_n + B_n u_n - x_{n+1} = uq_n
    inequality identity bounds on every variable (e_y corridor + input boxes)
    cost       P = blockdiag(Q x N, QN, R x N) (diagonal), q from corridor
               center-line and (v_ref, kappa_ref)

This module never materializes the 153x153 matrices.  Variables are grouped
per stage w_n = (x_n, u_n) in R^5 (x_N padded to 5), which makes the ADMM
reduced KKT matrix

    M = P + sigma I + rho_eq Aeq' Aeq + rho_in I

**block tridiagonal** with 5x5 blocks.  M is factorized by a block LU
(Schur-complement recursion) in one ``lax.scan`` over the N+1 stages, and
each ADMM iteration applies two stage scans (forward/backward substitution)
plus elementwise work — everything batches cleanly over a fleet axis under
``vmap`` (4096 lanes = batched (B, 5, 5) ops on the VPU/MXU).

Complexity per solve: O(N) 5x5 factorizations + iters * O(N) 5x5 matvecs —
versus O((N nx)^3) for a dense factor.  This is the TPU-native equivalent of
exploiting OSQP's sparse KKT factorization (SURVEY.md §7 shift #2).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from multi_purpose_mpc_tpu.config import SolverConfig
from multi_purpose_mpc_tpu.ops import admm as admm_mod
from multi_purpose_mpc_tpu.ops.linalg import HIGHEST, mv

NX = 3
NU = 2
NW = NX + NU  # stage width


@struct.dataclass
class LTVQP:
    """One LTV-MPC QP instance (leading fleet axes allowed on every field).

    Mirrors the data the reference pours into scipy.sparse each step
    (MPC.py:61-155): stage dynamics, equality offsets, diagonal costs,
    linear cost from references, and per-variable bounds.
    """

    A: jnp.ndarray  # (N, 3, 3) stage transition
    B: jnp.ndarray  # (N, 3, 2) stage input
    beq: jnp.ndarray  # (N+1, 3) equality rhs: [-x0_meas, uq_0..uq_{N-1}]
    q_x: jnp.ndarray  # (N+1, 3) linear cost on states
    q_u: jnp.ndarray  # (N, 2) linear cost on inputs
    P_x: jnp.ndarray  # (N+1, 3) diagonal quadratic cost on states (Q, QN)
    P_u: jnp.ndarray  # (N, 2) diagonal quadratic cost on inputs (R)
    lx: jnp.ndarray  # (N+1, 3) state lower bounds
    ux: jnp.ndarray  # (N+1, 3) state upper bounds
    lu: jnp.ndarray  # (N, 2) input lower bounds
    uu: jnp.ndarray  # (N, 2) input upper bounds

    @property
    def N(self) -> int:
        return self.B.shape[-3]


class LTVSolution(NamedTuple):
    X: jnp.ndarray  # (N+1, 3) primal states
    U: jnp.ndarray  # (N, 2) primal inputs
    status: jnp.ndarray  # () int32 — admm.SOLVED / MAX_ITER / DIVERGED
    r_prim: jnp.ndarray  # () inf-norm primal residual
    r_dual: jnp.ndarray  # () inf-norm dual residual


# ---------------------------------------------------------------------------
# Constraint operators (never materialize Aeq)
# ---------------------------------------------------------------------------

def eq_apply(qp: LTVQP, X, U):
    """r = Aeq z: r_0 = -x_0, r_{n+1} = A_n x_n + B_n u_n - x_{n+1}."""
    r0 = -X[..., 0:1, :]
    rn = (mv(qp.A, X[..., :-1, :]) + mv(qp.B, U) - X[..., 1:, :])
    return jnp.concatenate([r0, rn], axis=-2)


def eq_applyT(qp: LTVQP, W):
    """(gx, gu) = Aeq' w for w in equality-row space (N+1, 3)."""
    w_next = W[..., 1:, :]  # rows 1..N pair with stages 0..N-1
    gx_head = -W[..., :-1, :] + jnp.einsum("...nij,...ni->...nj", qp.A, w_next,
                                           precision=HIGHEST)
    gx_tail = -W[..., -1:, :]
    gx = jnp.concatenate([gx_head, gx_tail], axis=-2)
    gu = jnp.einsum("...nij,...ni->...nj", qp.B, w_next, precision=HIGHEST)
    return gx, gu


# ---------------------------------------------------------------------------
# Block-tridiagonal factorization of the reduced KKT matrix
# ---------------------------------------------------------------------------

def _build_blocks(qp: LTVQP, rho_eq, rho_in, sigma):
    """Diagonal blocks D_n and sub-diagonal blocks C_n of M in stage space.

    D_n (n < N) = [[Qd + s + ri + re (I + A_n'A_n),  re A_n'B_n],
                   [re B_n'A_n,  Rd + s + ri + re B_n'B_n]]
    D_N = diag(QNd + s + ri + re) padded to 5x5 with identity
    C_n = rows(stage n+1) x cols(stage n): [[-re A_n, -re B_n], [0, 0]]
    """
    N = qp.N
    dtype = qp.A.dtype
    AtA = jnp.einsum("...nki,...nkj->...nij", qp.A, qp.A, precision=HIGHEST)
    AtB = jnp.einsum("...nki,...nkj->...nij", qp.A, qp.B, precision=HIGHEST)
    BtB = jnp.einsum("...nki,...nkj->...nij", qp.B, qp.B, precision=HIGHEST)

    batch = qp.A.shape[:-3]
    D = jnp.zeros(batch + (N + 1, NW, NW), dtype)
    eye3 = jnp.eye(NX, dtype=dtype)

    # stages 0..N-1
    xx = (rho_eq * (eye3 + AtA)
          + jnp.eye(NX, dtype=dtype) * (sigma + rho_in)
          + jnp.einsum("...ni,ij->...nij", qp.P_x[..., :-1, :], eye3))
    uu = (rho_eq * BtB
          + jnp.eye(NU, dtype=dtype) * (sigma + rho_in)
          + jnp.einsum("...ni,ij->...nij", qp.P_u, jnp.eye(NU, dtype=dtype)))
    xu = rho_eq * AtB
    D = D.at[..., :-1, :NX, :NX].set(xx)
    D = D.at[..., :-1, :NX, NX:].set(xu)
    D = D.at[..., :-1, NX:, :NX].set(jnp.swapaxes(xu, -1, -2))
    D = D.at[..., :-1, NX:, NX:].set(uu)

    # terminal stage (x_N only; pad with identity so the 5x5 solve is benign)
    xxN = (jnp.eye(NX, dtype=dtype) * (sigma + rho_in + rho_eq)
           + jnp.einsum("...i,ij->...ij", qp.P_x[..., -1, :], eye3))
    D = D.at[..., -1, :NX, :NX].set(xxN)
    D = D.at[..., -1, NX:, NX:].set(jnp.eye(NU, dtype=dtype))

    C = jnp.zeros(batch + (N, NW, NW), dtype)
    C = C.at[..., :, :NX, :NX].set(-rho_eq * qp.A)
    C = C.at[..., :, :NX, NX:].set(-rho_eq * qp.B)
    return D, C


def _factor(D, C):
    """Schur recursion S_0 = D_0, S_n = D_n - C_{n-1} S_{n-1}^-1 C_{n-1}'.

    Returns per-stage inverses Sinv (the factor used by the substitutions).
    Runs as a scan over stages; under vmap this becomes batched 5x5 ops.
    """

    def step(S_prev_inv, DC):
        Dn, Cn = DC
        G = jnp.matmul(Cn, S_prev_inv, precision=HIGHEST)
        S = Dn - jnp.matmul(G, jnp.swapaxes(Cn, -1, -2), precision=HIGHEST)
        Sinv = jnp.linalg.inv(S)
        return Sinv, Sinv

    S0_inv = jnp.linalg.inv(D[..., 0, :, :])
    _, Sinv_rest = jax.lax.scan(
        lambda carry, dc: step(carry, dc),
        S0_inv,
        (jnp.moveaxis(D[..., 1:, :, :], -3, 0), jnp.moveaxis(C, -3, 0)),
    )
    Sinv = jnp.concatenate([S0_inv[None], Sinv_rest], axis=0)
    return jnp.moveaxis(Sinv, 0, -3)  # (..., N+1, 5, 5)


def _solve(Sinv, C, b):
    """Solve M w = b given the Schur factors: forward then backward scan."""
    bs = jnp.moveaxis(b, -2, 0)  # (N+1, ..., 5)
    Cs = jnp.moveaxis(C, -3, 0)  # (N, ..., 5, 5)
    Ss = jnp.moveaxis(Sinv, -3, 0)  # (N+1, ..., 5, 5)

    def fwd(v_prev, inp):
        bn, Cn, Sn_prev = inp
        v = bn - mv(jnp.matmul(Cn, Sn_prev, precision=HIGHEST), v_prev)
        return v, v

    v0 = bs[0]
    _, v_rest = jax.lax.scan(fwd, v0, (bs[1:], Cs, Ss[:-1]))
    v = jnp.concatenate([v0[None], v_rest], axis=0)

    def bwd(w_next, inp):
        vn, Sn, Cn = inp
        w = mv(Sn, vn - mv(jnp.swapaxes(Cn, -1, -2), w_next))
        return w, w

    wN = mv(Ss[-1], v[-1])
    _, w_rest = jax.lax.scan(bwd, wN, (v[:-1], Ss[:-1], Cs), reverse=True)
    w = jnp.concatenate([w_rest, wN[None]], axis=0)
    return jnp.moveaxis(w, 0, -2)  # (..., N+1, 5)


# ---------------------------------------------------------------------------
# ADMM on the structured problem
# ---------------------------------------------------------------------------

def solve_ltv_qp(qp: LTVQP, cfg: SolverConfig,
                 X0: Optional[jnp.ndarray] = None,
                 U0: Optional[jnp.ndarray] = None) -> LTVSolution:
    """ADMM solve of one LTV-MPC QP (single lane; vmap for the fleet).

    Equality rows keep ``rho * rho_eq_scale``; the projection pins their
    z-block to ``beq`` exactly, so only the identity rows carry a box
    projection.  Fixed iteration counts; rho adapts between rounds with a
    refactorization (one extra stage scan), like OSQP.
    """
    N = qp.N
    dtype = qp.A.dtype
    sigma = jnp.asarray(cfg.sigma, dtype)
    alpha = jnp.asarray(cfg.alpha, dtype)

    X = jnp.zeros((N + 1, NX), dtype) if X0 is None else X0
    U = jnp.zeros((N, NU), dtype) if U0 is None else U0
    # constraint-space iterates: eq block pinned, identity block boxed
    Zx = jnp.clip(X, qp.lx, qp.ux)
    Zu = jnp.clip(U, qp.lu, qp.uu)
    Yeq = jnp.zeros((N + 1, NX), dtype)
    Yx = jnp.zeros((N + 1, NX), dtype)
    Yu = jnp.zeros((N, NU), dtype)

    def pack(X, U):
        # (N+1, 5): stage n -> (x_n, u_n), u_N slot zero-padded
        Upad = jnp.concatenate([U, jnp.zeros_like(U[..., :1, :])], axis=-2)
        return jnp.concatenate([X, Upad], axis=-1)

    def unpack(W):
        return W[..., :NX], W[..., :-1, NX:]

    def run_round(carry, _):
        X, U, Zx, Zu, Yeq, Yx, Yu, rho_scalar = carry
        rho_eq = rho_scalar * cfg.rho_eq_scale
        rho_in = rho_scalar
        D, C = _build_blocks(qp, rho_eq, rho_in, sigma)
        Sinv = _factor(D, C)

        def body(_, state):
            X, U, Zx, Zu, Yeq, Yx, Yu = state
            # rhs = sigma z - q + A'(rho o z_c - y)
            weq = rho_eq * qp.beq - Yeq
            gx_eq, gu_eq = eq_applyT(qp, weq)
            rx = sigma * X - qp.q_x + gx_eq + (rho_in * Zx - Yx)
            ru = sigma * U - qp.q_u + gu_eq + (rho_in * Zu - Yu)
            W = _solve(Sinv, C, pack(rx, ru))
            Xt, Ut = unpack(W)

            Req = eq_apply(qp, Xt, Ut)
            Xn = alpha * Xt + (1 - alpha) * X
            Un = alpha * Ut + (1 - alpha) * U
            # eq rows: projection pins z to beq; dual accumulates violation
            Zeq_pre = alpha * Req + (1 - alpha) * qp.beq
            Yeq_n = Yeq + rho_eq * (Zeq_pre - qp.beq)
            # identity rows: box projection
            Zx_pre = alpha * Xt + (1 - alpha) * Zx
            Zu_pre = alpha * Ut + (1 - alpha) * Zu
            Zx_n = jnp.clip(Zx_pre + Yx / rho_in, qp.lx, qp.ux)
            Zu_n = jnp.clip(Zu_pre + Yu / rho_in, qp.lu, qp.uu)
            Yx_n = Yx + rho_in * (Zx_pre - Zx_n)
            Yu_n = Yu + rho_in * (Zu_pre - Zu_n)
            return Xn, Un, Zx_n, Zu_n, Yeq_n, Yx_n, Yu_n

        X, U, Zx, Zu, Yeq, Yx, Yu = jax.lax.fori_loop(
            0, cfg.iterations, body, (X, U, Zx, Zu, Yeq, Yx, Yu))

        # adaptive rho from relative residuals
        Req = eq_apply(qp, X, U)
        rp_vec = jnp.maximum(jnp.max(jnp.abs(Req - qp.beq)),
                             jnp.maximum(jnp.max(jnp.abs(X - Zx)),
                                         jnp.max(jnp.abs(U - Zu))))
        gx_eq, gu_eq = eq_applyT(qp, Yeq)
        dx = qp.P_x * X + qp.q_x + gx_eq + Yx
        du = qp.P_u * U + qp.q_u + gu_eq + Yu
        rd_vec = jnp.maximum(jnp.max(jnp.abs(dx)), jnp.max(jnp.abs(du)))
        den_p = jnp.maximum(jnp.max(jnp.abs(Req)),
                            jnp.maximum(jnp.max(jnp.abs(X)), jnp.max(jnp.abs(U))))
        den_d = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(qp.P_x * X)),
                                        jnp.max(jnp.abs(qp.q_x))),
                            jnp.maximum(jnp.max(jnp.abs(gx_eq)), 1e-10))
        ratio = jnp.sqrt((rp_vec / jnp.maximum(den_p, 1e-10)) /
                         jnp.maximum(rd_vec / jnp.maximum(den_d, 1e-10), 1e-12))
        rho_new = jnp.clip(rho_scalar * ratio, 1e-6, 1e6)
        rho_new = jnp.where(jnp.isfinite(rho_new), rho_new, rho_scalar)
        return (X, U, Zx, Zu, Yeq, Yx, Yu, rho_new), None

    rho0 = jnp.asarray(cfg.rho, dtype)
    (X, U, Zx, Zu, Yeq, Yx, Yu, _), _ = jax.lax.scan(
        run_round, (X, U, Zx, Zu, Yeq, Yx, Yu, rho0), None,
        length=max(cfg.rho_updates, 1))

    # residuals / status (unscaled problem; per-lane values, never exceptions)
    Req = eq_apply(qp, X, U)
    r_prim = jnp.maximum(
        jnp.max(jnp.abs(Req - qp.beq)),
        jnp.maximum(jnp.max(jnp.clip(qp.lx - X, 0, jnp.inf) + jnp.clip(X - qp.ux, 0, jnp.inf)),
                    jnp.max(jnp.clip(qp.lu - U, 0, jnp.inf) + jnp.clip(U - qp.uu, 0, jnp.inf))))
    gx_eq, gu_eq = eq_applyT(qp, Yeq)
    dx = qp.P_x * X + qp.q_x + gx_eq + Yx
    du = qp.P_u * U + qp.q_u + gu_eq + Yu
    r_dual = jnp.maximum(jnp.max(jnp.abs(dx)), jnp.max(jnp.abs(du)))

    scale_p = jnp.maximum(jnp.max(jnp.abs(Req)),
                          jnp.maximum(jnp.max(jnp.abs(X)), jnp.max(jnp.abs(U))))
    scale_d = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(qp.q_x)), jnp.max(jnp.abs(qp.q_u))),
                          jnp.maximum(jnp.max(jnp.abs(gx_eq)), jnp.max(jnp.abs(gu_eq))))
    eps_p = cfg.eps_abs + cfg.eps_rel * scale_p
    eps_d = cfg.eps_abs + cfg.eps_rel * scale_d

    finite = jnp.isfinite(X).all() & jnp.isfinite(U).all()
    converged = (r_prim <= eps_p) & (r_dual <= eps_d)
    status = jnp.where(~finite, admm_mod.DIVERGED,
                       jnp.where(converged, admm_mod.SOLVED,
                                 admm_mod.MAX_ITER)).astype(jnp.int32)
    return LTVSolution(X=X, U=U, status=status, r_prim=r_prim, r_dual=r_dual)


# ---------------------------------------------------------------------------
# Dense materialization (for cross-checks against the dense solver / oracle)
# ---------------------------------------------------------------------------

def materialize_dense(qp: LTVQP):
    """Build the dense (P, q, A, l, u) of this QP in the reference's variable
    order [x_0..x_N | u_0..u_{N-1}] (MPC.py:128-155).  Test/debug only."""
    import numpy as np

    N = qp.N
    n = NX * (N + 1) + NU * N
    A_np = np.asarray(qp.A)
    B_np = np.asarray(qp.B)

    Aeq = np.zeros((NX * (N + 1), n))
    for i in range(N + 1):
        Aeq[NX * i:NX * (i + 1), NX * i:NX * (i + 1)] = -np.eye(NX)
    for k in range(N):
        r = NX * (k + 1)
        Aeq[r:r + NX, NX * k:NX * (k + 1)] += A_np[k]
        Aeq[r:r + NX, NX * (N + 1) + NU * k:NX * (N + 1) + NU * (k + 1)] = B_np[k]

    A_full = np.vstack([Aeq, np.eye(n)])
    beq = np.asarray(qp.beq).reshape(-1)
    l = np.concatenate([beq, np.asarray(qp.lx).reshape(-1), np.asarray(qp.lu).reshape(-1)])
    u = np.concatenate([beq, np.asarray(qp.ux).reshape(-1), np.asarray(qp.uu).reshape(-1)])
    P = np.diag(np.concatenate([np.asarray(qp.P_x).reshape(-1),
                                np.asarray(qp.P_u).reshape(-1)]))
    q = np.concatenate([np.asarray(qp.q_x).reshape(-1), np.asarray(qp.q_u).reshape(-1)])
    return P, q, A_full, l, u
