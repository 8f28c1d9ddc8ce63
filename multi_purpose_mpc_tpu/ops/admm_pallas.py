"""Fused Pallas TPU kernel for the batched LTV-MPC ADMM solve.

Why a kernel: the XLA formulation (ops/ltv_qp.py) re-streams the stage
factors from HBM on every ADMM iteration — per MPC step at batch 4096 that is
``iterations x ~25 MB`` of traffic, which measured out bandwidth/latency
bound at ~2.2k car-steps/s.  This kernel keeps EVERYTHING — stage data,
factors, iterates — resident in VMEM for a tile of lanes and runs the entire
ADMM loop (including rho-adaptation refactorizations) in one ``pallas_call``:
HBM traffic drops to one read of the inputs + one write of the outputs per
MPC step.

Layout: the lane axes are LAST — a tile of ``LANES = S * 128`` lanes laid
out as an ``(S, 128)`` trailing block (sublanes x lanes; see
:func:`_lane_shape`), so every scalar-per-lane quantity is one FULL vreg at
S = 8 and every 5x5 stage operation is 25 full-vreg multiply-adds — pure
VPU work with zero transposes and no wasted sublanes.  Host-side wrappers
move arrays between the solver's ``(B, stages, ...)`` convention and the
kernel's ``(stages, ..., B/128, 128)`` (a free reshape: the batch axis is
contiguous).

Math is identical to :func:`multi_purpose_mpc_tpu.ops.ltv_qp.solve_ltv_qp`
(same OSQP-style iteration, same stage-space block-tridiagonal Schur
factorization, same acceptance semantics) — cross-checked by tests against
the XLA solver and the float64 oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_purpose_mpc_tpu.config import SolverConfig
from multi_purpose_mpc_tpu.ops import admm as admm_mod
from multi_purpose_mpc_tpu.ops.ltv_qp import (
    NU,
    NW,
    NX,
    LTVQP,
    LTVSolution,
    SolverCarry,
)

DEFAULT_LANES = 128


def _lane_shape(lanes: int) -> Tuple[int, ...]:
    """Kernel-side layout of a lane tile.

    ``lanes % 1024 == 0`` tiles lay out 2-D as ``(S, 128)`` (S = lanes/128
    sublanes x 128 lanes) so every per-lane quantity is S/8 FULL vregs.  In
    the 1-D ``(lanes,)`` layout every per-stage slice occupies lanes/128
    vregs at ONE sublane each, wasting 7/8 of every vector issue slot;
    measured on the v5e, a ``(128,)`` elementwise op costs exactly the same
    as an ``(8, 128)`` one, so sublane packing is an up-to-8x on the
    solver's issue-bound stage math.  Mosaic requires the block's
    second-to-last dim to be a multiple of 8, hence the 1024 granularity;
    smaller tiles keep the classic 1-D layout (identical math — the kernel
    body is lane-shape-generic).

    Toolchain status (v5e, 2026-08, round-5 bisection): the lanes >= 512
    "compile failure" (remote tpu_compile_helper exit 1 after ~10 min) is a
    compile-time/resource blow-up specific to MULTI-TILE pipelined grids of
    this kernel — the identical body at grid=(1,) compiles and runs, and
    measures 2.7x faster per lane than the (128,) layout (322 vs 864
    ns/lane at a 30-iteration budget, B=1024).  The wrappers below
    therefore dispatch 2-D tiles as a ``lax.map`` of single-tile
    ``pallas_call``s (one Mosaic compile, sequential tiles — exactly the
    TPU grid schedule) instead of a multi-tile grid."""
    if lanes >= 1024 and lanes % 1024 == 0:
        return (lanes // 128, 128)
    return (lanes,)


def _gj_inverse_5x5(S):
    """Gauss-Jordan inverse of (5, 5, L) SPD stage blocks, vectorized over
    lanes.  No pivoting — the Schur complements are positive definite by
    construction (P + sigma I + rho A'A).  Written as explicit row lists:
    Mosaic has no scatter lowering, so no ``.at[]`` updates."""
    # identity rows built in-kernel via iota — Pallas kernels cannot close
    # over non-scalar constants
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (NW,) + S.shape[2:], 0)
    a = [S[i] for i in range(NW)]  # rows, each (5, L)
    inv = [jnp.where(row_ids == i, 1.0, 0.0).astype(S.dtype)
           for i in range(NW)]
    for k in range(NW):
        piv = 1.0 / a[k][k]
        a[k] = a[k] * piv
        inv[k] = inv[k] * piv
        for i in range(NW):
            if i == k:
                continue
            f = a[i][k]
            a[i] = a[i] - f * a[k]
            inv[i] = inv[i] - f * inv[k]
    return jnp.stack(inv)


def _mv5(M, v):
    """(5, 5, L) @ (5, L) -> (5, L), unrolled to vector multiply-adds —
    Mosaic's dot lowering mis-handles these tiny lane-batched contractions,
    and explicit VPU ops are the natural form anyway."""
    n = M.shape[0]
    m = M.shape[1]
    return jnp.stack([sum(M[i, j] * v[j] for j in range(m)) for i in range(n)])


def _mtv5(M, v):
    """(5, 5, L)^T @ (5, L) -> (5, L)."""
    n = M.shape[0]
    m = M.shape[1]
    return jnp.stack([sum(M[i, j] * v[i] for i in range(n)) for j in range(m)])


def _mm_ll(A_, B_):
    """(a, b, L) @ (b, c, L) -> (a, c, L), unrolled."""
    a, b = A_.shape[0], A_.shape[1]
    c = B_.shape[1]
    return jnp.stack([
        jnp.stack([sum(A_[i, k] * B_[k, j] for k in range(b))
                   for j in range(c)])
        for i in range(a)])


# ---------------------------------------------------------------------------
# Plane-matrix helpers for the cyclic-reduction stage solver.
#
# A "pmat" is a list-of-lists of (stages, L) planes (or None for a
# structural zero): block matrices batched over the *stage* axis, so every
# op is a full-width vector op over (stages, L) — the Schur recursion's
# (L,)-wide per-stage ops use 1/8 of the VPU's sublanes and serialize over
# stages; CR's stage-batched planes pack them densely AND cut the
# sequential depth from O(N) to O(log N) levels.
# ---------------------------------------------------------------------------


def _pm_zeros_like(p):
    return jnp.zeros_like(p)


def _pm_mul(A, B):
    """pmat product C[i][j] = sum_k A[i][k] B[k][j]; None-aware."""
    ra, rk = len(A), len(B)
    rb = len(B[0])
    out = []
    for i in range(ra):
        row = []
        for j in range(rb):
            acc = None
            for k in range(rk):
                a = A[i][k]
                b = B[k][j]
                if a is None or b is None:
                    continue
                acc = a * b if acc is None else acc + a * b
            row.append(acc)
        out.append(row)
    return out


def _pm_mulT(A, B):
    """C = A @ B^T: C[i][j] = sum_k A[i][k] B[j][k]."""
    return _pm_mul(A, [[B[j][k] for j in range(len(B))]
                       for k in range(len(B[0]))])


def _pm_Tmul(A, B):
    """C = A^T @ B: C[i][j] = sum_k A[k][i] B[k][j]."""
    return _pm_mul([[A[k][i] for k in range(len(A))]
                    for i in range(len(A[0]))], B)


def _pm_sub(A, B):
    """A - B with None as zero."""
    out = []
    for i in range(len(A)):
        row = []
        for j in range(len(A[0])):
            a, b = A[i][j], B[i][j]
            if b is None:
                row.append(a)
            elif a is None:
                row.append(-b)
            else:
                row.append(a - b)
        out.append(row)
    return out


def _pm_neg(A):
    return [[None if x is None else -x for x in row] for row in A]


def _pm_mv(A, v):
    """pmat @ plane-vector: w[i] = sum_j A[i][j] v[j]."""
    out = []
    for i in range(len(A)):
        acc = None
        for j in range(len(v)):
            a = A[i][j]
            if a is None or v[j] is None:
                continue
            acc = a * v[j] if acc is None else acc + a * v[j]
        out.append(acc)
    return out


def _pm_Tv(A, v):
    """pmat^T @ plane-vector: w[j] = sum_i A[i][j] v[i]."""
    out = []
    for j in range(len(A[0])):
        acc = None
        for i in range(len(A)):
            a = A[i][j]
            if a is None or v[i] is None:
                continue
            acc = a * v[i] if acc is None else acc + a * v[i]
        out.append(acc)
    return out


def _pm_inv(D):
    """Gauss-Jordan inverse of a dense n x n pmat of (s, L) planes.  No
    pivoting — the CR reduced diagonals stay SPD (Schur complements of SPD
    blocks)."""
    n = len(D)
    one = jnp.ones_like(D[0][0])
    zero = jnp.zeros_like(D[0][0])
    a = [[D[i][j] if D[i][j] is not None else zero for j in range(n)]
         for i in range(n)]
    inv = [[one if i == j else zero for j in range(n)] for i in range(n)]
    for k in range(n):
        piv = 1.0 / a[k][k]
        a[k] = [x * piv for x in a[k]]
        inv[k] = [x * piv for x in inv[k]]
        for i in range(n):
            if i == k:
                continue
            f = a[i][k]
            a[i] = [a[i][j] - f * a[k][j] for j in range(n)]
            inv[i] = [inv[i][j] - f * inv[k][j] for j in range(n)]
    return inv


def _pm_rows(A, sl):
    """Slice every plane's stage axis."""
    return [[None if x is None else x[sl] for x in row] for row in A]


def _pv_rows(v, sl):
    return [None if x is None else x[sl] for x in v]


def _plane_split_even_odd(p):
    """(m_pad, *L) plane with even m_pad -> (even rows, odd rows)."""
    m2 = p.shape[0] // 2
    r = p.reshape((m2, 2) + p.shape[1:])
    return r[:, 0], r[:, 1]


def _plane_interleave(a, b):
    """Even rows a (e, *L) + odd rows b (e, *L) -> (2e, *L)."""
    e = a.shape[0]
    return jnp.stack([a, b], axis=1).reshape((2 * e,) + a.shape[1:])


def _make_kernel(N: int, cfg: SolverConfig, build=None, n_raw: int = 6,
                 lanes: int = DEFAULT_LANES):
    """Builds the kernel body for a fixed horizon + solver config.

    ``build``: optional in-kernel QP constructor.  When given, the kernel's
    first ``n_raw`` refs carry raw per-stage data and ``build(raw_arrays)``
    returns ``(AB, beq, Pd, qv, lw, uw)`` — the fused-assembly path that
    skips materializing/packing the LTVQP tensors in HBM entirely.
    """
    sigma = cfg.sigma
    alpha = cfg.alpha
    eq_scale = cfg.rho_eq_scale
    # Stage-loop policy.  Two implementations of the factor/substitution
    # recursions share one interface (make_stage_solver):
    #   * N <= 32 — unrolled SSA values: Mosaic keeps factors/iterates in
    #     registers across the iteration loop (the round-1 schedule, ~158k
    #     car-steps/s at batch 4096);
    #   * N > 32 — rolled fori_loops over VMEM scratch: O(1) code size and
    #     live-set in N, which is what makes N = 60-100+ compile and fit
    #     the 16 MB budget (costs ~18% at N=30 from scratch round-trips —
    #     measured, hence the hybrid).
    # cfg.stage_solver == "cr" replaces both with block cyclic reduction:
    # stage-batched (stages, L) planes instead of per-stage (L,) vectors —
    # full sublane packing and O(log N) sequential depth per solve.
    # Measured on the v5e (N=30, B=4096, /tmp/prof_cr_split.py pattern):
    # CR per-iteration 112 us vs Schur 78 us, factor 0.32 vs 0.16 ms — the
    # denser packing loses to CR's ~2x block-matrix work per level at 31
    # stages, so "auto" stays schur; CR remains the opt-in for very long
    # horizons where O(log N) depth can win.
    CR = cfg.stage_solver == "cr"
    ROLLED = _use_rolled(N, cfg, lanes)

    def kernel(*refs):
        if build is None:
            (AB_ref, beq_ref, Pd_ref, qv_ref, lw_ref, uw_ref,
             W0_ref, Zw0_ref, Yeq0_ref, Yw0_ref, rho0_ref,
             W_out, Zw_out, Yeq_out, Yw_out, rho_out, rp_out, rd_out,
             AB_s, C_s, diag_s, Sinv_s, v_s, w_s) = refs
            AB = AB_ref[:]  # (N, 3, 5, L) stage [A_n | B_n]
            beq = beq_ref[:]  # (N+1, 3, L)
            Pd = Pd_ref[:]  # (N+1, 5, L) diagonal cost (u-slots of stage N=0)
            qv = qv_ref[:]  # (N+1, 5, L) linear cost
            lw = lw_ref[:]  # (N+1, 5, L)
            uw = uw_ref[:]  # (N+1, 5, L)
        else:
            raw = refs[:n_raw]
            (W0_ref, Zw0_ref, Yeq0_ref, Yw0_ref, rho0_ref,
             W_out, Zw_out, Yeq_out, Yw_out, rho_out, rp_out, rd_out,
             floor_out, AB_s, C_s, diag_s, Sinv_s, v_s, w_s) = refs[n_raw:]
            AB, beq, Pd, qv, lw, uw, floor_v = build(*[r[:] for r in raw])
            # certified violation floor (mpc.violation_floor), computed
            # in-kernel from the SAME VMEM-resident horizon data the
            # assembly just used: outside the kernel this 30-stage scalar
            # recurrence costs ~1 ms/step at B=4096 (18% of the headline
            # step, latency-bound (B,)-wide vector ops — measured r5);
            # in-kernel it is ~30 register-resident vreg ops
            floor_out[:] = floor_v[None]
        if ROLLED:
            # stage-indexed reads inside the rolled loops go through VMEM
            # scratch (dynamic indexing of register values is not a
            # Mosaic-safe pattern); vectorized all-stage ops use the value
            AB_s[:] = AB

        W = W0_ref[:]  # (N+1, 5, L) primal (x_n, u_n)
        Zw = jnp.clip(Zw0_ref[:], lw, uw)
        Yeq = Yeq0_ref[:]  # (N+1, 3, L)
        Yw = Yw0_ref[:]  # (N+1, 5, L)
        rho = rho0_ref[:]  # (1, L)

        dtype = W.dtype
        # trailing lane dims: (L,) in the classic layout, (S, 128) in the
        # sublane-packed layout (lanes > 128) — all math below is written
        # lane-shape-generic (broadcast over LS)
        LS = W.shape[2:]
        ones_ls = (1,) * len(LS)

        # equality-like box rows (l == u) carry rho * eq_scale, like OSQP's
        # rho vector and the XLA solver's rho_rows
        is_eq = (uw - lw) < 1e-9  # (N+1, 5, *LS)

        def rho_rows(rho_v, boost=None):
            rw = jnp.where(is_eq, rho_v[0] * eq_scale, rho_v[0])
            if boost is not None:
                rw = rw * boost
            return rw  # (N+1, 5, *LS)

        # identity / x-row-mask tensors built in-kernel via iota (no
        # non-scalar captured constants allowed in Pallas kernels)
        _r = jax.lax.broadcasted_iota(jnp.int32, (NW, NW) + ones_ls, 0)
        _c = jax.lax.broadcasted_iota(jnp.int32, (NW, NW) + ones_ls, 1)
        eye5 = (_r == _c).astype(dtype)  # (5, 5, *1s)
        mask_x = (jax.lax.broadcasted_iota(jnp.int32, (NW,) + ones_ls, 0) < NX
                  ).astype(dtype)  # (5, *1s)

        def factor_rolled(rho_v, rho_w):
            """Writes stage factors Sinv into the (N+1,5,5,L) VMEM scratch
            ``Sinv_s`` via a rolled Schur recursion.  Rolled ``fori_loop``
            + scratch (instead of an unrolled Python list) keeps code size
            and peak VMEM O(1) in N — what lifts the N~30 horizon cap.  All
            diagonal embeddings are one-hot products — no scatter."""
            rho_eq = rho_v[0] * eq_scale  # (*LS,)
            diag_s[:] = Pd + sigma + rho_w  # (N+1, 5, *LS)
            # coupling C_n = -rho_eq * AB_n, staged once per factorization
            # so the per-iteration substitutions don't recompute it
            C_s[:] = -(rho_eq[None, None, None] * AB)

            def GCt5_embed(G, Cn):
                """pad(G C') on the x-x block -> (5, 5, *LS); the u rows/cols
                are zero (no jnp.pad in Mosaic — explicit row build)."""
                GCt = [[sum(G[i][k] * Cn[j][k] for k in range(NW))
                        for j in range(NX)] for i in range(NX)]
                z = jnp.zeros(LS, dtype)
                return jnp.stack([
                    jnp.stack([(GCt[i][j] if (i < NX and j < NX) else z)
                               for j in range(NW)])
                    for i in range(NW)])

            def D_of(n_idx, ABn):
                """Diagonal block of stage n (< N), built on the fly:
                rho_eq*(AB_n'AB_n + diag(mask_x)) + diag(diag_base_n)."""
                AtA = jnp.stack([
                    jnp.stack([sum(ABn[k, i] * ABn[k, j] for k in range(NX))
                               for j in range(NW)])
                    for i in range(NW)])  # (5, 5, *LS)
                diag = diag_s[n_idx] + rho_eq[None] * mask_x
                return AtA * rho_eq + diag[:, None] * eye5

            Sinv_s[0] = _gj_inverse_5x5(D_of(0, AB_s[0]))

            def fstep(n, _):
                Cn = C_s[n - 1]  # (3, 5, L)
                Sprev = Sinv_s[n - 1]
                G = _mm_ll(Cn, Sprev)  # (3, 5, L)
                Sinv_s[n] = _gj_inverse_5x5(D_of(n, AB_s[n]) - GCt5_embed(G, Cn))
                return 0

            jax.lax.fori_loop(1, N, fstep, 0, unroll=1)

            # terminal stage: x rows diag_base + rho_eq; pad u rows identity
            diag_N = (mask_x * (diag_s[N] + rho_eq[None]) + (1.0 - mask_x))
            DN = diag_N[:, None] * eye5
            CN = C_s[N - 1]
            G = _mm_ll(CN, Sinv_s[N - 1])
            Sinv_s[N] = _gj_inverse_5x5(DN - GCt5_embed(G, CN))

        def solve_rolled(b):
            """Block-tridiagonal solve M w = b using the Sinv_s factors;
            b: (N+1, 5, L).  Forward/backward substitutions as rolled
            fori_loops over the v/w VMEM scratch buffers — code size and
            live VMEM stay O(1) in the horizon."""
            v_s[:] = b

            def fwd(n, _):
                Sv = _mv5(Sinv_s[n - 1], v_s[n - 1])  # (5, L)
                Cn = C_s[n - 1]
                Gv = jnp.stack([sum(Cn[i, j] * Sv[j] for j in range(NW))
                                for i in range(NX)])
                # subtract on x rows only (u rows of the pad are zero)
                Gv5 = jnp.concatenate([Gv, jnp.zeros((NU,) + LS, dtype)],
                                      axis=0)
                v_s[n] = v_s[n] - Gv5
                return 0

            jax.lax.fori_loop(1, N + 1, fwd, 0, unroll=1)

            w_s[N] = _mv5(Sinv_s[N], v_s[N])

            def bwd(k, _):
                n = N - 1 - k
                wx = w_s[n + 1]
                Cn = C_s[n]
                Ctw = jnp.stack([sum(Cn[i, j] * wx[i] for i in range(NX))
                                 for j in range(NW)])
                w_s[n] = _mv5(Sinv_s[n], v_s[n] - Ctw)
                return 0

            jax.lax.fori_loop(0, N, bwd, 0, unroll=1)
            return w_s[:]  # (N+1, 5, L)

        def factor_values(rho_v, rho_w):
            """Unrolled factorization as SSA values (N <= 32 fast path):
            returns (Sinv, C); Mosaic register-allocates across the
            iteration loop with no scratch round-trips."""
            rho_eq = rho_v[0] * eq_scale  # (*LS,)
            diag_base = Pd + sigma + rho_w  # (N+1, 5, *LS)
            AtA = jnp.stack([
                jnp.stack([sum(AB[:, k, i] * AB[:, k, j] for k in range(NX))
                           for j in range(NW)], axis=1)
                for i in range(NW)], axis=1)  # (N, 5, 5, *LS)
            diag_body = (diag_base[:-1]
                         + rho_eq[None, None] * mask_x[None])
            D = AtA * rho_eq + diag_body[:, :, None] * eye5[None]
            diag_N = (mask_x * (diag_base[N] + rho_eq[None])
                      + (1.0 - mask_x))
            DN = diag_N[:, None] * eye5
            C = -(rho_eq[None, None, None] * AB)  # (N, 3, 5, *LS)

            pad_uu = jnp.zeros((NU, NU) + LS, dtype)
            pad_xu = jnp.zeros((NX, NU) + LS, dtype)
            Sinvs = []
            Sinv = _gj_inverse_5x5(D[0])
            Sinvs.append(Sinv)
            for n in range(1, N + 1):
                Cn = C[n - 1]
                G = _mm_ll(Cn, Sinv)
                GCt = jnp.stack([
                    jnp.stack([sum(G[i, k] * Cn[j, k] for k in range(NW))
                               for j in range(NX)])
                    for i in range(NX)])
                GCt5 = jnp.concatenate([
                    jnp.concatenate([GCt, pad_xu], axis=1),
                    jnp.concatenate([jnp.swapaxes(pad_xu, 0, 1), pad_uu],
                                    axis=1),
                ], axis=0)
                Dn = D[n] if n < N else DN
                Sinv = _gj_inverse_5x5(Dn - GCt5)
                Sinvs.append(Sinv)
            return jnp.stack(Sinvs), C

        def solve_values(Sinv, C, b):
            """Unrolled substitutions on SSA values (N <= 32 fast path)."""
            pad2 = jnp.zeros((NU,) + LS, b.dtype)
            v = [None] * (N + 1)
            v[0] = b[0]
            for n in range(1, N + 1):
                Sv = _mv5(Sinv[n - 1], v[n - 1])
                Gv = jnp.stack([sum(C[n - 1][i, j] * Sv[j] for j in range(NW))
                                for i in range(NX)])
                v[n] = b[n] - jnp.concatenate([Gv, pad2], axis=0)
            w = [None] * (N + 1)
            w[N] = _mv5(Sinv[N], v[N])
            for n in range(N - 1, -1, -1):
                wx = w[n + 1]
                Ctw = jnp.stack([sum(C[n][i, j] * wx[i] for i in range(NX))
                                 for j in range(NW)])
                w[n] = _mv5(Sinv[n], v[n] - Ctw)
            return jnp.stack(w)

        # -- block cyclic reduction (cfg.stage_solver == "cr") -------------
        # Same SPD stage system; stage-batched (stages, L) planes and
        # O(log N) levels instead of the serial Schur recursion.  Stage
        # count pads to the next 2^k - 1 with decoupled identity stages.
        m_cr = N + 1
        mfull_cr = 1
        while mfull_cr < m_cr + 1:
            mfull_cr *= 2
        mfull_cr -= 1

        def factor_cr(rho_v, rho_w):
            rho_eq = rho_v[0] * eq_scale  # (*LS,)
            diag_base = Pd + sigma + rho_w  # (N+1, 5, *LS)
            z1 = jnp.zeros((1,) + LS, dtype)
            o1 = jnp.ones((1,) + LS, dtype)
            re = rho_eq[None]

            # stage-batched diagonal / coupling blocks as plane matrices
            D = []
            for i in range(NW):
                row = []
                for j in range(NW):
                    AtA = sum(AB[:, k, i] * AB[:, k, j] for k in range(NX))
                    body = re * AtA  # (N, L)
                    if i == j:
                        body = body + diag_base[:N, i]
                        if i < NX:
                            body = body + re
                        dN = (diag_base[N:, i] + re) if i < NX else o1
                    else:
                        dN = z1
                    p = jnp.concatenate([body, dN], axis=0)  # (m_cr, L)
                    if mfull_cr > m_cr:
                        padp = o1 if i == j else z1
                        p = jnp.concatenate(
                            [p] + [padp] * (mfull_cr - m_cr), axis=0)
                    row.append(p)
                D.append(row)
            O = []
            for i in range(NW):
                if i >= NX:
                    O.append([None] * NW)
                    continue
                row = []
                for j in range(NW):
                    p = jnp.concatenate([z1, -(re * AB[:, i, j])], axis=0)
                    if mfull_cr > m_cr:
                        p = jnp.concatenate(
                            [p] + [z1] * (mfull_cr - m_cr), axis=0)
                    row.append(p)
                O.append(row)

            levels = []
            mc = mfull_cr
            while mc > 1:
                e = (mc + 1) // 2
                mp = (mc - 1) // 2

                def pad_split(p, diag):
                    if p is None:
                        return None, None
                    tail = o1 if diag else z1
                    return _plane_split_even_odd(
                        jnp.concatenate([p, tail], axis=0))

                De, Do, Oe, Ol = [], [], [], []
                for i in range(NW):
                    de_r, do_r, oe_r, ol_r = [], [], [], []
                    for j in range(NW):
                        pe, po = pad_split(D[i][j], i == j)
                        de_r.append(pe)
                        do_r.append(po)
                        pe, po = pad_split(O[i][j], False)
                        oe_r.append(pe)
                        ol_r.append(po)
                    De.append(de_r)
                    Do.append(do_r)
                    Oe.append(oe_r)
                    Ol.append(ol_r)

                Dinv_e = _pm_inv(De)  # (e, L) planes
                OL = Ol  # O_{2t+1}, t = 0..e-1 (last is the zero pad)
                OR = _pm_rows(Oe, slice(1, None))  # O_{2t+2}, t = 0..mp-1
                levels.append((Dinv_e, OL, OR, mc, e, mp))

                OLm = _pm_rows(OL, slice(0, mp))
                Dim = _pm_rows(Dinv_e, slice(0, mp))
                t1 = _pm_mul(OLm, _pm_mulT(Dim, OLm))
                Di1 = _pm_rows(Dinv_e, slice(1, mp + 1))
                t2 = _pm_Tmul(OR, _pm_mul(Di1, OR))
                D = _pm_sub(_pm_sub(_pm_rows(Do, slice(0, mp)), t1), t2)
                if mp > 1:
                    OL1 = _pm_rows(OL, slice(1, mp))
                    Di2 = _pm_rows(Dinv_e, slice(1, mp))
                    OR0 = _pm_rows(OR, slice(0, mp - 1))
                    Ob = _pm_neg(_pm_mul(OL1, _pm_mul(Di2, OR0)))
                    O = [[None if x is None
                          else jnp.concatenate([z1, x], axis=0)
                          for x in row] for row in Ob]
                else:
                    O = [[None] * NW for _ in range(NW)]
                mc = mp
            Dinv_f = _pm_inv(D)  # single-stage inverse
            return levels, Dinv_f, z1

        def solve_cr(levels, Dinv_f, z1, b):
            """b: (N+1, 5, *LS) -> w: (N+1, 5, *LS) via the stored CR
            levels."""
            bp = [b[:, j] for j in range(NW)]
            if mfull_cr > m_cr:
                padz = jnp.broadcast_to(z1, (mfull_cr - m_cr,) + LS)
                bp = [jnp.concatenate([x, padz], axis=0) for x in bp]
            stack = []
            for (Dinv_e, OL, OR, mc, e, mp) in levels:
                bpad = [jnp.concatenate([x, z1], axis=0) for x in bp]
                be, bo = [], []
                for x in bpad:
                    pe, po = _plane_split_even_odd(x)
                    be.append(pe)
                    bo.append(po)
                u = _pm_mv(Dinv_e, be)  # (e, L) planes
                t1 = _pm_mv(_pm_rows(OL, slice(0, mp)),
                            _pv_rows(u, slice(0, mp)))
                t2 = _pm_Tv(OR, _pv_rows(u, slice(1, mp + 1)))
                bn = []
                for j in range(NW):
                    x = bo[j][:mp]
                    if t1[j] is not None:
                        x = x - t1[j]
                    if t2[j] is not None:
                        x = x - t2[j]
                    bn.append(x)
                stack.append((Dinv_e, OL, OR, be, mc))
                bp = bn
            w = _pm_mv(Dinv_f, bp)  # (1, L) planes
            for (Dinv_e, OL, OR, be, mc) in reversed(stack):
                prod = _pm_mv(OR, w)  # x-rows over (mp, L)
                w_pad = [jnp.concatenate([x, z1], axis=0) for x in w]  # (e, L)
                right = _pm_Tv(OL, w_pad)
                rhs = []
                for j in range(NW):
                    x = be[j]
                    if prod[j] is not None:
                        x = x - jnp.concatenate([z1, prod[j]], axis=0)
                    if right[j] is not None:
                        x = x - right[j]
                    rhs.append(x)
                we = _pm_mv(Dinv_e, rhs)  # (e, L)
                w = [_plane_interleave(we[j], w_pad[j])[:mc]
                     for j in range(NW)]
            return jnp.stack([x[:m_cr] for x in w], axis=1)

        def make_stage_solver(rho_v, rho_w):
            """Factorize for this rho; return the b -> w solve closure."""
            if CR:
                levels, Dinv_f, z1 = factor_cr(rho_v, rho_w)
                return lambda b: solve_cr(levels, Dinv_f, z1, b)
            if not ROLLED:
                Sinv, C = factor_values(rho_v, rho_w)
                return lambda b: solve_values(Sinv, C, b)
            factor_rolled(rho_v, rho_w)
            return solve_rolled

        def eq_apply(Wv):
            """r_0 = -x_0; r_{n+1} = AB_n W_n - x_{n+1}  -> (N+1, 3, L)."""
            r0 = -Wv[0, :NX]
            Wh = Wv[:-1]
            ABW = jnp.stack([sum(AB[:, i, j] * Wh[:, j] for j in range(NW))
                             for i in range(NX)], axis=1)  # (N, 3, L)
            rn = ABW - Wv[1:, :NX]
            return jnp.concatenate([r0[None], rn], axis=0)

        def eq_applyT(Wq):
            """g = Aeq' w, w: (N+1, 3, L) -> (N+1, 5, L)."""
            Wt = Wq[1:]
            g = jnp.stack([sum(AB[:, i, j] * Wt[:, i] for i in range(NX))
                           for j in range(NW)], axis=1)  # (N, 5, L)
            gN = jnp.zeros((1, NW) + LS, dtype)
            g = jnp.concatenate([g, gN], axis=0)
            pad_u = jnp.zeros((N + 1, NU) + LS, dtype)
            Wq_pad = jnp.concatenate([Wq, pad_u], axis=1)  # (N+1, 5, L)
            return g - Wq_pad

        def run_iters(iters, rho_v, st, boost=None):
            W, Zw, Yeq, Yw = st
            rho_eq = rho_v[0] * eq_scale
            rho_w = rho_rows(rho_v, boost)
            slv = make_stage_solver(rho_v, rho_w)

            def body(_, st):
                W, Zw, Yeq, Yw = st
                weq = rho_eq[None, None] * beq - Yeq
                rhs = sigma * W - qv + eq_applyT(weq) + rho_w * Zw - Yw
                Wt = slv(rhs)
                Req = eq_apply(Wt)
                Wn = alpha * Wt + (1.0 - alpha) * W
                Zeq_pre = alpha * Req + (1.0 - alpha) * beq
                Yeq_n = Yeq + rho_eq[None, None] * (Zeq_pre - beq)
                Zw_pre = alpha * Wt + (1.0 - alpha) * Zw
                Zw_n = jnp.clip(Zw_pre + Yw / rho_w, lw, uw)
                Yw_n = Yw + rho_w * (Zw_pre - Zw_n)
                return Wn, Zw_n, Yeq_n, Yw_n

            return jax.lax.fori_loop(0, iters, body, (W, Zw, Yeq, Yw))

        def primal_res(W, Zw):
            Req = eq_apply(W)
            viol = (jnp.clip(lw - W, 0.0, jnp.inf) +
                    jnp.clip(W - uw, 0.0, jnp.inf))
            return jnp.maximum(jnp.max(jnp.abs(Req - beq), axis=(0, 1)),
                               jnp.max(viol, axis=(0, 1)))  # (L,)

        def run_round(carry):
            W, Zw, Yeq, Yw, rho_v = carry
            W, Zw, Yeq, Yw = run_iters(cfg.iterations, rho_v, (W, Zw, Yeq, Yw))

            # adaptive rho from relative residuals (per lane) — formulas
            # mirror the XLA solver exactly
            Req = eq_apply(W)
            rp = jnp.maximum(jnp.max(jnp.abs(Req - beq), axis=(0, 1)),
                             jnp.max(jnp.abs(W - Zw), axis=(0, 1)))  # (L,)
            g = eq_applyT(Yeq)
            dvec = Pd * W + qv + g + Yw
            rd = jnp.max(jnp.abs(dvec), axis=(0, 1))
            den_p = jnp.maximum(jnp.max(jnp.abs(Req), axis=(0, 1)),
                                jnp.max(jnp.abs(W), axis=(0, 1)))
            den_d = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(Pd * W), axis=(0, 1)),
                            jnp.max(jnp.abs(qv), axis=(0, 1))),
                jnp.maximum(jnp.max(jnp.abs(g), axis=(0, 1)), 1e-10))
            ratio = jnp.sqrt((rp / jnp.maximum(den_p, 1e-10)) /
                             jnp.maximum(rd / den_d, 1e-12))
            rho_new = jnp.clip(rho_v[0] * ratio, 1e-6, 1e6)
            rho_new = jnp.where(jnp.isfinite(rho_new), rho_new, rho_v[0])
            return (W, Zw, Yeq, Yw, rho_new[None])

        # rho rounds: rolled fori_loop for 2-D packed lane tiles, unrolled
        # otherwise.  Rolling cuts generated code ~rho_updates-fold — which
        # is what lets the (S, 128) packed layout compile at the production
        # budget at all (the Mosaic backend's compile cost scales with body
        # size x lane-tile width; r5 bisection: a ONE-round 1024-lane body
        # compiles and runs 2.7x faster per lane, the six-round unrolled
        # body dies).  The classic 1-D tiles keep the unrolled rounds:
        # rolling them ballooned THEIR compile from ~1-2 min to 5-13 min
        # (measured r5) for zero device-time win (14.52 vs 14.56 ms at
        # B=4096).  fori_loop array carries lower fine in Mosaic — it is
        # lax.scan that has no in-kernel lowering.
        carry = (W, Zw, Yeq, Yw, rho)
        if len(LS) == 2:
            carry = jax.lax.fori_loop(
                0, max(cfg.rho_updates, 1), lambda _i, c: run_round(c),
                carry)
        else:
            for _ in range(max(cfg.rho_updates, 1)):
                carry = run_round(carry)
        W, Zw, Yeq, Yw, rho = carry

        if cfg.polish_iters > 0:
            # guarded active-set polish (see ltv_qp.solve_ltv_qp)
            tol = 1e-4
            act = ((Zw <= lw + tol) | (Zw >= uw - tol)) & \
                jnp.isfinite(jnp.where(Zw <= lw + tol, lw, uw))
            boost = jnp.where(act, cfg.polish_boost, 1.0)
            Wp, Zwp, Yeqp, Ywp = run_iters(cfg.polish_iters, rho,
                                           (W, Zw, Yeq, Yw), boost=boost)
            take = (primal_res(Wp, Zwp) < primal_res(W, Zw))  # (L,)
            W = jnp.where(take, Wp, W)
            Zw = jnp.where(take, Zwp, Zw)
            Yeq = jnp.where(take, Yeqp, Yeq)
            Yw = jnp.where(take, Ywp, Yw)

        # final residuals (unscaled, inf-norm per lane)
        rp = primal_res(W, Zw)
        g = eq_applyT(Yeq)
        rd = jnp.max(jnp.abs(Pd * W + qv + g + Yw), axis=(0, 1))

        W_out[:] = W
        Zw_out[:] = Zw
        Yeq_out[:] = Yeq
        Yw_out[:] = Yw
        rho_out[:] = rho
        rp_out[:] = rp[None]
        rd_out[:] = rd[None]

    return kernel


def resolve_lanes(B: int, lanes: int | None) -> int:
    """``lanes=None`` (the SolverConfig default) resolves by batch size:
    the (8, 128) sublane-packed 1024-lane tile once the batch can fill one
    (measured r5 at the production budget, B=4096: 4.36 vs 14.52 ms/solve —
    3.3x — with identical acceptance), the classic 128-lane tile below
    that (padding a small batch to 1024 would waste more than the packing
    wins; 128 also keeps single-car latency minimal)."""
    if lanes is not None:
        return lanes
    return 1024 if B >= 1024 else DEFAULT_LANES


def _use_rolled(N: int, cfg: SolverConfig, lanes: int = DEFAULT_LANES) -> bool:
    """Single source of truth for the stage-loop policy — the kernel body
    and the scratch allocation MUST agree (a forced-rolled kernel over the
    N <= 32 placeholder scratch fails Pallas lowering with a shape-mismatch
    swap).  cfg.rolled_stage_loops: None = auto (rolled above N = 32, and
    ALWAYS for 2-D packed lane tiles — the unrolled SSA body at (S, 128)
    still blows up the Mosaic backend's compile, while the rolled body
    compiles and is the 3.3x-fast path), True/False forces."""
    if cfg.stage_solver == "cr":
        return False
    if cfg.rolled_stage_loops is None:
        if len(_lane_shape(lanes)) == 2:
            return True
        return N > 32
    return bool(cfg.rolled_stage_loops)


def _compiler_params(N: int, lanes: int, rolled: bool, n_raw_stage: int = 0):
    """Explicit Mosaic VMEM budget for large lane tiles.

    The v5e has 128 MiB of physical VMEM but Mosaic's DEFAULT budget is
    ~16 MiB — which is exactly what made ``lanes >= 512`` tiles at N = 30
    "fail to compile" (remote tpu_compile_helper exit 1, no message through
    the tunnel): the kernel's blocks + scratch are stage-linear and cross
    ~18 MiB there, while N <= 16 at 1024 lanes compiles and runs fine
    (measured r4).  Passing the computed need lifts the cap; the default
    16 MiB stays for small tiles so the pipeliner keeps its double-buffer
    headroom."""
    S, NWl, NXl = N + 1, NW, NX
    per_lane = (
        # inputs: either the packed QP (AB..uw) or n_raw_stage raw stage rows
        (N * NXl * NWl + S * NXl + 4 * S * NWl if n_raw_stage == 0
         else n_raw_stage)
        + 4 * S * NWl + 1        # warm carry in
        + 4 * S * NWl + 3        # outputs
        + (N * NXl * NWl * 2 + S * NWl * (NWl + 3) if rolled else 6))
    need = per_lane * 4 * lanes * 2  # x2: pipeliner double-buffering slack
    if need <= 16 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(int(need), 110 * 1024 * 1024))


def _solver_scratch(N: int, lanes: int, rolled: bool):
    """VMEM scratch for the rolled (N > 32) stage loops: stage data /
    factors / substitution buffers.  Total f32 VMEM: (N+1) x (25 + 15) x
    lanes x 4 B + 2N x 15 x lanes — linear in N (~7 MB at N=100, 128
    lanes), which is what lets horizons >> 30 fit the 16 MB budget.  The
    N <= 32 fast path keeps everything in SSA values instead; its scratch
    is minimal placeholders (the kernel never touches them)."""
    f32 = jnp.float32
    ls = _lane_shape(lanes)
    if not rolled:
        return [
            pltpu.VMEM((1, 1, 1) + ls, f32),  # AB_s (unused)
            pltpu.VMEM((1, 1, 1) + ls, f32),  # C_s (unused)
            pltpu.VMEM((1, 1) + ls, f32),  # diag_s (unused)
            pltpu.VMEM((1, 1, 1) + ls, f32),  # Sinv_s (unused)
            pltpu.VMEM((1, 1) + ls, f32),  # v_s (unused)
            pltpu.VMEM((1, 1) + ls, f32),  # w_s (unused)
        ]
    return [
        pltpu.VMEM((N, NX, NW) + ls, f32),  # AB_s (stage-indexed reads)
        pltpu.VMEM((N, NX, NW) + ls, f32),  # C_s (coupling, per factor)
        pltpu.VMEM((N + 1, NW) + ls, f32),  # diag_s
        pltpu.VMEM((N + 1, NW, NW) + ls, f32),  # Sinv_s
        pltpu.VMEM((N + 1, NW) + ls, f32),  # v_s (forward substitution)
        pltpu.VMEM((N + 1, NW) + ls, f32),  # w_s (backward substitution)
    ]


def _pack_qp(qp: LTVQP):
    """(B, stages, ...) LTVQP -> kernel layout (stages, ..., B) tensors."""
    B = qp.A.shape[0]
    N = qp.N
    to_lanes = lambda a, perm: jnp.transpose(a, perm)

    AB = jnp.concatenate([qp.A, qp.B], axis=-1)  # (B, N, 3, 5)
    AB = to_lanes(AB, (1, 2, 3, 0))  # (N, 3, 5, B)
    beq = to_lanes(qp.beq, (1, 2, 0))  # (N+1, 3, B)

    def pack_stage_vec(x_part, u_part):
        # (B, N+1, 3) + (B, N, 2) -> (N+1, 5, B)
        u_pad = jnp.concatenate(
            [u_part, jnp.zeros_like(u_part[:, :1])], axis=1)  # (B, N+1, 2)
        w = jnp.concatenate([x_part, u_pad], axis=-1)  # (B, N+1, 5)
        return to_lanes(w, (1, 2, 0))

    Pd = pack_stage_vec(qp.P_x, qp.P_u)
    qv = pack_stage_vec(qp.q_x, qp.q_u)
    # pad variable (u-slot of stage N) gets [-inf, inf] bounds and zero cost
    inf = jnp.inf
    lw = pack_stage_vec(qp.lx, qp.lu)
    uw = pack_stage_vec(qp.ux, qp.uu)
    lw = lw.at[N, NX:].set(-inf)
    uw = uw.at[N, NX:].set(inf)
    return AB, beq, Pd, qv, lw, uw


def _pack_carry(c: SolverCarry):
    u_pad = jnp.concatenate([c.U, jnp.zeros_like(c.U[:, :1])], axis=1)
    W = jnp.concatenate([c.X, u_pad], axis=-1)
    zu_pad = jnp.concatenate([c.Zu, jnp.zeros_like(c.Zu[:, :1])], axis=1)
    Zw = jnp.concatenate([c.Zx, zu_pad], axis=-1)
    yu_pad = jnp.concatenate([c.Yu, jnp.zeros_like(c.Yu[:, :1])], axis=1)
    Yw = jnp.concatenate([c.Yx, yu_pad], axis=-1)
    t = lambda a: jnp.transpose(a, (1, 2, 0))
    return t(W), t(Zw), t(c.Yeq), t(Yw), c.rho[None, :]  # rho: (1, B)


def _dispatch_tiles(kernel, raw, block_shapes, out_blocks, N: int,
                    cfg: SolverConfig, lanes: int, Bp: int, interpret: bool,
                    n_raw_stage: int = 0):
    """Run ``kernel`` over all ``Bp // lanes`` lane tiles.

    ``raw``: input arrays with a trailing contiguous batch axis (..., Bp).
    1-D lane tiles dispatch as a classic multi-tile ``pallas_call`` grid.
    2-D ``(S, 128)`` packed tiles dispatch as ``lax.map`` of a
    SINGLE-TILE ``pallas_call``: the identical kernel body at grid=(1,)
    compiles where the multi-tile pipelined grid blows up the Mosaic
    backend (round-5 bisection, see :func:`_lane_shape`), and tiles run
    sequentially either way on a TPU core.  Returns output arrays with the
    trailing batch axis flattened back to (..., Bp)."""
    lblk = _lane_shape(lanes)
    rolled = _use_rolled(N, cfg, lanes)
    cp = _compiler_params(N, lanes, rolled, n_raw_stage=n_raw_stage)
    n_tiles = Bp // lanes
    f32 = jnp.float32

    if len(lblk) == 2:
        S_sub, LW = lblk

        def to_tiles(a):  # (..., Bp) -> (tiles, ..., S, 128)
            a = a.reshape(a.shape[:-1] + (n_tiles, S_sub, LW))
            return jnp.moveaxis(a, -3, 0)

        def spec1(s):
            return pl.BlockSpec(s + lblk,
                                (lambda i, _n=len(s) + 2: (0,) * _n),
                                memory_space=pltpu.VMEM)

        call = pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(1,),
                in_specs=[spec1(s) for s in block_shapes],
                out_specs=[spec1(s) for s in out_blocks],
                scratch_shapes=_solver_scratch(N, lanes, rolled),
            ),
            out_shape=[jax.ShapeDtypeStruct(s + lblk, f32)
                       for s in out_blocks],
            interpret=interpret,
            **({"compiler_params": cp} if cp is not None else {}),
        )
        # tiles dispatched as a PYTHON loop of identical single-tile calls
        # (static, small n_tiles): XLA compiles the Mosaic kernel once and
        # emits n_tiles custom-calls.  A lax.map/scan wrapper instead makes
        # the whole program fail remote compilation at n_tiles > 1
        # (measured r5: scan length 4 -> tpu_compile_helper exit 1 in 3 s
        # with the kernel itself already compiled; lengths 1 and the plain
        # call both fine).
        tiles_in = tuple(to_tiles(a) for a in raw)
        per_tile = [call(*(a[i] for a in tiles_in))
                    for i in range(n_tiles)]
        outs = [jnp.stack(parts) for parts in zip(*per_tile)]

        def from_tiles(a):  # (tiles, ..., S, 128) -> (..., Bp)
            a = jnp.moveaxis(a, 0, -3)
            return a.reshape(a.shape[:-3] + (Bp,))

        return tuple(from_tiles(o) for o in outs)

    def spec(s):
        return pl.BlockSpec(s + lblk,
                            (lambda i, _n=len(s): (0,) * _n + (i,)),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[spec(s) for s in block_shapes],
            out_specs=[spec(s) for s in out_blocks],
            scratch_shapes=_solver_scratch(N, lanes, rolled),
        ),
        out_shape=[jax.ShapeDtypeStruct(s + (Bp,), f32)
                   for s in out_blocks],
        interpret=interpret,
        **({"compiler_params": cp} if cp is not None else {}),
    )(*raw)


@functools.partial(jax.jit, static_argnames=("cfg", "lanes", "interpret"))
def solve_ltv_qp_pallas(qp: LTVQP, warm: SolverCarry, cfg: SolverConfig,
                        lanes: int | None = None,
                        interpret: bool = False) -> LTVSolution:
    """Batched solve: ``qp``/``warm`` carry a leading batch axis B (padded to
    a multiple of ``lanes``; ``None`` = auto, see :func:`resolve_lanes`).
    Drop-in replacement for ``vmap(solve_ltv_qp)`` on the hot path."""
    B = qp.A.shape[0]
    lanes = resolve_lanes(B, lanes)
    N = qp.N
    pad = (-B) % lanes
    if pad:
        qp = jax.tree.map(lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0), qp)
        warm = jax.tree.map(lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0), warm)
    Bp = B + pad

    AB, beq, Pd, qv, lw, uw = _pack_qp(qp)
    W0, Zw0, Yeq0, Yw0, rho0 = _pack_carry(warm)

    block_shapes = [
        (N, NX, NW),   # AB
        (N + 1, NX),   # beq
        (N + 1, NW),   # Pd
        (N + 1, NW),   # qv
        (N + 1, NW),   # lw
        (N + 1, NW),   # uw
        (N + 1, NW),   # W0
        (N + 1, NW),   # Zw0
        (N + 1, NX),   # Yeq0
        (N + 1, NW),   # Yw0
        (1,),          # rho0
    ]
    out_blocks = [
        (N + 1, NW),   # W
        (N + 1, NW),   # Zw
        (N + 1, NX),   # Yeq
        (N + 1, NW),   # Yw
        (1,),          # rho
        (1,),          # rp
        (1,),          # rd
    ]
    raw = (AB, beq, Pd, qv, lw, uw, W0, Zw0, Yeq0, Yw0, rho0)
    W, Zw, Yeq, Yw, rho, rp, rd = _dispatch_tiles(
        _make_kernel(N, cfg, lanes=lanes), raw, block_shapes, out_blocks,
        N, cfg, lanes, Bp, interpret)

    # unpack back to (B, stages, ...) and trim padding
    t = lambda a: jnp.transpose(
        a.reshape(a.shape[:2] + (Bp,)), (2, 0, 1))[:B]
    Wb = t(W)
    Zwb = t(Zw)
    Yeqb = t(Yeq)
    Ywb = t(Yw)
    X = Wb[..., :NX]
    U = Wb[..., :-1, NX:]
    flat1 = lambda a: a.reshape(Bp)[:B]
    rp = flat1(rp)
    rd = flat1(rd)
    rho_b = flat1(rho)

    finite = jnp.isfinite(Wb).all(axis=(-2, -1))
    eps_p = cfg.eps_abs + cfg.eps_rel * jnp.max(jnp.abs(Wb), axis=(-2, -1))
    eps_d = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
        jnp.max(jnp.abs(qp.q_x[:B]), axis=(-2, -1)),
        jnp.max(jnp.abs(qp.q_u[:B]), axis=(-2, -1)))
    converged = (rp <= eps_p) & (rd <= eps_d)
    status = jnp.where(~finite, admm_mod.DIVERGED,
                       jnp.where(converged, admm_mod.SOLVED,
                                 admm_mod.MAX_ITER)).astype(jnp.int32)

    fresh = SolverCarry(
        X=jnp.zeros_like(X), U=jnp.zeros_like(U),
        Zx=jnp.zeros_like(X), Zu=jnp.zeros_like(U),
        Yeq=jnp.zeros_like(Yeqb), Yx=jnp.zeros_like(X),
        Yu=jnp.zeros_like(U), rho=jnp.full_like(rho_b, cfg.rho))
    carry = SolverCarry(X=X, U=U, Zx=Zwb[..., :NX], Zu=Zwb[..., :-1, NX:],
                        Yeq=Yeqb, Yx=Ywb[..., :NX], Yu=Ywb[..., :-1, NX:],
                        rho=rho_b)
    carry = jax.tree.map(
        lambda a, z: jnp.where(
            finite.reshape((-1,) + (1,) * (a.ndim - 1)) if a.ndim > 1
            else finite, a, z),
        carry, fresh)
    return LTVSolution(X=X, U=U, status=status, r_prim=rp, r_dual=rd,
                       carry=carry)


# ---------------------------------------------------------------------------
# Fused-assembly entry point: raw horizon data in, solution out
# ---------------------------------------------------------------------------

def _make_builder(N: int, mpc_cfg, model_cfg):
    """In-kernel QP constructor from raw per-stage data (the fused analogue
    of mpc.assemble_ltv_qp + the host-side packing; MPC.py:61-155)."""
    Q0, Q1, Q2 = (float(v) for v in mpc_cfg.Q)
    QN0, QN1, QN2 = (float(v) for v in mpc_cfg.QN)
    R0, R1 = (float(v) for v in mpc_cfg.R)
    xmin = tuple(float(v) for v in mpc_cfg.xmin)
    xmax = tuple(float(v) for v in mpc_cfg.xmax)
    v_min = float(mpc_cfg.v_min)
    v_max = float(mpc_cfg.v_max)
    ay_max = float(mpc_cfg.ay_max)
    kmax = float(mpc_cfg.kappa_max(model_cfg.length))
    inf = float(jnp.inf)

    def build(v, k, ds, lbc, ubc, x0, kp):
        # v/k/ds: (N, *LS) horizon v_ref / kappa_ref / delta_s
        # lbc/ubc: (N, *LS) corridor bounds for x_1..x_N
        # x0: (3, *LS) measured spatial state; kp: (N, *LS) kappa predictions
        LS = v.shape[1:]
        dt = v.dtype
        zN = jnp.zeros_like(v)
        oN = jnp.ones_like(v)

        def full(val, rows):
            return jnp.full((rows,) + LS, val, dt)

        # stage matrices [A_n | B_n] (spatial_bicycle_models.py:404-417)
        r0 = jnp.stack([oN, ds, zN, zN, zN], axis=1)
        r1 = jnp.stack([-(k * k) * ds, oN, zN, zN, ds], axis=1)
        r2 = jnp.stack([-(k / v) * ds, zN, oN, -ds / (v * v), zN], axis=1)
        AB = jnp.stack([r0, r1, r2], axis=1)  # (N, 3, 5, L)

        # equality rhs: uq = B ur - f = (0, ds k, -2 ds / v)
        uq = jnp.stack([zN, ds * k, -2.0 * ds / v], axis=1)  # (N, 3, L)
        beq = jnp.concatenate([-x0[None], uq], axis=0)  # (N+1, 3, L)

        # diagonal cost
        Pd_body = jnp.stack([full(Q0, N), full(Q1, N),
                             full(Q2, N), full(R0, N),
                             full(R1, N)], axis=1)
        Pd_N = jnp.stack([full(QN0, 1), full(QN1, 1),
                          full(QN2, 1), full(0.0, 1),
                          full(0.0, 1)], axis=1)
        Pd = jnp.concatenate([Pd_body, Pd_N], axis=0)  # (N+1, 5, L)

        # linear cost: e_y center-line reference + input references
        ctr = 0.5 * (lbc + ubc)  # (N, L) for stages 1..N
        ey_col = jnp.concatenate([full(0.0, 1), -Q0 * ctr[:-1],
                                  -QN0 * ctr[-1:]], axis=0)  # (N+1, L)
        zc = jnp.zeros((N + 1,) + LS, dt)
        qu_v = jnp.concatenate([-R0 * v, full(0.0, 1)], axis=0)
        qu_k = jnp.concatenate([-R1 * k, full(0.0, 1)], axis=0)
        qv = jnp.stack([ey_col, zc, zc, qu_v, qu_k], axis=1)  # (N+1, 5, L)

        # bounds: e_y pinned at stage 0, corridor rows after; dynamic v cap
        l_ey = jnp.concatenate([x0[0:1], lbc], axis=0)  # (N+1, L)
        u_ey = jnp.concatenate([x0[0:1], ubc], axis=0)
        vmax_dyn = jnp.minimum(v_max, jnp.sqrt(ay_max / (jnp.abs(kp) + 1e-12)))
        l_v = jnp.concatenate([full(v_min, N), full(-inf, 1)], axis=0)
        u_v = jnp.concatenate([vmax_dyn, full(inf, 1)], axis=0)
        l_k = jnp.concatenate([full(-kmax, N), full(-inf, 1)], axis=0)
        u_k = jnp.concatenate([full(kmax, N), full(inf, 1)], axis=0)
        lw = jnp.stack([l_ey, full(xmin[1], N + 1),
                        full(xmin[2], N + 1), l_v, l_k], axis=1)
        uw = jnp.stack([u_ey, full(xmax[1], N + 1),
                        full(xmax[2], N + 1), u_v, u_k], axis=1)

        # certified violation floor by interval reachability — the exact
        # recurrence of mpc.violation_floor over the same horizon data,
        # Python-unrolled (stage-indexing a VALUE with a traced index has
        # no Mosaic lowering) and gated by the collapsed-corridor test like
        # mpc.corridor_violation_floor
        y_lo = y_hi = x0[0]
        p_lo = p_hi = x0[1]
        viol_max = jnp.zeros_like(x0[0])
        for n in range(N):
            kn = k[n]
            dn = ds[n]
            ny_lo = y_lo + dn * p_lo
            ny_hi = y_hi + dn * p_hi
            c = -(kn * kn) * dn
            t_lo = jnp.minimum(c * y_lo, c * y_hi)
            t_hi = jnp.maximum(c * y_lo, c * y_hi)
            np_lo = t_lo + p_lo + dn * (-kmax - kn)
            np_hi = t_hi + p_hi + dn * (kmax - kn)
            viol = jnp.maximum(0.0, jnp.maximum(lbc[n] - ny_hi,
                                                ny_lo - ubc[n]))
            viol_max = jnp.maximum(viol_max, viol)
            y_lo, y_hi, p_lo, p_hi = ny_lo, ny_hi, np_lo, np_hi
        width_ok = jnp.all(ubc - lbc > 0.0, axis=0)
        floor_v = jnp.where(width_ok, viol_max, 0.0)
        return AB, beq, Pd, qv, lw, uw, floor_v

    return build


@functools.partial(jax.jit, static_argnames=("cfg", "mpc_cfg", "model_cfg",
                                              "lanes", "interpret",
                                              "return_floor"))
def solve_mpc_qp_fused(v_ref, kappa_ref, delta_s, lb_c, ub_c, x0, kappa_pred,
                       warm: SolverCarry, cfg: SolverConfig, mpc_cfg,
                       model_cfg, lanes: int | None = None,
                       interpret: bool = False,
                       return_floor: bool = False):
    """Fully fused control-QP solve: assembly + ADMM in one kernel.

    Inputs carry a leading batch axis B: ``v_ref/kappa_ref/delta_s`` (B, N)
    gathered horizon data, ``lb_c/ub_c`` (B, N) corridor bounds, ``x0``
    (B, 3) measured spatial state, ``kappa_pred`` (B, N).  Compared to
    ``solve_ltv_qp_pallas`` this skips materializing the (B, N, 3, 5)-sized
    LTVQP tensors in HBM and the host-side packing transposes.

    ``return_floor=True`` additionally returns the per-lane certified
    violation floor (``(sol, floor)``) computed IN-KERNEL from the same
    VMEM-resident horizon data — the external
    ``mpc.corridor_violation_floor`` recurrence costs ~1 ms/step at B=4096
    (18% of the r5 headline step, measured).
    """
    N = v_ref.shape[-1]
    B = v_ref.shape[0]
    lanes = resolve_lanes(B, lanes)
    pad = (-B) % lanes
    if pad:
        padrep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
        v_ref, kappa_ref, delta_s, lb_c, ub_c, x0, kappa_pred = (
            padrep(a) for a in (v_ref, kappa_ref, delta_s, lb_c, ub_c, x0,
                                kappa_pred))
        warm = jax.tree.map(padrep, warm)
    Bp = B + pad

    t = lambda a: jnp.transpose(a, (1, 0))
    raw = (t(v_ref), t(kappa_ref), t(delta_s), t(lb_c), t(ub_c),
           t(x0), t(kappa_pred)) + _pack_carry(warm)

    build = _make_builder(N, mpc_cfg, model_cfg)
    kernel = _make_kernel(N, cfg, build=build, n_raw=7, lanes=lanes)
    block_shapes = [(N,), (N,), (N,), (N,), (N,), (NX,), (N,),
                    (N + 1, NW), (N + 1, NW), (N + 1, NX),
                    (N + 1, NW), (1,)]
    out_blocks = [(N + 1, NW), (N + 1, NW), (N + 1, NX),
                  (N + 1, NW), (1,), (1,), (1,), (1,)]
    W, Zw, Yeq, Yw, rho, rp, rd, floor = _dispatch_tiles(
        kernel, raw, block_shapes, out_blocks, N, cfg, lanes, Bp, interpret,
        n_raw_stage=6 * N + NX)

    tb = lambda a: jnp.transpose(
        a.reshape(a.shape[:2] + (Bp,)), (2, 0, 1))[:B]
    Wb = tb(W)
    Zwb = tb(Zw)
    Yeqb = tb(Yeq)
    Ywb = tb(Yw)
    X = Wb[..., :NX]
    U = Wb[..., :-1, NX:]
    flat1 = lambda a: a.reshape(Bp)[:B]
    rp = flat1(rp)
    rd = flat1(rd)
    rho_b = flat1(rho)
    floor = flat1(floor)

    finite = jnp.isfinite(Wb).all(axis=(-2, -1))
    eps_p = cfg.eps_abs + cfg.eps_rel * jnp.max(jnp.abs(Wb), axis=(-2, -1))
    # |q| bound from the raw data (q rows are -Q*ctr / -R*refs)
    Q0 = float(mpc_cfg.Q[0])
    QN0 = float(mpc_cfg.QN[0])
    R0, R1 = (float(x) for x in mpc_cfg.R)
    ctr = 0.5 * (lb_c[:B] + ub_c[:B])
    qmax = jnp.maximum(
        jnp.max(jnp.abs(ctr), axis=-1) * max(Q0, QN0),
        jnp.maximum(jnp.max(jnp.abs(v_ref[:B]), axis=-1) * R0,
                    jnp.max(jnp.abs(kappa_ref[:B]), axis=-1) * R1))
    eps_d = cfg.eps_abs + cfg.eps_rel * qmax
    converged = (rp <= eps_p) & (rd <= eps_d)
    status = jnp.where(~finite, admm_mod.DIVERGED,
                       jnp.where(converged, admm_mod.SOLVED,
                                 admm_mod.MAX_ITER)).astype(jnp.int32)

    fresh = SolverCarry(
        X=jnp.zeros_like(X), U=jnp.zeros_like(U),
        Zx=jnp.zeros_like(X), Zu=jnp.zeros_like(U),
        Yeq=jnp.zeros_like(Yeqb), Yx=jnp.zeros_like(X),
        Yu=jnp.zeros_like(U), rho=jnp.full_like(rho_b, cfg.rho))
    carry = SolverCarry(X=X, U=U, Zx=Zwb[..., :NX], Zu=Zwb[..., :-1, NX:],
                        Yeq=Yeqb, Yx=Ywb[..., :NX], Yu=Ywb[..., :-1, NX:],
                        rho=rho_b)
    carry = jax.tree.map(
        lambda a, z: jnp.where(
            finite.reshape((-1,) + (1,) * (a.ndim - 1)) if a.ndim > 1
            else finite, a, z),
        carry, fresh)
    sol = LTVSolution(X=X, U=U, status=status, r_prim=rp, r_dual=rd,
                      carry=carry)
    return (sol, floor) if return_floor else sol
