"""Roofline for the headline solver: what fraction of the chip's attainable
ceiling does the fused ADMM kernel reach, and what steps/s ceiling does that
imply for the batch-4096 bench? (VERDICT r3 weak #4 / next #5.)

The MPC stage math is 5x5-block work — MXU-MFU is ~0 by construction, so the
honest ceilings are (a) VPU throughput and (b) HBM bandwidth.  Spec sheets
for those are less defensible than the chip itself, so everything here is
MEASURED on the attached device:

* ``vpu_peak``   — a Pallas kernel issuing a pure dependent-FMA chain over a
  VMEM-resident (256, 128) block per program, 8-way ILP so the chain is
  issue-bound rather than latency-bound: the attainable f32 VPU ceiling.
* ``hbm_bw``     — a streaming ``2x-read -> write`` jitted map over 256 MB:
  the attainable HBM ceiling.
* ``admm_iter``  — per-ADMM-iteration kernel time at production shapes
  (N=30, B=4096), isolated by differencing two iteration budgets (same
  factorizations, same residual passes — only the iteration body differs).
* ``iter_flops`` — per-iteration FLOPs of the SAME algorithm, taken from
  XLA's own cost analysis of the pure-XLA solver (ops/ltv_qp.py implements
  the identical iteration body), again differenced between two budgets so
  assembly/factorization/residual flops cancel.

Achieved fraction = (iter_flops * B / admm_iter_time) / vpu_peak.  The
implied headline ceiling extrapolates the bench's steps/s by the solver's
measured share of the step at a perfect-VPU solver.

Run on the real TPU: ``python tools/roofline.py`` (add ``--json`` for one
machine-readable line; bench.py --roofline calls into this module).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fence(*outs):
    for x in jax.tree.leaves(outs):
        np.asarray(x.ravel()[0] if getattr(x, "ndim", 0) else x)


def _median_time(fn, reps=5):
    fn()  # warm / compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


# ---------------------------------------------------------------------------
# Attainable ceilings, measured
# ---------------------------------------------------------------------------

def measure_vpu_peak_once(rows: int = 256, chains: int = 8, k: int = 512,
                          grid: int = 512, interpret: bool = False):
    """Attainable f32 VPU FLOP/s: ``grid`` programs, each running ``k``
    rounds of ``chains`` independent dependent-FMA chains over a
    (rows, 128) VMEM block.  ``chains``-way ILP hides FMA latency so the
    measurement is issue-slot-bound; FLOPs = 2 * rows * 128 * chains * k
    per program (an FMA is one issue slot, two FLOPs — both numbers are
    reported)."""
    shape = (rows, 128)

    def kernel(x_ref, o_ref):
        xs = [x_ref[:, :] + jnp.float32(0.001 * c) for c in range(chains)]
        a = jnp.float32(1.000001)
        b = jnp.float32(1e-7)

        # manual 4x in-body unroll: Mosaic's fori_loop lowering only
        # supports unroll=1 (or full unroll), so amortize the loop
        # bookkeeping by hand
        def body(_, xs):
            for _ in range(4):
                xs = tuple(x * a + b for x in xs)
            return xs

        xs = jax.lax.fori_loop(0, k // 4, body, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:, :] = acc

    f = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )
    x = jnp.full(shape, 0.5, jnp.float32)
    dt = _median_time(lambda: _fence(f(x)))
    fmas = rows * 128 * chains * k * grid
    return dict(vpu_peak_flops=2 * fmas / dt, vpu_peak_fma_slots=fmas / dt,
                wall_s=dt)


def measure_vpu_peak():
    """Max over (block, ILP) shapes — a true attainable ceiling must
    upper-bound every real kernel.  The r4 single-config (256-row blocks,
    8 chains) measurement gave 1.43 Tflop/s, which the packed production
    solver then EXCEEDED (2.33 achieved): 8 chains x 32 vregs/block = 256+
    live vregs spill to VMEM every op, so that config measures VMEM
    traffic, not issue slots.  Small (8, 128) one-vreg blocks with many
    independent chains keep the live set in registers; sweep and keep the
    best."""
    best = None
    for rows, chains, k in ((256, 8, 512), (256, 16, 256),
                            (8, 64, 2048), (8, 128, 1024), (16, 64, 1024)):
        r = measure_vpu_peak_once(rows=rows, chains=chains, k=k)
        if best is None or r["vpu_peak_flops"] > best["vpu_peak_flops"]:
            best = r
    return best


def measure_dispatch_floor():
    """Round-trip cost of ONE dispatched-and-fenced trivial jitted call
    through the remote execution tunnel — the additive floor every
    single-call timing on this platform carries (measured r4: ~28 ms; it
    dominated the recorded 'admm_solve_ms' and the single-map HBM number)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((8,), jnp.float32)
    return _median_time(lambda: _fence(f(x)))


def measure_hbm_bw(mb: int = 256, k: int = 128):
    """Attainable HBM bytes/s: ``k`` rounds of a streaming map (2 reads +
    1 write per element -> 12 bytes/f32) over ``mb`` MB inputs, all inside
    ONE jitted call — a single dispatch costs ~30 ms through the remote-
    execution tunnel, so per-call timing of one 256 MB map measures the
    tunnel, not HBM (measured r4: 21.9 "GB/s" single-map vs ~700 looped)."""
    n = mb * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32)
    y = x * 0.5

    @jax.jit
    def f(x, y):
        # each round re-reads the carry + y from HBM and writes the carry
        # back (the arrays are far beyond any on-chip residency)
        return jax.lax.fori_loop(
            0, k, lambda _, acc: acc * jnp.float32(1.0000001) + y, x)

    dt = _median_time(lambda: _fence(f(x, y)))
    return dict(hbm_bw_bytes=12.0 * n * k / dt, wall_s=dt)


# ---------------------------------------------------------------------------
# The kernel under test
# ---------------------------------------------------------------------------

def _scenario(batch: int):
    from multi_purpose_mpc_tpu.config import sim_track_preset
    from multi_purpose_mpc_tpu.models.bicycle import init_car_state
    from multi_purpose_mpc_tpu.mpc import mpc_corridor, mpc_locate, mpc_pre_solve
    from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments
    from multi_purpose_mpc_tpu.ops.path import build_reference_path
    from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
    from multi_purpose_mpc_tpu.utils.maps import add_obstacles_host, load_grid_map

    map_cfg, path_cfg, model_cfg, cfg, speed_cfg, obstacles = (
        sim_track_preset(asset_dir="/root/repo/assets/maps"))
    grid = load_grid_map(map_cfg)
    path = build_reference_path(grid, path_cfg)
    grid = add_obstacles_host(grid, map_cfg.origin, map_cfg.resolution,
                              obstacles)
    path = compute_speed_profile(path, speed_cfg)
    segs = extract_all_segments(grid, path, 2 * model_cfg.safety_margin,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)
    rng = np.random.default_rng(3)
    e0 = jnp.asarray(rng.uniform(-0.02, 0.02, batch), jnp.float32)
    wp0 = jnp.asarray((np.arange(batch) * 7) % path.n_wp, jnp.int32)
    states = jax.vmap(lambda e, w: init_car_state(path, cfg.N, e_y=e, wp_id=w)
                      )(e0, wp0)
    located = jax.vmap(lambda s: mpc_locate(s, path))(states)
    cor = jax.vmap(lambda w: mpc_corridor(w, path, grid, cfg, model_cfg,
                                          segs))(located[0])
    qp, _ = jax.vmap(lambda s, loc, c: mpc_pre_solve(
        s, path, grid, cfg, model_cfg, segs, located=loc, corridor=c))(
        states, located, cor)
    return qp, states.solver, cfg


def measure_admm_iteration(batch: int = 4096, extra: int = 30,
                           chain: int = 8, chain0: int = 2):
    """Per-solve and per-ADMM-iteration DEVICE time at production shapes.

    Measurement discipline (round 5): a single dispatched call on this
    platform costs ~30 ms REGARDLESS of device compute below that scale —
    a 30-iteration and a 60-iteration batch-4096 solve time identically
    (30.05 vs 29.80 ms wall), so single-call timings and their differences
    measure the tunnel, not the kernel (r4's recorded 73.7 us/iteration was
    such an artifact).  Here K solves are CHAINED inside one jitted
    ``lax.scan`` (each warm-started from the previous carry — a real data
    dependency, so nothing folds), and both the dispatch floor and the
    scan overhead cancel in the (K - K0) difference:

        per_solve = (T(K) - T(K0)) / (K - K0)

    Per-iteration time differences per_solve across two iteration budgets
    (identical factorization/residual/I-O work)."""
    from multi_purpose_mpc_tpu.ops.admm_pallas import solve_ltv_qp_pallas

    qp, warm, cfg = _scenario(batch)
    base = cfg.solver

    def chained(k, scfg):
        @jax.jit
        def run(qp, w0):
            def body(w, _):
                sol = solve_ltv_qp_pallas(qp, w, scfg,
                                          lanes=scfg.kernel_lanes)
                return sol.carry, sol.r_prim
            _, rp = jax.lax.scan(body, w0, None, length=k)
            return rp

        return run

    def per_solve(scfg):
        f_long = chained(chain, scfg)
        f_short = chained(chain0, scfg)
        t_long = _median_time(lambda: _fence(f_long(qp, warm)))
        t_short = _median_time(lambda: _fence(f_short(qp, warm)))
        return max(t_long - t_short, 1e-12) / (chain - chain0)

    s1 = per_solve(base)
    s2 = per_solve(dataclasses.replace(base,
                                       iterations=base.iterations + extra))
    n_extra = base.rho_updates * extra  # extra iterations across rho rounds
    per_iter = max(s2 - s1, 1e-12) / n_extra
    total_iters = (base.rho_updates * base.iterations + base.polish_iters)
    return dict(batch=batch, per_iter_s=per_iter, solve_s=s1,
                iters_per_solve=total_iters,
                iter_share=min(per_iter * total_iters / s1, 1.0))


# -- jaxpr FLOP counter ------------------------------------------------------
# XLA's compiled cost_analysis() returns zero flops through the axon remote
# backend (measured r4: iter_flops_per_lane 0.0 in ROOFLINE.json), so the
# count is taken from the traced jaxpr instead: 1 flop per element per
# arithmetic primitive, 2*b*m*n*k for dot_general, scan bodies multiplied by
# their static trip count.  Comparisons/selects/copies count zero — the
# number is a FLOP count, not an issue-slot count, so the derived
# vpu_fraction is a LOWER bound (un-fused mul+add pairs spend 2 issue slots
# per 2 flops where the peak kernel's FMA spends 1).

_EW1 = {"add", "sub", "mul", "div", "neg", "abs", "max", "min", "exp",
        "log", "sqrt", "rsqrt", "tanh", "logistic", "sign", "floor",
        "ceil", "round", "sin", "cos", "pow", "atan2", "rem", "square",
        "erf", "expm1", "log1p"}

_REDUCE = {"reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
           "cumsum", "cumlogsumexp", "cummax", "cummin", "argmax", "argmin"}


def _aval_size(aval) -> float:
    return float(np.prod(aval.shape)) if aval.shape else 1.0


def _count_jaxpr(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        p = eqn.primitive.name
        params = eqn.params
        if p in ("pjit", "closed_call", "custom_jvp_call", "custom_vjp_call",
                 "remat", "checkpoint", "custom_vjp_call_jaxpr"):
            inner = params.get("jaxpr") or params.get("call_jaxpr")
            if inner is None:
                continue
            total += _count_jaxpr(getattr(inner, "jaxpr", inner))
        elif p == "scan":
            total += params["length"] * _count_jaxpr(params["jaxpr"].jaxpr)
        elif p == "while":
            # no static trip count: count ONE pass (documented lower bound;
            # the solver bodies under measurement use scan/fori only)
            total += _count_jaxpr(params["body_jaxpr"].jaxpr)
        elif p == "cond":
            total += max(_count_jaxpr(b.jaxpr) for b in params["branches"])
        elif p in _EW1:
            total += _aval_size(eqn.outvars[0].aval)
        elif p == "clamp":
            total += 2.0 * _aval_size(eqn.outvars[0].aval)
        elif p == "integer_pow":
            total += max(params["y"] - 1, 1) * _aval_size(eqn.outvars[0].aval)
        elif p == "dot_general":
            (lc, rc), (lb, _rb) = params["dimension_numbers"]
            lhs = eqn.invars[0].aval
            rhs = eqn.invars[1].aval
            m = np.prod([lhs.shape[i] for i in range(lhs.ndim)
                         if i not in set(lc) | set(lb)] or [1.0])
            n = np.prod([rhs.shape[i] for i in range(rhs.ndim)
                         if i not in set(rc) | set(lb)] or [1.0])
            k = np.prod([lhs.shape[i] for i in lc] or [1.0])
            b = np.prod([lhs.shape[i] for i in lb] or [1.0])
            total += 2.0 * b * m * n * k
        elif p in _REDUCE:
            total += _aval_size(eqn.invars[0].aval)
    return total


def _kernel_jaxprs(jaxpr, out=None):
    """Collect every pallas_call kernel jaxpr (with its grid size) reachable
    from ``jaxpr``."""
    if out is None:
        out = []
    for eqn in jaxpr.eqns:
        p = eqn.primitive.name
        params = eqn.params
        if p == "pallas_call":
            grid = params["grid_mapping"].grid
            n = float(np.prod([g for g in grid if isinstance(g, int)] or [1]))
            out.append((params["jaxpr"].jaxpr
                        if hasattr(params["jaxpr"], "jaxpr")
                        else params["jaxpr"], n))
        else:
            for key in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr"):
                inner = params.get(key)
                if inner is not None:
                    _kernel_jaxprs(getattr(inner, "jaxpr", inner), out)
            for b in params.get("branches", ()):
                _kernel_jaxprs(getattr(b, "jaxpr", b), out)
    return out


def count_kernel_flops(lanes: int = 1024):
    """FLOPs per lane of ONE production fused-solver call, counted from the
    ACTUAL Pallas kernel jaxpr (factorizations x rho rounds + all iteration
    bodies + polish + residual passes — everything the kernel executes),
    not the XLA analogue.  Traced at B = ``lanes`` (one tile); the kernel
    body is identical per tile, so flops/lane is batch-invariant.  Default
    1024 = the packed production tier (rolled body; the 128-lane unrolled
    body counts within 0.05% — measured r5: 2,261,452 vs 2,262,505
    flops/lane)."""
    from multi_purpose_mpc_tpu.ops.admm_pallas import solve_ltv_qp_pallas

    qp, warm, cfg = _scenario(lanes)
    jpr = jax.make_jaxpr(
        lambda q, w: solve_ltv_qp_pallas(q, w, cfg.solver, lanes=lanes))(
        qp, warm)
    kernels = _kernel_jaxprs(jpr.jaxpr)
    assert kernels, "no pallas_call found in the solver trace"
    per_tile = sum(n * _count_jaxpr(k) for k, n in kernels)
    return dict(solve_flops_per_lane=per_tile / lanes)


def count_iteration_flops():
    """Per-iteration FLOPs per lane of the PRODUCTION iteration body:
    ``ltv_qp.admm_iteration`` is the exact body the XLA solver loops over
    (and algorithmically what the fused Pallas kernels run).  Counted from
    the traced jaxpr (see ``_count_jaxpr``) — XLA's compiled cost analysis
    reports 0 flops through the remote axon backend (measured r4)."""
    from multi_purpose_mpc_tpu.ops.ltv_qp import (_build_blocks, _factor,
                                                  admm_iteration)

    qp, warm, cfg = _scenario(1)
    qp = jax.tree.map(lambda a: a[0], qp)  # single lane
    base = cfg.solver
    sigma = jnp.float32(base.sigma)
    alpha = jnp.float32(base.alpha)
    rho = jnp.float32(base.rho)
    rho_eq = rho * base.rho_eq_scale
    is_eq_x = (qp.ux - qp.lx) < 1e-9
    is_eq_u = (qp.uu - qp.lu) < 1e-9
    rho_x = jnp.where(is_eq_x, rho_eq, rho)
    rho_u = jnp.where(is_eq_u, rho_eq, rho)
    D, C = _build_blocks(qp, rho_eq, rho_x, rho_u, sigma)
    Sinv = _factor(D, C)
    N = qp.N
    state = (jnp.zeros((N + 1, 3)), jnp.zeros((N, 2)),
             jnp.zeros((N + 1, 3)), jnp.zeros((N, 2)),
             jnp.zeros((N + 1, 3)), jnp.zeros((N + 1, 3)),
             jnp.zeros((N, 2)))

    jpr = jax.make_jaxpr(
        lambda st: admm_iteration(qp, Sinv, C, rho_eq, rho_x, rho_u,
                                  sigma, alpha, st))(state)
    return dict(iter_flops_per_lane=_count_jaxpr(jpr.jaxpr))


def kernel_hbm_bytes(batch: int = 4096, N: int = 30) -> int:
    """HBM bytes one fused-solver call moves (inputs + outputs + carry; the
    ADMM iterations themselves run on VMEM-resident state — per-iteration
    HBM traffic is zero, which is the point of the kernel)."""
    S, NW, NXU = N + 1, 5, 3
    per_lane_f32 = (
        S * NW * 4          # Pd
        + S * NW            # qv
        + N * NXU * NW      # AB (A|B blocks)
        + S * NXU           # beq
        + 2 * S * NW        # lw / uw bounds
        + 4 * S * NW + 1    # warm carry in: W, Zw, Yeq(3/5 pad), Yw, rho
        + 4 * S * NW + 1    # carry out
        + 2                 # residuals out
    )
    return int(per_lane_f32 * 4 * batch)


# ---------------------------------------------------------------------------
# Report
# ---------------------------------------------------------------------------

def roofline(batch: int = 4096):
    assert jax.default_backend() == "tpu", "roofline is a real-chip measure"
    vpu = measure_vpu_peak()
    hbm = measure_hbm_bw()
    floor = measure_dispatch_floor()
    it = measure_admm_iteration(batch)
    fl = count_iteration_flops()
    kf = count_kernel_flops()

    # solve_s/per_iter_s are chained-difference DEVICE times (the dispatch
    # floor cancels inside measure_admm_iteration; `floor` is reported so
    # single-call walls elsewhere can be read correctly)
    achieved = kf["solve_flops_per_lane"] * batch / it["solve_s"]
    frac = achieved / vpu["vpu_peak_flops"]
    slot_frac = achieved / vpu["vpu_peak_fma_slots"]  # 1 flop ~ 1 issue slot
    # solve-phase HBM intensity: bytes moved once per solve vs solve time
    bytes_per_solve = kernel_hbm_bytes(batch)
    hbm_frac = (bytes_per_solve / it["solve_s"]) / hbm["hbm_bw_bytes"]

    return {
        "vpu_peak_flops": vpu["vpu_peak_flops"],
        "vpu_peak_fma_slots": vpu["vpu_peak_fma_slots"],
        "hbm_bw_bytes": hbm["hbm_bw_bytes"],
        "dispatch_floor_ms": floor * 1e3,
        "admm_iter_us": it["per_iter_s"] * 1e6,
        "admm_solve_ms": it["solve_s"] * 1e3,
        "iter_share_of_solve": it["iter_share"],
        "iter_flops_per_lane": fl["iter_flops_per_lane"],
        "solve_flops_per_lane": kf["solve_flops_per_lane"],
        "achieved_flops": achieved,
        "vpu_fraction": frac,
        "vpu_slot_fraction": slot_frac,
        "kernel_hbm_bytes_per_solve": bytes_per_solve,
        "hbm_fraction_during_solve": hbm_frac,
        "batch": batch,
    }


def main():
    r = roofline()
    if "--json" in sys.argv:
        print(json.dumps(r))
        return
    print(f"measured VPU peak: {r['vpu_peak_flops']/1e12:.2f} Tflop/s "
          f"({r['vpu_peak_fma_slots']/1e12:.2f} Tfma-slots/s)")
    print(f"measured HBM bw:   {r['hbm_bw_bytes']/1e9:.0f} GB/s")
    print(f"dispatch floor:    {r['dispatch_floor_ms']:.1f} ms/call")
    print(f"ADMM kernel: {r['admm_iter_us']:.1f} us/iteration at "
          f"B={r['batch']}, solve {r['admm_solve_ms']:.2f} ms device time "
          f"(chained-difference; "
          f"{r['iter_share_of_solve']*100:.0f}% in the iteration body)")
    print(f"kernel work: {r['solve_flops_per_lane']:.0f} flops/lane/solve, "
          f"{r['iter_flops_per_lane']:.0f} flops/lane/iteration "
          f"(jaxpr counts) -> achieved "
          f"{r['achieved_flops']/1e12:.3f} Tflop/s = "
          f"{r['vpu_fraction']*100:.1f}% of measured VPU peak "
          f"({r['vpu_slot_fraction']*100:.1f}% of issue slots)")
    print(f"kernel HBM traffic: {r['kernel_hbm_bytes_per_solve']/1e6:.1f} MB "
          f"per solve = {r['hbm_fraction_during_solve']*100:.1f}% of HBM bw "
          "during the solve (iterations are VMEM-resident)")


if __name__ == "__main__":
    main()
