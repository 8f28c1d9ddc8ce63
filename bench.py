"""Headline benchmark: closed-loop MPC car-steps/sec at batch 4096 on one chip.

Runs the full sense->corridor->linearize->QP-solve->actuate->integrate loop
(the BASELINE.json metric: "closed-loop MPC steps/sec (linearize+QP+rollout),
single car and batch-4096") as a jitted ``lax.scan`` over a vmapped fleet on
the Sim_Track scenario with obstacles — the obstacle-avoidance config, i.e.
the most expensive one (dynamic corridor extraction every step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 10_000 (the BASELINE.json north-star).

``bench.py --check`` instead runs the COMPILED (no interpret) Pallas kernels
on real scenario QPs and asserts status/residual/U[0]/corridor agreement with
the XLA solver — the Mosaic-lowering correctness gate that CI (CPU,
interpret=True) cannot provide.  Exits non-zero on any mismatch.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from multi_purpose_mpc_tpu.config import SimConfig, sim_track_preset
from multi_purpose_mpc_tpu.ops.path import build_reference_path
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.simulation import init_fleet, simulate_fleet
from multi_purpose_mpc_tpu.utils.maps import add_obstacles_host, load_grid_map

BATCH = 4096
STEPS = 50
NORTH_STAR = 10_000.0  # steps/s at batch 4096 (BASELINE.json)


def main():
    map_cfg, path_cfg, model_cfg, mpc_cfg, speed_cfg, obstacles = (
        sim_track_preset(asset_dir="/root/repo/assets/maps"))
    grid = load_grid_map(map_cfg)
    path = build_reference_path(grid, path_cfg)
    grid = add_obstacles_host(grid, map_cfg.origin, map_cfg.resolution, obstacles)
    path = compute_speed_profile(path, speed_cfg)

    # Monte-Carlo fleet: per-lane perturbed starts along the whole track.
    # Each timed run gets a FRESH fleet — re-invoking with bit-identical
    # inputs returns in ~1 ms on this platform (execution dedup), which
    # would fake a 100x throughput.
    salt = time.time_ns() % (1 << 30)  # the remote execution service caches
    # identical (program, inputs) submissions across processes

    # Physically valid starts: clip each lane's e_y0 into its start
    # waypoint's margin-shrunk corridor.  A raw U(-3cm, 3cm) offset at a
    # random waypoint can place the car inside an obstacle's safety zone —
    # a structurally infeasible QP from step 0 (the r4 diagnosis measured
    # such init transients inflating the rejection rate ~2x).
    from multi_purpose_mpc_tpu.simulation import feasible_starts

    def make_fleet(seed, batch=BATCH):
        rng = np.random.default_rng(seed + salt)
        wp0, e_y0 = feasible_starts(grid, path, mpc_cfg, model_cfg, batch,
                                    rng)
        return init_fleet(path, mpc_cfg.N, batch, e_y0=e_y0, wp_id0=wp0)

    sim = SimConfig(max_steps=STEPS)

    # compile + warm up
    res = simulate_fleet(grid, path, mpc_cfg, model_cfg, sim, make_fleet(0))
    jax.block_until_ready(res)

    times = []
    for seed in (1, 2, 3):
        fleet = make_fleet(seed)
        _ = float(np.asarray(fleet.s).sum())  # materialize inputs
        t0 = time.perf_counter()
        res = simulate_fleet(grid, path, mpc_cfg, model_cfg, sim, fleet)
        # A host transfer of a device-reduced scalar is the only reliable
        # completion fence on this remote-execution platform —
        # block_until_ready returns at dispatch time there.
        _ = float(np.asarray(res.log.x.sum() + res.log.v.sum()))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    car_steps_per_sec = BATCH * STEPS / dt
    active = np.asarray(res.log.active)
    ok = np.asarray(res.log.ok)
    floor = np.asarray(res.log.floor)
    solve_rate = float(ok[active].mean())
    rej = (~ok) & active
    # split the rejections: certified-infeasible QPs (car outside the
    # margin-shrunk corridor — the reference replays there too; the f64
    # oracle rejects ~2.3% of a clean lap the same way) vs true solver
    # failures (feasible QP the budget left unconverged)
    infeas_rate = float((rej & (floor > 0)).sum() / max(active.sum(), 1))
    solver_failure_rate = float((rej & (floor <= 0)).sum()
                                / max(active.sum(), 1))

    # --- fleet-health gates (VERDICT r3 #7): a perf "win" that trades
    # correctness for speed must fail loudly here ---
    failed_lanes = int(np.asarray(res.final_state.failed).sum())
    progress = np.asarray(res.log.s[-1] - res.log.s[0]).mean()
    exp_progress = 0.5 * float(np.asarray(path.v_ref).mean()) * STEPS * 0.05
    max_ey = float(np.abs(np.asarray(res.log.e_y)[active]).max())
    assert failed_lanes == 0, f"{failed_lanes} lanes failed (replay overrun)"
    assert progress > exp_progress, \
        f"mean progress {progress:.3f} m < floor {exp_progress:.3f} m"
    assert max_ey < 0.30, f"max |e_y| {max_ey:.3f} m out of corridor scale"
    # feasible-but-unconverged solves replay (reference-parity fallback);
    # their measured share at the production budget is ~1% of active steps.
    # Escalation could converge them but is deliberately OFF: converged
    # solves on the cost-flat reference weights drive measurably worse
    # (SolverConfig.escalate_lanes docstring).  Gate the share so a solver
    # regression (rate jumping past its measured band) still fails loudly.
    assert solver_failure_rate < 0.02, \
        f"solver failure rate {solver_failure_rate:.4f} (feasible QPs left " \
        "unconverged) above the measured production band"

    # single-car rate (the metric names both; single lane is latency-bound).
    # Warmup and timed calls must share the exact argument structure or the
    # timed call recompiles.  MIN of 5 runs: the ~100 ms wall of a 100-step
    # scan rides the remote-dispatch tunnel, whose one-sided latency jitter
    # spans 130-228 ms across identical runs (measured r5) — a median
    # moves tens of percent run-to-run (the r4 "single-car -34%" was this
    # noise), while the minimum is the standard latency estimator under
    # one-sided noise and reproduces across rounds.
    from multi_purpose_mpc_tpu.models.bicycle import init_car_state
    from multi_purpose_mpc_tpu.simulation import simulate_closed_loop

    single_sim = SimConfig(max_steps=100)
    st_a = init_car_state(path, mpc_cfg.N, e_y=1e-9 * (salt % 1000))
    r1 = simulate_closed_loop(grid, path, mpc_cfg, model_cfg, single_sim,
                              state0=st_a)
    _ = float(np.asarray(r1.log.x.sum()))
    stimes = []
    for k in range(5):
        st_b = init_car_state(path, mpc_cfg.N,
                              e_y=1e-9 * (salt % 1000) + 1e-6 * (k + 1))
        t0 = time.perf_counter()
        r1 = simulate_closed_loop(grid, path, mpc_cfg, model_cfg, single_sim,
                                  state0=st_b)
        _ = float(np.asarray(r1.log.x.sum()))
        stimes.append(time.perf_counter() - t0)
    single_steps_per_sec = 100 / min(stimes)

    # LiDAR-in-the-loop fleet (BASELINE.json config 4 at batch scale):
    # per-lane scans + per-lane online maps + in-loop corridor extraction.
    from multi_purpose_mpc_tpu.config import LidarConfig
    from multi_purpose_mpc_tpu.simulation import simulate_lidar_fleet

    # B=1024 (r5, VERDICT #3): the 32x-bitpacked per-lane map carry is
    # 32 KB/lane, so 1024 per-lane maps cost 32 MB of HBM where f32 grids
    # took 1 GB — the capacity lever the pack was built for.  The packed
    # QP solver tier also engages at this batch.
    LIDAR_BATCH = 1024
    LIDAR_STEPS = 50
    lidar = LidarConfig(FoV=360, range=1.0, resolution=4, n_ray_samples=192)
    # static scenario data (scanline table, occupied-cell table) is setup,
    # not steady-state: prebuild once — rebuilding per call costs ~0.3 s of
    # host syncs on the axon platform (round-3 profiling)
    from multi_purpose_mpc_tpu.ops.corridor_extract import build_scanline_table
    from multi_purpose_mpc_tpu.ops.lidar import occupied_cell_table

    ltable = build_scanline_table(grid, path, mpc_cfg.n_scan_samples)
    lcells = occupied_cell_table(grid.occ)
    lfleet = jax.tree.map(lambda a: a[:LIDAR_BATCH], make_fleet(4))
    lsim = SimConfig(max_steps=LIDAR_STEPS, static_grid=False)
    lres, _ = simulate_lidar_fleet(grid, grid, path, mpc_cfg, model_cfg,
                                   lsim, lidar, lfleet, table=ltable,
                                   cells=lcells)
    _ = float(np.asarray(lres.log.x.sum()))  # warm + fence
    ltimes = []
    for seed in (5, 15, 25):  # median of 3 (VERDICT r4 next #4: single-run
        # timings on this platform swing ~20% and read as regressions)
        lfleet = jax.tree.map(lambda a: a[:LIDAR_BATCH], make_fleet(seed))
        _ = float(np.asarray(lfleet.s).sum())
        t0 = time.perf_counter()
        lres, _ = simulate_lidar_fleet(grid, grid, path, mpc_cfg, model_cfg,
                                       lsim, lidar, lfleet, table=ltable,
                                       cells=lcells)
        _ = float(np.asarray(lres.log.x.sum() + lres.log.v.sum()))
        ltimes.append(time.perf_counter() - t0)
    lidar_rate = LIDAR_BATCH * LIDAR_STEPS / sorted(ltimes)[len(ltimes) // 2]

    # Real_Track fleet (the reference's second scenario, simulation.py:58-88):
    # non-circular 867x767 real map, Monte-Carlo starts over the first half
    from multi_purpose_mpc_tpu.config import real_track_preset

    rt_map, rt_path_cfg, rt_model, rt_mpc, rt_speed, _ = real_track_preset(
        asset_dir="/root/repo/assets/maps")
    rt_grid = load_grid_map(rt_map)
    rt_path = build_reference_path(rt_grid, rt_path_cfg)
    rt_path = compute_speed_profile(rt_path, rt_speed)
    RT_BATCH = 1024
    RT_STEPS = 30

    def make_rt_fleet(seed):
        rng = np.random.default_rng(seed + salt)
        return init_fleet(
            rt_path, rt_mpc.N, RT_BATCH,
            e_y0=jnp.asarray(rng.uniform(-0.1, 0.1, RT_BATCH), jnp.float32),
            wp_id0=jnp.asarray(rng.integers(0, rt_path.n_wp // 2, RT_BATCH),
                               jnp.int32))

    rt_sim = SimConfig(max_steps=RT_STEPS)
    rt_res = simulate_fleet(rt_grid, rt_path, rt_mpc, rt_model, rt_sim,
                            make_rt_fleet(6))
    _ = float(np.asarray(rt_res.log.x.sum()))  # warm + fence
    rt_times = []
    for seed in (7, 17, 27):  # median of 3
        rt_fleet = make_rt_fleet(seed)
        _ = float(np.asarray(rt_fleet.s).sum())
        t0 = time.perf_counter()
        rt_res = simulate_fleet(rt_grid, rt_path, rt_mpc, rt_model, rt_sim,
                                rt_fleet)
        _ = float(np.asarray(rt_res.log.x.sum() + rt_res.log.v.sum()))
        rt_times.append(time.perf_counter() - t0)
    rt_rate = RT_BATCH * RT_STEPS / sorted(rt_times)[len(rt_times) // 2]

    print(json.dumps({
        "metric": "closed-loop MPC car-steps/sec (linearize+corridor+QP+rollout), batch 4096, obstacle-avoidance config",
        "value": round(car_steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(car_steps_per_sec / NORTH_STAR, 3),
        "detail": {
            "batch": BATCH,
            "scan_steps": STEPS,
            "wall_s": round(dt, 3),
            "qp_solve_rate": round(solve_rate, 4),
            # rejection split (r4 diagnosis): rejected steps whose QP is
            # certified structurally infeasible (mpc.violation_floor > 0;
            # reference-parity replays) vs feasible QPs the solver left
            # unconverged (gated < 1% above)
            "qp_infeasible_rate": round(infeas_rate, 4),
            "qp_solver_failure_rate": round(solver_failure_rate, 5),
            "failed_lanes": failed_lanes,
            "max_abs_e_y": round(max_ey, 4),
            "single_car_steps_per_sec": round(single_steps_per_sec, 1),
            "lidar_fleet_steps_per_sec": round(lidar_rate, 1),
            "lidar_fleet_batch": LIDAR_BATCH,
            "real_track_steps_per_sec": round(rt_rate, 1),
            "real_track_batch": RT_BATCH,
            "device": str(jax.devices()[0]),
            **_roofline_fields(),
        },
    }))

    # --- cross-round drift gates (VERDICT r4 next #4): every headline
    # number is a median now; a >15% drop vs the latest recorded round is a
    # real regression and must fail loudly, not read as noise.  AFTER the
    # JSON print so a tripped gate never hides the measurements. ---
    prior = _prior_bench()
    if prior:
        rates = {
            "headline_steps_per_sec": (car_steps_per_sec,
                                       prior.get("value")),
            "single_car_steps_per_sec": (
                single_steps_per_sec,
                prior["detail"].get("single_car_steps_per_sec")),
            "real_track_steps_per_sec": (
                rt_rate, prior["detail"].get("real_track_steps_per_sec")),
        }
        # lidar rate is only comparable at the same batch (the r5 scale-up
        # to B >= 1024 changes the operating point)
        if prior["detail"].get("lidar_fleet_batch") == LIDAR_BATCH:
            rates["lidar_fleet_steps_per_sec"] = (
                lidar_rate, prior["detail"].get("lidar_fleet_steps_per_sec"))
        for name, (now, before) in rates.items():
            if before:
                # single-car is latency-bound: even min-of-5 walls swing
                # ~20% on tunnel jitter (measured spread 130-228 ms across
                # identical runs, r5), so its gate is wider
                tol = 0.70 if name == "single_car_steps_per_sec" else 0.85
                assert now >= tol * before, (
                    f"{name} regressed >{100 - int(tol * 100)}%: {now:.1f} "
                    f"vs recorded {before:.1f} ({prior['src']})")


def _prior_bench():
    """Latest recorded BENCH_r*.json (the driver writes one per round) —
    the cross-round drift baseline.  Returns {} when none parses."""
    import glob
    import os
    import re

    best = None
    for p in glob.glob("/root/repo/BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), p)
    if best is None:
        return {}
    try:
        with open(best[1]) as f:
            rec = json.load(f)
        parsed = rec.get("parsed") or {}
        if not parsed.get("detail"):
            return {}
        parsed["src"] = os.path.basename(best[1])
        return parsed
    except Exception:
        return {}


def _roofline_fields():
    """Attach the recorded roofline measurement (``bench.py --roofline``,
    tools/roofline.py — VPU/HBM attainable ceilings measured on this chip
    and the fused ADMM kernel's achieved fraction) when one exists."""
    import os

    p = "/root/repo/ROOFLINE.json"
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        r = json.load(f)
    return {
        "roofline_vpu_peak_tflops": round(r["vpu_peak_flops"] / 1e12, 2),
        "roofline_hbm_gbps": round(r["hbm_bw_bytes"] / 1e9, 1),
        "roofline_admm_iter_us": round(r["admm_iter_us"], 1),
        "roofline_vpu_fraction": round(r["vpu_fraction"], 3),
        "roofline_hbm_fraction_during_solve":
            round(r["hbm_fraction_during_solve"], 3),
    }


def check():
    """Compiled-kernel correctness gate (run on the real TPU).

    CI exercises the Pallas kernels only in ``interpret=True`` on CPU; this
    mode runs the ACTUAL Mosaic-compiled kernels on scenario QPs and asserts
    the same status/residual/U[0]/corridor agreement with the XLA solver
    that tests/test_admm_pallas.py asserts in interpret mode — so a Mosaic
    lowering bug that silently degrades solutions fails loudly here.
    OSQP plays this trusted-solver role in the reference (MPC.py:157-183).
    """
    from multi_purpose_mpc_tpu.models.bicycle import init_car_state
    from multi_purpose_mpc_tpu.mpc import (kappa_predictions, mpc_corridor,
                                           mpc_locate, mpc_pre_solve)
    from multi_purpose_mpc_tpu.ops.admm_pallas import (solve_ltv_qp_pallas,
                                                       solve_mpc_qp_fused)
    from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments
    from multi_purpose_mpc_tpu.ops.corridor_pallas import corridor_select_pallas
    from multi_purpose_mpc_tpu.ops.ltv_qp import solve_ltv_qp
    from multi_purpose_mpc_tpu.ops.path import gather_waypoint_index

    assert jax.default_backend() == "tpu", (
        "--check is the compiled-TPU gate; CI covers interpret mode")

    map_cfg, path_cfg, model_cfg, cfg, speed_cfg, obstacles = (
        sim_track_preset(asset_dir="/root/repo/assets/maps"))
    grid = load_grid_map(map_cfg)
    path = build_reference_path(grid, path_cfg)
    grid = add_obstacles_host(grid, map_cfg.origin, map_cfg.resolution, obstacles)
    path = compute_speed_profile(path, speed_cfg)
    sm = model_cfg.safety_margin
    segs = extract_all_segments(grid, path, 2 * sm,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)

    # states spread around the whole track incl. obstacle pinch-points
    B = cfg.solver.kernel_lanes or 128
    rng = np.random.default_rng(7)
    e0 = jnp.asarray(rng.uniform(-0.02, 0.02, B), jnp.float32)
    wp0 = jnp.asarray((np.arange(B) * (path.n_wp // B + 1)) % path.n_wp,
                      jnp.int32)
    states = jax.vmap(lambda e, w: init_car_state(path, cfg.N, e_y=e, wp_id=w)
                      )(e0, wp0)
    located = jax.vmap(lambda s: mpc_locate(s, path))(states)
    wp_id, e_y, e_psi = located

    # --- gate 1: corridor selection kernel vs XLA scan ---
    cor_ref = jax.vmap(
        lambda w: mpc_corridor(w, path, grid, cfg, model_cfg, segs))(wp_id)
    cor_ker = corridor_select_pallas(path, segs, wp_id + 1, cfg, sm,
                                     lanes=cfg.solver.kernel_lanes or 128)
    np.testing.assert_allclose(np.asarray(cor_ker.ub), np.asarray(cor_ref.ub),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(cor_ker.lb), np.asarray(cor_ref.lb),
                               atol=2e-4)
    print("check[corridor_select_pallas]: OK "
          f"(max |d_ub| {np.abs(np.asarray(cor_ker.ub - cor_ref.ub)).max():.1e})")

    # --- gate 2: structured ADMM kernel vs XLA stage-scan solver ---
    qp, _ = jax.vmap(lambda s, loc, cor: mpc_pre_solve(
        s, path, grid, cfg, model_cfg, segs, located=loc, corridor=cor))(
        states, located, cor_ref)
    ref = jax.vmap(lambda q, w: solve_ltv_qp(q, cfg.solver, warm=w))(
        qp, states.solver)
    ker = solve_ltv_qp_pallas(qp, states.solver, cfg.solver, lanes=128)
    _assert_solver_agreement("solve_ltv_qp_pallas", ker, ref, cfg)

    # --- gate 2b: (8,128) sublane-packed 1024-lane tile vs the classic
    # 128-lane kernel on the SAME B=1024 scenario QPs (the production fleet
    # tier since r5; classic is itself gated against XLA above) ---
    Bp_ = 1024
    e0p = jnp.asarray(rng.uniform(-0.02, 0.02, Bp_), jnp.float32)
    wp0p = jnp.asarray((np.arange(Bp_) * 7) % path.n_wp, jnp.int32)
    states_p = jax.vmap(
        lambda e, w: init_car_state(path, cfg.N, e_y=e, wp_id=w))(e0p, wp0p)
    loc_p = jax.vmap(lambda s: mpc_locate(s, path))(states_p)
    cor_p = jax.vmap(
        lambda w: mpc_corridor(w, path, grid, cfg, model_cfg, segs))(loc_p[0])
    qp_p, _ = jax.vmap(lambda s, loc, cor: mpc_pre_solve(
        s, path, grid, cfg, model_cfg, segs, located=loc, corridor=cor))(
        states_p, loc_p, cor_p)
    ker_c = solve_ltv_qp_pallas(qp_p, states_p.solver, cfg.solver, lanes=128)
    ker_p = solve_ltv_qp_pallas(qp_p, states_p.solver, cfg.solver, lanes=1024)
    _assert_solver_agreement("solve_ltv_qp_pallas[packed-1024]", ker_p,
                             ker_c, cfg)

    # --- gate 3: fully fused kernel (in-kernel assembly) vs XLA pipeline ---
    idxs = jax.vmap(lambda w: gather_waypoint_index(path, w, jnp.arange(cfg.N))
                    )(wp_id)
    x0 = jnp.stack([e_y, e_psi, jnp.zeros_like(e_y)], -1)
    kp = jax.vmap(lambda u: kappa_predictions(u, cfg.N))(states.u_seq)
    from multi_purpose_mpc_tpu.mpc import corridor_violation_floor

    fused, floor_k = solve_mpc_qp_fused(
        path.v_ref[idxs], path.kappa[idxs], path.seg_dist[idxs], cor_ref.lb,
        cor_ref.ub, x0, kp, states.solver, cfg.solver, cfg, model_cfg,
        lanes=128, return_floor=True)
    _assert_solver_agreement("solve_mpc_qp_fused", fused, ref, cfg)
    # in-kernel certified floor == the external interval recurrence (r5)
    floor_x = jax.vmap(lambda ey, ep, kr, ds, cor: corridor_violation_floor(
        ey, ep, (None, kr, ds), cor, cfg, model_cfg))(
        e_y, e_psi, path.kappa[idxs], path.seg_dist[idxs], cor_ref)
    np.testing.assert_allclose(np.asarray(floor_k), np.asarray(floor_x),
                               atol=1e-5)
    print("check[in-kernel violation floor]: OK "
          f"(max |d| {np.abs(np.asarray(floor_k - floor_x)).max():.1e})")

    # --- gate 4: N=60 horizon, compiled (rolled stage loops in VMEM) ---
    import dataclasses

    from multi_purpose_mpc_tpu.ops.ltv_qp import init_solver_carry

    cfg60 = dataclasses.replace(cfg, N=60)
    states60 = jax.vmap(lambda e, w: init_car_state(path, 60, e_y=e, wp_id=w)
                        )(e0, wp0)
    loc60 = jax.vmap(lambda s: mpc_locate(s, path))(states60)
    cor60 = jax.vmap(
        lambda w: mpc_corridor(w, path, grid, cfg60, model_cfg, segs)
    )(loc60[0])
    qp60, _ = jax.vmap(lambda s, loc, cor: mpc_pre_solve(
        s, path, grid, cfg60, model_cfg, segs, located=loc, corridor=cor))(
        states60, loc60, cor60)
    ref60 = jax.vmap(lambda q, w: solve_ltv_qp(q, cfg.solver, warm=w))(
        qp60, states60.solver)
    ker60 = solve_ltv_qp_pallas(qp60, states60.solver, cfg.solver,
                                lanes=128)
    _assert_solver_agreement("solve_ltv_qp_pallas[N=60]", ker60, ref60, cfg)

    # --- gate 5: scanline-extraction kernel (VMEM-resident grid) vs gather ---
    from multi_purpose_mpc_tpu.ops.corridor_extract import (
        build_scanline_table, extract_occ_gather, extract_occ_pallas,
        horizon_tables)

    table = build_scanline_table(grid, path, cfg.n_scan_samples)
    idxh = jax.vmap(lambda w: gather_waypoint_index(path, w + 1,
                                                    jnp.arange(cfg.N)))(wp_id)
    pxh, pyh, _, _, _, row0h = horizon_tables(table, idxh)
    # per-lane grids, salted so lanes differ
    occ_b = np.broadcast_to(np.asarray(grid.occ),
                            (B,) + grid.occ.shape).copy()
    r2 = np.random.default_rng(11)
    for b in range(B):
        occ_b[b, r2.integers(0, grid.occ.shape[0], 32),
              r2.integers(0, grid.occ.shape[1], 32)] = 0.0
    occ_b = jnp.asarray(occ_b)
    v_ker = extract_occ_pallas(occ_b, pxh, pyh, row0h, table.window_rows)
    v_ref = jax.jit(extract_occ_gather)(occ_b, pxh, pyh)
    np.testing.assert_array_equal(np.asarray(v_ker), np.asarray(v_ref))
    v_ker_sh = extract_occ_pallas(grid.occ, pxh, pyh, row0h,
                                  table.window_rows)
    v_ref_sh = jax.jit(extract_occ_gather)(grid.occ, pxh, pyh)
    np.testing.assert_array_equal(np.asarray(v_ker_sh), np.asarray(v_ref_sh))
    print("check[extract_occ_pallas]: OK (per-lane + shared, bitwise)")

    # --- gate 6: fused write-back + extraction kernel vs sequential pair ---
    from multi_purpose_mpc_tpu.ops.grid import w2m
    from multi_purpose_mpc_tpu.ops.lidar import LidarScan, fleet_writeback
    from multi_purpose_mpc_tpu.ops.mapping_pallas import (
        pad_rows, writeback_extract_pallas)

    nb = 91
    H, W = grid.occ.shape
    k = r2.integers(0, path.n_wp, (B, nb))
    hx = np.asarray(path.x)[k] + r2.uniform(-0.1, 0.1, (B, nb))
    hy = np.asarray(path.y)[k] + r2.uniform(-0.1, 0.1, (B, nb))
    scans = LidarScan(angles=jnp.zeros((B, nb), jnp.float32),
                      ranges=jnp.ones((B, nb), jnp.float32),
                      hit=jnp.asarray(r2.random((B, nb)) < 0.6),
                      hit_xy=jnp.asarray(np.stack([hx, hy], -1), jnp.float32))
    occ_ref = fleet_writeback(grid, occ_b, None, None, None, scans, None,
                              clear_free=False, shared=False)
    vals_ref = jax.jit(extract_occ_gather)(occ_ref, pxh, pyh)
    hpx, hpy = w2m(grid, scans.hit_xy[..., 0], scans.hit_xy[..., 1])
    hpx = jnp.clip(hpx, 0, W - 1)
    hpy = jnp.clip(hpy, 0, H - 1)
    new_occ, vals = writeback_extract_pallas(
        pad_rows(occ_b, table.window_rows), hpx, hpy, scans.hit, pxh, pyh,
        row0h, table.window_rows)
    np.testing.assert_array_equal(np.asarray(new_occ[:, :H]),
                                  np.asarray(occ_ref))
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(vals_ref))
    print("check[writeback_extract_pallas]: OK (fused == dense+gather, "
          "bitwise)")
    print(json.dumps({"check": "ok", "lanes": int(B),
                      "device": str(jax.devices()[0])}))


def _assert_solver_agreement(name, out, ref, cfg):
    """The interpret-mode bars of tests/test_admm_pallas.py:33-48, applied
    to the compiled kernel: acceptance decisions identical, residuals match,
    speed command (the strongly-determined control) elementwise close."""
    ok_out = np.asarray(out.r_prim) <= cfg.feas_tol
    ok_ref = np.asarray(ref.r_prim) <= cfg.feas_tol
    np.testing.assert_array_equal(ok_out, ok_ref)
    assert (np.asarray(out.status) != 2).all(), "kernel lane DIVERGED"  # admm.DIVERGED
    # r_prim agreement at the acceptance scale: compiled-TPU vs XLA-on-TPU
    # reduction orders shift near-converged residuals by up to a few e-3 in
    # absolute terms (measured 2.8e-3 max on scenario QPs); the acceptance
    # equality above is the exact gate, this bounds residual QUALITY drift
    np.testing.assert_allclose(np.asarray(out.r_prim), np.asarray(ref.r_prim),
                               atol=5e-3)
    # speed command: strongly determined away from obstacle pinch-points;
    # ON pinch-point lanes the active set is near-degenerate and two
    # eps~1e-3-accurate solvers legitimately differ by O(1e-2) (measured
    # 8.7e-3 worst lane of 128; the reference's OSQP at its default eps has
    # the same property) — the bound is the behavioral scale, not float noise
    np.testing.assert_allclose(np.asarray(out.U[:, 0, 0]),
                               np.asarray(ref.U[:, 0, 0]), atol=2e-2)
    d = np.abs(np.asarray(out.U[:, 0, 0]) - np.asarray(ref.U[:, 0, 0])).max()
    print(f"check[{name}]: OK (max |d_v0| {d:.1e}, "
          f"max r_prim {np.asarray(out.r_prim).max():.1e})")


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    elif "--roofline" in sys.argv:
        # measured attainable-ceiling statement for the headline solver
        # (VERDICT r3 #5); writes ROOFLINE.json so plain bench runs can
        # attach the recorded fractions to their detail dict
        from tools.roofline import roofline

        r = roofline()
        with open("/root/repo/ROOFLINE.json", "w") as f:
            json.dump(r, f, indent=1)
        print(json.dumps(r))
    else:
        main()
