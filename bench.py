"""Headline benchmark: closed-loop MPC car-steps/sec at batch 4096 on one chip.

Runs the full sense->corridor->linearize->QP-solve->actuate->integrate loop
(the BASELINE.json metric: "closed-loop MPC steps/sec (linearize+QP+rollout),
single car and batch-4096") as a jitted ``lax.scan`` over a vmapped fleet on
the Sim_Track scenario with obstacles — the obstacle-avoidance config, i.e.
the most expensive one (dynamic corridor extraction every step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 10_000 (the BASELINE.json north-star).
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

    def make_fleet(seed):
        rng = np.random.default_rng(seed + salt)
        e_y0 = jnp.asarray(rng.uniform(-0.03, 0.03, BATCH), jnp.float32)
        wp0 = jnp.asarray(rng.integers(0, path.n_wp, BATCH), jnp.int32)
        return init_fleet(path, mpc_cfg.N, BATCH, e_y0=e_y0, wp_id0=wp0)

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
    solve_rate = float(np.asarray(res.log.ok)[active].mean())

    # single-car rate (the metric names both; single lane is latency-bound).
    # Warmup and timed calls must share the exact argument structure or the
    # timed call recompiles.
    from multi_purpose_mpc_tpu.models.bicycle import init_car_state
    from multi_purpose_mpc_tpu.simulation import simulate_closed_loop

    single_sim = SimConfig(max_steps=100)
    st_a = init_car_state(path, mpc_cfg.N, e_y=1e-9 * (salt % 1000))
    st_b = init_car_state(path, mpc_cfg.N, e_y=1e-9 * (salt % 1000) + 1e-6)
    r1 = simulate_closed_loop(grid, path, mpc_cfg, model_cfg, single_sim,
                              state0=st_a)
    _ = float(np.asarray(r1.log.x.sum()))
    t0 = time.perf_counter()
    r1 = simulate_closed_loop(grid, path, mpc_cfg, model_cfg, single_sim,
                              state0=st_b)
    _ = float(np.asarray(r1.log.x.sum()))
    single_steps_per_sec = 100 / (time.perf_counter() - t0)

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
            "single_car_steps_per_sec": round(single_steps_per_sec, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
