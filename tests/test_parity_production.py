"""Production-budget trajectory-quality bar (VERDICT r4 next #6).

tests/test_parity.py pins the MATH at a cranked solver budget (200x10+40);
the production loop runs 30x6+10, where the iteration budget acts as the
implicit kappa regularizer on the reference's cost-flat weights
(SolverConfig docstring / ROUND_NOTES r4).  Nothing previously pinned what
that budget COSTS in trajectory terms.  This test free-runs the framework at
PRODUCTION solver defaults against the float64 oracle's free run on the
same Sim_Track obstacle scenario and asserts:

  * the early, fork-free window tracks the oracle pose to centimeters;
  * the lap completes in the reference's step-count envelope;
  * the accept rate stays in the measured production band.

Free runs legitimately diverge later: the first acceptance disagreement
(borderline pinch-point QP) flips the two runs into different replay
schedules, and on cost-flat weights any two eps~1e-3 solvers pick different
members of the optimal kappa band (ROUND_NOTES r2 finding 2).  The bars
below bound the BUDGET's cost, not solver identity.
Reference loop: /root/reference/src/simulation.py:134-163.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from multi_purpose_mpc_tpu.config import (SimConfig, SpeedProfileConstraints,
                                          sim_track_preset)
from multi_purpose_mpc_tpu.ops.path import build_reference_path
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.simulation import simulate_closed_loop
from multi_purpose_mpc_tpu.utils.maps import add_obstacles_host, load_grid_map
from tests.oracle.sim import path_to_dict, simulate_oracle

T = 300


def test_production_budget_tracks_oracle():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    map_cfg, path_cfg, model_cfg, mpc_cfg, speed_cfg, obstacles = (
        sim_track_preset(asset_dir=os.path.join(repo, "assets", "maps")))
    # PRODUCTION defaults: reference weights, 30x6+10 budget, xla backend
    # (the CPU-portable solver; kernel parity is pinned by bench --check)
    import dataclasses

    mpc_cfg = dataclasses.replace(mpc_cfg, solver_backend="xla")
    grid = load_grid_map(map_cfg)
    path = build_reference_path(grid, path_cfg)
    grid = add_obstacles_host(grid, map_cfg.origin, map_cfg.resolution,
                              obstacles)
    path = compute_speed_profile(path, SpeedProfileConstraints(v_max=0.85))

    # oracle free run (float64, high-accuracy IP solver)
    occ = np.asarray(grid.occ)
    origin = (float(grid.origin[0]), float(grid.origin[1]))
    olog = simulate_oracle(occ, origin, float(grid.resolution),
                           path_to_dict(path), mpc_cfg, model_cfg, T,
                           K=mpc_cfg.n_scan_samples, S=mpc_cfg.max_segments,
                           qp_solver="ip")
    To = len(olog["x"])

    # framework free run at the production budget
    res = simulate_closed_loop(grid, path, mpc_cfg, model_cfg,
                               SimConfig(max_steps=T))
    active = np.asarray(res.log.active)
    n_active = int(active.sum())
    ok = np.asarray(res.log.ok)[active]
    fx = np.asarray(res.log.x)
    fy = np.asarray(res.log.y)

    # 1. lap completes, in the oracle's step-count envelope (same physics,
    #    same speed profile -- the budget must not change the lap's scale)
    assert bool(res.final_state.done), "production lap did not complete"
    assert abs(n_active - To) <= 0.15 * To, \
        f"lap length {n_active} vs oracle {To} outside 15%"

    # 2. accept rate in the measured production band (bench gates the fleet
    #    at the same scale; single-lane Sim_Track measured 0.97-1.0)
    assert ok.mean() >= 0.95, f"accept rate {ok.mean():.3f} < 0.95"

    # 3. free-run divergence ENVELOPE.  On the reference's cost-flat
    #    weights two correct controllers drift apart from step 1 — each
    #    picks a different member of the optimal kappa band (ROUND_NOTES
    #    r2 finding 2), so no fixed centimeter bar can hold over a long
    #    window for ANY solver pair (two f64 solvers included).  What the
    #    production budget owns is the RATE: measured r5 (CPU, free runs,
    #    first disagreement at step 8) max pose error 0.053 m over the
    #    first 10 steps, 0.109 m over 40, 0.160 m over 60 — ~2.5 mm/step of
    #    band-choice drift on a 0.06 m/step trajectory, while BOTH runs
    #    finish the lap inside their corridors (bars 1-2).  Bars at ~2x the
    #    measured envelope: a budget regression (e.g. solves degrading to
    #    garbage mid-window) blows these bounds immediately.
    fw_ok_seq = np.asarray(res.log.ok)
    n_cmp = min(To, n_active)
    derr = np.hypot(fx[:n_cmp] - olog["x"][:n_cmp],
                    fy[:n_cmp] - olog["y"][:n_cmp])
    print(f"\n[prod parity] lap {n_active} vs oracle {To}; "
          f"accept {ok.mean():.3f}; first disagreement "
          f"{np.flatnonzero(~(fw_ok_seq[:n_cmp] & olog['solved'][:n_cmp]))[:5]}")
    for k in (10, 20, 40, 60):
        if k <= n_cmp:
            print(f"[prod parity] max pose err over first {k}: "
                  f"{derr[:k].max():.4f} m")
    assert derr[:10].max() <= 0.10, \
        f"pose divergence {derr[:10].max():.4f} m > 0.10 over 10 steps"
    assert derr[:40].max() <= 0.25, \
        f"pose divergence {derr[:40].max():.4f} m > 0.25 over 40 steps"
