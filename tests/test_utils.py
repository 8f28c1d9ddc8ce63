"""Auxiliary subsystems: checkpoint/resume, profiling, post-hoc viz
(SURVEY.md §5 — the reference has none of these)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")

from multi_purpose_mpc_tpu.config import SimConfig
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.simulation import init_fleet, simulate_fleet
from multi_purpose_mpc_tpu.utils.checkpoint import load_fleet_state, save_fleet_state
from multi_purpose_mpc_tpu.utils.profiling import time_stages, timeit
from multi_purpose_mpc_tpu.utils.viz import render_frame, render_trajectory


def _rollout(scenario, fleet0, T):
    return simulate_fleet(scenario["grid"], scenario["path"],
                          scenario["mpc_cfg"], scenario["model_cfg"],
                          SimConfig(max_steps=T), fleet0)


def test_checkpoint_roundtrip_resumes_identically(sim_track, tmp_path):
    scenario = dict(sim_track,
                    path=compute_speed_profile(sim_track["path"],
                                               sim_track["speed_cfg"]))
    fleet0 = init_fleet(scenario["path"], scenario["mpc_cfg"].N, batch=3)

    # run 6 steps; checkpoint; run 4 more
    mid = _rollout(scenario, fleet0, 6).final_state
    ckpt = str(tmp_path / "fleet.npz")
    save_fleet_state(ckpt, mid, step=6)

    restored, step = load_fleet_state(ckpt, like=mid)
    assert step == 6
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                            np.asarray(b)),
                 mid, restored)

    # resuming from the checkpoint == continuing the original run
    cont = _rollout(scenario, mid, 4)
    resumed = _rollout(scenario, restored, 4)
    np.testing.assert_array_equal(np.asarray(cont.log.x),
                                  np.asarray(resumed.log.x))


def test_profiling_helpers():
    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones((64, 64))
    t = timeit(f, x, warmup=1, iters=3)
    assert t > 0
    stages = time_stages({"double": lambda: f(x)}, warmup=1, iters=2)
    assert stages["double"] > 0


def test_render_outputs(sim_track, tmp_path):
    scenario = dict(sim_track,
                    path=compute_speed_profile(sim_track["path"],
                                               sim_track["speed_cfg"]))
    from multi_purpose_mpc_tpu.simulation import simulate_closed_loop

    res = simulate_closed_loop(scenario["grid"], scenario["path"],
                               scenario["mpc_cfg"], scenario["model_cfg"],
                               SimConfig(max_steps=5))
    out = str(tmp_path / "traj.png")
    render_trajectory(scenario["grid"], scenario["path"],
                      scenario["obstacles"], res.log, scenario["model_cfg"],
                      out_path=out)
    assert os.path.getsize(out) > 1000
    ax = render_frame(scenario["grid"], scenario["path"], scenario["obstacles"],
                      res.log, 2, scenario["model_cfg"])
    assert ax is not None
