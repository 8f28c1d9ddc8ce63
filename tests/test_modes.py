"""The three task modes (README.md:17-19): tracking is exercised everywhere;
here time-optimal driving (weight preset, time-as-state) is validated against
the tracking baseline."""

import dataclasses

import numpy as np
import pytest

from multi_purpose_mpc_tpu.config import SimConfig, time_optimal_config
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.simulation import simulate_closed_loop


@pytest.fixture(scope="module")
def scenario(sim_track):
    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    return dict(sim_track, path=path)


def test_time_optimal_beats_tracking_lap_time(scenario):
    """Minimum-time weights (terminal cost on the t state, README.md:48)
    must complete the lap in fewer steps than the tracking preset."""
    base = scenario["mpc_cfg"]
    topt = time_optimal_config(base)

    T = 400
    r_track = simulate_closed_loop(scenario["grid"], scenario["path"], base,
                                   scenario["model_cfg"], SimConfig(max_steps=T))
    r_topt = simulate_closed_loop(scenario["grid"], scenario["path"], topt,
                                  scenario["model_cfg"], SimConfig(max_steps=T))

    assert bool(r_track.final_state.done)
    assert bool(r_topt.final_state.done), \
        f"time-optimal lap incomplete: s={float(r_topt.final_state.s):.2f}"
    lap_track = int(np.argmax(np.asarray(r_track.log.s) >= float(scenario["path"].length)))
    lap_topt = int(np.argmax(np.asarray(r_topt.log.s) >= float(scenario["path"].length)))
    assert lap_topt <= lap_track, (lap_topt, lap_track)
    # time-optimal runs at (or very near) the speed cap wherever allowed
    v = np.asarray(r_topt.log.v)[np.asarray(r_topt.log.active)]
    assert v.mean() > 0.85


def test_time_optimal_stays_inside_corridor(scenario):
    """Corner-cutting is allowed, leaving the drivable corridor is not."""
    topt = time_optimal_config(scenario["mpc_cfg"])
    res = simulate_closed_loop(scenario["grid"], scenario["path"], topt,
                               scenario["model_cfg"], SimConfig(max_steps=400))
    act = np.asarray(res.log.active)
    e_y = np.asarray(res.log.e_y)[act]
    assert np.abs(e_y).max() < float(np.asarray(scenario["path"].ub).max()) + 0.05
    assert not bool(res.final_state.failed)
