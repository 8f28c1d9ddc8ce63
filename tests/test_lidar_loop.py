"""LiDAR-in-the-loop closed loop: the controller drives on a map built
online from scans of the true world (BASELINE.json config 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multi_purpose_mpc_tpu.config import LidarConfig, SimConfig
from multi_purpose_mpc_tpu.ops.grid import make_grid_map
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.simulation import simulate_lidar_loop
from multi_purpose_mpc_tpu.utils.maps import add_obstacles_host


@pytest.fixture(scope="module")
def scenario(sim_track):
    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    return dict(sim_track, path=path)


def test_lidar_loop_discovers_map_and_drives(scenario):
    """Start from an optimistic all-free known map: scans must populate it
    and the car must still track the path."""
    true_grid = scenario["grid"]
    known0 = make_grid_map(np.ones_like(np.asarray(true_grid.occ)),
                           (float(true_grid.origin[0]), float(true_grid.origin[1])),
                           float(true_grid.resolution))
    lidar = LidarConfig(FoV=360, range=1.0, resolution=4, n_ray_samples=192)

    T = 40
    res, known = simulate_lidar_loop(true_grid, known0, scenario["path"],
                                     scenario["mpc_cfg"], scenario["model_cfg"],
                                     SimConfig(max_steps=T), lidar)
    occ0 = np.asarray(known0.occ)
    occT = np.asarray(known.occ)
    # scans discovered occupancy
    n_found = int((occ0 - occT).sum())
    assert n_found > 200, f"only {n_found} cells discovered"
    # the car made progress and stayed controlled
    assert float(res.final_state.s) > 1.0
    assert not bool(res.final_state.failed)
    assert np.abs(np.asarray(res.log.e_y)).max() < 0.25


def test_lidar_loop_true_map_equivalence(scenario):
    """With the known map == the true map, the lidar loop must behave like
    the plain closed loop (scans discover nothing new)."""
    from multi_purpose_mpc_tpu.simulation import simulate_closed_loop

    true_grid = scenario["grid"]
    lidar = LidarConfig(FoV=180, range=0.5, resolution=10, n_ray_samples=96)
    T = 12
    # plain loop ALSO with in-loop extraction (static_grid=False) so the
    # corridor computation matches exactly
    plain = simulate_closed_loop(true_grid, scenario["path"],
                                 scenario["mpc_cfg"], scenario["model_cfg"],
                                 SimConfig(max_steps=T, static_grid=False))
    loop, known = simulate_lidar_loop(true_grid, true_grid, scenario["path"],
                                      scenario["mpc_cfg"], scenario["model_cfg"],
                                      SimConfig(max_steps=T), lidar)
    # scan hits only re-mark already-occupied cells
    np.testing.assert_array_equal(np.asarray(known.occ),
                                  np.asarray(true_grid.occ))
    np.testing.assert_allclose(np.asarray(loop.log.v), np.asarray(plain.log.v),
                               atol=1e-5)
