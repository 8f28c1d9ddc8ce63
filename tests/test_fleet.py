"""Fleet sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_purpose_mpc_tpu.config import SimConfig
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.parallel.fleet import simulate_fleet_sharded
from multi_purpose_mpc_tpu.parallel.mesh import (
    fleet_mesh,
    fleet_metrics,
    fleet_sharding,
    round_up_batch,
    shard_fleet_state,
)
from multi_purpose_mpc_tpu.simulation import init_fleet, simulate_fleet


@pytest.fixture(scope="module")
def scenario(sim_track):
    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    return dict(sim_track, path=path)


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8, (
        "sharding tests need xla_force_host_platform_device_count=8")


def test_mesh_and_sharding_placement(scenario):
    mesh = fleet_mesh()
    assert mesh.devices.size == 8
    batch = round_up_batch(10, mesh)
    assert batch == 16
    fleet0 = init_fleet(scenario["path"], scenario["mpc_cfg"].N, batch)
    sharded = shard_fleet_state(fleet0, mesh)
    # leading axis split across all 8 devices
    assert len(sharded.x.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded.x), np.asarray(fleet0.x))


def test_sharded_rollout_matches_single_device(scenario):
    T = 8
    mesh = fleet_mesh()
    batch = 8
    e_y0 = jnp.linspace(-0.03, 0.03, batch)
    fleet0 = init_fleet(scenario["path"], scenario["mpc_cfg"].N, batch, e_y0=e_y0)

    plain = simulate_fleet(scenario["grid"], scenario["path"],
                           scenario["mpc_cfg"], scenario["model_cfg"],
                           SimConfig(max_steps=T), fleet0)
    sharded = simulate_fleet_sharded(mesh, scenario["grid"], scenario["path"],
                                     scenario["mpc_cfg"], scenario["model_cfg"],
                                     SimConfig(max_steps=T), fleet0)
    # GSPMD partitioning reassociates float reductions (rho adaptation,
    # polish selection), and the cost-flat curvature direction amplifies the
    # diffs chaotically — compare behaviorally: early prefix elementwise,
    # then progress/tracking envelopes.
    np.testing.assert_allclose(np.asarray(sharded.log.v)[:3],
                               np.asarray(plain.log.v)[:3], atol=5e-3)
    np.testing.assert_allclose(np.asarray(sharded.log.s)[-1],
                               np.asarray(plain.log.s)[-1], atol=0.02)
    assert np.abs(np.asarray(sharded.log.e_y)).max() < \
        np.abs(np.asarray(plain.log.e_y)).max() + 0.02
    assert np.asarray(sharded.log.ok).mean() > 0.9
    # same sharded program twice is bitwise deterministic
    sharded2 = simulate_fleet_sharded(mesh, scenario["grid"], scenario["path"],
                                      scenario["mpc_cfg"], scenario["model_cfg"],
                                      SimConfig(max_steps=T), fleet0)
    np.testing.assert_array_equal(np.asarray(sharded.log.x),
                                  np.asarray(sharded2.log.x))


def test_fleet_metrics_aggregate(scenario):
    T = 8
    fleet0 = init_fleet(scenario["path"], scenario["mpc_cfg"].N, 8)
    res = simulate_fleet(scenario["grid"], scenario["path"],
                         scenario["mpc_cfg"], scenario["model_cfg"],
                         SimConfig(max_steps=T), fleet0)
    m = jax.jit(fleet_metrics)(res.log, scenario["path"].length)
    assert 0.0 < float(m["qp_solve_rate"]) <= 1.0
    assert float(m["mean_progress"]) > 0.0
    assert float(m["mean_speed"]) > 0.0
    assert np.isfinite(float(m["max_abs_e_y"]))


def test_per_lane_failure_isolation(scenario):
    """One lane marked failed must freeze without affecting the others —
    the fleet semantics replacing the reference's exit(1) (SURVEY.md §5)."""
    T = 6
    batch = 4
    fleet0 = init_fleet(scenario["path"], scenario["mpc_cfg"].N, batch)
    fleet0 = fleet0.replace(
        failed=jnp.asarray([False, True, False, False]))
    res = simulate_fleet(scenario["grid"], scenario["path"],
                         scenario["mpc_cfg"], scenario["model_cfg"],
                         SimConfig(max_steps=T), fleet0)
    v = np.asarray(res.log.v)
    assert (v[:, 1] == 0.0).all(), "failed lane must not move"
    assert (v[-1, [0, 2, 3]] > 0.0).all(), "healthy lanes must advance"
    s = np.asarray(res.log.s)
    assert (s[-1, [0, 2, 3]] > 0.0).all()
