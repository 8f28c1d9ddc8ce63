"""Speed-profile QP tests against the float64 oracle and physical properties."""

import numpy as np
import jax.numpy as jnp

from multi_purpose_mpc_tpu.config import SolverConfig, SpeedProfileConstraints
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from tests.oracle.qp import solve_qp_f64


def _oracle_speed_profile(path, c):
    """Dense float64 re-derivation of the speed-profile QP (SURVEY.md §3.4)."""
    n = path.n_wp
    N = n - 1
    kappa = np.asarray(path.kappa, np.float64)[:N]
    li = np.asarray(path.seg_dist, np.float64)[:N]
    v_max_dyn = np.minimum(c.v_max, np.sqrt(c.ay_max / (np.abs(kappa) + 1e-12)))

    D1 = np.zeros((N - 1, N))
    for i in range(N - 1):
        D1[i, i] = -1.0 / (2 * li[i])
        D1[i, i + 1] = 1.0 / (2 * li[i])
    A = np.vstack([D1, np.eye(N)])
    l = np.concatenate([np.full(N - 1, c.a_min), np.full(N, c.v_min)])
    u = np.concatenate([np.full(N - 1, c.a_max), v_max_dyn])
    x, _, _ = solve_qp_f64(np.eye(N), -v_max_dyn, A, l, u)
    return x, v_max_dyn, li


def test_speed_profile_matches_oracle(sim_track):
    path = sim_track["path"]
    c = sim_track["speed_cfg"]
    out = compute_speed_profile(path, c)
    v = np.asarray(out.v_ref)

    v_ref, v_max_dyn, li = _oracle_speed_profile(path, c)
    np.testing.assert_allclose(v[:-1], v_ref, atol=2e-3)
    # terminal waypoint copies its neighbor (reference_path.py:352-354)
    assert v[-1] == v[-2]


def test_speed_profile_respects_constraints(sim_track):
    path = sim_track["path"]
    c = sim_track["speed_cfg"]
    out = compute_speed_profile(path, c)
    v = np.asarray(out.v_ref, np.float64)[:-1]
    kappa = np.asarray(path.kappa, np.float64)[:-1]
    li = np.asarray(path.seg_dist, np.float64)[:-1]

    v_max_dyn = np.minimum(c.v_max, np.sqrt(c.ay_max / (np.abs(kappa) + 1e-12)))
    assert (v <= v_max_dyn + 1e-3).all()
    assert (v >= c.v_min - 1e-3).all()
    acc = (v[1:] - v[:-1]) / (2 * li[:-1])
    assert (acc <= c.a_max + 1e-2).all()
    assert (acc >= c.a_min - 1e-2).all()


def test_speed_profile_slows_for_corners(sim_track):
    """Curvature spikes at smoothed corners must pull speed below v_max."""
    path = sim_track["path"]
    out = compute_speed_profile(path, sim_track["speed_cfg"])
    v = np.asarray(out.v_ref)[:-1]
    kappa = np.abs(np.asarray(path.kappa))[:-1]
    # v_max_dyn = sqrt(ay_max/|kappa|) binds only once |kappa| > ay_max/v_max^2
    assert v[kappa > 5.0].max() < 0.92 * sim_track["speed_cfg"].v_max
    assert v[kappa < 0.1].max() > 0.95 * sim_track["speed_cfg"].v_max
