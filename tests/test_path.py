"""Path geometry tests: construction parity with the loop-based oracle,
width computation sanity on the real Sim_Track map."""

import numpy as np
import jax.numpy as jnp

from multi_purpose_mpc_tpu.ops.path import (
    densify_and_smooth,
    gather_waypoint_index,
    headings_and_curvature,
    path_lengths,
)
from tests.oracle.geometry import construct_path_oracle

SIM_WP_X = [-0.75, -0.25, -0.25, 0.25, 0.25, 1.25, 1.25, 0.75, 0.75, 1.25,
            1.25, -0.75, -0.75, -0.25]
SIM_WP_Y = [-1.5, -1.5, -0.5, -0.5, -1.5, -1.5, -1, -1, -0.5, -0.5, 0, 0,
            -1.5, -1.5]


def test_construction_parity_with_oracle():
    gx, gy = densify_and_smooth(SIM_WP_X, SIM_WP_Y, 0.05, 5)
    x, y, psi, kappa = headings_and_curvature(gx, gy)
    ox, oy, opsi, okappa = construct_path_oracle(SIM_WP_X, SIM_WP_Y, 0.05, 5)
    assert x.shape == ox.shape
    np.testing.assert_allclose(x, ox, atol=1e-12)
    np.testing.assert_allclose(y, oy, atol=1e-12)
    np.testing.assert_allclose(psi, opsi, atol=1e-12)
    np.testing.assert_allclose(kappa, okappa, atol=1e-9)


def test_path_lengths():
    gx, gy = densify_and_smooth(SIM_WP_X, SIM_WP_Y, 0.05, 5)
    x, y, psi, kappa = headings_and_curvature(gx, gy)
    seg_len, cum_len, seg_dist, length = path_lengths(x, y, circular=True)
    assert seg_len[0] == 0.0
    np.testing.assert_allclose(seg_len[1:], np.hypot(np.diff(x), np.diff(y)))
    np.testing.assert_allclose(cum_len[-1], length)
    # seg_dist agrees with seg_len shifted, and wraps across the seam
    np.testing.assert_allclose(seg_dist[:-1], seg_len[1:])
    np.testing.assert_allclose(seg_dist[-1], np.hypot(x[0] - x[-1], y[0] - y[-1]))


def test_kappa_signs_around_square_track():
    """Sim_Track runs counter-clockwise around its first corner block; the
    smoothed corners must carry consistent-sign curvature spikes."""
    gx, gy = densify_and_smooth(SIM_WP_X, SIM_WP_Y, 0.05, 5)
    x, y, psi, kappa = headings_and_curvature(gx, gy)
    assert np.abs(kappa).max() > 1.0  # sharp smoothed corners
    assert np.abs(kappa).min() < 1e-9  # straights


def test_built_path_widths_positive_on_track(sim_track):
    path = sim_track["path"]
    ub = np.asarray(path.ub)
    lb = np.asarray(path.lb)
    assert (ub >= 0).all() and (lb <= 0).all()
    # on-track waypoints must have usable drivable width
    assert (ub - lb).min() > 0.02
    assert (ub - lb).max() <= 2 * sim_track["path_cfg"].max_width + 1e-6
    # border cells must lie roughly ub / |lb| meters from the center-line
    d_ub = np.hypot(np.asarray(path.border_ub)[:, 0] - np.asarray(path.x),
                    np.asarray(path.border_ub)[:, 1] - np.asarray(path.y))
    np.testing.assert_allclose(d_ub, ub, atol=0.02)


def test_width_ray_march_synthetic_corridor():
    """A synthetic straight corridor with known wall distance."""
    from multi_purpose_mpc_tpu.ops.grid import make_grid_map
    from multi_purpose_mpc_tpu.ops.path import compute_static_width

    res = 0.01
    occ = np.ones((100, 100), np.float32)
    occ[:20, :] = 0.0  # wall below y = 0.2
    occ[80:, :] = 0.0  # wall above y = 0.8
    g = make_grid_map(occ, (0.0, 0.0), res)

    x = jnp.array([0.5], jnp.float32)
    y = jnp.array([0.5], jnp.float32)
    psi = jnp.array([0.0], jnp.float32)  # driving +x; left = +y
    ub, lb, bub, blb = compute_static_width(g, x, y, psi, max_width=0.5,
                                            n_ray_samples=128)
    # wall cells start at y=0.795 (cell center of row 80) above, 0.195 below
    np.testing.assert_allclose(np.asarray(ub)[0], 0.295, atol=0.02)
    np.testing.assert_allclose(np.asarray(lb)[0], -0.305, atol=0.02)


def test_gather_waypoint_index_wrap_and_clamp(sim_track):
    path = sim_track["path"]
    n = path.n_wp
    idx = gather_waypoint_index(path, jnp.asarray(n - 2), jnp.arange(5))
    np.testing.assert_array_equal(np.asarray(idx), [(n - 2 + k) % n for k in range(5)])

    noncirc = path.replace(circular=False)
    idx2 = gather_waypoint_index(noncirc, jnp.asarray(n - 2), jnp.arange(5))
    np.testing.assert_array_equal(np.asarray(idx2),
                                  [min(n - 2 + k, n - 1) for k in range(5)])
