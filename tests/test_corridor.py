"""Dynamic-corridor tests: synthetic grids, oracle parity, safety properties."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.ops.constraints import (
    free_segments,
    update_path_constraints,
)
from multi_purpose_mpc_tpu.ops.grid import lookup_world, make_grid_map
from multi_purpose_mpc_tpu.utils.maps import add_obstacles_host
from tests.oracle.corridor import free_segments_oracle, select_corridor_oracle

K = 128
S = 8


def corridor_grid():
    """1m x 1m grid at 1cm: free band y in [0.2, 0.8], obstacle strip in the
    middle splitting the scanline into two segments."""
    occ = np.ones((100, 100), np.float32)
    occ[:20, :] = 0.0
    occ[80:, :] = 0.0
    occ[45:55, 30:70] = 0.0  # block across the middle
    return make_grid_map(occ, (0.0, 0.0), 0.01)


def test_free_segments_split_by_obstacle():
    g = corridor_grid()
    p_ub = jnp.asarray([0.5, 0.85], jnp.float32)
    p_lb = jnp.asarray([0.5, 0.15], jnp.float32)
    segs = free_segments(g, p_ub, p_lb, min_width=0.05, n_samples=K, max_segments=S)
    valid = np.asarray(segs.valid)
    assert valid.sum() == 2
    ub = np.asarray(segs.ub_xy)[valid]
    lb = np.asarray(segs.lb_xy)[valid]
    # first segment: from top border (~0.8) down to the obstacle top (~0.55)
    np.testing.assert_allclose(ub[0, 1], 0.80, atol=0.03)
    np.testing.assert_allclose(lb[0, 1], 0.545, atol=0.03)
    # second segment: from obstacle bottom (~0.45) to bottom border (~0.2)
    np.testing.assert_allclose(ub[1, 1], 0.455, atol=0.03)
    np.testing.assert_allclose(lb[1, 1], 0.195, atol=0.03)


def test_free_segments_min_width_filter():
    g = corridor_grid()
    p_ub = jnp.asarray([0.5, 0.85], jnp.float32)
    p_lb = jnp.asarray([0.5, 0.15], jnp.float32)
    segs = free_segments(g, p_ub, p_lb, min_width=0.3, n_samples=K, max_segments=S)
    # both segments are ~0.25 wide -> filtered out
    assert np.asarray(segs.valid).sum() == 0


def test_free_segments_match_oracle_random(rng):
    occ = (rng.random((64, 64)) > 0.3).astype(np.float32)
    g = make_grid_map(occ, (0.0, 0.0), 0.02)
    for _ in range(10):
        p_ub = rng.uniform(0.1, 1.1, 2)
        p_lb = rng.uniform(0.1, 1.1, 2)
        segs = free_segments(g, jnp.asarray(p_ub, jnp.float32),
                             jnp.asarray(p_lb, jnp.float32),
                             min_width=0.03, n_samples=K, max_segments=S)
        oub, olb, ovalid = free_segments_oracle(occ, (0.0, 0.0), 0.02,
                                                p_ub, p_lb, 0.03, K, S)
        np.testing.assert_array_equal(np.asarray(segs.valid), ovalid)
        np.testing.assert_allclose(np.asarray(segs.ub_xy)[ovalid],
                                   oub[ovalid], atol=1e-4)
        np.testing.assert_allclose(np.asarray(segs.lb_xy)[ovalid],
                                   olb[ovalid], atol=1e-4)


def test_corridor_on_sim_track_with_obstacles(sim_track):
    """Corridor on the real obstructed map must stay inside free space and
    respect the static width envelope."""
    path = sim_track["path"]
    grid = sim_track["grid"]
    model = sim_track["model_cfg"]
    sm = model.safety_margin
    N = sim_track["mpc_cfg"].N

    for wp0 in [0, 40, 90, 150]:
        cor = update_path_constraints(grid, path, jnp.int32(wp0), N,
                                      2 * sm, sm, n_samples=K, max_segments=S)
        ub = np.asarray(cor.ub)
        lb = np.asarray(cor.lb)
        assert (ub >= lb).all(), wp0
        # corridor is a subset of the static max width envelope
        assert (ub <= np.asarray(path.ub).max() + 0.05).all()
        assert (lb >= np.asarray(path.lb).min() - 0.05).all()
        # the margin-reduced border points must lie in free space (or be
        # collapsed onto the center-line)
        mid = (np.asarray(cor.border_ub) + np.asarray(cor.border_lb)) / 2
        occ_mid = np.asarray(lookup_world(grid, jnp.asarray(mid[:, 0]),
                                          jnp.asarray(mid[:, 1])))
        collapsed = (ub == 0.0) & (lb == 0.0)
        assert (occ_mid[~collapsed] > 0.5).all(), wp0


def test_corridor_selection_matches_oracle(sim_track):
    path = sim_track["path"]
    grid = sim_track["grid"]
    model = sim_track["model_cfg"]
    sm = model.safety_margin
    N = 20
    wp0 = 25

    cor = update_path_constraints(grid, path, jnp.int32(wp0), N, 2 * sm, sm,
                                  n_samples=K, max_segments=S)

    occ = np.asarray(grid.occ)
    origin = (float(grid.origin[0]), float(grid.origin[1]))
    res = float(grid.resolution)
    idx = (wp0 + np.arange(N)) % path.n_wp
    seg_list = []
    for i in idx:
        seg_list.append(free_segments_oracle(
            occ, origin, res,
            np.asarray(path.border_ub)[i], np.asarray(path.border_lb)[i],
            2 * sm, K, S))
    prev_idx = np.concatenate([idx[:1], idx[:-1]])
    oub, olb, _ = select_corridor_oracle(
        np.asarray(path.x, np.float64)[idx], np.asarray(path.y, np.float64)[idx],
        np.asarray(path.psi, np.float64)[idx],
        np.asarray(path.seg_dist, np.float64)[prev_idx],
        np.asarray(path.psi, np.float64)[prev_idx],
        seg_list, sm)

    np.testing.assert_allclose(np.asarray(cor.ub), oub, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cor.lb), olb, atol=1e-3)


def test_fully_blocked_corridor_collapses():
    occ = np.ones((100, 100), np.float32)
    occ[:20, :] = 0.0
    occ[80:, :] = 0.0
    occ[30:, 40:60] = 0.0  # wall across the whole corridor at x ~ [0.4, 0.6]
    occ[:30, 40:60] = 0.0
    g = make_grid_map(occ, (0.0, 0.0), 0.01)
    p_ub = jnp.asarray([0.5, 0.85], jnp.float32)
    p_lb = jnp.asarray([0.5, 0.15], jnp.float32)
    segs = free_segments(g, p_ub, p_lb, min_width=0.05, n_samples=K,
                         max_segments=S)
    assert np.asarray(segs.valid).sum() == 0
