"""Occupancy-grid op tests: transforms, rasterization, hole removal."""

import numpy as np
import jax.numpy as jnp

from multi_purpose_mpc_tpu.ops.grid import (
    add_boundary,
    add_obstacles,
    lookup,
    m2w,
    make_grid_map,
    w2m,
)
from multi_purpose_mpc_tpu.utils.maps import remove_small_holes


def simple_grid(h=64, w=64, origin=(-1.0, -2.0), res=0.05):
    return make_grid_map(np.ones((h, w), np.float32), origin, res)


def test_w2m_matches_reference_floor_convention(rng):
    g = simple_grid()
    xs = rng.uniform(-1.0, 2.0, 100)
    ys = rng.uniform(-2.0, 1.0, 100)
    px, py = w2m(g, xs, ys)
    # reference: int(np.floor((x - origin)/res))  (map.py:85-86)
    exp_x = np.floor((xs - (-1.0)) / 0.05).astype(np.int32)
    exp_y = np.floor((ys - (-2.0)) / 0.05).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(px), exp_x)
    np.testing.assert_array_equal(np.asarray(py), exp_y)


def test_m2w_cell_center_roundtrip(rng):
    g = simple_grid()
    px = rng.integers(0, 64, 50)
    py = rng.integers(0, 64, 50)
    x, y = m2w(g, px, py)
    # reference: (d + 0.5) * res + origin  (map.py:98-99)
    np.testing.assert_allclose(np.asarray(x), (px + 0.5) * 0.05 - 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), (py + 0.5) * 0.05 - 2.0, atol=1e-6)
    # Round trip: cell centers map back to the same cell
    px2, py2 = w2m(g, x, y)
    np.testing.assert_array_equal(np.asarray(px2), px)
    np.testing.assert_array_equal(np.asarray(py2), py)


def test_lookup_out_of_bounds_is_occupied():
    g = simple_grid()
    vals = lookup(g, jnp.array([-1, 0, 63, 64]), jnp.array([0, 0, 63, 63]))
    np.testing.assert_array_equal(np.asarray(vals), [0.0, 1.0, 1.0, 0.0])


def test_add_obstacles_matches_reference_raster():
    """Disk raster parity with the reference's ogrid-based fill (map.py:129-137),
    going through the float64 host pixel path (scenario coords sit exactly on
    cell boundaries, where float32 w2m rounds differently)."""
    from multi_purpose_mpc_tpu.utils.maps import add_obstacles_host

    g = simple_grid()
    cx, cy, radius = -0.3, -1.1, 0.12
    out = np.asarray(add_obstacles_host(g, (-1.0, -2.0), 0.05,
                                        [(cx, cy, radius)]).occ)

    # reference semantics in numpy float64
    ref = np.ones((64, 64), np.float32)
    r_px = int(np.ceil(radius / 0.05))
    px = int(np.floor((cx + 1.0) / 0.05))
    py = int(np.floor((cy + 2.0) / 0.05))
    yy, xx = np.ogrid[-r_px:r_px, -r_px:r_px]
    mask = xx ** 2 + yy ** 2 <= r_px ** 2
    ref[py - r_px:py + r_px, px - r_px:px + r_px][mask] = 0.0

    np.testing.assert_array_equal(out, ref)


def test_add_obstacles_active_mask():
    g = simple_grid()
    out_off = add_obstacles(g, [0.0], [-1.0], [0.2], active=jnp.array([False]))
    np.testing.assert_array_equal(np.asarray(out_off.occ), np.asarray(g.occ))


def test_add_boundary_blocks_line():
    g = simple_grid()
    out = add_boundary(g, [(-0.85, -1.02)], [(1.88, -1.02)], n_samples=256)
    occ = np.asarray(out.occ)
    # row of y = -1.02 -> py = floor(0.98/0.05) = 19 occupied from px 3..57
    assert (occ[19, 3:58] == 0).all()
    # rows far away untouched
    assert (occ[40] == 1).all()


def test_remove_small_holes_fills_small_speckles_only():
    data = np.ones((32, 32), np.int8)
    data[5, 5] = 0  # 1-px speckle -> filled
    data[10:12, 10:12] = 0  # 4-px speckle -> filled (area < 5)
    data[20:23, 20:23] = 0  # 9-px block -> kept
    out = remove_small_holes(data, area_threshold=5)
    assert out[5, 5] == 1
    assert (out[10:12, 10:12] == 1).all()
    assert (out[20:23, 20:23] == 0).all()


def test_remove_small_holes_8_connectivity():
    # Diagonal chain of 5 px is one 8-connected component of area 5 -> kept
    data = np.ones((16, 16), np.int8)
    for i in range(5):
        data[3 + i, 3 + i] = 0
    out = remove_small_holes(data, area_threshold=5)
    assert (out[np.arange(3, 8), np.arange(3, 8)] == 0).all()


def test_real_map_assets_load(sim_track):
    g = sim_track["grid"]
    assert g.occ.shape == (500, 500)
    occ = np.asarray(g.occ)
    assert set(np.unique(occ)) <= {0.0, 1.0}
    assert 0.0 < occ.mean() < 1.0  # both free and occupied present
