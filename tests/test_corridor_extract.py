"""Fleet-scale dynamic-grid scanline extraction: all backends must agree
with the in-place gather semantics of ops/constraints.free_segments
(reference_path.py:466-520), bitwise — the values are 0/1 occupancies at
static per-waypoint sample coordinates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_purpose_mpc_tpu.ops.constraints import (update_path_constraints,
                                                   select_corridor,
                                                   SegmentCandidates)
from multi_purpose_mpc_tpu.ops.corridor_extract import (
    build_scanline_table, extract_occ_gather, extract_occ_onehot,
    extract_occ_pallas, fleet_dynamic_segments, horizon_tables)
from multi_purpose_mpc_tpu.ops.path import gather_waypoint_index


@pytest.fixture(scope="module")
def setup(sim_track):
    grid = sim_track["grid"]
    path = sim_track["path"]
    cfg = sim_track["mpc_cfg"]
    model = sim_track["model_cfg"]
    table = build_scanline_table(grid, path, cfg.n_scan_samples)

    B = 4
    rng = np.random.default_rng(0)
    wp = jnp.asarray(rng.integers(0, path.n_wp, B), jnp.int32)
    idx = jax.vmap(lambda w: gather_waypoint_index(path, w + 1,
                                                   jnp.arange(cfg.N)))(wp)
    # per-lane grids salted with random extra obstacles
    occ_b = np.broadcast_to(np.asarray(grid.occ),
                            (B,) + grid.occ.shape).copy()
    for b in range(B):
        occ_b[b, rng.integers(0, 500, 30), rng.integers(0, 500, 30)] = 0.0
    return dict(grid=grid, path=path, cfg=cfg, model=model, table=table,
                wp=wp, idx=idx, occ_b=jnp.asarray(occ_b))


def test_table_matches_inline_sampling(setup):
    """Static table px/py/cx/cy == what sample_line computes inline."""
    from multi_purpose_mpc_tpu.ops.grid import m2w
    from multi_purpose_mpc_tpu.ops.rays import sample_line

    grid, path, t = setup["grid"], setup["path"], setup["table"]
    s = jax.vmap(lambda a, b: sample_line(grid, a[0], a[1], b[0], b[1],
                                          t.px.shape[1]))(path.border_ub,
                                                          path.border_lb)
    np.testing.assert_array_equal(np.asarray(t.px),
                                  np.clip(np.asarray(s.px), 0, 499))
    np.testing.assert_array_equal(np.asarray(t.py),
                                  np.clip(np.asarray(s.py), 0, 499))
    cx, cy = m2w(grid, s.px, s.py)
    np.testing.assert_array_equal(np.asarray(t.cx), np.asarray(cx))
    np.testing.assert_array_equal(np.asarray(t.cy), np.asarray(cy))
    # row windows cover every sample row
    py = np.asarray(t.py)
    r0 = np.asarray(t.row0)
    assert (py.min(1) >= r0).all()
    assert (py.max(1) < r0 + t.window_rows).all()
    assert (r0 % 8 == 0).all()


def test_window_covers_alignment_slack():
    """row0 floors rmin to a multiple of 8, so the window must be sized for
    span + alignment slack (up to 7 rows).  A scanline spanning rows 15..140
    (raw span 126 < 128, aligned span 133 > 128) used to pass the guard yet
    read rows 136..140 outside the window as occupied."""
    from types import SimpleNamespace

    from multi_purpose_mpc_tpu.ops.grid import make_grid_map

    grid = make_grid_map(np.ones((200, 256), np.float32), (0.0, 0.0), 0.01)
    path = SimpleNamespace(
        border_ub=jnp.asarray([[0.505, 1.405]], jnp.float32),  # row 140
        border_lb=jnp.asarray([[0.505, 0.155]], jnp.float32))  # row 15
    t = build_scanline_table(grid, path, n_samples=256)
    py = np.asarray(t.py)
    r0 = np.asarray(t.row0)
    assert (py.min(1) >= r0).all()
    assert (py.max(1) < r0 + t.window_rows).all(), (
        py.max(), r0, t.window_rows)
    assert (r0 % 8 == 0).all()


def test_extraction_backends_agree(setup):
    t, idx, occ_b = setup["table"], setup["idx"], setup["occ_b"]
    px, py, _, _, _, row0 = horizon_tables(t, idx)
    v_g = extract_occ_gather(occ_b, px, py)
    v_o = extract_occ_onehot(occ_b, px, py)
    v_p = extract_occ_pallas(occ_b, px, py, row0, t.window_rows,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(v_g), np.asarray(v_o))
    np.testing.assert_array_equal(np.asarray(v_g), np.asarray(v_p))


def test_extraction_backends_agree_shared(setup):
    t, idx, grid = setup["table"], setup["idx"], setup["grid"]
    px, py, _, _, _, row0 = horizon_tables(t, idx)
    v_g = extract_occ_gather(grid.occ, px, py)
    v_o = extract_occ_onehot(grid.occ, px, py)
    v_p = extract_occ_pallas(grid.occ, px, py, row0, t.window_rows,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(v_g), np.asarray(v_o))
    np.testing.assert_array_equal(np.asarray(v_g), np.asarray(v_p))


def test_fleet_corridor_matches_per_lane_reference(setup):
    """Table extraction + shared segment logic + selection == the per-lane
    update_path_constraints pipeline, bitwise, on per-lane dynamic grids."""
    grid, path, cfg, model = (setup["grid"], setup["path"], setup["cfg"],
                              setup["model"])
    t, wp, idx, occ_b = (setup["table"], setup["wp"], setup["idx"],
                         setup["occ_b"])
    sm = model.safety_margin
    segs = fleet_dynamic_segments(occ_b, t, idx, 2.0 * sm, cfg.max_segments,
                                  backend="gather")
    cor_new = jax.vmap(lambda i, u, l, v: select_corridor(
        path, i, SegmentCandidates(ub_xy=u, lb_xy=l, valid=v), sm))(
            idx, segs.ub_xy, segs.lb_xy, segs.valid)
    cor_ref = jax.vmap(lambda o, w: update_path_constraints(
        grid.replace(occ=o), path, w + 1, cfg.N, 2.0 * sm, sm,
        cfg.n_scan_samples, cfg.max_segments), in_axes=(0, 0))(occ_b, wp)
    np.testing.assert_array_equal(np.asarray(cor_new.ub),
                                  np.asarray(cor_ref.ub))
    np.testing.assert_array_equal(np.asarray(cor_new.lb),
                                  np.asarray(cor_ref.lb))


@pytest.mark.slow
@pytest.mark.kernel
def test_select_pallas_segs_matches_xla(setup):
    """The per-lane-candidates wrapper of the selection kernel (dynamic-grid
    path) agrees with the XLA selection scan (interpret mode)."""
    from multi_purpose_mpc_tpu.ops.corridor_pallas import (
        corridor_select_pallas_segs)

    path, cfg, model = setup["path"], setup["cfg"], setup["model"]
    t, idx, occ_b = setup["table"], setup["idx"], setup["occ_b"]
    sm = model.safety_margin
    segs = fleet_dynamic_segments(occ_b, t, idx, 2.0 * sm, cfg.max_segments,
                                  backend="gather")
    cor_x = jax.vmap(lambda i, u, l, v: select_corridor(
        path, i, SegmentCandidates(ub_xy=u, lb_xy=l, valid=v), sm))(
            idx, segs.ub_xy, segs.lb_xy, segs.valid)
    cor_k = corridor_select_pallas_segs(path, segs, idx, cfg, sm,
                                        lanes=8, interpret=True)
    np.testing.assert_allclose(np.asarray(cor_k.ub), np.asarray(cor_x.ub),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cor_k.lb), np.asarray(cor_x.lb),
                               atol=1e-5)
