"""Windowed horizon table (ops/horizon_table.py) vs the per-step gathers.

The table is a pure re-layout of setup data: every consumer must match the
gather-based path BITWISE (same floats, same kernel, different plumbing).
"""

import jax
import pytest

# interpret-mode Mosaic kernel parity: heavy on CPU (minutes); the
# compiled kernels are gated on the real TPU by `bench.py --check`
# every round, so fast iteration excludes these via -m "not slow"
# (run explicitly with -m kernel)
pytestmark = [pytest.mark.slow, pytest.mark.kernel]
import jax.numpy as jnp
import numpy as np

from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments
from multi_purpose_mpc_tpu.ops.corridor_pallas import corridor_select_pallas
from multi_purpose_mpc_tpu.ops.horizon_table import (
    build_horizon_table,
    corridor_select_from_block,
    gather_horizon_block,
    solver_inputs_from_block,
)
from multi_purpose_mpc_tpu.ops.path import gather_waypoint_index


def _segs(sim_track):
    path = sim_track["path"]
    grid = sim_track["grid"]
    cfg = sim_track["mpc_cfg"]
    sm = sim_track["model_cfg"].safety_margin
    return extract_all_segments(grid, path, 2 * sm,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)


def test_corridor_from_block_bitwise(sim_track):
    path = sim_track["path"]
    cfg = sim_track["mpc_cfg"]
    sm = sim_track["model_cfg"].safety_margin
    segs = _segs(sim_track)
    table = build_horizon_table(path, segs, cfg)

    wp_ids = jnp.asarray([0, 11, 41, 87, 133, 180, 199, 55], jnp.int32)
    ref = corridor_select_pallas(path, segs, wp_ids + 1, cfg, sm,
                                 lanes=8, interpret=True)
    blk = gather_horizon_block(table, wp_ids)
    out = corridor_select_from_block(blk, cfg, sm, lanes=8, interpret=True)

    for a, b, name in ((ref.ub, out.ub, "ub"), (ref.lb, out.lb, "lb"),
                       (ref.border_ub, out.border_ub, "border_ub"),
                       (ref.border_lb, out.border_lb, "border_lb")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_solver_inputs_from_block_bitwise(sim_track):
    path = sim_track["path"]
    cfg = sim_track["mpc_cfg"]
    segs = _segs(sim_track)
    table = build_horizon_table(path, segs, cfg)

    wp_ids = jnp.asarray([3, 77, 198, 0], jnp.int32)
    blk = gather_horizon_block(table, wp_ids)
    v_ref, kappa_ref, delta_s = solver_inputs_from_block(
        blk, cfg.max_segments)

    offs = jnp.arange(cfg.N)
    idxs = jax.vmap(lambda w: gather_waypoint_index(path, w, offs))(wp_ids)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(path.v_ref[idxs]))
    np.testing.assert_array_equal(np.asarray(kappa_ref), np.asarray(path.kappa[idxs]))
    np.testing.assert_array_equal(np.asarray(delta_s), np.asarray(path.seg_dist[idxs]))


def test_table_non_circular_clamp(sim_track):
    """Non-circular paths bake the end-of-path clamp (SURVEY.md Q4) into the
    window: the last base waypoint's horizon repeats the final waypoint."""
    import dataclasses

    from multi_purpose_mpc_tpu.ops.constraints import SegmentCandidates
    from multi_purpose_mpc_tpu.ops.path import build_reference_path

    path_cfg = dataclasses.replace(sim_track["path_cfg"], circular=False)
    path = build_reference_path(sim_track["grid"], path_cfg)
    cfg = sim_track["mpc_cfg"]

    S = cfg.max_segments
    n = path.n_wp
    segs = SegmentCandidates(
        ub_xy=jnp.zeros((n, S, 2)), lb_xy=jnp.zeros((n, S, 2)),
        valid=jnp.zeros((n, S), bool))
    table = build_horizon_table(path, segs, cfg)
    last = gather_horizon_block(table, jnp.asarray([n - 1], jnp.int32))[0]
    # corridor pose columns all clamp to the final waypoint
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               float(path.x[n - 1]) * np.ones(cfg.N))
    v_ref, _, _ = solver_inputs_from_block(last[None], S)
    np.testing.assert_allclose(np.asarray(v_ref[0]),
                               float(path.v_ref[n - 1]) * np.ones(cfg.N))
