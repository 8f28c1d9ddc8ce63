"""Corridor-selection Pallas kernel vs the XLA scan (interpret mode)."""

import numpy as np
import pytest

# interpret-mode Mosaic kernel parity: heavy on CPU (minutes); the
# compiled kernels are gated on the real TPU by `bench.py --check`
# every round, so fast iteration excludes these via -m "not slow"
# (run explicitly with -m kernel)
pytestmark = [pytest.mark.slow, pytest.mark.kernel]
import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.ops.constraints import (
    corridor_from_segments,
    extract_all_segments,
)
from multi_purpose_mpc_tpu.ops.corridor_pallas import corridor_select_pallas


def test_kernel_matches_xla_selection(sim_track):
    path = sim_track["path"]
    grid = sim_track["grid"]
    model = sim_track["model_cfg"]
    cfg = sim_track["mpc_cfg"]
    sm = model.safety_margin

    segs = extract_all_segments(grid, path, 2 * sm,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)

    wp_ids = jnp.asarray([0, 11, 41, 87, 133, 180, 199, 55], jnp.int32)
    ref = jax.vmap(lambda w: corridor_from_segments(path, segs, w, cfg.N, sm))(
        wp_ids)
    out = corridor_select_pallas(path, segs, wp_ids, cfg, sm,
                                 lanes=8, interpret=True)

    np.testing.assert_allclose(np.asarray(out.ub), np.asarray(ref.ub), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.lb), np.asarray(ref.lb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.border_ub),
                               np.asarray(ref.border_ub), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.border_lb),
                               np.asarray(ref.border_lb), atol=5e-5)


def test_kernel_padding(sim_track):
    path = sim_track["path"]
    grid = sim_track["grid"]
    model = sim_track["model_cfg"]
    cfg = sim_track["mpc_cfg"]
    sm = model.safety_margin
    segs = extract_all_segments(grid, path, 2 * sm,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)
    wp_ids = jnp.asarray([3, 77, 150], jnp.int32)  # not a multiple of lanes
    out = corridor_select_pallas(path, segs, wp_ids, cfg, sm,
                                 lanes=8, interpret=True)
    assert out.ub.shape == (3, cfg.N)
    ref = jax.vmap(lambda w: corridor_from_segments(path, segs, w, cfg.N, sm))(
        wp_ids)
    np.testing.assert_allclose(np.asarray(out.ub), np.asarray(ref.ub), atol=2e-5)


def test_packed_lane_layout_bitwise(sim_track):
    """r5: the (8,128) packed lane layout of the selection kernel (single-
    tile dispatch, select_call_lanes_last) is BITWISE the 1-D layout.
    Production call sites keep lanes=128 — the packed variant measured
    slower end-to-end for this small kernel (553k vs 671k headline
    steps/s; see select_call_lanes_last) — so this pins the machinery,
    not a default."""
    import jax.numpy as jnp
    import numpy as np

    from multi_purpose_mpc_tpu.ops.constraints import extract_all_segments

    path = sim_track["path"]
    grid = sim_track["grid"]
    cfg = sim_track["mpc_cfg"]
    model = sim_track["model_cfg"]
    segs = extract_all_segments(grid, path, 2 * model.safety_margin,
                                n_samples=cfg.n_scan_samples,
                                max_segments=cfg.max_segments)
    B = 24
    wp = jnp.asarray((np.arange(B) * 7) % path.n_wp, jnp.int32)
    ref = corridor_select_pallas(path, segs, wp + 1, cfg,
                                 model.safety_margin, lanes=8,
                                 interpret=True)
    out = corridor_select_pallas(path, segs, wp + 1, cfg,
                                 model.safety_margin, lanes=1024,
                                 interpret=True)
    for name in ("ub", "lb", "border_ub", "border_lb"):
        np.testing.assert_array_equal(np.asarray(getattr(out, name)),
                                      np.asarray(getattr(ref, name)))
