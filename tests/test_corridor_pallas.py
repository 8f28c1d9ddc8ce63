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
