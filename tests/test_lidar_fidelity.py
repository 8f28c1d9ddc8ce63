"""LiDAR parity vs the reference's corner-span algorithm
(lidar_model.py:37-112), on the reference's own scan scene
(lidar_model.py:132-148: real map, pose (-4.9, -5.0, yaw 0.9), FoV 180°,
range 5 m, 1°/beam).

Two bars (VERDICT round-1, Missing #2):
  * ``conservative=True`` — EXACT range parity with the corner-span oracle
    (the span test reduces to ray-square intersection; see ops/lidar.scan);
  * default fast beam-march — bounded divergence: identical hit/miss
    decisions and sub-cell agreement on all but corner-grazing beams.
"""

import os

import numpy as np
import pytest

from multi_purpose_mpc_tpu.config import LidarConfig, real_track_preset
from multi_purpose_mpc_tpu.ops.lidar import scan
from multi_purpose_mpc_tpu.utils.maps import load_grid_map
from tests.oracle.lidar import scan_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SCENE = (-4.9, -5.0, 0.9)  # lidar_model.py:142
CFG = LidarConfig(FoV=180.0, range=5.0, resolution=1.0, n_ray_samples=256)


@pytest.fixture(scope="module")
def real_map():
    map_cfg, *_ = real_track_preset(asset_dir=os.path.join(REPO, "assets",
                                                           "maps"))
    grid = load_grid_map(map_cfg)
    return grid, np.asarray(grid.occ), (float(grid.origin[0]),
                                        float(grid.origin[1])), \
        float(grid.resolution)


def _poses(occ, origin, res, n=3, seed=3):
    """Reference scene + random free poses whose whole sensor window stays
    on-map: the fast march treats off-map samples as occupied (a documented
    deviation, ops/rays.py), while the reference skips out-of-image cells
    (lidar_model.py:63-65) — comparing there would test the deviation, not
    the algorithm."""
    poses = [REFERENCE_SCENE]
    rng = np.random.default_rng(seed)
    m = int(CFG.range / res) + 2
    h, w = occ.shape
    fy, fx = np.nonzero(occ[m:h - m, m:w - m] > 0.5)
    for si in rng.choice(len(fx), n, replace=False):
        poses.append((origin[0] + (fx[si] + m + 0.5) * res,
                      origin[1] + (fy[si] + m + 0.5) * res,
                      float(rng.uniform(-np.pi, np.pi))))
    return poses


def test_conservative_scan_matches_reference_exactly(real_map):
    """Corner-span semantics, bit-for-bit ranges (up to f32) on the
    reference scene + random free poses."""
    grid, occ, origin, res = real_map
    for (x, y, psi) in _poses(occ, origin, res):
        oracle = scan_oracle(occ, origin, res, x, y, psi,
                             CFG.FoV, CFG.range, CFG.resolution)
        s = scan(grid, x, y, psi, CFG, conservative=True)
        np.testing.assert_allclose(np.asarray(s.ranges, np.float64), oracle,
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(s.hit),
                                      oracle < CFG.range - 1e-9)


def test_fast_scan_divergence_bounded(real_map):
    """The default beam-march agrees with the reference algorithm on
    hit/miss for every beam of the reference scene, and on range to within
    one cell for 95% of beams; corner-grazing beams (where the reference
    min-updates from cells the ray only touches) stay the documented
    exception, bounded in count."""
    grid, occ, origin, res = real_map
    x, y, psi = REFERENCE_SCENE
    oracle = scan_oracle(occ, origin, res, x, y, psi,
                         CFG.FoV, CFG.range, CFG.resolution)
    s = scan(grid, x, y, psi, CFG)
    r = np.asarray(s.ranges, np.float64)
    d = np.abs(r - oracle)

    np.testing.assert_array_equal(np.asarray(s.hit), oracle < CFG.range - 1e-9)
    assert np.percentile(d, 95) < res, np.percentile(d, 95)
    assert d.max() < 4 * res, d.max()  # measured 0.133 at K=256

    # Across random poses the march must never HALLUCINATE obstacles: its
    # range can never undershoot the corner-span truth by more than the
    # center-vs-entry offset (the hit cell is ray-intersecting, so the
    # reference's min-update covers it to within a cell diagonal).  It CAN
    # overshoot — grazing cells the ray only touches update the reference
    # but not a point-sampled march; that gap is pose-dependent (measured
    # 0-19% of beams at shallow wall angles), bounded pooled, and closed
    # entirely by conservative=True.
    big = total = 0
    for (px_, py_, ps_) in _poses(occ, origin, res, n=4, seed=11)[1:]:
        o = scan_oracle(occ, origin, res, px_, py_, ps_,
                        CFG.FoV, CFG.range, CFG.resolution)
        rr = np.asarray(scan(grid, px_, py_, ps_, CFG).ranges, np.float64)
        assert (o - rr).max() < 1.5 * res, "march hallucinated an obstacle"
        big += int(((rr - o) > 2 * res).sum())
        total += len(rr)
    assert big / total < 0.25, big / total
