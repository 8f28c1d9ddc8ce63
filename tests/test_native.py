"""Native C map-preprocessing vs the scipy reference implementation."""

import os

import numpy as np
import pytest

from multi_purpose_mpc_tpu.utils import native
from multi_purpose_mpc_tpu.utils.maps import (
    binarize,
    load_map_image,
    remove_small_holes,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler / native lib")


def test_native_matches_scipy_on_random_grids(rng):
    for _ in range(8):
        img = (rng.random((80, 90)) * 255).astype(np.uint8)
        thr = int(rng.integers(50, 200))
        area = int(rng.integers(2, 12))
        ref = remove_small_holes(binarize(img, thr), area)
        out = native.preprocess_map(img, thr, area)
        np.testing.assert_array_equal(out, ref)


def test_native_hole_removal_semantics():
    g = np.ones((32, 32), np.int8)
    g[5, 5] = 0  # 1 px -> filled
    g[10:12, 10:12] = 0  # 4 px -> filled
    g[20:23, 20:23] = 0  # 9 px -> kept
    for i in range(5):
        g[3 + i, 26 - i] = 0  # diagonal 5 px chain (8-connected) -> kept
    out = native.remove_small_holes_native(g, 5)
    ref = remove_small_holes(g, 5)
    np.testing.assert_array_equal(out, ref)
    assert out[5, 5] == 1 and out[10, 10] == 1
    assert out[21, 21] == 0 and out[4, 25] == 0


def test_native_real_map_identical_to_fallback():
    p = os.path.join(REPO, "assets", "maps", "sim_map.png")
    a = load_map_image(p, use_native=True)
    b = load_map_image(p, use_native=False)
    np.testing.assert_array_equal(a, b)
