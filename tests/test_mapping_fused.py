"""Fused write-back + extraction kernel: bitwise parity with the sequential
backends (dense one-hot write-back, then scanline extraction) — the pair it
replaces in the per-lane LiDAR fleet hot loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# interpret-mode Mosaic kernel parity: heavy on CPU (minutes); the
# compiled kernels are gated on the real TPU by `bench.py --check`
# every round, so fast iteration excludes these via -m "not slow"
# (run explicitly with -m kernel)
pytestmark = [pytest.mark.slow, pytest.mark.kernel]

from multi_purpose_mpc_tpu.ops.corridor_extract import (build_scanline_table,
                                                        extract_occ_gather,
                                                        horizon_tables)
from multi_purpose_mpc_tpu.ops.grid import w2m
from multi_purpose_mpc_tpu.ops.lidar import LidarScan, fleet_writeback
from multi_purpose_mpc_tpu.ops.mapping_pallas import (pad_rows,
                                                      writeback_extract_pallas)
from multi_purpose_mpc_tpu.ops.path import gather_waypoint_index


@pytest.fixture(scope="module")
def setup(sim_track):
    grid = sim_track["grid"]
    path = sim_track["path"]
    cfg = sim_track["mpc_cfg"]
    table = build_scanline_table(grid, path, cfg.n_scan_samples)

    B, nb = 4, 91
    rng = np.random.default_rng(3)
    wp = jnp.asarray(rng.integers(0, path.n_wp, B), jnp.int32)
    idx = jax.vmap(lambda w: gather_waypoint_index(path, w + 1,
                                                   jnp.arange(cfg.N)))(wp)
    occ_b = np.broadcast_to(np.asarray(grid.occ),
                            (B,) + grid.occ.shape).copy()
    for b in range(B):
        occ_b[b, rng.integers(0, 500, 30), rng.integers(0, 500, 30)] = 0.0

    # synthetic scans: hit world coords on/near the track, ~60% hit rate
    k = rng.integers(0, path.n_wp, (B, nb))
    hx = np.asarray(path.x)[k] + rng.uniform(-0.1, 0.1, (B, nb))
    hy = np.asarray(path.y)[k] + rng.uniform(-0.1, 0.1, (B, nb))
    scans = LidarScan(
        angles=jnp.zeros((B, nb), jnp.float32),
        ranges=jnp.ones((B, nb), jnp.float32),
        hit=jnp.asarray(rng.random((B, nb)) < 0.6),
        hit_xy=jnp.asarray(np.stack([hx, hy], -1), jnp.float32))
    return dict(grid=grid, table=table, idx=idx, occ_b=jnp.asarray(occ_b),
                scans=scans)


def test_fused_matches_sequential_backends(setup):
    grid, table, idx = setup["grid"], setup["table"], setup["idx"]
    occ_b, scans = setup["occ_b"], setup["scans"]
    H, W = grid.occ.shape

    # sequential reference: dense write-back, then gather extraction
    occ_ref = fleet_writeback(grid, occ_b, None, None, None, scans,
                              None, clear_free=False, shared=False)
    pxh, pyh, inbh, _, _, row0h = horizon_tables(table, idx)
    vals_ref = extract_occ_gather(occ_ref, pxh, pyh)

    hpx, hpy = w2m(grid, scans.hit_xy[..., 0], scans.hit_xy[..., 1])
    hpx = jnp.clip(hpx, 0, W - 1)
    hpy = jnp.clip(hpy, 0, H - 1)
    occ_pad = pad_rows(occ_b, table.window_rows)
    new_occ, vals = writeback_extract_pallas(occ_pad, hpx, hpy, scans.hit,
                                             pxh, pyh, row0h,
                                             table.window_rows,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(new_occ[:, :H]),
                                  np.asarray(occ_ref))
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(vals_ref))
    # pad rows stay free (1.0): the carry never accumulates hits off-grid
    assert (np.asarray(new_occ[:, H:]) == 1.0).all()


def test_packed_kernel_matches_unpacked(setup):
    """Bitpacked fused kernel (32 rows/int32 word HBM carry): bitwise-equal
    occupancy and extraction values to the unpacked fused kernel (VERDICT
    r3 #2 — the map-stack bandwidth/capacity lever)."""
    from multi_purpose_mpc_tpu.ops.mapping_pallas import (
        pack_rows, unpack_rows, writeback_extract_packed)

    grid, table, idx = setup["grid"], setup["table"], setup["idx"]
    occ_b, scans = setup["occ_b"], setup["scans"]
    H, W = grid.occ.shape
    R = table.window_rows

    pxh, pyh, _, _, _, row0h = horizon_tables(table, idx)
    hpx, hpy = w2m(grid, scans.hit_xy[..., 0], scans.hit_xy[..., 1])
    hpx = jnp.clip(hpx, 0, W - 1)
    hpy = jnp.clip(hpy, 0, H - 1)

    o1, v1 = writeback_extract_pallas(pad_rows(occ_b, R), hpx, hpy,
                                      scans.hit, pxh, pyh, row0h, R,
                                      interpret=True)
    pk = pack_rows(occ_b, R)
    o2pk, v2 = writeback_extract_packed(pk, hpx, hpy, scans.hit, pxh, pyh,
                                        row0h, R, interpret=True)
    np.testing.assert_array_equal(np.asarray(unpack_rows(o2pk, H)),
                                  np.asarray(o1[:, :H]))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))


def test_pack_unpack_round_trip(setup):
    """pack_rows/unpack_rows are lossless on binary grids, incl. the row-31
    bit (int32 sign position)."""
    from multi_purpose_mpc_tpu.ops.mapping_pallas import pack_rows, unpack_rows

    rng = np.random.default_rng(7)
    occ = (rng.random((2, 70, 40)) > 0.3).astype(np.float32)
    occ[:, 31, :] = 0.0  # the sign-bit row of word 0 all occupied
    occ[:, 63, :] = 1.0
    pk = pack_rows(jnp.asarray(occ), 16)
    assert pk.dtype == jnp.int32 and pk.shape == (2, 3, 40)
    np.testing.assert_array_equal(np.asarray(unpack_rows(pk, 70)), occ)


def test_packed_rollout_matches_dense(setup, sim_track):
    """simulate_lidar_fleet(writeback_backend='packed') == 'dense' rollout,
    bitwise, on a short per-lane rollout (march scan backend, CPU)."""
    from multi_purpose_mpc_tpu.config import LidarConfig, SimConfig
    from multi_purpose_mpc_tpu.simulation import (init_fleet,
                                                  simulate_lidar_fleet)
    import multi_purpose_mpc_tpu.ops.mapping_pallas as mp

    grid = sim_track["grid"]
    path = sim_track["path"]
    cfg = sim_track["mpc_cfg"]
    model = sim_track["model_cfg"]
    lidar = LidarConfig(FoV=360, range=1.0, resolution=6, n_ray_samples=128)
    sim = SimConfig(max_steps=3, static_grid=False)
    B = 2
    fl = init_fleet(path, cfg.N, B, wp_id0=jnp.asarray([40, 200], jnp.int32))

    res_d, occ_d = simulate_lidar_fleet(grid, grid, path, cfg, model, sim,
                                        lidar, fl, scan_backend="march",
                                        writeback_backend="dense")
    orig = mp.writeback_extract_packed
    mp_interp = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        mp.writeback_extract_packed = mp_interp
        res_p, occ_p = simulate_lidar_fleet(grid, grid, path, cfg, model,
                                            sim, lidar, fl,
                                            scan_backend="march",
                                            writeback_backend="packed")
    finally:
        mp.writeback_extract_packed = orig
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_d))
    for a, b in zip(res_p.log, res_d.log):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_rollout_matches_dense(setup, sim_track):
    """simulate_lidar_fleet(writeback_backend='fused') == 'dense' rollout,
    bitwise, on a short per-lane rollout (march scan backend, CPU)."""
    from multi_purpose_mpc_tpu.config import LidarConfig, SimConfig
    from multi_purpose_mpc_tpu.simulation import (init_fleet,
                                                  simulate_lidar_fleet)
    import multi_purpose_mpc_tpu.ops.mapping_pallas as mp

    grid = sim_track["grid"]
    path = sim_track["path"]
    cfg = sim_track["mpc_cfg"]
    model = sim_track["model_cfg"]
    lidar = LidarConfig(FoV=360, range=1.0, resolution=4, n_ray_samples=192)
    sim = SimConfig(max_steps=3, static_grid=False)
    B = 3
    fl = init_fleet(path, cfg.N, B,
                    wp_id0=jnp.asarray([0, 120, 300], jnp.int32))

    res_d, occ_d = simulate_lidar_fleet(grid, grid, path, cfg, model, sim,
                                        lidar, fl, scan_backend="march",
                                        writeback_backend="dense")
    # run the fused kernel in interpret mode on CPU
    orig = mp.writeback_extract_pallas
    mp_interp = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        mp.writeback_extract_pallas = mp_interp
        res_f, occ_f = simulate_lidar_fleet(grid, grid, path, cfg, model,
                                            sim, lidar, fl,
                                            scan_backend="march",
                                            writeback_backend="fused")
    finally:
        mp.writeback_extract_pallas = orig
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_d))
    for a, b in zip(res_f.log, res_d.log):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
