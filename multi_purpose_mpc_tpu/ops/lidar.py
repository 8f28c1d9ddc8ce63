"""LiDAR sensor model as a vmapped beam ray-march (TPU-native lidar_model.py).

The reference scans by brute force: an O((2 range_px)^2) Python double loop
over every grid cell in range, computing per occupied cell the angular span
of its 9 corner points and min-updating every beam inside the span
(reference: lidar_model.py:37-112) — the single most TPU-friendly component
to redesign (SURVEY.md §3.5).  Here each *beam* marches a fixed number of
samples along its ray and takes the first occupied cell: ``n_beams x K``
grid lookups, fully data-parallel, thousands of scans per chip under vmap.

Semantics kept from the reference:
  * beam angles span ``[-FoV/2, +FoV/2]`` degrees around the car's yaw
    (lidar_model.py:31-33);
  * the sensor sits at the *center of the car's cell* (lidar_model.py:54-56);
  * a hit range is the distance to the hit cell's center, in meters
    (lidar_model.py:91-108); misses keep the max range.

``update_grid_from_scan`` closes the loop the reference left to its ROS node
(README.md:76): write hit endpoints back into a (dynamic copy of the) grid —
the LiDAR-in-the-loop config of BASELINE.json.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.config import LidarConfig
from multi_purpose_mpc_tpu.ops.grid import GridMap, lookup, m2w, w2m
from multi_purpose_mpc_tpu.ops.rays import first_occupied, sample_line


class LidarScan(NamedTuple):
    angles: jnp.ndarray  # (n_beams,) beam angles relative to car yaw [rad]
    ranges: jnp.ndarray  # (n_beams,) measured range [m] (max range if miss)
    hit: jnp.ndarray  # (n_beams,) bool — beam hit an obstacle
    hit_xy: jnp.ndarray  # (n_beams, 2) world coords of hit cell centers


def beam_angles(cfg: LidarConfig) -> jnp.ndarray:
    """Relative beam angles (reference: lidar_model.py:31-33)."""
    half = jnp.pi / 360.0 * cfg.FoV
    return jnp.linspace(-half, half, cfg.n_beams, dtype=jnp.float32)


def scan(grid: GridMap, x, y, psi, cfg: LidarConfig,
         conservative: bool = False) -> LidarScan:
    """One scan from pose (x, y, psi); vmap over a fleet for batched scans.

    ``conservative=False`` (default, fast): first occupied cell among K point
    samples along each ray — 1 grid lookup per sample.

    ``conservative=True``: exact reference corner-span semantics.  The
    reference updates beam b with occupied cell c iff b's angle lies in the
    angular span of c's 9 corner/edge/center points (lidar_model.py:75-103);
    for a convex cell square not containing the sensor, that span is exactly
    the set of ray directions intersecting the square, so the test reduces
    to  perp_dist(cell_center, ray) <= (|n_x| + |n_y|)/2 * resolution  with
    n the ray normal (the square's support function).  We evaluate it over
    the 3x3 neighborhood of every ray sample (sample spacing < 1 px covers
    every intersected cell) and min-update with the distance to the cell
    center, matching the reference's measurement (:91-108) including
    corner-grazing hits the point-sampled march can miss.  9 lookups per
    sample; use for fidelity-critical scans.
    """
    angles = beam_angles(cfg)
    # sensor at the car cell's center (lidar_model.py:54-56)
    px, py = w2m(grid, x, y)
    cx, cy = m2w(grid, px, py)

    world_ang = angles + psi
    ux = jnp.cos(world_ang)
    uy = jnp.sin(world_ang)
    ex = cx + cfg.range * ux
    ey = cy + cfg.range * uy

    samples = sample_line(grid, jnp.broadcast_to(cx, world_ang.shape),
                          jnp.broadcast_to(cy, world_ang.shape),
                          ex, ey, cfg.n_ray_samples)

    if not conservative:
        hit, idx = first_occupied(samples)
        hpx = jnp.take_along_axis(samples.px, idx[:, None], axis=-1)[:, 0]
        hpy = jnp.take_along_axis(samples.py, idx[:, None], axis=-1)[:, 0]
        hx, hy = m2w(grid, hpx, hpy)
        dist = jnp.hypot(hx - cx, hy - cy)
        ranges = jnp.where(hit, jnp.minimum(dist, cfg.range), cfg.range)
        return LidarScan(angles=angles, ranges=ranges, hit=hit,
                         hit_xy=jnp.stack([hx, hy], -1))

    res = grid.resolution
    support = (jnp.abs(ux) + jnp.abs(uy))[:, None] * 0.5 * res  # (nb, 1)
    best = jnp.full(world_ang.shape, jnp.inf, jnp.float32)
    best_px = jnp.zeros(world_ang.shape, jnp.int32)
    best_py = jnp.zeros(world_ang.shape, jnp.int32)
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            qx = samples.px + ox
            qy = samples.py + oy
            # OOB reads as free: the reference never updates from
            # out-of-image cells (lidar_model.py:63-65)
            occv = lookup(grid, qx, qy, oob_value=1.0)
            wx, wy = m2w(grid, qx, qy)
            rx = wx - cx
            ry = wy - cy
            along = rx * ux[:, None] + ry * uy[:, None]
            perp = jnp.abs(ry * ux[:, None] - rx * uy[:, None])
            d = jnp.hypot(rx, ry)
            cand = ((occv < 0.5) & (along > 0.0) & (perp <= support)
                    & (d < cfg.range))
            dd = jnp.where(cand, d, jnp.inf)
            k = jnp.argmin(dd, axis=-1)
            dk = jnp.take_along_axis(dd, k[:, None], axis=-1)[:, 0]
            better = dk < best
            best = jnp.where(better, dk, best)
            best_px = jnp.where(better,
                                jnp.take_along_axis(qx, k[:, None], -1)[:, 0],
                                best_px)
            best_py = jnp.where(better,
                                jnp.take_along_axis(qy, k[:, None], -1)[:, 0],
                                best_py)
    hit = jnp.isfinite(best)
    hx, hy = m2w(grid, best_px, best_py)
    hx = jnp.where(hit, hx, cx + cfg.range * ux)
    hy = jnp.where(hit, hy, cy + cfg.range * uy)
    ranges = jnp.where(hit, best, cfg.range)
    return LidarScan(angles=angles, ranges=ranges, hit=hit,
                     hit_xy=jnp.stack([hx, hy], -1))


def measurements(scan_out: LidarScan) -> jnp.ndarray:
    """(2, n_beams) stacked (angle, range) container — the reference's
    ``self.measurements`` layout (lidar_model.py:31-35)."""
    return jnp.stack([scan_out.angles, scan_out.ranges], axis=0)


def update_grid_from_scan(grid: GridMap, x, y, psi, scan_out: LidarScan,
                          cfg: LidarConfig, clear_free: bool = False,
                          free_samples: int = 64) -> GridMap:
    """Write scan hits into a new grid (online map update, BASELINE.json
    config 4).  Pure function of the grid — usable inside the jitted control
    loop for LiDAR-in-the-loop simulation.

    ``clear_free=True`` additionally marks cells along each beam up to 95% of
    the measured range as free — a measurement-refresh mode for dynamic
    scenes (our extension; the reference's in-repo map never updates, its ROS
    node did: README.md:76).
    """
    occ = grid.occ
    h, w = occ.shape

    if clear_free:
        px, py = w2m(grid, x, y)
        cx, cy = m2w(grid, px, py)
        world_ang = scan_out.angles + psi
        t = jnp.linspace(0.0, 0.95, free_samples)  # (F,)
        rx = cx + (scan_out.ranges[:, None] * t[None, :]) * jnp.cos(world_ang)[:, None]
        ry = cy + (scan_out.ranges[:, None] * t[None, :]) * jnp.sin(world_ang)[:, None]
        fpx, fpy = w2m(grid, rx, ry)
        fpx = jnp.clip(fpx.reshape(-1), 0, w - 1)
        fpy = jnp.clip(fpy.reshape(-1), 0, h - 1)
        occ = occ.at[fpy, fpx].max(1.0)

    hpx, hpy = w2m(grid, scan_out.hit_xy[:, 0], scan_out.hit_xy[:, 1])
    hpx = jnp.clip(hpx, 0, w - 1)
    hpy = jnp.clip(hpy, 0, h - 1)
    occ = occ.at[hpy, hpx].min(jnp.where(scan_out.hit, 0.0, 1.0))
    return grid.replace(occ=occ)
