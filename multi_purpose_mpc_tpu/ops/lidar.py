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
from multi_purpose_mpc_tpu.ops.grid import GridMap, m2w, w2m
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


def scan(grid: GridMap, x, y, psi, cfg: LidarConfig) -> LidarScan:
    """One scan from pose (x, y, psi); vmap over a fleet for batched scans."""
    angles = beam_angles(cfg)
    # sensor at the car cell's center (lidar_model.py:54-56)
    px, py = w2m(grid, x, y)
    cx, cy = m2w(grid, px, py)

    world_ang = angles + psi
    ex = cx + cfg.range * jnp.cos(world_ang)
    ey = cy + cfg.range * jnp.sin(world_ang)

    samples = sample_line(grid, jnp.broadcast_to(cx, world_ang.shape),
                          jnp.broadcast_to(cy, world_ang.shape),
                          ex, ey, cfg.n_ray_samples)
    hit, idx = first_occupied(samples)

    hpx = jnp.take_along_axis(samples.px, idx[:, None], axis=-1)[:, 0]
    hpy = jnp.take_along_axis(samples.py, idx[:, None], axis=-1)[:, 0]
    hx, hy = m2w(grid, hpx, hpy)
    dist = jnp.hypot(hx - cx, hy - cy)
    ranges = jnp.where(hit, jnp.minimum(dist, cfg.range), cfg.range)
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
