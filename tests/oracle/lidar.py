"""Corner-span LiDAR scan oracle (independent numpy re-derivation of the
reference algorithm, lidar_model.py:37-108).

The reference scans by iterating every grid cell inside the sensor's square
range window; for each *occupied* cell it computes the angular span of the
cell's 9 corner/edge/center points relative to the car yaw and min-updates
every beam whose angle falls inside that span with the distance to the cell
center.  The framework instead marches K samples per beam
(multi_purpose_mpc_tpu/ops/lidar.py) — the right TPU shape — so this oracle
exists to *bound the divergence* between the two algorithms on real scenes
(VERDICT round-1, Missing #2).

Faithfulness notes:
  * the sensor sits at the center of the car's cell (lidar_model.py:54-56);
  * hit range = distance between cell centers, in meters (:91-108);
  * cells whose span straddles +-pi hit the reference's wrap branch
    (:96-99), whose chained comparison ``max <= beam <= min`` is vacuously
    false — those cells update no beams.  They lie behind the sensor, outside
    a 180-degree FoV, so for the shipped FoV the branch is unreachable; we
    replicate it anyway (faithful > intended here, it cannot matter).
"""

from __future__ import annotations

import math

import numpy as np


def beam_angles(fov_deg: float, resolution_deg: float) -> np.ndarray:
    n = int(fov_deg / resolution_deg + 1)
    return np.linspace(-math.pi / 360 * fov_deg, math.pi / 360 * fov_deg, n)


def scan_oracle(occ: np.ndarray, origin, resolution: float,
                car_x: float, car_y: float, car_psi: float,
                fov_deg: float, max_range: float,
                resolution_deg: float) -> np.ndarray:
    """Corner-span scan; returns per-beam ranges in meters (max_range = miss).

    ``occ`` follows the framework convention (1 = free, 0 = occupied),
    ``occ[y, x]`` indexing.
    """
    angles = beam_angles(fov_deg, resolution_deg)
    ranges = np.full(angles.shape, max_range, dtype=np.float64)

    h, w = occ.shape
    x = int(np.floor((car_x - origin[0]) / resolution))
    y = int(np.floor((car_y - origin[1]) / resolution))
    xc = x + 0.5
    yc = y + 0.5
    range_px = int(max_range / resolution)

    for i in range(x - range_px, x + range_px + 1):
        if not (0 <= i < w):
            continue
        for j in range(y - range_px, y + range_px + 1):
            if not (0 <= j < h):
                continue
            if occ[j, i] != 0:
                continue
            xt = i + 0.5
            yt = j + 0.5
            cell_angles = []
            for k in (-1, 0, 1):
                for l in (-1, 0, 1):
                    dy = yt + l / 2 - yc
                    dx = xt + k / 2 - xc
                    a = math.atan2(dy, dx) - car_psi
                    if a < -math.pi:
                        a = -math.fmod(math.pi + a, 2 * math.pi) + math.pi
                    else:
                        a = math.fmod(math.pi + a, 2 * math.pi) - math.pi
                    cell_angles.append(a)
            amin = min(cell_angles)
            amax = max(cell_angles)
            dist_px = math.hypot(xc - xt, yc - yt)

            if amin < -math.pi / 2 and amax > math.pi / 2:
                hit = (amax <= angles) & (angles <= amin)  # vacuous (see module doc)
            else:
                hit = (amin <= angles) & (angles <= amax)
            upd = hit & (dist_px * resolution < ranges)
            ranges[upd] = dist_px * resolution
    return ranges
