"""Loop-based float64 oracle for path geometry and the bicycle model.

Re-derives the reference math (SURVEY.md §3.3-§3.4) waypoint-by-waypoint with
explicit Python loops — deliberately the opposite style of the vectorized
package code, so vectorization/off-by-one bugs show up as mismatches.
"""

from __future__ import annotations

import math

import numpy as np


def construct_path_oracle(wp_x, wp_y, resolution, smoothing_distance):
    """Corner points -> (x, y, psi, kappa) per waypoint, reference semantics:
    densify per segment with endpoint=False + goal point; +/-sd moving
    average; psi from look-ahead diff; kappa = wrapped heading change over
    look-ahead distance with kappa[0] = 0; last densified point dropped."""
    eps = 1e-12
    xs, ys = [], []
    for i in range(len(wp_x) - 1):
        d = math.hypot(wp_x[i + 1] - wp_x[i], wp_y[i + 1] - wp_y[i])
        n = int(d / resolution)
        for k in range(n):
            t = k / n
            xs.append(wp_x[i] + t * (wp_x[i + 1] - wp_x[i]))
            ys.append(wp_y[i] + t * (wp_y[i + 1] - wp_y[i]))
    xs.append(wp_x[-1])
    ys.append(wp_y[-1])

    sd = smoothing_distance
    sx, sy = [], []
    for i in range(sd, len(xs) - sd):
        sx.append(float(np.mean(xs[i - sd:i + sd + 1])))
        sy.append(float(np.mean(ys[i - sd:i + sd + 1])))

    out = []
    for i in range(len(sx) - 1):
        dx = sx[i + 1] - sx[i]
        dy = sy[i + 1] - sy[i]
        psi = math.atan2(dy, dx)
        dist = math.hypot(dx, dy)
        if i == 0:
            kappa = 0.0
        else:
            prev_dx = sx[i] - sx[i - 1]
            prev_dy = sy[i] - sy[i - 1]
            ang_behind = math.atan2(prev_dy, prev_dx)
            dpsi = (psi - ang_behind + math.pi) % (2 * math.pi) - math.pi
            kappa = dpsi / (dist + eps)
        out.append((sx[i], sy[i], psi, kappa))
    arr = np.array(out, np.float64)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]


def linearize_oracle(v_ref, kappa_ref, delta_s):
    """LTV triple, straight from the SURVEY §2.1 row 7 equations."""
    A = np.array([
        [1.0, delta_s, 0.0],
        [-kappa_ref ** 2 * delta_s, 1.0, 0.0],
        [-kappa_ref / v_ref * delta_s, 0.0, 1.0],
    ])
    B = np.array([
        [0.0, 0.0],
        [0.0, delta_s],
        [-delta_s / v_ref ** 2, 0.0],
    ])
    f = np.array([0.0, 0.0, delta_s / v_ref])
    return f, A, B


def drive_oracle(x, y, psi, s, e_y, e_psi, kappa, v, delta, length, Ts):
    """Forward-Euler plant step (SURVEY §3.3)."""
    x2 = x + v * math.cos(psi) * Ts
    y2 = y + v * math.sin(psi) * Ts
    psi2 = psi + v / length * math.tan(delta) * Ts
    s_dot = v * math.cos(e_psi) / (1.0 - e_y * kappa)
    return x2, y2, psi2, s + s_dot * Ts


def t2s_oracle(wx, wy, wpsi, x, y, psi):
    e_y = math.cos(wpsi) * (y - wy) - math.sin(wpsi) * (x - wx)
    e_psi = (psi - wpsi + math.pi) % (2 * math.pi) - math.pi
    return e_y, e_psi


def s2t_oracle(wx, wy, wpsi, e_y, e_psi):
    return (wx - e_y * math.sin(wpsi), wy + e_y * math.cos(wpsi), wpsi + e_psi)
