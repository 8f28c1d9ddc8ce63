"""Loop-based float64 oracle for the dynamic drivable corridor.

Implements the same K-sample scanline algorithm as
multi_purpose_mpc_tpu.ops.constraints (the framework's shape-static
reformulation of reference_path.py:466-648), but with explicit Python loops
in float64 — an independent implementation to catch vectorization bugs.
"""

from __future__ import annotations

import math

import numpy as np


def wrap(a):
    return (a + math.pi) % (2 * math.pi) - math.pi


def w2m(origin, res, x, y):
    return (int(np.floor((x - origin[0]) / res)), int(np.floor((y - origin[1]) / res)))


def m2w(origin, res, px, py):
    return ((px + 0.5) * res + origin[0], (py + 0.5) * res + origin[1])


def occ_at(occ, origin, res, x, y):
    px, py = w2m(origin, res, x, y)
    h, w = occ.shape
    if 0 <= px < w and 0 <= py < h:
        return occ[py, px]
    return 0.0


def free_segments_oracle(occ, origin, res, p_ub, p_lb, min_width, K, S):
    """K-sample free-run extraction; returns (ub_xy, lb_xy, valid) arrays."""
    ts = np.linspace(0.0, 1.0, K)
    pts = [(np.float32(p_ub[0]) + t32 * (np.float32(p_lb[0]) - np.float32(p_ub[0])),
            np.float32(p_ub[1]) + t32 * (np.float32(p_lb[1]) - np.float32(p_ub[1])))
           for t32 in np.float32(ts)]
    cells = [w2m(origin, res, x, y) for x, y in pts]
    free = [occ_at(occ, origin, res, x, y) > 0.5 for x, y in pts]

    segs = []
    k = 0
    while k < K:
        if free[k]:
            a = k
            while k + 1 < K and free[k + 1]:
                k += 1
            b = k
            ub_c = cells[max(a - 1, 0)]
            lb_c = cells[min(b + 1, K - 1)]
            ub_w = m2w(origin, res, *ub_c)
            lb_w = m2w(origin, res, *lb_c)
            width = math.hypot(ub_w[0] - lb_w[0], ub_w[1] - lb_w[1])
            if width > min_width:
                segs.append((ub_w, lb_w))
        k += 1

    ub_xy = np.zeros((S, 2))
    lb_xy = np.zeros((S, 2))
    valid = np.zeros(S, bool)
    for i, (u, l) in enumerate(segs[:S]):
        ub_xy[i] = u
        lb_xy[i] = l
        valid[i] = True
    return ub_xy, lb_xy, valid


def select_corridor_oracle(wx, wy, wpsi, delta_s, prev_psi, seg_list,
                           safety_margin):
    """Horizon selection loop (reference_path.py:535-648, intended Q2 fix)."""
    N = len(wx)
    ub_hor = np.zeros(N)
    lb_hor = np.zeros(N)
    cells_sm = np.zeros((N, 2, 2))
    ub_prev = np.zeros(2)
    lb_prev = np.zeros(2)

    for n in range(N):
        ub_xy, lb_xy, valid = seg_list[n]
        idxs = np.flatnonzero(valid)
        if len(idxs) == 0:
            ub_ls = np.array([wx[n], wy[n]])
            lb_ls = np.array([wx[n], wy[n]])
        elif n == 0:
            widths = [math.hypot(*(ub_xy[i] - lb_xy[i])) for i in idxs]
            sel = idxs[int(np.argmax(widths))]
            ub_ls, lb_ls = ub_xy[sel], lb_xy[sel]
        else:
            proj = delta_s[n] * np.array([math.cos(prev_psi[n]), math.sin(prev_psi[n])])
            ub_pw = ub_prev + proj
            lb_pw = lb_prev + proj
            offs = [(math.hypot(*(ub_xy[i] - ub_pw)) + math.hypot(*(lb_xy[i] - lb_pw))) / 2
                    for i in idxs]
            sel = idxs[int(np.argmin(offs))]
            ub_ls, lb_ls = ub_xy[sel], lb_xy[sel]

        ang_ub = wrap(math.atan2(ub_ls[1] - wy[n], ub_ls[0] - wx[n]) - wpsi[n])
        ang_lb = wrap(math.atan2(lb_ls[1] - wy[n], lb_ls[0] - wx[n]) - wpsi[n])
        ub = np.sign(ang_ub) * math.hypot(ub_ls[0] - wx[n], ub_ls[1] - wy[n])
        lb = np.sign(ang_lb) * math.hypot(lb_ls[0] - wx[n], lb_ls[1] - wy[n])
        ub -= safety_margin
        lb += safety_margin
        if ub < lb:
            ub, lb = 0.0, 0.0

        a_ub = wrap(wpsi[n] + math.pi / 2)
        a_lb = wrap(wpsi[n] - math.pi / 2)
        d_ub = np.array([math.cos(a_ub), math.sin(a_ub)])
        d_lb = np.array([math.cos(a_lb), math.sin(a_lb)])
        w = np.array([wx[n], wy[n]])
        cells_sm[n, 0] = w + ub * d_ub
        cells_sm[n, 1] = w - lb * d_lb
        ub_prev = w + (ub + safety_margin) * d_ub
        lb_prev = w - (lb - safety_margin) * d_lb

        ub_hor[n] = ub
        lb_hor[n] = lb
    return ub_hor, lb_hor, cells_sm
