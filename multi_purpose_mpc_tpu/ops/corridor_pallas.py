"""Pallas TPU kernel for the corridor continuity-selection scan.

After the ADMM kernel removed the QP bottleneck, the next cost in the fleet
step was the corridor selection (ops/constraints.select_corridor): a
``lax.scan`` over the N horizon stages whose every step is a handful of tiny
batched ops — ~600 dispatches per control step.  This kernel runs the whole
selection for a tile of lanes in one ``pallas_call`` with the stage loop
unrolled in VMEM (lanes-last layout, like the ADMM kernel).

Trig identities replace the transcendentals the XLA version uses:

* ``sign(wrap(atan2(dy, dx) - psi)) == sign(dy cos(psi) - dx sin(psi))``
  (the sign of the cross product) — no atan2 / angle wrap in the kernel;
* the orthogonal directions are ``(-sin psi, cos psi)`` / ``(sin psi,
  -cos psi)`` — no wrapped ``psi +- pi/2``.

Semantics identical to :func:`...ops.constraints.select_corridor`
(reference_path.py:535-648 with the Q2 fix); cross-checked by tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_purpose_mpc_tpu.config import MPCConfig
from multi_purpose_mpc_tpu.ops.constraints import Corridor, SegmentCandidates
from multi_purpose_mpc_tpu.ops.path import PathData, gather_waypoint_index

DEFAULT_LANES = 128
_BIG = 1e9


def _make_kernel(N: int, S: int, safety_margin: float):
    sm = safety_margin

    def kernel(ubxy_ref, lbxy_ref, valid_ref, wx_ref, wy_ref, cos_ref, sin_ref,
               ds_ref, cosp_ref, sinp_ref,
               ub_out, lb_out, cub_out, clb_out):
        ubxy = ubxy_ref[:]  # (N, S, 2, L)
        lbxy = lbxy_ref[:]  # (N, S, 2, L)
        valid = valid_ref[:]  # (N, S, L) float 0/1
        wx = wx_ref[:]  # (N, L)
        wy = wy_ref[:]
        cpsi = cos_ref[:]  # cos(psi)
        spsi = sin_ref[:]
        ds = ds_ref[:]  # (N, L) distance from previous horizon wp
        cprev = cosp_ref[:]  # cos(prev psi)
        sprev = sinp_ref[:]

        # trailing lane dims: (L,) classic, (S_sub, 128) packed — the body
        # is lane-shape-generic (static leading indices + elementwise math)
        LS = wx.shape[1:]
        dtype = wx.dtype
        zeros = jnp.zeros(LS, dtype)

        ub_prev_x = zeros
        ub_prev_y = zeros
        lb_prev_x = zeros
        lb_prev_y = zeros

        ubs, lbs, cubs, clbs = [], [], [], []
        for n in range(N):
            x = wx[n]
            y = wy[n]
            cp = cpsi[n]
            sp = spsi[n]

            # --- candidate choice ---
            proj_x = ds[n] * cprev[n]
            proj_y = ds[n] * sprev[n]
            ub_pw_x = ub_prev_x + proj_x
            ub_pw_y = ub_prev_y + proj_y
            lb_pw_x = lb_prev_x + proj_x
            lb_pw_y = lb_prev_y + proj_y

            best_score = jnp.full(LS, _BIG, dtype)
            sel_ubx = x
            sel_uby = y
            sel_lbx = x
            sel_lby = y
            any_valid = jnp.zeros(LS, dtype)
            for s in range(S):
                v = valid[n, s]
                ux = ubxy[n, s, 0]
                uy = ubxy[n, s, 1]
                lx = lbxy[n, s, 0]
                ly = lbxy[n, s, 1]
                if n == 0:
                    # widest segment (reference_path.py:544-548); minimize
                    # negative width so one "best_score < " rule serves both
                    w2 = (ux - lx) ** 2 + (uy - ly) ** 2
                    score = -w2
                else:
                    d_ub = jnp.sqrt((ux - ub_pw_x) ** 2 + (uy - ub_pw_y) ** 2)
                    d_lb = jnp.sqrt((lx - lb_pw_x) ** 2 + (ly - lb_pw_y) ** 2)
                    score = (d_ub + d_lb) * 0.5
                better = (v > 0.5) & (score < best_score)
                best_score = jnp.where(better, score, best_score)
                sel_ubx = jnp.where(better, ux, sel_ubx)
                sel_uby = jnp.where(better, uy, sel_uby)
                sel_lbx = jnp.where(better, lx, sel_lbx)
                sel_lby = jnp.where(better, ly, sel_lby)
                any_valid = jnp.maximum(any_valid, v)

            # --- signed orthogonal distances ---
            dux = sel_ubx - x
            duy = sel_uby - y
            dlx = sel_lbx - x
            dly = sel_lby - y
            # sign(wrap(atan2(dy,dx) - psi)) == sign of the cross product
            sign_ub = jnp.sign(duy * cp - dux * sp)
            sign_lb = jnp.sign(dly * cp - dlx * sp)
            ub = sign_ub * jnp.sqrt(dux * dux + duy * duy) - sm
            lb = sign_lb * jnp.sqrt(dlx * dlx + dly * dly) + sm
            infeasible = ub < lb
            ub = jnp.where(infeasible, 0.0, ub)
            lb = jnp.where(infeasible, 0.0, lb)

            # border cells; orthogonal dirs: ub along (-sin, cos), lb uses
            # -(cos(psi - pi/2), sin(psi - pi/2)) = (-sin, cos) as well
            dx_o = -sp
            dy_o = cp
            cub_x = x + ub * dx_o
            cub_y = y + ub * dy_o
            clb_x = x + lb * dx_o
            clb_y = y + lb * dy_o
            ub_prev_x = x + (ub + sm) * dx_o
            ub_prev_y = y + (ub + sm) * dy_o
            lb_prev_x = x + (lb - sm) * dx_o
            lb_prev_y = y + (lb - sm) * dy_o

            ubs.append(ub)
            lbs.append(lb)
            cubs.append(jnp.stack([cub_x, cub_y]))
            clbs.append(jnp.stack([clb_x, clb_y]))

        ub_out[:] = jnp.stack(ubs)
        lb_out[:] = jnp.stack(lbs)
        cub_out[:] = jnp.stack(cubs)
        clb_out[:] = jnp.stack(clbs)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("cfg", "safety_margin", "lanes", "interpret"))
def corridor_select_pallas(path: PathData, all_segs: SegmentCandidates,
                           wp_id: jnp.ndarray, cfg: MPCConfig,
                           safety_margin: float,
                           lanes: int = DEFAULT_LANES,
                           interpret: bool = False) -> Corridor:
    """Batched corridor from precomputed per-waypoint candidates via the
    fused kernel (static-grid fast path).

    ``wp_id``: (B,) horizon start indices (callers pass ``wp_id + 1`` like
    the reference, MPC.py:116).  Returns a Corridor with leading batch axis.
    """
    N = cfg.N
    B = wp_id.shape[0]
    offs = jnp.arange(N)
    idx = jax.vmap(lambda w: gather_waypoint_index(path, w, offs))(wp_id)  # (B, N)
    segs = SegmentCandidates(ub_xy=all_segs.ub_xy[idx],
                             lb_xy=all_segs.lb_xy[idx],
                             valid=all_segs.valid[idx])
    return corridor_select_pallas_segs(path, segs, idx, cfg, safety_margin,
                                       lanes=lanes, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "safety_margin", "lanes", "interpret"))
def corridor_select_pallas_segs(path: PathData, segs: SegmentCandidates,
                                idx: jnp.ndarray, cfg: MPCConfig,
                                safety_margin: float,
                                lanes: int = DEFAULT_LANES,
                                interpret: bool = False) -> Corridor:
    """Batched corridor from per-(lane, horizon-step) candidates — the
    dynamic-grid path (LiDAR-in-the-loop fleets extract per-lane segments
    each step and select here).  ``segs`` leading (B, N, S); ``idx`` (B, N)
    horizon waypoint indices.
    """
    N = cfg.N
    S = segs.valid.shape[-1]
    B = idx.shape[0]
    pad = (-B) % lanes
    if pad:
        padB = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
        idx = padB(idx)
        segs = SegmentCandidates(ub_xy=padB(segs.ub_xy),
                                 lb_xy=padB(segs.lb_xy),
                                 valid=padB(segs.valid))
    Bp = B + pad

    prev_idx = jnp.concatenate([idx[:, :1], idx[:, :-1]], axis=1)

    t2 = lambda a: jnp.transpose(a, (1, 0))  # (Bp, N) -> (N, Bp)
    wx = t2(path.x[idx])
    wy = t2(path.y[idx])
    psi = path.psi[idx]
    cpsi = t2(jnp.cos(psi))
    spsi = t2(jnp.sin(psi))
    ds = t2(path.seg_dist[prev_idx])
    ppsi = path.psi[prev_idx]
    cprev = t2(jnp.cos(ppsi))
    sprev = t2(jnp.sin(ppsi))

    ubxy = jnp.transpose(segs.ub_xy, (1, 2, 3, 0))  # (N, S, 2, Bp)
    lbxy = jnp.transpose(segs.lb_xy, (1, 2, 3, 0))
    valid = jnp.transpose(segs.valid.astype(jnp.float32), (1, 2, 0))

    return select_call_lanes_last(ubxy, lbxy, valid, wx, wy, cpsi, spsi,
                                  ds, cprev, sprev, N=N, S=S,
                                  safety_margin=float(safety_margin),
                                  out_batch=B, lanes=lanes,
                                  interpret=interpret)


def select_call_lanes_last(ubxy, lbxy, valid, wx, wy, cpsi, spsi, ds, cprev,
                           sprev, *, N: int, S: int, safety_margin: float,
                           out_batch: int, lanes: int,
                           interpret: bool = False) -> Corridor:
    """Shared ``pallas_call`` plumbing for the selection kernel: takes the
    kernel-layout inputs (lanes-LAST, batch pre-padded to a multiple of
    ``lanes``), tiles the lane axis, and unpacks the Corridor (first
    ``out_batch`` lanes).  Used by both selection entry points here and the
    windowed-horizon-table path (:mod:`..ops.horizon_table`) so block specs
    and output unpacking cannot drift."""
    Bp = wx.shape[-1]
    kernel = _make_kernel(N, S, safety_margin)
    f32 = jnp.float32
    in_blocks = [(N, S, 2), (N, S, 2), (N, S),
                 (N,), (N,), (N,), (N,), (N,), (N,), (N,)]
    out_blocks = [(N,), (N,), (N, 2), (N, 2)]
    raw = (ubxy, lbxy, valid, wx, wy, cpsi, spsi, ds, cprev, sprev)

    # 2-D packed lane tiles (lanes >= 1024 -> (S_sub, 128)): single-tile
    # pallas_calls in a Python loop, exactly like the ADMM solver's
    # _dispatch_tiles.  Bitwise-identical to the 1-D layout (interpret
    # test), but measured SLOWER end-to-end for THIS kernel (r5: headline
    # 553k vs 671k steps/s at B=4096) — the selection body is small enough
    # that tile-stack transposes + per-tile call overhead beat the sublane
    # packing, so production call sites keep lanes=128; the path stays for
    # experiments and as the pattern reference.
    from multi_purpose_mpc_tpu.ops.admm_pallas import _lane_shape

    lblk = _lane_shape(lanes)
    if len(lblk) == 2:
        S_sub, LW = lblk
        n_tiles = Bp // lanes

        def to_tiles(a):  # (..., Bp) -> (tiles, ..., S_sub, 128)
            a = a.reshape(a.shape[:-1] + (n_tiles, S_sub, LW))
            return jnp.moveaxis(a, -3, 0)

        def spec1(s):
            return pl.BlockSpec(s + lblk,
                                (lambda i, _n=len(s) + 2: (0,) * _n),
                                memory_space=pltpu.VMEM)

        call = pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(1,),
                in_specs=[spec1(s) for s in in_blocks],
                out_specs=[spec1(s) for s in out_blocks]),
            out_shape=[jax.ShapeDtypeStruct(s + lblk, f32)
                       for s in out_blocks],
            interpret=interpret,
        )
        tiles_in = tuple(to_tiles(a) for a in raw)
        per_tile = [call(*(a[i] for a in tiles_in)) for i in range(n_tiles)]
        outs = [jnp.stack(parts) for parts in zip(*per_tile)]

        def from_tiles(a):
            a = jnp.moveaxis(a, 0, -3)
            return a.reshape(a.shape[:-3] + (Bp,))

        ub, lb, cub, clb = (from_tiles(o) for o in outs)
    else:
        def spec(s):
            return pl.BlockSpec(s + (lanes,),
                                (lambda i, _nd=len(s): (0,) * _nd + (i,)),
                                memory_space=pltpu.VMEM)

        grid_spec = pl.GridSpec(
            grid=(Bp // lanes,),
            in_specs=[spec(s) for s in in_blocks],
            out_specs=[spec(s) for s in out_blocks],
        )
        out_shapes = [jax.ShapeDtypeStruct(s + (Bp,), f32)
                      for s in out_blocks]
        ub, lb, cub, clb = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shapes,
            interpret=interpret,
        )(*raw)

    B = out_batch
    return Corridor(ub=jnp.transpose(ub, (1, 0))[:B],
                    lb=jnp.transpose(lb, (1, 0))[:B],
                    border_ub=jnp.transpose(cub, (2, 0, 1))[:B],
                    border_lb=jnp.transpose(clb, (2, 0, 1))[:B])
