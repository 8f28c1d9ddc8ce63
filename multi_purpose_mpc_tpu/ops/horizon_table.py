"""Windowed horizon table: one gather per step instead of ~10 x B x N.

Round-3 profiling at batch 4096 (Sim_Track, N=30) showed the static-fleet
step spending 7.6 ms/step — 30% of the whole 25.3 ms step — in the
*inputs* of the corridor-selection kernel, and nearly nothing in the kernel
itself: XLA lowers ``table[idx]`` with a (B, N) index array as ~B*N
serialized small row fetches (~6.4 ms for the segment/pose gathers alone).

But horizon indices are CONSECUTIVE waypoints: ``idx[b, n] =
wrap(wp_id[b] + 1 + n)`` (reference MPC.py:93-94 walks ``wp_id + n``).  So
every per-(waypoint, horizon-step) quantity the control step consumes can be
pre-windowed ONCE at setup into a ``(n_wp, N, F)`` table; the per-step work
collapses to a single ``table[wp_id]`` take of B contiguous (N, F) rows
(~0.2 ms at B=4096) plus elementwise column slices.

The table packs, per base waypoint ``w`` and horizon step ``n``:

* corridor-selection inputs at waypoint ``w + 1 + n`` (the reference passes
  ``wp_id + 1`` to ``update_path_constraints``, MPC.py:116): pose
  (x, y, cos psi, sin psi), the previous horizon step's pose/arc data
  (ds, cos psi_prev, sin psi_prev), and the static free-segment candidates
  (ub_xy, lb_xy, valid) from :func:`...constraints.extract_all_segments`;
* LTV/QP inputs at waypoint ``w + n`` (MPC.py:93-100): v_ref, kappa,
  delta_s.

Circular wrap / non-circular clamp semantics (SURVEY.md Q4) are baked in at
build time via :func:`...path.gather_waypoint_index`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.config import MPCConfig
from multi_purpose_mpc_tpu.ops.constraints import Corridor, SegmentCandidates
from multi_purpose_mpc_tpu.ops.path import PathData, gather_waypoint_index

# column layout (S = cfg.max_segments)
_NPOSE = 7  # x, y, cos, sin, ds, cos_prev, sin_prev


def _cols(S: int):
    ub0 = _NPOSE
    lb0 = ub0 + 2 * S
    va0 = lb0 + 2 * S
    sol0 = va0 + S
    return ub0, lb0, va0, sol0, sol0 + 3  # ..., total F


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_horizon_table(path: PathData, segs: SegmentCandidates,
                        cfg: MPCConfig) -> jnp.ndarray:
    """(n_wp, N, F) float32 window table; see module docstring."""
    N = cfg.N
    S = segs.valid.shape[-1]
    n_wp = path.n_wp
    w = jnp.arange(n_wp, dtype=jnp.int32)[:, None]
    offs = jnp.arange(N, dtype=jnp.int32)[None, :]
    idxc = gather_waypoint_index(path, w + 1, offs)  # (n_wp, N) corridor
    idxs = gather_waypoint_index(path, w, offs)  # (n_wp, N) solver
    prev = jnp.concatenate([idxc[:, :1], idxc[:, :-1]], axis=1)

    psi_c = path.psi[idxc]
    psi_p = path.psi[prev]
    cols = [
        path.x[idxc], path.y[idxc], jnp.cos(psi_c), jnp.sin(psi_c),
        path.seg_dist[prev], jnp.cos(psi_p), jnp.sin(psi_p),
    ]
    cols.append(segs.ub_xy[idxc].reshape(n_wp, N, 2 * S))
    cols.append(segs.lb_xy[idxc].reshape(n_wp, N, 2 * S))
    cols.append(segs.valid[idxc].astype(jnp.float32))
    cols.append(path.v_ref[idxs])
    cols.append(path.kappa[idxs])
    cols.append(path.seg_dist[idxs])
    cols = [c[..., None] if c.ndim == 2 else c for c in cols]
    return jnp.concatenate(cols, axis=-1).astype(jnp.float32)


def gather_horizon_block(table: jnp.ndarray, wp_id: jnp.ndarray) -> jnp.ndarray:
    """One contiguous-row take: (B,) base waypoint ids -> (B, N, F)."""
    return table[wp_id]


def solver_inputs_from_block(blk: jnp.ndarray, S: int):
    """(B, N, F) -> v_ref, kappa_ref, delta_s — replaces the three (B, N)
    row gathers in the fused-solver prep (mpc.py)."""
    _, _, _, sol0, _ = _cols(S)
    return blk[..., sol0], blk[..., sol0 + 1], blk[..., sol0 + 2]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "safety_margin", "lanes", "interpret"))
def corridor_select_from_block(blk: jnp.ndarray, cfg: MPCConfig,
                               safety_margin: float,
                               lanes: int = 128,
                               interpret: bool = False) -> Corridor:
    """Corridor continuity selection from a gathered window block.

    Same kernel and call plumbing as
    :func:`...corridor_pallas.corridor_select_pallas` (delegates to
    ``select_call_lanes_last``; cross-checked bitwise by tests) — only the
    input views differ: column slices of the (B, N, F) block replace ten
    separate (B, N)-indexed gathers.
    """
    from multi_purpose_mpc_tpu.ops.corridor_pallas import select_call_lanes_last

    N = cfg.N
    S = cfg.max_segments
    ub0, lb0, va0, _, _ = _cols(S)
    B = blk.shape[0]
    pad = (-B) % lanes
    if pad:
        blk = jnp.concatenate(
            [blk, jnp.broadcast_to(blk[:1], (pad,) + blk.shape[1:])])
    Bp = B + pad

    t2 = lambda a: jnp.transpose(a, (1, 0))
    wx = t2(blk[..., 0])
    wy = t2(blk[..., 1])
    cpsi = t2(blk[..., 2])
    spsi = t2(blk[..., 3])
    ds = t2(blk[..., 4])
    cprev = t2(blk[..., 5])
    sprev = t2(blk[..., 6])
    ubxy = jnp.transpose(blk[..., ub0:ub0 + 2 * S].reshape(Bp, N, S, 2),
                         (1, 2, 3, 0))
    lbxy = jnp.transpose(blk[..., lb0:lb0 + 2 * S].reshape(Bp, N, S, 2),
                         (1, 2, 3, 0))
    valid = jnp.transpose(blk[..., va0:va0 + S], (1, 2, 0))

    return select_call_lanes_last(ubxy, lbxy, valid, wx, wy, cpsi, spsi,
                                  ds, cprev, sprev, N=N, S=S,
                                  safety_margin=float(safety_margin),
                                  out_batch=B, lanes=lanes,
                                  interpret=interpret)
