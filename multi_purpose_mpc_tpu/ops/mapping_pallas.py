"""Fused per-lane map-update + scanline-extraction Pallas kernel.

The LiDAR-in-the-loop fleet's per-step map work is two passes over every
lane's occupancy grid: write the scan hits in (``ops.lidar.fleet_writeback``)
and read the N horizon scanlines back out (``ops.corridor_extract``).  Run
separately through XLA, each pass streams the full (B, H, W) grid stack
through HBM and the write-back additionally materializes its one-hot
operands and the (B, H, W) hit-count tensor in HBM — ~4x the occupancy
bytes actually touched (measured 4.5 + 2.9 ms/step at B=256 on a v5e).

This kernel fuses both passes: one program per lane holds the lane's grid
VMEM-resident (500x500 f32 = 1 MB << 16 MB VMEM), applies the hit write-back
as an in-VMEM one-hot matmul (MXU, exact: 0/1 operands, f32 accumulation),
stores the updated grid once, and contracts the N scanline windows against
the updated VMEM copy — HBM traffic collapses to the floor (one grid read +
one grid write + the (N, K) values).  Outputs are bitwise-identical to
``fleet_writeback(clear_free=False) -> extract_occ_pallas`` (same one-hot
construction, same window contraction; tests + ``bench.py --check`` pin it).

Reference behavior covered: the per-scan ``self.map.data[...] = 0`` hit
write of the out-of-repo ROS loop (README.md:76) + the per-waypoint
Bresenham occupancy reads of reference_path.py:466-520, batched per lane.

``clear_free=True`` (observed-free clearing) and ``shared_grid=True``
(cross-lane pooling) stay on the XLA paths — clearing needs nb x F sample
one-hots that defeat the VMEM budget, pooling needs a cross-lane reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_purpose_mpc_tpu.ops.corridor_extract import scanline_window_rows


def _make_fused_kernel(N: int, K: int, Hp: int, W: int, R: int, nbp: int):
    """One program = one lane: hit write-back into the VMEM-resident grid,
    then all N scanline-window contractions against the updated copy."""

    def kernel(row0_ref, occ_ref, hpx_ref, hpy_ref, hit_ref, px_ref, py_ref,
               occ_out_ref, vals_ref):
        b = pl.program_id(0)

        # --- write-back: occ := where(any beam hit the cell, 0, occ) ---
        hpx = hpx_ref[0, 0]  # (nbp,) clipped int32
        hpy = hpy_ref[0, 0]
        hit = hit_ref[0, 0]  # (nbp,) int32 0/1 (padding lanes 0)
        ih = jax.lax.broadcasted_iota(jnp.int32, (Hp, nbp), 0)
        iw = jax.lax.broadcasted_iota(jnp.int32, (nbp, W), 1)
        rowOH = ((hpy[None, :] == ih) & (hit[None, :] > 0)
                 ).astype(jnp.bfloat16)  # (Hp, nbp)
        colOH = (hpx[:, None] == iw).astype(jnp.bfloat16)  # (nbp, W)
        counts = jax.lax.dot_general(
            rowOH, colOH, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Hp, W)
        new_occ = jnp.where(counts > 0.5, 0.0, occ_ref[0])
        occ_out_ref[0] = new_occ

        # --- extraction: N scanline windows against the UPDATED grid ---
        # shared fragment with ops.corridor_extract (bitwise the same math)
        vals_ref[0] = scanline_window_rows(
            lambda r0a: occ_out_ref[0, pl.dslice(r0a, R), :],
            px_ref, py_ref, lambda n: row0_ref[b, n], N, K, W, R)

    return kernel


@functools.partial(jax.jit, static_argnames=("window_rows", "interpret"))
def writeback_extract_pallas(occ: jnp.ndarray, hpx: jnp.ndarray,
                             hpy: jnp.ndarray, hit: jnp.ndarray,
                             px: jnp.ndarray, py: jnp.ndarray,
                             row0: jnp.ndarray, window_rows: int,
                             interpret: bool = False):
    """Fused hit write-back + scanline extraction over per-lane grids.

    occ (B, Hp, W) f32 per-lane grids, rows pre-padded 8-aligned with
    ``Hp >= window_rows`` (keep the rollout carry padded: :func:`pad_rows`);
    hpx/hpy (B, nb) int32 hit pixel coords clipped in-bounds; hit (B, nb)
    bool; px/py (B, N, K) clipped scanline sample coords; row0 (B, N)
    8-aligned window starts with ``row0 + window_rows <= Hp``.

    Returns ``(new_occ (B, Hp, W), vals (B, N, K))`` — bitwise-equal to
    ``fleet_writeback(..., clear_free=False, shared=False)`` followed by
    ``extract_occ_pallas`` on the updated grids.
    """
    B, N, K = px.shape
    Hp, W = occ.shape[-2:]
    R = window_rows
    if Hp % 8 or Hp < R:
        raise ValueError(f"occ rows {Hp} must be 8-aligned and >= {R}")

    nb = hpx.shape[1]
    nbp = max(((nb + 127) // 128) * 128, 128)
    if nbp != nb:
        pad = [(0, 0), (0, nbp - nb)]
        hpx = jnp.pad(hpx, pad)
        hpy = jnp.pad(hpy, pad)
        hit = jnp.pad(hit, pad)
    # dummy middle axis: Mosaic needs the last two block dims to equal the
    # array dims (or be (8, 128)-divisible); (1, nbp) of (B, nbp) is neither
    hpx, hpy, hit = (a[:, None, :] for a in (hpx, hpy, hit))

    kernel = _make_fused_kernel(N, K, Hp, W, R, nbp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hp, W), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbp), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbp), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbp), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, K), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, K), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Hp, W), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, K), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    new_occ, vals = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, Hp, W), occ.dtype),
                   jax.ShapeDtypeStruct((B, N, K), jnp.float32)],
        interpret=interpret,
    )(row0, occ, hpx, hpy, hit.astype(jnp.int32), px, py)
    return new_occ, vals


def pad_rows(occ: jnp.ndarray, window_rows: int) -> jnp.ndarray:
    """Pad the row axis 8-aligned and >= window_rows (pad cells read as
    free=1.0, matching clipped-coordinate reads of in-bounds samples —
    `inb` masking handles true out-of-bounds)."""
    H = occ.shape[-2]
    Hp = ((max(H, window_rows) + 7) // 8) * 8
    if Hp == H:
        return occ
    pad = [(0, 0)] * (occ.ndim - 2) + [(0, Hp - H), (0, 0)]
    return jnp.pad(occ, pad, constant_values=1.0)


# ---------------------------------------------------------------------------
# Bit-packed variant: occupancy packed 32 rows/int32 word in HBM
# ---------------------------------------------------------------------------
#
# The (B, Hp, W) f32 stack is the LiDAR fleet's HBM-dominant tensor (1 MB per
# Sim_Track lane) and the fused kernel is bandwidth-bound on exactly it
# (ROUND_NOTES r3: 2.14 ms/step = 41% of the lidar step at B=256).  The grid
# is strictly binary (1=free / 0=occupied), so the HBM-resident carry packs
# bit j of word (r, c) = cell (32 r + j, c) — 32x fewer bytes per step and
# 32x more lanes per chip.  Inside the kernel the lane's grid is UNPACKED
# into VMEM scratch once (VPU shifts), the write-back + window extraction
# run unchanged on the f32 copy (bitwise the unpacked kernel's math), and
# the updated grid repacks on the way out.  Row packing (not column) keeps
# the 128-wide lane dimension intact for Mosaic.

def _make_fused_kernel_packed(N: int, K: int, Hp: int, W: int, R: int,
                              nbp: int):
    WR = Hp // 32  # word rows

    def kernel(row0_ref, pk_ref, hpx_ref, hpy_ref, hit_ref, px_ref, py_ref,
               pk_out_ref, vals_ref, occ_scr):
        b = pl.program_id(0)

        # --- unpack: word row r -> f32 rows 32r..32r+31 of the scratch ---
        sh = jax.lax.broadcasted_iota(jnp.int32, (32, W), 0)
        for r in range(WR):
            word = pk_ref[0, r, :]  # (W,) int32
            bits = jax.lax.shift_right_logical(
                jnp.broadcast_to(word[None, :], (32, W)), sh) & 1
            occ_scr[32 * r:32 * r + 32, :] = bits.astype(jnp.float32)

        # --- write-back: occ := where(any beam hit the cell, 0, occ) ---
        # (same one-hot construction as the unpacked kernel)
        hpx = hpx_ref[0, 0]
        hpy = hpy_ref[0, 0]
        hit = hit_ref[0, 0]
        ih = jax.lax.broadcasted_iota(jnp.int32, (Hp, nbp), 0)
        iw = jax.lax.broadcasted_iota(jnp.int32, (nbp, W), 1)
        rowOH = ((hpy[None, :] == ih) & (hit[None, :] > 0)
                 ).astype(jnp.bfloat16)
        colOH = (hpx[:, None] == iw).astype(jnp.bfloat16)
        counts = jax.lax.dot_general(
            rowOH, colOH, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        occ_scr[:, :] = jnp.where(counts > 0.5, 0.0, occ_scr[:, :])

        # --- repack + store (sum of distinct powers of two == bitwise or;
        # int32 add wraps, so bit 31 packs exactly) ---
        for r in range(WR):
            blk = occ_scr[32 * r:32 * r + 32, :]
            words = jnp.sum(
                jax.lax.shift_left((blk > 0.5).astype(jnp.int32), sh),
                axis=0, dtype=jnp.int32)
            pk_out_ref[0, r, :] = words

        # --- extraction: N scanline windows against the updated scratch ---
        vals_ref[0] = scanline_window_rows(
            lambda r0a: occ_scr[pl.dslice(r0a, R), :],
            px_ref, py_ref, lambda n: row0_ref[b, n], N, K, W, R)

    return kernel


@functools.partial(jax.jit, static_argnames=("window_rows", "interpret"))
def writeback_extract_packed(occ_pk: jnp.ndarray, hpx: jnp.ndarray,
                             hpy: jnp.ndarray, hit: jnp.ndarray,
                             px: jnp.ndarray, py: jnp.ndarray,
                             row0: jnp.ndarray, window_rows: int,
                             interpret: bool = False):
    """Fused hit write-back + scanline extraction over BIT-PACKED per-lane
    grids.

    ``occ_pk`` (B, Hp/32, W) int32 row-packed grids (:func:`pack_rows`);
    other arguments and the returned ``vals`` exactly as
    :func:`writeback_extract_pallas`.  Returns ``(new_occ_pk, vals)`` with
    the grid still packed — the rollout carry never unpacks.
    """
    B, N, K = px.shape
    WR, W = occ_pk.shape[-2:]
    Hp = WR * 32
    R = window_rows
    if Hp < R:
        raise ValueError(f"packed rows {Hp} must be >= window_rows {R}")

    nb = hpx.shape[1]
    nbp = max(((nb + 127) // 128) * 128, 128)
    if nbp != nb:
        pad = [(0, 0), (0, nbp - nb)]
        hpx = jnp.pad(hpx, pad)
        hpy = jnp.pad(hpy, pad)
        hit = jnp.pad(hit, pad)
    hpx, hpy, hit = (a[:, None, :] for a in (hpx, hpy, hit))

    kernel = _make_fused_kernel_packed(N, K, Hp, W, R, nbp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, WR, W), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbp), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbp), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbp), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, K), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, K), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, WR, W), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, K), lambda b, r0: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Hp, W), jnp.float32)],
    )
    new_pk, vals = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, WR, W), jnp.int32),
                   jax.ShapeDtypeStruct((B, N, K), jnp.float32)],
        interpret=interpret,
    )(row0, occ_pk, hpx, hpy, hit.astype(jnp.int32), px, py)
    return new_pk, vals


def pack_rows(occ: jnp.ndarray, window_rows: int) -> jnp.ndarray:
    """(..., H, W) binary f32 grid -> (..., ceil/32, W) int32 row-packed,
    rows padded (free=1.0) to a multiple of 32 that is >= ``window_rows``
    and 8-aligned (trivially, 32 | Hp)."""
    H = occ.shape[-2]
    Hp = ((max(H, window_rows) + 31) // 32) * 32
    if Hp != H:
        pad = [(0, 0)] * (occ.ndim - 2) + [(0, Hp - H), (0, 0)]
        occ = jnp.pad(occ, pad, constant_values=1.0)
    bits = (occ > 0.5).astype(jnp.int32)
    shape = occ.shape[:-2] + (Hp // 32, 32, occ.shape[-1])
    bits = bits.reshape(shape)
    sh = jnp.broadcast_to(jnp.arange(32, dtype=jnp.int32)[:, None],
                          bits.shape)
    return jnp.sum(jax.lax.shift_left(bits, sh), axis=-2, dtype=jnp.int32)


def unpack_rows(occ_pk: jnp.ndarray, H: int) -> jnp.ndarray:
    """(..., WR, W) int32 row-packed -> (..., H, W) f32 binary grid."""
    WR, W = occ_pk.shape[-2:]
    words = jnp.broadcast_to(occ_pk[..., :, None, :],
                             occ_pk.shape[:-2] + (WR, 32, W))
    sh = jnp.broadcast_to(jnp.arange(32, dtype=jnp.int32)[:, None],
                          words.shape)
    bits = jax.lax.shift_right_logical(words, sh) & 1
    out = bits.reshape(occ_pk.shape[:-2] + (WR * 32, W)).astype(jnp.float32)
    return out[..., :H, :]
