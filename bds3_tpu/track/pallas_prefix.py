"""Pallas TPU kernel: fused carrier mix + mask + exclusive prefix sums.

Replaces the XLA chain  int8->f32 cast, cos/sin, mask, i/q products,
2x cumsum  (several HBM round trips per epoch) with one pass over the
sample windows.  Tile size equals the phase-split block (SPLIT = 4096), so
the carrier phase is affine within each tile:

  cyc(i0 + j) = base[c, t] + j * slope[c]   (mod 1)

where base folds the split-table value, the epoch phase remainder, the
window-offset correction, and t*SPLIT*d_cyc (all computed by the caller).

Outputs exclusive prefixes P_i, P_q with P[x] = sum_{j<x} bb[j]; the
prefix-sum identity sum over [a,b) = P[b]-P[a] feeds the bucket
correlator unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPLIT = 4096
ROWS, LANES = 32, 128  # SPLIT = ROWS * LANES


def _tile_exclusive_prefix(x):
    """(32, 128) f32 -> (exclusive prefix, total) within the tile."""
    # inclusive prefix along lanes
    incl = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        rolled = pltpu.roll(incl, s, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        incl = incl + jnp.where(col >= s, rolled, 0.0)
    # exclusive row offsets from per-row totals
    row_tot = incl[:, LANES - 1 : LANES]          # (32, 1)
    row_incl = row_tot
    for s in (1, 2, 4, 8, 16):
        rolled = pltpu.roll(row_incl, s, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
        row_incl = row_incl + jnp.where(row >= s, rolled, 0.0)
    row_excl = row_incl - row_tot                 # (32, 1)
    excl = incl - x + row_excl
    total = row_incl[ROWS - 1, 0]
    return excl, total


def _kernel(base_ref, slope_ref, off_ref, blk_ref, win_ref,
            pi_ref, pq_ref, carry):
    ch = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry[0] = 0.0
        carry[1] = 0.0

    x = win_ref[0].astype(jnp.float32)          # (ROWS, LANES)
    lin = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))
    gidx = t * SPLIT + lin

    cyc = jnp.mod(base_ref[ch, t] + lin.astype(jnp.float32) * slope_ref[ch],
                  1.0)
    ang = (2.0 * np.pi) * cyc
    off = off_ref[ch]
    blk = blk_ref[ch]
    mask = ((gidx >= off) & (gidx < off + blk)).astype(jnp.float32)
    xm = x * mask
    ib = xm * jnp.cos(ang)
    qb = -(xm * jnp.sin(ang))

    ei, ti = _tile_exclusive_prefix(ib)
    eq, tq = _tile_exclusive_prefix(qb)
    pi_ref[0] = ei + carry[0]
    pq_ref[0] = eq + carry[1]
    carry[0] += ti
    carry[1] += tq


def mix_prefix(windows, base, slope, off, blk, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mix_prefix(windows, base, slope, off, blk, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mix_prefix(windows, base, slope, off, blk, interpret=False):
    """windows (C, n_win) int8 with n_win % 4096 == 0;
    base (C, T) f32 per-tile phase bases; slope (C,) f32; off/blk (C,) i32.
    Returns (P_i, P_q) each (C, n_win) f32 exclusive prefixes."""
    c, n_win = windows.shape
    t = n_win // SPLIT
    grid = (c, t)
    win3 = windows.reshape(c, n_win // LANES, LANES)
    out_shape = [
        jax.ShapeDtypeStruct((c, n_win // LANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((c, n_win // LANES, LANES), jnp.float32),
    ]
    vspec = pl.BlockSpec((1, ROWS, LANES), lambda ci, ti: (ci, ti, 0),
                         memory_space=pltpu.VMEM)
    p_i, p_q = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # base (C, T)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # slope (C,)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off (C,)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blk (C,)
            vspec,                                      # window tile
        ],
        out_specs=[vspec, vspec],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(base, slope, off.astype(jnp.int32), blk.astype(jnp.int32), win3)
    return p_i.reshape(c, n_win), p_q.reshape(c, n_win)
