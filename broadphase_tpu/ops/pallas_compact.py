"""Pallas TPU kernel: single-pass streaming stream-compaction.

Moves the kept lanes of u32 columns to the front, preserving order — the
same contract as ``ops.compact.stable_compact`` but in ONE pass over HBM
instead of ``ceil(log2(P))`` shift+select passes (~17 ms at 16M lanes).

How: the grid walks tiles in order (TPU grid steps are sequential;
``dimension_semantics=("arbitrary",)`` pins it).  Each tile log-shift
compacts its 1024 lanes in VMEM (10 staged shifts), appends the survivors
to a 2048-entry staging buffer at the current fill offset (a dynamic
element-roll decomposed into two sublane rolls + a lane roll + a lane
select), and flushes one aligned 1024-block to the output when the
staging buffer holds at least one (a tile appends at most 1024, so one
flush keeps the fill below 1024).  The final grid step pads the staging
remainder with the fill value and flushes it, then writes one more fill
block so readers see fill values through the next aligned boundary.

Output lanes at or beyond the kept count hold ``fill``.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 32                      # 4096 entries/grid step: the grid is
TILE = TILE_ROWS * LANES            # sequential (carried offsets), so
STAGE_ROWS = 2 * TILE_ROWS          # bigger tiles amortize per-step latency


def auto_tile_rows(n: int, small: int = TILE_ROWS, big: int = 128,
                   threshold: int = 1 << 21) -> int:
    """Tile rows for a sequential-grid streaming kernel: per-step fixed
    costs dominate big inputs (measured: 16M lanes at 4096-entry tiles
    spend ~6 of 7 ms on ~3900 step latencies), so scale the tile with the
    input.  Shared by stream_compact / prep_runs / run_ends so a retune
    moves every kernel to the same regime."""
    return big if n >= threshold else small


def _bc(mask, a):
    return mask


def _elem_roll(x: jnp.ndarray, s) -> jnp.ndarray:
    """Row-major circular roll of a (R, 128) tile by a dynamic element
    count s: out[i] = x[(i - s) mod (R*128)]."""
    a = s // LANES
    b = s % LANES
    x1 = pltpu.roll(x, a, axis=0)
    x2 = pltpu.roll(x, a + 1, axis=0)
    y1 = pltpu.roll(x1, b, axis=1)
    y2 = pltpu.roll(x2, b, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= b, y1, y2)


def _tile_compact(keep, cols, iota=None):
    """In-tile ranked-shift compaction of (R, 128) row-major tiles (shape
    taken from ``keep``).  Returns (compacted cols, kept count)."""
    del iota
    n_elems = keep.shape[0] * LANES
    ki = keep.astype(jnp.int32)
    # row-major exclusive prefix sum of drops via staged element shifts
    drops = 1 - ki
    pref = drops
    d = 1
    while d < n_elems:
        # shift right by d (row-major): inverse of _shift_left
        r, c = d // LANES, d % LANES
        y = pref
        if r:
            y = jnp.concatenate(
                [jnp.zeros((r, LANES), jnp.int32), y[:-r]], axis=0)
        if c:
            prev = jnp.concatenate(
                [jnp.zeros((1, LANES), jnp.int32), y[:-1]], axis=0)
            y = jnp.concatenate([prev[:, LANES - c:], y[:, :LANES - c]],
                                axis=1)
        pref = pref + y
        d <<= 1
    drops_excl = pref - drops
    rem = jnp.where(keep, drops_excl, 0)
    arrs = list(cols)
    b = 1
    while b < n_elems:
        rr, cc = b // LANES, b % LANES

        def shl(a, fill=0):
            y = a
            if rr:
                y = jnp.concatenate(
                    [y[rr:], jnp.full((rr, LANES), fill, a.dtype)], axis=0)
            if cc:
                nxt = jnp.concatenate(
                    [y[1:], jnp.full((1, LANES), fill, y.dtype)], axis=0)
                y = jnp.concatenate([y[:, cc:], nxt[:, :cc]], axis=1)
            return y

        rem_in = shl(rem)
        recv = (rem_in & b) != 0
        arrs = [jnp.where(recv, shl(a), a) for a in arrs]
        rem = jnp.where(recv, rem_in - b, rem)
        b <<= 1
    return arrs, jnp.sum(ki)


def _make_kernel(n_cols, n_tiles, fills, tile_rows=TILE_ROWS):
    TR = tile_rows
    TL = TR * LANES
    SR = 2 * TR

    def kernel(keep_ref, *refs):
        col_refs = refs[:n_cols]
        out_refs = refs[n_cols:2 * n_cols]
        cnt_ref = refs[2 * n_cols]
        stage = refs[2 * n_cols + 1:2 * n_cols + 1 + n_cols]
        pos_ref = refs[2 * n_cols + 1 + n_cols]      # SMEM: (2,) fill, flushed_blocks
        sems = refs[2 * n_cols + 2 + n_cols]

        g = pl.program_id(0)
        iota = (jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0)
                * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 1))

        @pl.when(g == 0)
        def _init():
            pos_ref[0] = 0      # entries currently in staging
            pos_ref[1] = 0      # 1024-blocks already flushed
            for s, f in zip(stage, fills):
                s[:] = jnp.full((SR, LANES), f, jnp.uint32)

        keep = keep_ref[:] != 0
        cols = tuple(r[:] for r in col_refs)
        compacted, k = _tile_compact(keep, cols, iota)

        staged = pos_ref[0]
        # append: entries land at staging offsets [staged, staged + k)
        for s, c, f in zip(stage, compacted, fills):
            pad2 = jnp.concatenate(
                [c, jnp.full((TR, LANES), f, c.dtype)], axis=0)
            rolled = _elem_roll(pad2, staged)
            sidx = (jax.lax.broadcasted_iota(jnp.int32,
                                             (SR, LANES), 0) * LANES
                    + jax.lax.broadcasted_iota(jnp.int32,
                                               (SR, LANES), 1))
            put = (sidx >= staged) & (sidx < staged + k)
            s[:] = jnp.where(put, rolled, s[:])
        staged = staged + k
        pos_ref[0] = staged

        is_last = g == n_tiles - 1

        @pl.when(staged >= TL)
        def _flush():
            blk = pos_ref[1]
            copies = [pltpu.make_async_copy(
                s.at[pl.ds(0, TR), :],
                o.at[pl.ds(blk * TR, TR), :],
                sems.at[i]) for i, (s, o) in enumerate(zip(stage, out_refs))]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            for s, f in zip(stage, fills):
                shifted = pltpu.roll(s[:], SR - TR, axis=0)
                lanei = jax.lax.broadcasted_iota(
                    jnp.int32, (SR, LANES), 0)
                s[:] = jnp.where(lanei < TR, shifted,
                                 jnp.full((SR, LANES), f,
                                          jnp.uint32))
            pos_ref[1] = blk + 1
            pos_ref[0] = staged - TL

        @pl.when(is_last)
        def _final():
            # flush the (partial) remainder; staging holds fill beyond it
            blk = pos_ref[1]
            copies = [pltpu.make_async_copy(
                s.at[pl.ds(0, TR), :],
                o.at[pl.ds(blk * TR, TR), :],
                sems.at[i]) for i, (s, o) in enumerate(zip(stage, out_refs))]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            cnt_ref[0] = blk * TL + pos_ref[0]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("fills", "tile_rows", "interpret"))
def stream_compact(keep: jnp.ndarray, cols: Sequence[jnp.ndarray],
                   fills=None, tile_rows: int = 0,
                   interpret: bool = False
                   ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Single-pass ordered compaction of u32 columns by ``keep``.

    Returns ((compacted cols...), count).  Lanes at or beyond count hold
    ``fill`` up to the next 1024 boundary past the count; the remaining
    tail is fill too (outputs are fill-initialized by the flush scheme
    only through the final block — callers must treat lanes >= count as
    undefined unless they stay within one block past count).  The safe
    contract used here: callers mask with ``lane < count`` or rely on
    fill values, which are guaranteed for the whole output because every
    block is either flushed (staging is fill beyond its live entries) or
    never written (see `_pad_blocks` — output length includes one spare
    fill block and unwritten blocks are prezeroed via jnp.full).
    """
    N0 = keep.shape[0]
    n_cols = len(cols)
    if fills is None:
        fills = (0xFFFF_FFFF,) * n_cols
    assert len(fills) == n_cols
    if tile_rows == 0:
        tile_rows = auto_tile_rows(N0)
    TL = tile_rows * LANES
    N = -(-N0 // TL) * TL
    if N != N0:
        keep = jnp.concatenate(
            [keep.astype(jnp.bool_), jnp.zeros((N - N0,), jnp.bool_)])
        cols = tuple(jnp.concatenate(
            [jnp.asarray(c, jnp.uint32),
             jnp.full((N - N0,), f, jnp.uint32)])
            for c, f in zip(cols, fills))
    n_tiles = N // TL
    # output gets one spare block so the final partial flush fits
    out_len = N + TL

    kern = _make_kernel(n_cols, n_tiles, tuple(fills), tile_rows)
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_rows, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)] * (1 + n_cols),
        out_specs=([pl.BlockSpec(memory_space=pl.ANY)] * n_cols
                   + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_shape=([jax.ShapeDtypeStruct((out_len // LANES, LANES),
                                         jnp.uint32)] * n_cols
                   + [jax.ShapeDtypeStruct((1,), jnp.int32)]),
        scratch_shapes=([pltpu.VMEM((2 * tile_rows, LANES), jnp.uint32)]
                        * n_cols
                        + [pltpu.SMEM((2,), jnp.int32),
                           pltpu.SemaphoreType.DMA((n_cols,))]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(keep.astype(jnp.int32).reshape(-1, LANES),
      *[jnp.asarray(c, jnp.uint32).reshape(-1, LANES) for c in cols])
    count = outs[-1][0]
    lane = jnp.arange(N0, dtype=jnp.int32)
    flat = tuple(jnp.where(lane < count, o.reshape(out_len)[:N0],
                           jnp.uint32(f))
                 for o, f in zip(outs[:n_cols], fills))
    return flat, count
