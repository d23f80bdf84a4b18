"""Pallas TPU kernel: fused windowed merge + tombstone-cancel + compaction.

The temporal-coherence ``update`` inserts a SMALL sorted churn buffer
(tombstones + inserts, <= 2C entries) into a BIG sorted tree and removes
the tombstoned entries.  Doing that with a global bitonic merge + cancel
pass + streaming compaction costs three full-tree O(n log n / n) XLA
passes — measured 21.4 ms at the 1M bench shape, churn-independent,
MORE than a full ``lax.sort`` (the small-stride merge stages are relayout
passes; CLAUDE.md).  This kernel does all three in ONE streaming pass:

* The tree is walked in sorted tiles (sequential grid).  Each churn entry
  belongs to exactly one tile — the one whose key range contains it —
  and the per-tile churn windows ``[c_lo, c_hi)`` are precomputed by a
  tiny lexicographic searchsorted of the tile-boundary tuples (n_tiles
  probes, not n).
* Per tile: DMA the (pre-REVERSED) churn window next to the tree tile,
  placing the descending run flush against the tile's tail — ascending
  tree ++ all-ones pads ++ descending window is a bitonic sequence, so
  ``log2(2*TILE)`` in-VMEM half-cleaner stages merge it (Batcher).  The
  global pre-reversal makes the in-kernel layout a pure roll+select.
* Cancel: a tombstone differs from the tree entry it kills only in the
  lowest bit of the last column (the (id, aux, tag) packing — or the tag
  column on the wide-id path), so after the merge they are ADJACENT:
  one element-shift compare kills both.  All-ones pad lanes have the tag
  bit set and die with them.
* In-tile ranked-shift compaction (shared with ``pallas_compact``) +
  the staging-buffer append/flush scheme writes the compacted stream.

A tombstone and its tree twin always share a tile: tuples are unique and
the tombstone sorts directly after its twin, so no boundary tuple can
separate them.  Window overflow (skewed churn beyond ``window_rows``) is
flagged, never silent — the caller falls back to a rebuild.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_compact import LANES, _elem_roll, _tile_compact

TILE_ROWS = 64                      # 8192 entries/tile
WINDOW_ROWS = 16                    # 2048-entry churn window per tile


def _lex_gt(a_cols, b_cols):
    gt = jnp.zeros(a_cols[0].shape, jnp.bool_)
    eq = jnp.ones(a_cols[0].shape, jnp.bool_)
    for a, b in zip(a_cols, b_cols):
        gt = gt | (eq & (a > b))
        eq = eq & (a == b)
    return gt


def _shl_elems(x, s: int, fill):
    """Row-major element shift left by static s: out[i] = x[i + s]."""
    rr, cc = s // LANES, s % LANES
    y = x
    if rr:
        y = jnp.concatenate(
            [y[rr:], jnp.full((rr, LANES), fill, x.dtype)], axis=0)
    if cc:
        nxt = jnp.concatenate(
            [y[1:], jnp.full((1, LANES), fill, y.dtype)], axis=0)
        y = jnp.concatenate([y[:, cc:], nxt[:, :cc]], axis=1)
    return y


def _shr_elems(x, s: int, fill):
    """Row-major element shift right by static s: out[i] = x[i - s]."""
    rr, cc = s // LANES, s % LANES
    y = x
    if rr:
        y = jnp.concatenate(
            [jnp.full((rr, LANES), fill, x.dtype), y[:-rr]], axis=0)
    if cc:
        prv = jnp.concatenate(
            [jnp.full((1, LANES), fill, y.dtype), y[:-1]], axis=0)
        y = jnp.concatenate([prv[:, LANES - cc:], y[:, :LANES - cc]],
                            axis=1)
    return y


def _bitonic_stage(cols, s: int, idx):
    """One ascending half-cleaner at stride s over row-major tiles."""
    ups = [_shl_elems(c, s, 0) for c in cols]
    dns = [_shr_elems(c, s, 0) for c in cols]
    gt_up = _lex_gt(cols, ups)        # x_i > x_{i+s}
    gt_dn = _lex_gt(cols, dns)        # x_i > x_{i-s}
    low = (idx & s) == 0
    return [jnp.where(low, jnp.where(gt_up, u, c),
                      jnp.where(gt_dn, c, d))
            for c, u, d in zip(cols, ups, dns)]


def _make_kernel(nc: int, n_tiles: int, churn_total: int,
                 tile_rows: int, window_rows: int, out_blocks: int):
    TR = tile_rows
    TL = TR * LANES
    WR = window_rows
    WC = WR * LANES
    WRB = ((WR + 1 + 7) // 8) * 8   # sublane-aligned window DMA rows
    MR = 2 * TR                     # merged rows (tree tile + tail block)
    ML = MR * LANES
    SR = 4 * TR                     # staging rows
    ones = 0xFFFF_FFFF              # python int: jnp scalars would be
    #                                 captured constants in the kernel

    def kernel(*refs):
        tree = refs[:nc]
        churn_rev = refs[nc:2 * nc]             # ANY: full reversed churn
        wb = refs[2 * nc]                       # SMEM (n_tiles, 2) int32
        out = refs[2 * nc + 1:3 * nc + 1]
        cnt_ref = refs[3 * nc + 1]
        ovf_ref = refs[3 * nc + 2]
        wbuf = refs[3 * nc + 3:4 * nc + 3]      # VMEM (WRB, LANES)
        stage = refs[4 * nc + 3:5 * nc + 3]     # VMEM (SR, LANES)
        pos_ref = refs[5 * nc + 3]              # SMEM (3,): staged,
        #                                         flushed blocks, ovf
        sems = refs[5 * nc + 4]                 # DMA sems (2*nc,) flat

        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            pos_ref[0] = 0
            pos_ref[1] = 0
            pos_ref[2] = 0
            for s in stage:
                s[:] = jnp.full((SR, LANES), ones, jnp.uint32)

        # ---- the tile's churn window, loaded from the REVERSED churn ----
        c_lo = wb[g, 0]
        c_hi = wb[g, 1]
        w_len = jnp.clip(c_hi - c_lo, 0, WC)
        # accumulate the window-overflow flag in SMEM scratch (outputs are
        # only written once, at the final step)
        pos_ref[2] = jnp.where(c_hi - c_lo > WC, 1, pos_ref[2])
        start_rev = churn_total - (c_lo + w_len)
        r0 = start_rev // LANES
        off0 = start_rev % LANES
        copies = [pltpu.make_async_copy(
            cr.at[pl.ds(r0, WRB), :], wbuf[i], sems.at[i])
            for i, cr in enumerate(churn_rev)]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        # ---- merged bitonic layout: tree tile (asc) ++ ones ++ window
        # (desc, flush against the tail) ----------------------------------
        sidx = (jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 1))
        midx = (jax.lax.broadcasted_iota(jnp.int32, (MR, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (MR, LANES), 1))
        roll_by = (TL - w_len - off0) % TL
        merged = []
        for i in range(nc):
            blk = jnp.concatenate(
                [wbuf[i][:], jnp.full((TR - WRB, LANES), ones,
                                      jnp.uint32)], axis=0)
            tail = jnp.where(sidx >= TL - w_len, _elem_roll(blk, roll_by),
                             jnp.full((TR, LANES), ones, jnp.uint32))
            merged.append(jnp.concatenate([tree[i][:], tail], axis=0))

        s = ML // 2
        while s >= 1:
            merged = _bitonic_stage(merged, s, midx)
            s //= 2

        # ---- cancel: a tree entry directly followed by its tombstone
        # (identical tuple except the lowest bit of the last column) dies
        # with it; tombstones and all-ones pads have the low bit set -----
        nxt = [_shl_elems(c, 1, 0xFFFF_FFFF) for c in merged]
        eq = jnp.ones((MR, LANES), jnp.bool_)
        for a, b in zip(merged[:-1], nxt[:-1]):
            eq = eq & (a == b)
        eq = eq & ((merged[-1] >> 1) == (nxt[-1] >> 1))
        dead = (eq & ((nxt[-1] & 1) == 1)) | ((merged[-1] & 1) == 1)

        compacted, k = _tile_compact(~dead, merged)

        # ---- staging append + flush (pallas_compact's scheme; a tile can
        # append up to TL + WC survivors, so up to two flushes) -----------
        staged = pos_ref[0]
        stg_idx = (jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 0)
                   * LANES
                   + jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 1))
        for st, c in zip(stage, compacted):
            pad2 = jnp.concatenate(
                [c, jnp.full((SR - MR, LANES), ones, jnp.uint32)], axis=0)
            rolled = _elem_roll(pad2, staged)
            put = (stg_idx >= staged) & (stg_idx < staged + k)
            st[:] = jnp.where(put, rolled, st[:])
        pos_ref[0] = staged + k

        def _flush():
            # clamp: if a miscount ever overfilled the staging (flagged by
            # the caller's count-vs-capacity check), never DMA out of
            # bounds — a bounded wrong answer, not a device fault
            blk = jnp.minimum(pos_ref[1], out_blocks - 1)
            cps = [pltpu.make_async_copy(
                st.at[pl.ds(0, TR), :],
                o.at[pl.ds(blk * TR, TR), :], sems.at[nc + i])
                for i, (st, o) in enumerate(zip(stage, out))]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
            rowi = jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 0)
            for st in stage:
                shifted = pltpu.roll(st[:], SR - TR, axis=0)
                st[:] = jnp.where(rowi < SR - TR, shifted,
                                  jnp.full((SR, LANES), ones, jnp.uint32))
            pos_ref[1] = blk + 1
            pos_ref[0] = pos_ref[0] - TL

        for _ in range(2):
            @pl.when(pos_ref[0] >= TL)
            def _f():
                _flush()

        @pl.when(g == n_tiles - 1)
        def _final():
            blk = jnp.minimum(pos_ref[1], out_blocks - 1)
            cps = [pltpu.make_async_copy(
                st.at[pl.ds(0, TR), :],
                o.at[pl.ds(blk * TR, TR), :], sems.at[nc + i])
                for i, (st, o) in enumerate(zip(stage, out))]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
            cnt_ref[0] = pos_ref[1] * TL + pos_ref[0]
            ovf_ref[0] = pos_ref[2]

    return kernel


def _lower_bound_tuple(cols, qcols, n: int):
    """#rows of the sorted tuple columns < each query tuple (lex order)."""
    lo = jnp.zeros(qcols[0].shape, jnp.int32)
    hi = jnp.full(qcols[0].shape, n, jnp.int32)
    iters = max(1, int(n).bit_length())
    for _ in range(iters):
        cont = lo < hi
        mid = (lo + hi) >> 1
        midc = jnp.clip(mid, 0, n - 1)
        mcols = tuple(c[midc] for c in cols)
        lt = _lex_gt(qcols, mcols)            # mid < query
        lo = jnp.where(cont & lt, mid + 1, lo)
        hi = jnp.where(cont & ~lt, mid, hi)
    return lo


@functools.partial(jax.jit, static_argnames=("out_capacity", "tile_rows",
                                             "window_rows", "interpret"))
def merge_cancel_compact(tree_cols: Sequence[jnp.ndarray],
                         churn_cols: Sequence[jnp.ndarray],
                         churn_count: jnp.ndarray,
                         out_capacity: int,
                         tile_rows: int = TILE_ROWS,
                         window_rows: int = WINDOW_ROWS,
                         interpret: bool = False
                         ) -> Tuple[Tuple[jnp.ndarray, ...],
                                    jnp.ndarray, jnp.ndarray]:
    """Merge sorted ``churn_cols`` into sorted ``tree_cols``, cancel
    tombstones, and return the compacted columns.

    Column convention (both inputs): every column is a u32 sort key in
    lexicographic order; the LAST column's lowest bit is the tombstone
    tag, and a tombstone's tuple differs from its victim's only in that
    bit.  Pads are all-ones in every column.  ``churn_count`` is the live
    churn prefix length (pads beyond it are excluded from the windows).

    Returns ``(cols, count, window_overflow)`` — cols of length
    ``out_capacity`` with all-ones beyond ``count``.  ``window_overflow``
    means some tile's churn exceeded ``window_rows * 128`` entries and the
    result is truncated — callers must treat it like any capacity
    overflow (rebuild).
    """
    nc = len(tree_cols)
    if ((window_rows + 1 + 7) // 8) * 8 > tile_rows:
        raise ValueError(
            f"window_rows={window_rows}: the sublane-aligned window DMA "
            f"buffer must fit the tile (window_rows <= tile_rows - 8 = "
            f"{tile_rows - 8})")
    TL = tile_rows * LANES
    WC = window_rows * LANES
    N0 = tree_cols[0].shape[0]
    NC = churn_cols[0].shape[0]
    N = -(-N0 // TL) * TL
    n_tiles = N // TL
    ones = jnp.uint32(0xFFFF_FFFF)

    tree_p = tuple(jnp.concatenate(
        [jnp.asarray(c, jnp.uint32),
         jnp.full((N - N0,), ones, jnp.uint32)]) if N != N0
        else jnp.asarray(c, jnp.uint32) for c in tree_cols)

    cc = jnp.minimum(jnp.asarray(churn_count, jnp.int32), NC)
    # windows: boundary tuple of tile t is its first tree lane; churn
    # entry e belongs to tile t iff boundary[t] <= e < boundary[t+1]
    bidx_lanes = jnp.arange(1, n_tiles, dtype=jnp.int32) * TL
    bounds = tuple(c[bidx_lanes] for c in tree_p)
    lbs = _lower_bound_tuple(churn_cols, bounds, NC)
    lbs = jnp.minimum(lbs, cc)
    c_lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), lbs])
    c_hi = jnp.concatenate([lbs, cc.reshape(1)])
    wb = jnp.stack([c_lo, c_hi], axis=1)

    # reversed churn (+ DMA safety rows): window [a, b) of the ascending
    # churn is rows of the reversed array starting at NC - b
    wrb = ((window_rows + 1 + 7) // 8) * 8
    rev_rows = NC // LANES + wrb + 2
    churn_rev = tuple(jnp.concatenate(
        [jnp.asarray(c, jnp.uint32)[::-1],
         jnp.full((rev_rows * LANES - NC,), ones, jnp.uint32)]
    ).reshape(rev_rows, LANES) for c in churn_cols)

    out_len = N + ((NC + TL - 1) // TL + 2) * TL

    kern = _make_kernel(nc, n_tiles, NC, tile_rows, window_rows,
                        out_len // TL)
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=([pl.BlockSpec((tile_rows, LANES), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)] * nc
                  + [pl.BlockSpec(memory_space=pl.ANY)] * nc
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_specs=([pl.BlockSpec(memory_space=pl.ANY)] * nc
                   + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2),
        out_shape=([jax.ShapeDtypeStruct((out_len // LANES, LANES),
                                         jnp.uint32)] * nc
                   + [jax.ShapeDtypeStruct((1,), jnp.int32)] * 2),
        scratch_shapes=([pltpu.VMEM((wrb, LANES), jnp.uint32)]
                        * nc
                        + [pltpu.VMEM((4 * tile_rows, LANES), jnp.uint32)]
                        * nc
                        + [pltpu.SMEM((3,), jnp.int32),
                           pltpu.SemaphoreType.DMA((2 * nc,))]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*[c.reshape(-1, LANES) for c in tree_p],
      *churn_rev, wb)
    count = outs[nc][0]
    w_ovf = outs[nc + 1][0] != 0
    lane = jnp.arange(out_capacity, dtype=jnp.int32)
    cap_rows = out_capacity
    flat = tuple(jnp.where(lane < count,
                           o.reshape(out_len)[:cap_rows], ones)
                 for o in outs[:nc])
    return flat, count, w_ovf
