"""Pallas TPU kernel v3: segmented pair expansion via ranked-spread placement.

Produces both sides of the candidate-pair list from the sorted id array and
the per-element descendant-run structure (reference hot loop
``src/layer.rs:550-573`` restructured; SURVEY.md §7.5):

    pair slot t lies in run j:   starts[j] <= t < starts[j] + run[j]
    a[t] = ids[j + 1 + (t - starts[j])]    (descendant / later element)
    b[t] = ids[j]                          (ancestor / stack element)

Generation 2 (``pallas_expand.py``) found the covering run per SLOT with a
row-scan + 8-step per-lane binary search over a window of compacted run
starts, then resolved BOTH id lookups through row-loop gathers — ~500
row-passes per 1024-slot tile, squeezed between per-grid-step fixed costs
(small tiles) and row-loop scaling (large tiles).

This version inverts the search into a *placement*: runs tile the slot
space contiguously (starts are a prefix sum — no gaps), so each compacted
run entry k simply *lands at slot* ``sv[k] - t0`` of its tile, and every
other slot copies the previous run's values.  Two observations make that
cheap and exact:

* After rotating the entry window so the first in-tile run sits at lane 0,
  the placement distance ``d = (sv[k] - t0) - lane(k)`` is NONNEGATIVE and
  NONDECREASING in k (``sv`` strictly increasing, one lane per entry), and
  targets are distinct.  Monotone distinct-target routing decomposes into
  ``log2(T)`` static roll+select stages processed HIGH bit -> LOW bit with
  pull semantics — collision-free: at stage b a collision would need two
  live entries at distance exactly b with the *later* entry's remaining
  shift missing bit b, which contradicts monotonicity of the bits-above-b
  prefix (see the staged-routing argument in this file's history).
* The per-slot quantities both sides need collapse to two values carried
  per run: ``abase = j + 1 - starts[j]`` (so the a-side element index is
  just ``t + abase``) and ``bid = ids[j]`` (the b-side id, carried through
  the starts compaction for free).  After placement + a log-shift forward
  fill, the b-side is DONE with zero gathers; only the a-side still
  gathers ids, through a pipelined window DMA with the multi-window
  guaranteed-progress loop of generation 2.

Tile = 4096 slots (4x generation 2): per-grid-step fixed costs quarter,
and nothing in the kernel scales with window ROW count except the single
a-side gather loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
T_ROWS = 32
T = T_ROWS * LANES                  # 4096 slots per grid step
BLOCK = T                           # starts-window block = 4096 entries
W_ROWS = 2 * T_ROWS                 # entry window: two blocks
IDW_ROWS = 32                       # a-side id window: 4096 ids
IDW = IDW_ROWS * LANES

PAD_ID = 0xFFFF_FFFF
_HUGE = 0x7FFF_FFFF


def _roll64(x, s):
    """Static row-major circular roll of a (W_ROWS, 128) tile by s >= 0
    elements: out[i] = x[(i - s) mod (W_ROWS*128)]."""
    a, b = s // LANES, s % LANES
    if b == 0:
        return pltpu.roll(x, a, axis=0)
    y1 = pltpu.roll(pltpu.roll(x, a, axis=0), b, axis=1)
    y2 = pltpu.roll(pltpu.roll(x, a + 1, axis=0), b, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= b, y1, y2)


def _dyn_roll(x, s):
    """Dynamic row-major circular roll (same semantics as :func:`_roll64`
    with a traced s); pltpu.roll accepts dynamic non-negative shifts."""
    a = s // LANES
    b = s % LANES
    y1 = pltpu.roll(pltpu.roll(x, a, axis=0), b, axis=1)
    y2 = pltpu.roll(pltpu.roll(x, a + 1, axis=0), b, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= b, y1, y2)


def _gather_idwin(wins, idx, idw_rows=IDW_ROWS):
    """accs[j][r, l] = wins[j][idx[r, l]] over (idw_rows, 128) windows: the
    row-loop + take_along_axis lane gather (the only per-lane gather Mosaic
    supports).  Gathering several windows at the same indices shares the
    row masks, so the loop is run once."""
    row, col = idx // LANES, idx % LANES
    accs = [jnp.zeros(idx.shape, jnp.uint32) for _ in wins]
    for w in range(idw_rows):
        hit = row == w
        for j, win in enumerate(wins):
            rowvec = jnp.broadcast_to(win[w, :][None, :], idx.shape)
            accs[j] = jnp.where(hit,
                                jnp.take_along_axis(rowvec, col, axis=1),
                                accs[j])
    return accs


def _make_kernel(dim: int, idw_rows: int = IDW_ROWS, ab_bias: int = 0):
    IDWR = idw_rows
    IDWN = idw_rows * LANES
    SEEN = 1 << 30                 # seen flag packed into the biased abase

    def kernel(blk_ref, c0_ref, spec_ref, total_ref, rule_ref,
               sv_lo, sv_hi, ab_lo, ab_hi, bid_lo, bid_hi, ids_hbm,
               a_ref, b_ref,
               idwin, kp_ref, res_ref, sems):
        g = pl.program_id(0)
        t0 = g * T
        rows_total = ids_hbm.shape[0]

        def start_id_copy(base_row):
            return pltpu.make_async_copy(
                ids_hbm.at[pl.ds(base_row, IDWR), :],
                idwin.at[:, :],
                sems.at[0])

        # ---- speculative a-side id window (base prefetched): DMA overlaps
        # the placement work below
        srow = spec_ref[g]
        srow = pl.multiple_of(srow, SUBLANES)
        spec_copy = start_id_copy(srow)
        spec_copy.start()

        # ---- entry window: two pipelined blocks, rotated so the first
        # in-tile run entry (c0 + 1) is at lane 0
        sv = jnp.concatenate([sv_lo[:], sv_hi[:]], axis=0)
        ab = jnp.concatenate([ab_lo[:], ab_hi[:]], axis=0)
        bid = jnp.concatenate([bid_lo[:], bid_hi[:]], axis=0)
        blkbase = blk_ref[g] * BLOCK
        r = c0_ref[g] + 1 - blkbase          # in [1, BLOCK]
        shift = W_ROWS * LANES - r           # left-rotate by r
        sv = _dyn_roll(sv, shift)
        ab = _dyn_roll(ab, shift)
        bid = _dyn_roll(bid, shift)

        lin64 = (jax.lax.broadcasted_iota(jnp.int32, (W_ROWS, LANES), 0)
                 * LANES
                 + jax.lax.broadcasted_iota(jnp.int32, (W_ROWS, LANES), 1))

        # covering run (entry c0) landed on the last lane: reduce + splat
        is_cov = lin64 == (W_ROWS * LANES - 1)
        ab0 = jnp.sum(jnp.where(is_cov, ab, 0))
        # Mosaic rejects SCALAR bitcasts: bitcast the vector to i32, reduce,
        # and convert the scalar back (int->uint convert is mod 2^32)
        bid0 = jnp.sum(jnp.where(
            is_cov, jax.lax.bitcast_convert_type(bid, jnp.int32),
            0)).astype(jnp.uint32)

        # ---- ranked-spread placement of in-tile entries at their slots.
        # After the rotation every in-tile entry (distinct start slot in
        # [t0, t0+T)) sits in the first T lanes, and targets are < T, so
        # the whole placement runs on a HALF-window (T_ROWS, LANES) tile:
        # an entry at lane l moves d = u - l < T - l and never wraps.
        sv_h = sv[:T_ROWS]
        ab_h = ab[:T_ROWS]
        bid_h = bid[:T_ROWS]
        lin32 = (jax.lax.broadcasted_iota(jnp.int32, (T_ROWS, LANES), 0)
                 * LANES
                 + jax.lax.broadcasted_iota(jnp.int32, (T_ROWS, LANES), 1))
        u = sv_h - t0
        valid = (u >= 0) & (u < T)           # HUGE pad entries excluded
        d = u - lin32                        # >= 0, nondecreasing over valid
        rem = jnp.where(valid, d, -1)
        b_shift = T // 2                     # d <= T-1: bits 11..0
        while b_shift >= 1:
            inc_rem = _roll64(rem, b_shift)
            inc_ab = _roll64(ab_h, b_shift)
            inc_bid = _roll64(bid_h, b_shift)
            recv = (inc_rem >= 0) & ((inc_rem & b_shift) != 0)
            leave = (rem >= 0) & ((rem & b_shift) != 0)
            ab_h = jnp.where(recv, inc_ab, ab_h)
            bid_h = jnp.where(recv, inc_bid, bid_h)
            rem = jnp.where(recv, inc_rem - b_shift,
                            jnp.where(leave, -1, rem))
            b_shift //= 2

        placed = rem == 0
        # the seen flag rides bit 30 of the BIASED abase (ab + ab_bias in
        # (0, 2^30), asserted by the wrapper), so the fill rolls TWO tiles
        # per stage instead of three
        fabp = jnp.where(placed, (ab_h + ab_bias) | SEEN, 0)
        fbid = jnp.where(placed, bid_h, 0)

        # ---- forward fill (runs tile the slot space: every unplaced slot
        # copies the nearest placed slot before it; none -> covering run)
        s = 1
        while s < T:
            src_ok = lin32 >= s
            rfp = _roll64(fabp, s)
            rbid = _roll64(fbid, s)
            take = ((fabp & SEEN) == 0) & ((rfp & SEEN) != 0) & src_ok
            fabp = jnp.where(take, rfp, fabp)
            fbid = jnp.where(take, rbid, fbid)
            s <<= 1
        seen = (fabp & SEEN) != 0
        fab = jnp.where(seen, (fabp & (SEEN - 1)) - ab_bias, ab0)
        fbid = jnp.where(seen, fbid, bid0)

        # ---- outputs: a-side via windowed (id, tz) gather + emit-once keep
        # test; the b-side write moves after the resolve loop so it can be
        # masked by the per-slot keep bits.
        t = t0 + lin32
        valid_slot = t < total_ref[0]
        idx_a = t + fab                      # = oj + 1 + (t - sv)
        a_ref[:] = jnp.full((T_ROWS, LANES), PAD_ID, jnp.uint32)
        kp_ref[:] = jnp.ones((T_ROWS, LANES), jnp.int32)
        res_ref[:] = 1 - valid_slot.astype(jnp.int32)

        # with rule==1 the id streams carry rule bytes in their low 8 bits
        # (b/prep side: (id << 8) | (depth << dim) | e; a/window side:
        # (id << 8) | (alpha << dim) | e); with rule==0 they are plain ids
        # and every emission is kept
        rule_i = rule_ref[0]                           # 0/1 int32 scalar
        sh = jnp.uint32(8) * rule_i.astype(jnp.uint32)
        bm = jax.lax.bitcast_convert_type(fbid, jnp.int32) & 0xFF
        emask = (1 << dim) - 1

        def resolve_with(id_base):
            need = res_ref[:] == 0
            loc = idx_a - id_base
            inw = need & (loc >= 0) & (loc < IDWN)
            loc = jnp.clip(loc, 0, IDWN - 1)
            (ga,) = _gather_idwin([idwin[:]], loc, IDWR)
            # emit-once rule, folded form (layer._emit_once_keep): keep iff
            # no axis has BOTH sides off their block min, AND the a cell's
            # alignment depth alpha reaches up to the b entry's depth
            am = jax.lax.bitcast_convert_type(ga, jnp.int32) & 0xFF
            kacc = ((am & bm & emask) == 0) & ((am >> dim) <= (bm >> dim))
            keep = kacc.astype(jnp.int32) | (1 - rule_i)
            a_ref[:] = jnp.where(inw & (keep != 0), ga >> sh, a_ref[:])
            kp_ref[:] = jnp.where(inw, keep, kp_ref[:])
            new_res = res_ref[:] | inw.astype(jnp.int32)
            res_ref[:] = new_res
            return jnp.sum(1 - new_res)

        spec_copy.wait()
        rem0 = resolve_with(srow * LANES)

        def resolve_window(_):
            need = res_ref[:] == 0
            cand = jnp.where(need, idx_a, _HUGE)
            m = jnp.min(cand)
            base_row = jnp.clip((m // (SUBLANES * LANES)) * SUBLANES,
                                0, rows_total - IDWR)
            base_row = pl.multiple_of(base_row, SUBLANES)
            c = start_id_copy(base_row)
            c.start()
            c.wait()
            return resolve_with(base_row * LANES)

        jax.lax.while_loop(lambda n_: n_ > 0, resolve_window, rem0)

        b_ref[:] = jnp.where(valid_slot & (kp_ref[:] != 0), fbid >> sh,
                             jnp.uint32(PAD_ID))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("pair_capacity", "interpret"))
def expand_pairs(ids: jnp.ndarray, starts: jnp.ndarray, run: jnp.ndarray,
                 total: jnp.ndarray, pair_capacity: int,
                 interpret: bool = False):
    """(a, b) pair sides for every slot t < total; PAD_ID elsewhere.

    Same contract as generation 2: ``ids`` u32 (cap,) sorted element ids;
    ``starts``/``run`` int32 (cap,) exclusive prefix sum of run lengths and
    the lengths; ``total`` int32 scalar; any static ``pair_capacity``
    (padded internally to the 4096-slot tile).

    The production scan path computes the compacted entries in the fused
    ``ops.pallas_prep.prep_runs`` kernel and calls
    :func:`expand_pairs_prepped` directly; this wrapper keeps the
    starts/run contract for the XLA-side callers and the kernel tests.
    """
    cap = ids.shape[0]

    # compact to nonempty runs, carrying (start, abase, bid) per entry:
    # abase = j + 1 - starts[j]  ->  a-side element index = t + abase
    # bid   = ids[j]             ->  the b-side id, resolved HERE for free
    from .pallas_compact import stream_compact
    j32 = jnp.arange(cap, dtype=jnp.int32)
    abase_pre = j32 + 1 - starts
    (sv_u, ab_u, bid_c), _m = stream_compact(
        run > 0,
        (starts, abase_pre, ids),
        fills=(_HUGE, 0, PAD_ID), interpret=interpret)
    sv = sv_u.astype(jnp.int32)
    abv = ab_u.astype(jnp.int32)
    return expand_pairs_prepped(ids, sv, abv, bid_c, total,
                                pair_capacity, rule=None,
                                interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("pair_capacity", "dim", "idw_rows",
                                    "interpret"))
def expand_pairs_prepped(ids: jnp.ndarray, sv: jnp.ndarray,
                         abv: jnp.ndarray, bid_c: jnp.ndarray,
                         total: jnp.ndarray, pair_capacity: int,
                         rule=None, dim: int = 3, idw_rows: int = IDW_ROWS,
                         interpret: bool = False):
    """Expansion from PRE-COMPACTED nonempty-run entries.

    sv/abv: int32 (L,) start slots (strictly increasing over live entries,
    ``_HUGE`` fills beyond) and a-side bases (j + 1 - sv); bid_c: uint32
    (L,) b-side id stream; ids: the sorted element id stream for the
    a-side window.

    Emit-once dedup (``rule`` truthy): the streams carry packed rule
    bytes — ``bid_c`` entries are ``(id << 8) | (depth << dim) | e``,
    ``ids`` entries are ``(id << 8) | (alpha << dim) | e`` (alpha from
    ``layer._alpha_meta``) — and the kernel keeps exactly ONE emission
    per candidate pair (the canonical cell), writing PAD on both sides
    of dropped duplicates.  With ``rule=None``/0, ids are plain and
    every emission is kept.
    """
    P = pair_capacity
    cap = ids.shape[0]
    # the resolve loop's guaranteed-progress argument requires the window
    # to cover one whole SUBLANES-aligned id block; the gather row loop
    # unrolls idw_rows stages (Mosaic compile cost), so bound it too
    assert 8 <= idw_rows <= 64 and idw_rows % SUBLANES == 0, idw_rows
    # biased abase (fill seen-flag packing): ab in [1 - P, cap], so with
    # bias P + 1 it sits in [2, cap + P + 1], which must stay below the
    # bit-30 seen flag.  2^30 lanes of emission/tree would need >8 GB of
    # HBM per column, so this never binds in practice.
    ab_bias = P + 1
    assert cap + P + 2 < (1 << 30), (cap, P)
    if rule is None:
        rule = jnp.int32(0)
    rule = jnp.asarray(rule).astype(jnp.int32).reshape(1)

    # pad the entry arrays so window blocks [blk, blk+1] always exist
    n_ent = sv.shape[0]
    ent_pad = (-(-n_ent // BLOCK)) * BLOCK + BLOCK
    sv = jnp.pad(sv, (0, ent_pad - n_ent), constant_values=_HUGE)
    abv = jnp.pad(abv, (0, ent_pad - n_ent))
    bid_c = jnp.pad(bid_c, (0, ent_pad - n_ent),
                    constant_values=jnp.uint32(PAD_ID))

    Pp = -(-P // T) * T
    G = Pp // T

    from . import search
    t0s = jnp.arange(G, dtype=jnp.int32) * T
    c0s = jnp.maximum(search.upper_bound_i32(sv, t0s) - 1, 0)
    # blk never actually clips: ent_pad leaves a full spare block, so
    # c0 // BLOCK <= ent_pad/BLOCK - 2 and the rotation r stays in [1, BLOCK]
    max_blk = ent_pad // BLOCK - 2
    blks = jnp.clip(c0s // BLOCK, 0, max_blk)

    # speculative a-side window base: first slot's element index, in
    # SUBLANES-aligned rows
    id_rows = max(-(-cap // (SUBLANES * LANES)) * SUBLANES, idw_rows)
    ids_p = jnp.pad(ids, (0, id_rows * LANES - cap))
    ab_at_c0 = abv[c0s]
    spec_rows = jnp.clip(((t0s + ab_at_c0) // (SUBLANES * LANES))
                         * SUBLANES, 0, id_rows - idw_rows)

    def _win_map(delta):
        def index_map(g, blk_ref, c0_ref, spec_ref, total_ref, rule_ref):
            return (blk_ref[g] + delta, 0)
        return index_map

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((T_ROWS, LANES), _win_map(0),
                         memory_space=pltpu.VMEM),     # sv low
            pl.BlockSpec((T_ROWS, LANES), _win_map(1),
                         memory_space=pltpu.VMEM),     # sv high
            pl.BlockSpec((T_ROWS, LANES), _win_map(0),
                         memory_space=pltpu.VMEM),     # abase low
            pl.BlockSpec((T_ROWS, LANES), _win_map(1),
                         memory_space=pltpu.VMEM),     # abase high
            pl.BlockSpec((T_ROWS, LANES), _win_map(0),
                         memory_space=pltpu.VMEM),     # bid low
            pl.BlockSpec((T_ROWS, LANES), _win_map(1),
                         memory_space=pltpu.VMEM),     # bid high
            pl.BlockSpec(memory_space=pl.ANY),         # ids
        ],
        out_specs=[
            pl.BlockSpec((T_ROWS, LANES), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_ROWS, LANES), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((idw_rows, LANES), jnp.uint32),   # idwin
            pltpu.VMEM((T_ROWS, LANES), jnp.int32),      # keep bits
            pltpu.VMEM((T_ROWS, LANES), jnp.int32),      # res
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    a, b = pl.pallas_call(
        _make_kernel(dim, idw_rows, ab_bias),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Pp // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((Pp // LANES, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(blks, c0s, spec_rows, jnp.asarray(total, jnp.int32).reshape(1), rule,
      sv.reshape(-1, LANES), sv.reshape(-1, LANES),
      abv.reshape(-1, LANES), abv.reshape(-1, LANES),
      bid_c.reshape(-1, LANES), bid_c.reshape(-1, LANES),
      ids_p.reshape(-1, LANES))
    return a.reshape(Pp)[:P], b.reshape(Pp)[:P]
