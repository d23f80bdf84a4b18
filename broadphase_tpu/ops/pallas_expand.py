"""Pallas TPU kernel: segmented pair expansion from run starts.

Produces both sides of the candidate-pair list from the sorted id array and
the per-element descendant-run structure (reference hot loop
``src/layer.rs:550-573`` restructured; SURVEY.md §7.5):

    pair slot t lies in run j:   starts[j] <= t < starts[j] + run[j]
    a[t] = ids[j + 1 + (t - starts[j])]    (descendant / later element)
    b[t] = ids[j]                          (ancestor / stack element)

Two generations of this design:

* Round 1 computed ``j(t)``/``off(t)`` in XLA with a histogram + cummax
  over the pair buffer — two data-dependent scatters over the element
  array, which serialize at ~10 ns/element on TPU (measured 89 ms of a
  268 ms step at 1M).
* This version computes ``j``/``off`` inside the kernel.  The caller
  compacts ``starts`` to NONEMPTY runs only (single-pass streaming
  compaction) and precomputes one scalar per T-slot tile: ``j0`` = the
  compacted index of the run covering the tile's first slot.  Because
  every nonempty run covers at least one slot, the runs intersecting a
  tile span at most T+1 consecutive compacted entries, so one aligned
  2T-entry window DMA is sufficient *by construction* — the kernel
  finds j per lane with a row-first count (rows are sorted, a row's
  first entry is its min) plus an 8-step in-row binary search.

The id lookups ``ids[j]``/``ids[j+1+off]`` still have unbounded span (a
long run reads far ahead; adjacent runs may be far apart), so they keep
the round-1 multi-window resolution loop: DMA an aligned id window at the
minimum unresolved index until every lookup resolves (guaranteed
progress, nothing clamped).  Mosaic cannot carry vectors through
``scf.while``, so vector state lives in scratch refs and the loop carries
one scalar.

Tile size is a parameter; 1024-slot tiles measured best on the real chip
(the in-kernel searches gather through row loops whose cost scales with
the window row count, so larger tiles lose more on search than they gain
on per-step fixed costs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8                       # int32 HBM tiling: (8, 128)
TILE = 1024                        # kept for callers sizing pair buffers

PAD_ID = 0xFFFF_FFFF
_HUGE = 0x7FFF_FFFF


def _gather_window(win, rows, idx, acc_dtype):
    """acc[r, l] = win[idx[r, l] // LANES, idx[r, l] % LANES] via the
    row-loop + take_along_axis pattern (the lane gather Mosaic supports)."""
    row, col = idx // LANES, idx % LANES
    acc = jnp.zeros(idx.shape, acc_dtype)
    for w in range(rows):
        rowvec = jnp.broadcast_to(win[w, :][None, :], idx.shape)
        acc = jnp.where(row == w,
                        jnp.take_along_axis(rowvec, col, axis=1), acc)
    return acc


def _make_kernel(t_rows: int, win_rows: int, swin_rows: int):
    T = t_rows * LANES
    WIN = win_rows * LANES
    win_blocks = win_rows // SUBLANES

    def kernel(j0_ref, oj0_ref, total_ref, sv_lo, sv_hi, oj_lo, oj_hi,
               ids_hbm, a_ref, b_ref,
               idwin, res_a_ref, res_b_ref, sems):
        g = pl.program_id(0)
        t0 = g * T
        rows_total = ids_hbm.shape[0]

        def start_id_copies(id_base_row):
            return [
                pltpu.make_async_copy(
                    ids_hbm.at[pl.ds(id_base_row + blk * SUBLANES,
                                     SUBLANES), :],
                    idwin.at[pl.ds(blk * SUBLANES, SUBLANES), :],
                    sems.at[blk])
                for blk in range(win_blocks)
            ]

        # ---- speculative id window: the covering run's element index
        # (prefetched) predicts where this tile's id lookups start, so the
        # DMA overlaps the covering-run search below instead of waiting
        # for its result
        spec_base_row = jnp.clip((jnp.maximum(oj0_ref[g], 0) // T) * t_rows,
                                 0, rows_total - win_rows)
        spec_base_row = pl.multiple_of(spec_base_row, SUBLANES)
        spec_copies = start_id_copies(spec_base_row)
        for c in spec_copies:
            c.start()

        # ---- slot coordinates and validity (from the prefetched total)
        tau = (jax.lax.broadcasted_iota(jnp.int32, (t_rows, LANES), 0)
               * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (t_rows, LANES), 1))
        t = t0 + tau
        valid = (t < total_ref[0]).astype(jnp.int32)

        a_ref[:] = jnp.full((t_rows, LANES), PAD_ID, jnp.uint32)
        b_ref[:] = jnp.full((t_rows, LANES), PAD_ID, jnp.uint32)
        res_a_ref[:] = 1 - valid
        res_b_ref[:] = 1 - valid

        # ---- starts window: a 2T-entry window is always enough (nonempty
        # runs cover >= 1 slot, so every run intersecting the tile lies in
        # [j0, j0 + T], and the window base is j0 aligned down to a T
        # block).  The two T-blocks arrive as pipelined BlockSpec inputs
        # whose index maps read the prefetched j0s — Mosaic double-buffers
        # them across grid steps, unlike the manual DMA this replaces.
        sv = jnp.concatenate([sv_lo[:], sv_hi[:]], axis=0)
        oj_win = jnp.concatenate([oj_lo[:], oj_hi[:]], axis=0)
        row_cnt = jnp.zeros((t_rows, LANES), jnp.int32)
        for w in range(swin_rows):
            # rows are sorted: a row's first entry is its min — a scalar
            # reduce + splat (Mosaic cannot broadcast (1,1) vectors)
            first = jnp.min(sv[w:w + 1, :])
            row_cnt = row_cnt + (first <= t).astype(jnp.int32)
        row = jnp.maximum(row_cnt - 1, 0)   # last row with first <= t
        lo = row * LANES
        hi = lo + LANES
        for _ in range(8):                  # 128-wide range needs 8 halvings
            mid = (lo + hi) // 2
            svmid = _gather_window(sv, swin_rows, mid, jnp.int32)
            le = svmid <= t
            lo = jnp.where(le, mid + 1, lo)
            hi = jnp.where(le, hi, mid)
        j_loc = jnp.maximum(lo - 1, 0)
        sv_at = _gather_window(sv, swin_rows, j_loc, jnp.int32)
        oj_at = _gather_window(oj_win, swin_rows, j_loc, jnp.int32)

        off = t - sv_at
        idx_b = oj_at
        idx_a = oj_at + 1 + off

        # ---- multi-window id resolution
        def resolve_with(id_base):
            """Resolve every in-window lookup against the idwin contents;
            returns the remaining unresolved count."""
            need_a = res_a_ref[:] == 0
            need_b = res_b_ref[:] == 0
            loc_a = idx_a - id_base
            loc_b = idx_b - id_base
            in_a = need_a & (loc_a >= 0) & (loc_a < WIN)
            in_b = need_b & (loc_b >= 0) & (loc_b < WIN)
            loc_a = jnp.clip(loc_a, 0, WIN - 1)
            loc_b = jnp.clip(loc_b, 0, WIN - 1)
            ga = _gather_window(idwin[:], win_rows, loc_a, jnp.uint32)
            gb = _gather_window(idwin[:], win_rows, loc_b, jnp.uint32)
            a_ref[:] = jnp.where(in_a, ga, a_ref[:])
            b_ref[:] = jnp.where(in_b, gb, b_ref[:])
            new_res_a = res_a_ref[:] | in_a.astype(jnp.int32)
            new_res_b = res_b_ref[:] | in_b.astype(jnp.int32)
            res_a_ref[:] = new_res_a
            res_b_ref[:] = new_res_b
            return jnp.sum(2 - new_res_a - new_res_b)

        for c in spec_copies:
            c.wait()
        rem0 = resolve_with(spec_base_row * LANES)

        def resolve_window(_):
            need_a = res_a_ref[:] == 0
            need_b = res_b_ref[:] == 0
            cand = jnp.minimum(jnp.where(need_a, idx_a, _HUGE),
                               jnp.where(need_b, idx_b, _HUGE))
            m = jnp.min(cand)
            id_base_row = jnp.clip((m // T) * t_rows, 0,
                                   rows_total - win_rows)
            id_base_row = pl.multiple_of(id_base_row, SUBLANES)
            copies = start_id_copies(id_base_row)
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            return resolve_with(id_base_row * LANES)

        jax.lax.while_loop(lambda r: r > 0, resolve_window, rem0)

    return kernel


def _pad_rows(x, fill, tile, swin):
    """Pad a 1-D array so any aligned starts window fits."""
    n = x.shape[0]
    padded = (-(-n // tile)) * tile + swin
    return jnp.pad(x, (0, padded - n), constant_values=fill)


@functools.partial(jax.jit,
                   static_argnames=("pair_capacity", "interpret",
                                    "tile_rows"))
def expand_pairs(ids: jnp.ndarray, starts: jnp.ndarray, run: jnp.ndarray,
                 total: jnp.ndarray, pair_capacity: int,
                 interpret: bool = False, tile_rows: int | None = None):
    """(a, b) pair sides for every slot t < total; PAD_ID elsewhere.

    ids u32 (cap,): sorted element ids.  starts/run int32 (cap,): exclusive
    prefix sum of run lengths and the lengths themselves.  total: int32
    scalar (= starts[-1] + run[-1]).  pair_capacity: any static size
    (padded internally to the tile).  Slots t >= total resolve to PAD
    immediately.
    """
    if tile_rows is None:
        # 8 rows (1024 slots) measured best compiled too: the in-kernel
        # searches gather through row loops that scale with the window
        # row count, so larger tiles LOSE (66 vs 38 ms at 1M with 32 rows)
        tile_rows = 8
    T = tile_rows * LANES
    # id window = 2 tiles: typical per-tile id spans are ~tile-sized, and
    # the multi-window loop covers the adversarial long-run/sparse cases;
    # a smaller window halves every row-loop gather's cost
    win_rows = 2 * tile_rows
    swin_rows = 2 * tile_rows
    WIN = win_rows * LANES
    SWIN = swin_rows * LANES

    P = pair_capacity
    cap = ids.shape[0]

    # compact to nonempty runs: (start value, original element index);
    # the streaming kernel self-pads to its tile
    from .pallas_compact import stream_compact
    (sv_u, oj_u), _m = stream_compact(
        run > 0,
        (starts, jnp.arange(cap, dtype=jnp.int32)),
        fills=(_HUGE, 0), interpret=interpret)
    sv = sv_u.astype(jnp.int32)
    oj = oj_u.astype(jnp.int32)
    sv = _pad_rows(sv, _HUGE, T, SWIN)
    oj = _pad_rows(oj, 0, T, SWIN)

    # pair capacity padded to the tile size (pad slots are >= total and
    # resolve to PAD immediately; sliced off on return)
    Pp = -(-P // T) * T

    # per-tile covering-run index into the compacted array, and the
    # covering run's ELEMENT index (the kernel's speculative id-window base)
    from . import search
    t0s = jnp.arange(Pp // T, dtype=jnp.int32) * T
    j0s = search.upper_bound_i32(sv, t0s) - 1
    oj0s = oj[jnp.clip(j0s, 0, oj.shape[0] - 1)]

    padded_ids = max(-(-cap // T) * T, WIN)
    if padded_ids != cap:
        ids = jnp.pad(ids, (0, padded_ids - cap))

    # starts-window blocks: the 2T window = two consecutive T-blocks whose
    # indices come from the prefetched j0s — Mosaic pipelines these as
    # regular inputs (the manual DMA+wait this replaces serialized every
    # grid step on the DMA round trip)
    s_blocks_max = sv.shape[0] // T - 2

    def _win_map(delta):
        def index_map(g, j0s_ref, oj0s_ref, total_ref):
            k = jnp.clip(jnp.maximum(j0s_ref[g], 0) // T, 0, s_blocks_max)
            return (k + delta, 0)
        return index_map

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Pp // T,),
        in_specs=[
            pl.BlockSpec((tile_rows, LANES), _win_map(0),
                         memory_space=pltpu.VMEM),     # sv low block
            pl.BlockSpec((tile_rows, LANES), _win_map(1),
                         memory_space=pltpu.VMEM),     # sv high block
            pl.BlockSpec((tile_rows, LANES), _win_map(0),
                         memory_space=pltpu.VMEM),     # oj low block
            pl.BlockSpec((tile_rows, LANES), _win_map(1),
                         memory_space=pltpu.VMEM),     # oj high block
            pl.BlockSpec(memory_space=pl.ANY),         # ids
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((win_rows, LANES), jnp.uint32),   # idwin
            pltpu.VMEM((tile_rows, LANES), jnp.int32),   # res_a
            pltpu.VMEM((tile_rows, LANES), jnp.int32),   # res_b
            pltpu.SemaphoreType.DMA((win_rows // SUBLANES,)),
        ],
    )
    a, b = pl.pallas_call(
        _make_kernel(tile_rows, win_rows, swin_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Pp // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((Pp // LANES, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(j0s, oj0s, jnp.asarray(total, jnp.int32).reshape(1),
      sv.reshape(-1, LANES), sv.reshape(-1, LANES),
      oj.reshape(-1, LANES), oj.reshape(-1, LANES),
      ids.reshape(-1, LANES))
    return a.reshape(Pp)[:P], b.reshape(Pp)[:P]
