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
  compacts ``starts`` to NONEMPTY runs only (log-shift compaction, no
  scatters) and precomputes one scalar per 1024-slot tile: ``j0`` = the
  compacted index of the run covering the tile's first slot.  Because
  every nonempty run covers at least one slot, the runs intersecting a
  tile span at most 1025 consecutive compacted entries, so one aligned
  2048-entry window DMA is sufficient *by construction* — the kernel
  binary-searches it per lane (11 steps) to recover j and the run start.

The id lookups ``ids[j]``/``ids[j+1+off]`` still have unbounded span (a
long run reads far ahead; adjacent runs may be far apart), so they keep
the round-1 multi-window resolution loop: DMA the 4096-id window at the
minimum unresolved index until every lookup resolves (guaranteed
progress, nothing clamped).  Mosaic cannot carry vectors through
``scf.while``, so vector state lives in scratch refs and the loop carries
one scalar.

Interpret mode is used off-TPU, so the same kernel is testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8                       # int32 HBM tiling: (8, 128)
TILE_ROWS = 8                      # T = 8 x 128 = 1024 pairs per grid step
TILE = TILE_ROWS * LANES
WIN_BLOCKS = 4                     # id window = 4 x (8 x 128) = 4096 ids
WIN_ROWS = WIN_BLOCKS * SUBLANES
WIN = WIN_ROWS * LANES
SWIN_BLOCKS = 2                    # starts window = 2048 entries
SWIN_ROWS = SWIN_BLOCKS * SUBLANES
SWIN = SWIN_ROWS * LANES

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


def _expand_kernel(j0_ref, total_ref, sv_hbm, oj_hbm, ids_hbm,
                   a_ref, b_ref,
                   svwin, ojwin, idwin, res_a_ref, res_b_ref,
                   sem_s, sems):
    g = pl.program_id(0)
    t0 = g * TILE
    rows_total = ids_hbm.shape[0]
    s_rows_total = sv_hbm.shape[0]

    # ---- slot coordinates and validity (from the prefetched total scalar)
    tau = (jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1))
    t = t0 + tau
    valid = (t < total_ref[0]).astype(jnp.int32)

    a_ref[:] = jnp.full((TILE_ROWS, LANES), PAD_ID, jnp.uint32)
    b_ref[:] = jnp.full((TILE_ROWS, LANES), PAD_ID, jnp.uint32)
    res_a_ref[:] = 1 - valid
    res_b_ref[:] = 1 - valid

    # ---- starts window: one aligned 2048-entry DMA is always enough.
    # Nonempty runs cover >= 1 slot each, so sv[j0 + q] >= t0 + q: every run
    # intersecting this tile lies in [j0, j0 + 1024], and aligning the base
    # down to a 1024-entry block keeps the top within base + 2047.
    j0 = jnp.maximum(j0_ref[g], 0)
    base_row = jnp.clip((j0 // TILE) * SUBLANES, 0, s_rows_total - SWIN_ROWS)
    base_row = pl.multiple_of(base_row, SUBLANES)
    base = base_row * LANES
    s_copies = [
        pltpu.make_async_copy(
            hbm.at[pl.ds(base_row + blk * SUBLANES, SUBLANES), :],
            win.at[pl.ds(blk * SUBLANES, SUBLANES), :],
            sem_s.at[2 * i + blk])
        for i, (hbm, win) in enumerate(((sv_hbm, svwin), (oj_hbm, ojwin)))
        for blk in range(SWIN_BLOCKS)
    ]
    for c in s_copies:
        c.start()
    for c in s_copies:
        c.wait()

    # ---- per-lane search: last window entry with sv <= t.
    # Rows are sorted, so the row holding the answer is found with
    # SWIN_ROWS broadcast compares against each row's FIRST entry (much
    # cheaper than binary-search steps, which need a full row-loop gather
    # each); then 7 binary steps search within the 128-entry row.
    sv = svwin[:]
    row_cnt = jnp.zeros((TILE_ROWS, LANES), jnp.int32)
    for w in range(SWIN_ROWS):
        # rows are sorted, so the row's first entry is its min — a scalar
        # reduce + splat compare (Mosaic cannot broadcast (1,1)->(8,128))
        first = jnp.min(sv[w:w + 1, :])
        row_cnt = row_cnt + (first <= t).astype(jnp.int32)
    row = jnp.maximum(row_cnt - 1, 0)       # last row with first entry <= t
    lo = row * LANES
    hi = lo + LANES
    for _ in range(8):                       # 128-entry in-row search
        # (8 halvings: a 128-wide [lo, hi) range reaches 0 only after 8)
        mid = (lo + hi) // 2
        svmid = _gather_window(sv, SWIN_ROWS, mid, jnp.int32)
        le = svmid <= t
        lo = jnp.where(le, mid + 1, lo)
        hi = jnp.where(le, hi, mid)
    j_loc = jnp.maximum(lo - 1, 0)
    sv_at = _gather_window(sv, SWIN_ROWS, j_loc, jnp.int32)
    oj_at = _gather_window(ojwin[:], SWIN_ROWS, j_loc, jnp.int32)

    off = t - sv_at
    idx_b = oj_at
    idx_a = oj_at + 1 + off

    # ---- multi-window id resolution (unchanged from round 1)
    def resolve_window(_):
        need_a = res_a_ref[:] == 0
        need_b = res_b_ref[:] == 0
        cand = jnp.minimum(jnp.where(need_a, idx_a, _HUGE),
                           jnp.where(need_b, idx_b, _HUGE))
        m = jnp.min(cand)
        id_base_row = jnp.clip((m // TILE) * SUBLANES, 0,
                               rows_total - WIN_ROWS)
        id_base_row = pl.multiple_of(id_base_row, SUBLANES)
        id_base = id_base_row * LANES

        copies = [
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(id_base_row + blk * SUBLANES, SUBLANES), :],
                idwin.at[pl.ds(blk * SUBLANES, SUBLANES), :],
                sems.at[blk])
            for blk in range(WIN_BLOCKS)
        ]
        for c in copies:
            c.start()

        loc_a = idx_a - id_base
        loc_b = idx_b - id_base
        in_a = need_a & (loc_a >= 0) & (loc_a < WIN)
        in_b = need_b & (loc_b >= 0) & (loc_b < WIN)
        loc_a = jnp.clip(loc_a, 0, WIN - 1)
        loc_b = jnp.clip(loc_b, 0, WIN - 1)

        for c in copies:
            c.wait()
        ga = _gather_window(idwin[:], WIN_ROWS, loc_a, jnp.uint32)
        gb = _gather_window(idwin[:], WIN_ROWS, loc_b, jnp.uint32)
        a_ref[:] = jnp.where(in_a, ga, a_ref[:])
        b_ref[:] = jnp.where(in_b, gb, b_ref[:])
        new_res_a = res_a_ref[:] | in_a.astype(jnp.int32)
        new_res_b = res_b_ref[:] | in_b.astype(jnp.int32)
        res_a_ref[:] = new_res_a
        res_b_ref[:] = new_res_b
        return jnp.sum(2 - new_res_a - new_res_b)

    unresolved0 = jnp.sum(2 - res_a_ref[:] - res_b_ref[:])
    jax.lax.while_loop(lambda r: r > 0, resolve_window, unresolved0)


def _pad_rows(x, fill):
    """Pad a 1-D array so (a) any aligned starts window fits and (b) the
    row count is a multiple of the DMA block."""
    n = x.shape[0]
    padded = (-(-n // TILE)) * TILE + SWIN
    return jnp.pad(x, (0, padded - n), constant_values=fill)


@functools.partial(jax.jit, static_argnames=("pair_capacity", "interpret"))
def expand_pairs(ids: jnp.ndarray, starts: jnp.ndarray, run: jnp.ndarray,
                 total: jnp.ndarray, pair_capacity: int,
                 interpret: bool = False):
    """(a, b) pair sides for every slot t < total; PAD_ID elsewhere.

    ids u32 (cap,): sorted element ids.  starts/run int32 (cap,): exclusive
    prefix sum of run lengths and the lengths themselves.  total: int32
    scalar (= starts[-1] + run[-1]).  pair_capacity: static multiple of
    1024.  Slots t >= total resolve to PAD immediately.
    """
    P = pair_capacity
    assert P % TILE == 0, f"pair capacity must be a multiple of {TILE}"
    cap = ids.shape[0]

    # compact to nonempty runs: (start value, original element index)
    if cap % TILE == 0:
        # single-pass streaming kernel
        from .pallas_compact import stream_compact
        (sv_u, oj_u), _m = stream_compact(
            run > 0,
            (starts, jnp.arange(cap, dtype=jnp.int32)),
            fills=(_HUGE, 0), interpret=interpret)
        sv = sv_u.astype(jnp.int32)
        oj = oj_u.astype(jnp.int32)
    else:
        from .compact import stable_compact
        (sv, oj), _m = stable_compact(
            run > 0,
            (starts, jnp.arange(cap, dtype=jnp.int32)),
            (_HUGE, 0))
    sv = _pad_rows(sv, _HUGE)
    oj = _pad_rows(oj, 0)

    # per-tile covering-run index into the compacted array
    from . import search
    t0s = jnp.arange(P // TILE, dtype=jnp.int32) * TILE
    j0s = search.upper_bound_i32(sv, t0s) - 1

    padded_ids = max(-(-cap // TILE) * TILE, WIN)
    if padded_ids != cap:
        ids = jnp.pad(ids, (0, padded_ids - cap))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # sv
            pl.BlockSpec(memory_space=pl.ANY),     # oj
            pl.BlockSpec(memory_space=pl.ANY),     # ids
        ],
        out_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((SWIN_ROWS, LANES), jnp.int32),   # svwin
            pltpu.VMEM((SWIN_ROWS, LANES), jnp.int32),   # ojwin
            pltpu.VMEM((WIN_ROWS, LANES), jnp.uint32),   # idwin
            pltpu.VMEM((TILE_ROWS, LANES), jnp.int32),   # res_a
            pltpu.VMEM((TILE_ROWS, LANES), jnp.int32),   # res_b
            pltpu.SemaphoreType.DMA((2 * SWIN_BLOCKS,)),
            pltpu.SemaphoreType.DMA((WIN_BLOCKS,)),
        ],
    )
    a, b = pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((P // LANES, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(j0s, jnp.asarray(total, jnp.int32).reshape(1),
      sv.reshape(-1, LANES), oj.reshape(-1, LANES),
      ids.reshape(-1, LANES))
    return a.reshape(P), b.reshape(P)
