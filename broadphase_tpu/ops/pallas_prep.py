"""Pallas TPU kernel: fused run-length prefix sum + nonempty-run compaction.

Bridges pass 1 (descendant-run ends, ``ops/pallas_runends.py``) and pass 2
(pair expansion, ``ops/pallas_expand2.py``) of the scan.  The XLA glue it
replaces materialized four 4M-lane arrays per step (run, cumsum, starts,
abase) and re-read three of them in ``stream_compact``:

    run[j]    = max(min(e[j], count) - j - 1, 0)   for j < count
    starts    = exclusive prefix sum of run        (SMEM carry)
    entries   = compacted (starts, j + 1 - starts, ids[j]) where run > 0

One sequential forward pass: each 4096-element tile computes its runs, an
in-tile exclusive prefix sum merged with the running total, and appends
the nonempty entries to the staging buffer (the ``stream_compact``
machinery) — run/starts never touch HBM.  Outputs are exactly the
expansion kernel's prepped inputs plus (m, total, wrapped).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_compact import _elem_roll, _tile_compact

LANES = 128
T_ROWS = 32
T = T_ROWS * LANES
STAGE_ROWS = 2 * T_ROWS

_HUGE = 0x7FFF_FFFF
PAD_ID = 0xFFFF_FFFF


def _prefix_sum_excl(x):
    """Row-major exclusive prefix sum over an (R, 128) int32 tile."""
    pref = x
    d = 1
    while d < x.shape[0] * LANES:
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
    return pref - x


def _make_kernel(n_tiles: int, out_blocks: int, tile_rows: int):
    TR = tile_rows
    TL = TR * LANES
    SR = 2 * TR

    def kernel(count_ref, e_ref, ids_ref,
               sv_out, ab_out, bid_out, cnt_ref,
               st_sv, st_ab, st_bid, pos_ref, sems):
        g = pl.program_id(0)
        t0 = g * TL

        @pl.when(g == 0)
        def _init():
            pos_ref[0] = 0          # staged entries
            pos_ref[1] = 0          # blocks flushed
            pos_ref[2] = 0          # running total (starts carry)
            pos_ref[3] = 0          # wrapped flag
            st_sv[:] = jnp.full((SR, LANES), _HUGE, jnp.uint32)
            st_ab[:] = jnp.zeros((SR, LANES), jnp.uint32)
            st_bid[:] = jnp.full((SR, LANES), PAD_ID, jnp.uint32)

        count = count_ref[0]
        pos = (t0
               + jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0)
               * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 1))
        e = jnp.minimum(e_ref[:], count)
        run = jnp.where(pos < count, jnp.maximum(e - (pos + 1), 0), 0)

        carry = pos_ref[2]
        starts = _prefix_sum_excl(run) + carry
        tile_sum = jnp.sum(run)
        new_carry = carry + tile_sum
        pos_ref[2] = new_carry
        # int32 wrap: the running total of non-negatives must not decrease
        pos_ref[3] = pos_ref[3] | (new_carry < carry).astype(jnp.int32)

        valid = run > 0
        ab = pos + 1 - starts
        cols = [jax.lax.bitcast_convert_type(starts, jnp.uint32),
                jax.lax.bitcast_convert_type(ab, jnp.uint32),
                ids_ref[:]]
        compacted, k = _tile_compact(valid, cols)

        staged = pos_ref[0]
        sidx = (jax.lax.broadcasted_iota(jnp.int32,
                                         (SR, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32,
                                           (SR, LANES), 1))
        put = (sidx >= staged) & (sidx < staged + k)
        fills = (_HUGE, 0, PAD_ID)
        for st, c, f in zip((st_sv, st_ab, st_bid), compacted, fills):
            pad_full = jnp.concatenate(
                [c, jnp.full((SR - TR, LANES), f,
                             jnp.uint32)], axis=0)
            rolled = _elem_roll(pad_full, staged)
            st[:] = jnp.where(put, rolled, st[:])
        staged = staged + k
        pos_ref[0] = staged

        def flush():
            blk = pos_ref[1]

            @pl.when(blk < out_blocks)
            def _write():
                copies = [pltpu.make_async_copy(
                    st.at[pl.ds(0, TR), :],
                    o.at[pl.ds(blk * TR, TR), :],
                    sems.at[i]) for i, (st, o) in enumerate(
                        zip((st_sv, st_ab, st_bid),
                            (sv_out, ab_out, bid_out)))]
                for c in copies:
                    c.start()
                for c in copies:
                    c.wait()
            rowi = jax.lax.broadcasted_iota(jnp.int32,
                                            (SR, LANES), 0)
            for st, f in zip((st_sv, st_ab, st_bid), fills):
                shifted = pltpu.roll(st[:], SR - TR, axis=0)
                st[:] = jnp.where(rowi < SR - TR, shifted,
                                  jnp.full((SR, LANES), f,
                                           jnp.uint32))
            pos_ref[1] = blk + 1
            pos_ref[0] = pos_ref[0] - TL

        @pl.when(pos_ref[0] >= TL)
        def _():
            flush()

        @pl.when(g == n_tiles - 1)
        def _final():
            blk = pos_ref[1]

            @pl.when(blk < out_blocks)
            def _write():
                copies = [pltpu.make_async_copy(
                    st.at[pl.ds(0, TR), :],
                    o.at[pl.ds(blk * TR, TR), :],
                    sems.at[i]) for i, (st, o) in enumerate(
                        zip((st_sv, st_ab, st_bid),
                            (sv_out, ab_out, bid_out)))]
                for c in copies:
                    c.start()
                for c in copies:
                    c.wait()
            cnt_ref[0] = blk * TL + pos_ref[0]     # m = nonempty runs
            cnt_ref[1] = pos_ref[2]                # total pair slots
            cnt_ref[2] = pos_ref[3]                # wrapped flag

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def prep_runs(e: jnp.ndarray, ids: jnp.ndarray, count,
              tile_rows: int = 0, interpret: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                         jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sv, ab, bid, m, total, wrapped) from run ends ``e`` and ``ids``.

    e: int32 (cap,) descendant-run ends (``ops.search.descendant_run_ends``);
    ids: uint32 (cap,); count: int32 live prefix length.  sv/ab/bid are the
    compacted nonempty-run entries (fills ``_HUGE``/0/PAD beyond m), sized
    to hold every entry (cap rounded up one spare block).
    """
    cap = e.shape[0]
    if tile_rows == 0:
        from .pallas_compact import auto_tile_rows
        tile_rows = auto_tile_rows(cap, small=T_ROWS)
    TL = tile_rows * LANES
    padded = -(-max(cap, 1) // TL) * TL
    if padded != cap:
        e = jnp.pad(e, (0, padded - cap))
        ids = jnp.pad(ids, (0, padded - cap),
                      constant_values=jnp.uint32(PAD_ID))
    n_tiles = padded // TL
    out_blocks = n_tiles                      # every entry could be nonempty
    out_len = (out_blocks + 1) * TL

    outs = pl.pallas_call(
        _make_kernel(n_tiles, out_blocks, tile_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile_rows, LANES), lambda g, c: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_rows, LANES), lambda g, c: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=([pl.BlockSpec(memory_space=pl.ANY)] * 3
                       + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
            scratch_shapes=[pltpu.VMEM((2 * tile_rows, LANES),
                                       jnp.uint32)] * 3
            + [pltpu.SMEM((4,), jnp.int32),
               pltpu.SemaphoreType.DMA((3,))],
        ),
        out_shape=([jax.ShapeDtypeStruct((out_len // LANES, LANES),
                                         jnp.uint32)] * 3
                   + [jax.ShapeDtypeStruct((3,), jnp.int32)]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(count, jnp.int32).reshape(1),
      e.reshape(-1, LANES),
      ids.reshape(-1, LANES))

    sv_o, ab_o, bid_o, counts = outs
    m = counts[0]
    total = counts[1]
    wrapped = counts[2] != 0
    lane = jnp.arange(out_len, dtype=jnp.int32)
    sv = jnp.where(lane < m, jax.lax.bitcast_convert_type(
        sv_o.reshape(out_len), jnp.int32), _HUGE)
    ab = jnp.where(lane < m, jax.lax.bitcast_convert_type(
        ab_o.reshape(out_len), jnp.int32), 0)
    bid = jnp.where(lane < m, bid_o.reshape(out_len), jnp.uint32(PAD_ID))
    return sv, ab, bid, m, total, wrapped
