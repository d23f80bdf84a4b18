"""Pallas TPU kernel: windowed segmented pair-expansion gather.

Produces both sides of the candidate-pair list from the sorted id array:

    a[t] = ids[j[t] + 1 + o[t]]        (the descendant / later element)
    b[t] = ids[j[t]]                   (the ancestor / stack element)

XLA lowers these data-dependent gathers to ~8-10 ns/element on TPU (no
per-lane gather hardware path), costing ~190 ms at 16M pairs.  This kernel
exploits the structure instead: ``j`` is *non-decreasing* in t (runs are
emitted in order), so for an output tile of T = 1024 pairs every needed id
lies in a bounded contiguous window:

    j in [j[t0], j[t1]]            with j[t1] - j[t0] <= T
    i = j+1+o in (j, e_j)          and within the tile i <= j[t1] + T + 1

Each grid step DMAs one aligned 4096-id window (4 blocks of (8,128); HBM
slices must be tile-aligned) into VMEM and resolves the lookups with
``take_along_axis(..., axis=1)`` — the lane gather Mosaic supports — over
the window's rows: 32 broadcast+select passes, all VPU work, no HBM random
access.

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
WIN_BLOCKS = 4                     # window = 4 x (8 x 128) = 4096 ids:
WIN_ROWS = WIN_BLOCKS * SUBLANES   # covers 2T+2 needed + 1023 align slack
WIN = WIN_ROWS * LANES


def _expand_kernel(j_ref, o_ref, ids_hbm, a_ref, b_ref, win, sems):
    rows_total = ids_hbm.shape[0]
    j0 = j_ref[0, 0]
    base_row = jnp.clip((j0 // TILE) * SUBLANES, 0, rows_total - WIN_ROWS)
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

    j = j_ref[:]                                  # (TILE_ROWS, LANES)
    o = o_ref[:]
    loc_i = j + 1 + o - base
    loc_j = j - base
    # clamp into the window (out-of-range slots are masked upstream)
    loc_i = jnp.clip(loc_i, 0, WIN - 1)
    loc_j = jnp.clip(loc_j, 0, WIN - 1)
    row_i = loc_i // LANES
    col_i = loc_i % LANES
    row_j = loc_j // LANES
    col_j = loc_j % LANES

    for c in copies:
        c.wait()
    a = jnp.zeros((TILE_ROWS, LANES), jnp.uint32)
    b = jnp.zeros((TILE_ROWS, LANES), jnp.uint32)
    for w in range(WIN_ROWS):
        rowvec = jnp.broadcast_to(win[w, :][None, :], (TILE_ROWS, LANES))
        cand_i = jnp.take_along_axis(rowvec, col_i, axis=1)
        cand_j = jnp.take_along_axis(rowvec, col_j, axis=1)
        a = jnp.where(row_i == w, cand_i, a)
        b = jnp.where(row_j == w, cand_j, b)
    a_ref[:] = a
    b_ref[:] = b


@functools.partial(jax.jit, static_argnames=("interpret",))
def expand_gather(ids: jnp.ndarray, j_of_t: jnp.ndarray,
                  o_of_t: jnp.ndarray, interpret: bool = False):
    """(a, b) = (ids[j+1+o], ids[j]) for non-decreasing j with the
    run-structure window invariant.  ids u32 (cap,); j/o int32 (P,), P a
    multiple of 1024.  ids is padded to a multiple of 1024 internally."""
    P = j_of_t.shape[0]
    assert P % TILE == 0, f"pair capacity must be a multiple of {TILE}"
    cap = ids.shape[0]
    padded = max(-(-cap // TILE) * TILE, WIN)
    if padded != cap:
        ids = jnp.pad(ids, (0, padded - cap))
    ids2d = ids.reshape(padded // LANES, LANES)
    grid = P // TILE

    a, b = pl.pallas_call(
        _expand_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
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
            pltpu.SemaphoreType.DMA((WIN_BLOCKS,)),
        ],
        interpret=interpret,
    )(j_of_t.reshape(P // LANES, LANES), o_of_t.reshape(P // LANES, LANES),
      ids2d)
    return a.reshape(P), b.reshape(P)
