"""Pallas TPU bitonic sort over u32 key columns.

``lax.sort`` on TPU pays O(n log^2 n) compare-exchange stages with poor
fusion — measured 51 ms for a 16M-lane 2-column sort, ~7x above the
arithmetic + bandwidth floor.  This module runs the same bitonic network
but fuses every stage whose exchange distance fits inside a VMEM-resident
chunk into a single HBM pass:

* **chunk kernel** — per 2^18-element chunk, all stages with k <= CHUNK
  (171 compare-exchange stages) execute on VMEM data: partners come from
  circular rolls (lane rolls for distance < 128, sublane rolls above),
  directions from the global index iota.  One HBM read + write total.
* **crossing stages** (j >= CHUNK) — pure XLA: the partner of element i
  at distance j is a ``reshape(-1, 2, j)`` axis flip, and the
  compare-exchange is an elementwise select.  ~10-21 bandwidth-bound
  passes for 16M lanes.
* **finish kernel** — after each k-phase's crossing stages, the remaining
  j < CHUNK stages of that phase fuse into one VMEM pass per chunk.

All columns are key columns, compared lexicographically in the order
given (the callers sort with total orders: canonical pairs sort on
(a, b); the build sort on (hi, lo, id)).  Arbitrary lengths are padded to
a power of two with all-ones keys (0xFFFFFFFF sorts last; object id
0xFFFFFFFF is reserved as PAD throughout the framework).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK_ROWS = 2048
CHUNK = CHUNK_ROWS * LANES          # 2^18 elements per VMEM-resident chunk


def _lex_lt(a_cols, b_cols):
    """Lexicographic a < b over parallel column tuples."""
    lt = jnp.zeros(a_cols[0].shape, jnp.bool_)
    eq = jnp.ones(a_cols[0].shape, jnp.bool_)
    for a, b in zip(a_cols, b_cols):
        lt = lt | (eq & (a < b))
        eq = eq & (a == b)
    return lt


def _exchange(cols, partner_cols, take):
    return tuple(jnp.where(take, p, c) for c, p in zip(cols, partner_cols))


def _stage_masks(idx, k, j):
    asc = (idx & k) == 0
    is_upper = (idx & j) != 0
    return asc, is_upper


def _take_mask(cols, partner_cols, asc, is_upper):
    pgt = _lex_lt(cols, partner_cols)       # partner > mine
    plt = _lex_lt(partner_cols, cols)       # partner < mine
    # boolean select via logic ops (Mosaic cannot select_n i1 vectors)
    sel = asc ^ is_upper
    return (~sel & pgt) | (sel & plt)


def _roll_partner(cols, j):
    """Partner values at XOR distance j inside a (ROWS, 128) tile.
    pltpu.roll requires non-negative shifts; roll by -s == roll by
    size - s (exchange partners always stay inside the same 2j block, so
    the circular wraparound values are never selected)."""
    if j < LANES:
        lo = tuple(pltpu.roll(c, LANES - j, axis=1) for c in cols)
        hi = tuple(pltpu.roll(c, j, axis=1) for c in cols)
    else:
        r = j // LANES
        lo = tuple(pltpu.roll(c, CHUNK_ROWS - r, axis=0) for c in cols)
        hi = tuple(pltpu.roll(c, r, axis=0) for c in cols)
    return lo, hi


def _kernel_stages(cols, idx, k_values, j_top):
    """Run bitonic stages for each k in k_values, j from min(k/2, j_top)
    down to 1, on VMEM-resident (ROWS, 128) tiles."""
    for k in k_values:
        j = min(k // 2, j_top)
        while j >= 1:
            lo, hi = _roll_partner(cols, j)
            bit = (idx & j) != 0
            partner = tuple(jnp.where(bit, h, l) for l, h in zip(lo, hi))
            asc, is_upper = _stage_masks(idx, k, j)
            take = _take_mask(cols, partner, asc, is_upper)
            cols = _exchange(cols, partner, take)
            j //= 2
    return cols


def _make_chunk_kernel(n_cols, k_values, j_top):
    def kernel(*refs):
        in_refs = refs[:n_cols]
        out_refs = refs[n_cols:]
        g = pl.program_id(0)
        base = g * CHUNK
        idx = (base
               + jax.lax.broadcasted_iota(jnp.int32, (CHUNK_ROWS, LANES), 0)
               * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (CHUNK_ROWS, LANES), 1))
        cols = tuple(r[:] for r in in_refs)
        cols = _kernel_stages(cols, idx, k_values, j_top)
        for r, c in zip(out_refs, cols):
            r[:] = c

    return kernel


def _run_chunk_kernel(cols, k_values, j_top, interpret):
    N = cols[0].shape[0]
    n_cols = len(cols)
    grid = N // CHUNK
    out = pl.pallas_call(
        _make_chunk_kernel(n_cols, tuple(k_values), j_top),
        grid=(grid,),
        in_specs=[pl.BlockSpec((CHUNK_ROWS, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)] * n_cols,
        out_specs=[pl.BlockSpec((CHUNK_ROWS, LANES), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)] * n_cols,
        out_shape=[jax.ShapeDtypeStruct((N // LANES, LANES), c.dtype)
                   for c in cols],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*[c.reshape(N // LANES, LANES) for c in cols])
    return tuple(o.reshape(N) for o in out)


def _xla_stage(cols, k, j, N):
    """One crossing compare-exchange stage in plain XLA: partner at XOR
    distance j = flip of the middle axis of a (-1, 2, j) reshape."""
    shaped = tuple(c.reshape(-1, 2, j) for c in cols)
    partner = tuple(s[:, ::-1, :] for s in shaped)
    idx = jnp.arange(N, dtype=jnp.int32).reshape(-1, 2, j)
    asc, is_upper = _stage_masks(idx, k, j)
    take = _take_mask(shaped, partner, asc, is_upper)
    return tuple(e.reshape(N)
                 for e in _exchange(shaped, partner, take))


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_u32_columns(cols: Sequence[jnp.ndarray], interpret: bool = False
                     ) -> Tuple[jnp.ndarray, ...]:
    """Sort parallel u32 columns lexicographically (ALL columns are keys).

    Equivalent to ``jax.lax.sort(cols, num_keys=len(cols))``.  Length is
    padded internally to a power of two (>= CHUNK) with all-ones keys.
    """
    cols = tuple(jnp.asarray(c, jnp.uint32) for c in cols)
    N0 = cols[0].shape[0]
    N = max(CHUNK, 1 << max(0, (N0 - 1).bit_length()))
    if N != N0:
        pad = jnp.full((N - N0,), 0xFFFF_FFFF, jnp.uint32)
        cols = tuple(jnp.concatenate([c, pad]) for c in cols)

    # phase A: all k <= CHUNK.  Mosaic compile time grows ~quadratically
    # with the unrolled stage count (measured 21st->33s, 105st->466s), so
    # the 171 stages are split into <=48-stage kernels: ~5 min total
    # first-compile instead of ~25, for 3 extra bandwidth-bound passes.
    groups, cur, cur_stages = [], [], 0
    for p in range(1, CHUNK.bit_length()):          # k = 2 .. CHUNK
        if cur and cur_stages + p > 48:
            groups.append(cur)
            cur, cur_stages = [], 0
        cur.append(1 << p)
        cur_stages += p
    groups.append(cur)
    for g in groups:
        cols = _run_chunk_kernel(cols, tuple(g), CHUNK // 2, interpret)

    # phases k > CHUNK: XLA crossing stages + fused in-chunk finish
    k = 2 * CHUNK
    while k <= N:
        j = k // 2
        while j >= CHUNK:
            cols = _xla_stage(cols, k, j, N)
            j //= 2
        cols = _run_chunk_kernel(cols, (k,), CHUNK // 2, interpret)
        k *= 2

    if N != N0:
        cols = tuple(c[:N0] for c in cols)
    return cols
