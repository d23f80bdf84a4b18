"""Vectorized searches over sorted device arrays.

Two families:

* ``upper_bound_*`` — classic branch-free binary search, log2(cap) *gather*
  rounds per query batch.  Fine for small query counts (the query engine),
  but random gathers are slow on TPU (the VPU has no per-lane gather), so
  for full-array query batches use the merge-based variants instead.
* ``merged_upper_bound`` / ``expand_runs`` — reformulate the search as ONE
  ``lax.sort`` of the concatenated (keys ++ queries) stream followed by
  cumsum/cummax sweeps.  Sort and cumulative ops are fast TPU primitives
  (hardware-friendly, linear HBM traffic), so this turns the reference's
  pointer-chasing ``binary_search_by`` (``src/layer.rs:204-206``) into a
  sort-rank program with no data-dependent memory access at all.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import index as bidx
from ..index import IndexSpec, Key


def _iters(cap: int) -> int:
    return max(1, int(cap).bit_length())


def upper_bound_keys(spec: IndexSpec, keys: Key, queries: Key) -> jnp.ndarray:
    """For each query key q: number of elements in the sorted `keys` array
    with key <= q (i.e. the exclusive end of q's run).  int32, in [0, cap]."""
    cap = jnp.shape(spec.ops.to_u32(keys))[0] if spec.bits == 64 else keys.shape[0]
    qshape = jnp.shape(spec.ops.to_u32(queries)) if spec.bits == 64 else queries.shape
    lo = jnp.zeros(qshape, dtype=jnp.int32)
    hi = jnp.full(qshape, cap, dtype=jnp.int32)
    for _ in range(_iters(cap)):
        cont = lo < hi
        mid = (lo + hi) >> 1
        km = bidx.key_gather(spec, keys, jnp.clip(mid, 0, cap - 1))
        le = bidx.key_le(spec, km, queries)
        lo = jnp.where(cont & le, mid + 1, lo)
        hi = jnp.where(cont & ~le, mid, hi)
    return lo


def lower_bound_keys(spec: IndexSpec, keys: Key, queries: Key) -> jnp.ndarray:
    """Number of elements with key < q (first index of q's run)."""
    cap = jnp.shape(spec.ops.to_u32(keys))[0] if spec.bits == 64 else keys.shape[0]
    qshape = jnp.shape(spec.ops.to_u32(queries)) if spec.bits == 64 else queries.shape
    lo = jnp.zeros(qshape, dtype=jnp.int32)
    hi = jnp.full(qshape, cap, dtype=jnp.int32)
    for _ in range(_iters(cap)):
        cont = lo < hi
        mid = (lo + hi) >> 1
        km = bidx.key_gather(spec, keys, jnp.clip(mid, 0, cap - 1))
        lt = bidx.key_lt(spec, km, queries)
        lo = jnp.where(cont & lt, mid + 1, lo)
        hi = jnp.where(cont & ~lt, mid, hi)
    return lo


def upper_bound_i32(sorted_vals: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Number of elements in sorted int32 `sorted_vals` that are <= q."""
    cap = sorted_vals.shape[0]
    lo = jnp.zeros(queries.shape, dtype=jnp.int32)
    hi = jnp.full(queries.shape, cap, dtype=jnp.int32)
    for _ in range(_iters(cap)):
        cont = lo < hi
        mid = (lo + hi) >> 1
        vm = sorted_vals[jnp.clip(mid, 0, cap - 1)]
        le = vm <= queries
        lo = jnp.where(cont & le, mid + 1, lo)
        hi = jnp.where(cont & ~le, mid, hi)
    return lo


# ---------------------------------------------------------------------------
# Merge-based searches: sort + cumsum instead of gather loops
# ---------------------------------------------------------------------------

def merged_upper_bound(spec: IndexSpec, keys: Key, queries: Key) -> jnp.ndarray:
    """For every query q: #elements of sorted `keys` with key <= q.

    One lax.sort of the concatenated stream + one scatter — no gather loops.
    Returns int32 (nq,) in query order.
    """
    kcols = bidx.sort_operands(spec, keys)
    qcols = bidx.sort_operands(spec, queries)
    nk = kcols[0].shape[0]
    nq = qcols[0].shape[0]
    vals = tuple(jnp.concatenate([k, q]) for k, q in zip(kcols, qcols))
    tag = jnp.concatenate([jnp.zeros(nk, jnp.uint32), jnp.ones(nq, jnp.uint32)])
    payload = jnp.concatenate([jnp.zeros(nk, jnp.int32),
                               jnp.arange(nq, dtype=jnp.int32)])
    out = jax.lax.sort(vals + (tag, payload), num_keys=len(vals) + 1)
    stag, spay = out[-2], out[-1]
    pos = jnp.arange(nk + nq, dtype=jnp.int32)
    q_before = jnp.cumsum(stag.astype(jnp.int32)) - stag.astype(jnp.int32)
    e_here = pos - q_before                    # #keys at positions < here
    dest = jnp.where(stag == 1, spay, nq)
    return jnp.zeros((nq,), jnp.int32).at[dest].set(e_here, mode="drop")


def expand_runs(starts: jnp.ndarray, pair_capacity: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ragged-run expansion: for each output slot t in [0, pair_capacity),
    find j(t) = index of the run containing t and o(t) = t - starts[j(t)]
    (the offset inside that run).

    ``starts`` is the sorted int32 exclusive-prefix-sum of run lengths.
    Equivalent to ``j = upper_bound(starts, t) - 1`` per t, but built from
    one sort of (starts ++ iota) + cumsum/cummax + one scatter — no gathers.
    Slots beyond the total run length return clamped garbage; mask with
    ``t < total`` downstream.
    """
    nj = starts.shape[0]
    t = jnp.arange(pair_capacity, dtype=jnp.int32)
    vals = jnp.concatenate([starts, t])
    tag = jnp.concatenate([jnp.zeros(nj, jnp.int32),
                           jnp.ones(pair_capacity, jnp.int32)])
    svals, stag = jax.lax.sort((vals, tag), num_keys=2)
    pos = jnp.arange(nj + pair_capacity, dtype=jnp.int32)
    qcum = jnp.cumsum(stag)                     # #queries up to & incl here
    j_here = pos - qcum                          # (#starts before here) - 1
    # last start value seen so far (starts ascending -> cummax == forward fill)
    sval_ffill = jax.lax.cummax(jnp.where(stag == 0, svals, jnp.int32(0)))
    o_here = svals - sval_ffill                  # t - starts[j]
    t_here = qcum - 1
    dest = jnp.where(stag == 1, t_here, pair_capacity)
    j_of_t = jnp.zeros((pair_capacity,), jnp.int32
                       ).at[dest].set(j_here, mode="drop")
    o_of_t = jnp.zeros((pair_capacity,), jnp.int32
                       ).at[dest].set(o_here, mode="drop")
    return j_of_t, o_of_t
