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


def _bracketed_search(spec: IndexSpec, keys: Key, queries: Key,
                      lo: jnp.ndarray, hi: jnp.ndarray, le: bool
                      ) -> jnp.ndarray:
    """Binary search with PER-QUERY brackets and a data-dependent trip
    count.  The classic loops above always run log2(cap) gather rounds;
    when the caller already knows each answer lies in [lo, hi] (e.g. a
    tree descent where children live inside the parent's element range),
    a ``while_loop`` stops as soon as every bracket closes — the gather
    rounds shrink with the brackets, which shrink geometrically down a
    descent.  Requires lo <= answer <= hi elementwise."""
    cap = jnp.shape(spec.ops.to_u32(keys))[0] if spec.bits == 64 \
        else keys.shape[0]
    cmp = bidx.key_le if le else bidx.key_lt

    def cond(c):
        l, h = c
        return jnp.any(l < h)

    def body(c):
        l, h = c
        cont = l < h
        mid = (l + h) >> 1
        km = bidx.key_gather(spec, keys, jnp.clip(mid, 0, cap - 1))
        go = cmp(spec, km, queries)
        l = jnp.where(cont & go, mid + 1, l)
        h = jnp.where(cont & ~go, mid, h)
        return l, h

    lo, _ = jax.lax.while_loop(cond, body, (lo.astype(jnp.int32),
                                            hi.astype(jnp.int32)))
    return lo


def lower_bound_keys_bracketed(spec: IndexSpec, keys: Key, queries: Key,
                               lo, hi) -> jnp.ndarray:
    """#elements with key < q, given per-query answer brackets [lo, hi]."""
    return _bracketed_search(spec, keys, queries, lo, hi, le=False)


def upper_bound_keys_bracketed(spec: IndexSpec, keys: Key, queries: Key,
                               lo, hi) -> jnp.ndarray:
    """#elements with key <= q, given per-query answer brackets [lo, hi]."""
    return _bracketed_search(spec, keys, queries, lo, hi, le=True)


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

    Two lax.sorts of the concatenated stream — no gather loops, no scatters.
    The tag (key=0 < query=1, so upper bound) and the query's position are
    packed into one u32 column; the second sort on that column alone routes
    each query's answer back to query order (a sort is far cheaper than a
    data-dependent scatter on TPU).  Returns int32 (nq,) in query order.
    """
    kcols = bidx.sort_operands(spec, keys)
    qcols = bidx.sort_operands(spec, queries)
    nk = kcols[0].shape[0]
    nq = qcols[0].shape[0]
    vals = tuple(jnp.concatenate([k, q]) for k, q in zip(kcols, qcols))
    tagpay = jnp.concatenate([
        jnp.zeros(nk, jnp.uint32),
        jnp.uint32(1 << 31) | jnp.arange(nq, dtype=jnp.uint32)])
    out = jax.lax.sort(vals + (tagpay,), num_keys=len(vals) + 1)
    stp = out[-1]
    is_q = (stp >> 31).astype(jnp.int32)
    pos = jnp.arange(nk + nq, dtype=jnp.int32)
    e_here = pos - (jnp.cumsum(is_q) - is_q)   # #keys at positions < here
    _, e_sorted = jax.lax.sort((stp, e_here.astype(jnp.uint32)), num_keys=1)
    return e_sorted[nk:].astype(jnp.int32)


def adjacent_lca_depth(spec: IndexSpec, keys: Key) -> jnp.ndarray:
    """For each adjacent pair in a *sorted* key array: the deepest depth d
    with ``same_cell_at_depth(keys[i], keys[i+1], d)`` — the depth of the
    two cells' lowest common ancestor.

    One clz over the adjacent-key XOR: ``level_mask(d)`` covers the top
    ``dim*d`` bits of the key (``src/index.rs:82-87``), so the LCA depth is
    ``leading_zeros_from_key_top(xor) // dim`` clamped to ``axis_bits``
    (differences confined to the depth field mean "same cell at every
    depth").  Returns int32 of shape (n,); slot n-1 holds the sentinel -1
    (past the last element every subtree is broken).
    """
    ops = spec.ops
    if spec.bits == 32:
        x = keys[:-1] ^ keys[1:]
        if spec.key_bits < 32:
            x = x << (32 - spec.key_bits)
        nlz = jax.lax.clz(x).astype(jnp.int32)
    else:
        xh = keys.hi[:-1] ^ keys.hi[1:]
        xl = keys.lo[:-1] ^ keys.lo[1:]
        s = 64 - spec.key_bits
        if s:
            xh = (xh << s) | (xl >> (32 - s))
            xl = xl << s
        nlz = jnp.where(xh != jnp.uint32(0),
                        jax.lax.clz(xh),
                        jnp.uint32(32) + jax.lax.clz(xl)).astype(jnp.int32)
    lca = jnp.minimum(nlz // spec.dim, spec.axis_bits)
    return jnp.concatenate([lca, jnp.full((1,), -1, jnp.int32)])


def descendant_run_ends(spec: IndexSpec, keys: Key,
                        depth: jnp.ndarray) -> jnp.ndarray:
    """Exclusive end of every element's descendant-or-equal run, sort-free.

    Over a *sorted* key array, element j's collision partners are the
    contiguous run (j, e_j) with keys in ``(key_j .. descendant_max(key_j)]``
    (the invariant behind the reference's stack sweep,
    ``src/layer.rs:550-573``).  Because truncation-at-depth-d equality is an
    equivalence that chains through adjacent elements, e_j is simply one
    past the first position i >= j whose :func:`adjacent_lca_depth` drops
    below depth_j.  "First position >= j with lca < d" is a reverse cummin
    of positions per depth level d — ``axis_bits + 1`` cheap vector passes,
    no sorts, no gathers (replaces two full-array ``lax.sort`` calls of the
    merged-rank formulation; VERDICT round 1 item #3.ii).

    ``depth`` is ``depth_of(keys)``; pad entries (depth > axis_bits) get
    e = 0.  Returns int32 (n,), values in [0, n].

    On TPU the per-depth suffix mins run in one Pallas kernel (reversed
    grid + per-depth SMEM carry, ``ops.pallas_runends``); the XLA
    formulation below (one reverse cummin per depth level) is the
    off-TPU / opt-out fallback.
    """
    n = depth.shape[0]
    lca = adjacent_lca_depth(spec, keys)
    d = depth.astype(jnp.int32)

    import os
    use_pallas = os.environ.get("BROADPHASE_NO_PALLAS") != "1" and (
        os.environ.get("BROADPHASE_FORCE_PALLAS") == "1"
        or jax.default_backend() == "tpu")
    if use_pallas:
        from .pallas_runends import run_ends
        return run_ends(lca, d, spec.axis_bits + 1,
                        interpret=jax.default_backend() != "tpu")

    pos = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(2**31 - 1)
    e = jnp.zeros((n,), jnp.int32)
    for dd in range(spec.axis_bits + 1):
        # sentinel lca[n-1] = -1 < dd guarantees a qualifying position in
        # every suffix, so nxt <= n-1 and e <= n
        nxt = jax.lax.cummin(jnp.where(lca < dd, pos, big), reverse=True)
        e = jnp.where(d == dd, nxt + 1, e)
    return e


def expand_runs(starts: jnp.ndarray, pair_capacity: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ragged-run expansion: for each output slot t in [0, pair_capacity),
    find j(t) = index of the run containing t and o(t) = t - starts[j(t)]
    (the offset inside that run).

    ``starts`` is the sorted int32 exclusive-prefix-sum of run lengths.
    Equivalent to ``j = upper_bound(starts, t) - 1`` per t, but because the
    query sequence is the *identity* (t = 0..P-1), the search collapses to a
    histogram: ``j(t) = (#starts <= t) - 1 = cumsum(histogram(starts))[t] - 1``
    — one scatter-add + one cumsum.  ``starts[j(t)]`` falls out of a
    scatter-max + running-max forward fill (start values are monotone).
    No sorts, no gathers.  Slots beyond the total run length return clamped
    garbage; mask with ``t < total`` downstream.
    """
    P = pair_capacity
    t = jnp.arange(P, dtype=jnp.int32)
    hist = jnp.zeros((P,), jnp.int32).at[starts].add(1, mode="drop")
    j_of_t = jnp.cumsum(hist) - 1                       # #starts <= t, -1
    smax = jnp.zeros((P,), jnp.int32).at[starts].max(starts, mode="drop")
    start_of_t = jax.lax.cummax(smax)                   # starts[j(t)]
    o_of_t = t - start_of_t
    return j_of_t, o_of_t


def segmented_broadcast(starts: jnp.ndarray, run: jnp.ndarray,
                        values: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """out[t] = values[j(t)] — broadcast each run's value across its output
    range, without a gather: scatter values at run starts (nonempty runs
    have strictly increasing, unique starts), then forward-fill with
    log2(out_size) shift+select passes.  A per-lane gather costs ~8-10 ns/
    element on TPU; these are pure vector ops."""
    P = out_size
    nonempty = run > 0
    dest = jnp.where(nonempty, starts, P)
    vals = jnp.zeros((P,), values.dtype).at[dest].set(values, mode="drop")
    seen = jnp.zeros((P,), jnp.bool_).at[dest].set(True, mode="drop")
    s = 1
    while s < P:
        pv = jnp.concatenate([vals[:s], vals[:-s]])   # shift right by s
        ps = jnp.concatenate([jnp.zeros((s,), jnp.bool_), seen[:-s]])
        vals = jnp.where(seen, vals, pv)
        seen = seen | ps
        s <<= 1
    return vals
