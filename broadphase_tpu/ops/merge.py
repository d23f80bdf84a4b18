"""Bitonic merge of two sorted column sets — log(n) stages, no gathers.

``lax.sort`` is comparison-oblivious: merging two already-sorted arrays
through it costs the full O(n log^2 n) compare-exchange network.  But the
concatenation of an ascending run and a *reversed* (descending) run is a
bitonic sequence, and Batcher's bitonic merger sorts it in exactly
``log2(n)`` half-cleaner stages.  Each stage is a fixed power-of-two-stride
compare-exchange — expressible as one reshape + elementwise lexicographic
compare + where, i.e. pure vector passes with zero random memory access.
This is the TPU-native replacement for the reference's idiom of re-sorting
after ``Layer::merge`` (``src/layer.rs:127-138`` + ``:159``): linear-ish
work for what is semantically a linear merge.

HYBRID TAIL (measured, round 4): stages at stride < ~a vector register's
worth of lanes are sublane/lane shuffles — XLA lowers each as a relayout
pass, and the last ~10 stages cost far more than the first 12 despite
touching the same bytes.  After the half-cleaner stages with strides
m/2 .. R have run, every contiguous block of R lanes is bitonic and the
blocks are inter-ordered (max(block i) <= min(block i+1) — the standard
bitonic-merge recursion invariant), so the remaining log2(R) stages can
be replaced by ONE batched ``lax.sort`` over rows of length R — XLA's
tuned sorter at 1/log2(m/R)th the depth, with no cross-row work.
``tail_rows`` picks R.

Used by ``layer._merge_jit`` (sorted x sorted fast path) and
``layer.update`` (temporal-coherence tree update).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _lex_gt(lo_cols, hi_cols, num_keys: int) -> jnp.ndarray:
    """lo > hi under lexicographic order of the first num_keys columns."""
    gt = jnp.zeros(lo_cols[0].shape, jnp.bool_)
    eq = jnp.ones(lo_cols[0].shape, jnp.bool_)
    for k in range(num_keys):
        gt = gt | (eq & (lo_cols[k] > hi_cols[k]))
        eq = eq & (lo_cols[k] == hi_cols[k])
    return gt


def bitonic_merge(cols_a: Sequence[jnp.ndarray],
                  cols_b: Sequence[jnp.ndarray],
                  num_keys: int,
                  tail_rows: int = 2048) -> Tuple[jnp.ndarray, ...]:
    """Merge two ascending column sets into one ascending set.

    cols_a / cols_b: parallel 1-D arrays; the first ``num_keys`` columns
    are the lexicographic sort keys (uint32; pad entries must be all-ones
    so they sort to the tail — the layer's standard pad convention), the
    rest are payload moved alongside.  Both inputs must already be
    ascending.  Returns columns of length ``next_pow2(len_a + len_b)``,
    ascending; the all-ones padding inserted to reach the power of two
    sorts to the tail with the input pads.

    ``tail_rows`` (static, power of two) is the hybrid cutoff R: strides
    below R are finished by one batched row sort instead of lane-shuffle
    stages (see module docstring).  ``tail_rows=1`` recovers the pure
    compare-exchange network.

    Ties across the two inputs land in unspecified order (the layer's
    (key, id) tuples are unique over live entries, so this never matters
    there); within each input, order is preserved for distinct keys.
    """
    assert tail_rows >= 1 and (tail_rows & (tail_rows - 1)) == 0
    na = cols_a[0].shape[0]
    nb = cols_b[0].shape[0]
    m = _next_pow2(na + nb)
    pad = m - na - nb
    cols = []
    for a, b in zip(cols_a, cols_b):
        ones = jnp.full((pad,), jnp.iinfo(a.dtype).max
                        if jnp.issubdtype(a.dtype, jnp.integer) else 0,
                        a.dtype)
        # ascending A ++ max-pads ++ descending B: a bitonic sequence
        cols.append(jnp.concatenate([a, ones, b[::-1]]))

    s = m // 2
    while s >= tail_rows:
        xs = [c.reshape(-1, 2, s) for c in cols]
        lo = [x[:, 0, :] for x in xs]
        hi = [x[:, 1, :] for x in xs]
        swap = _lex_gt(lo, hi, num_keys)
        cols = [
            jnp.stack([jnp.where(swap, h, l), jnp.where(swap, l, h)],
                      axis=1).reshape(m)
            for l, h in zip(lo, hi)
        ]
        s //= 2
    if s >= 1:
        # blocks of length R = min(tail_rows, m) are bitonic and
        # inter-ordered; one batched row sort finishes them
        R = min(tail_rows, m)
        rows = jax.lax.sort(tuple(c.reshape(-1, R) for c in cols),
                            dimension=1, num_keys=num_keys)
        cols = [r.reshape(m) for r in rows]
    return tuple(cols)
