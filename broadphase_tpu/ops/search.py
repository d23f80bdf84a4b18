"""Vectorized binary searches over sorted device arrays.

These replace the reference's pointer-chasing ``binary_search_by``
(``src/layer.rs:204-206``) and the stack sweep's implicit range discovery
with fixed-trip-count searches that vectorize over whole query batches —
log2(capacity) gathers per query, fully branch-free.
"""

from __future__ import annotations

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
