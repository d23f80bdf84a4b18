"""Temporal-coherence tree updates: re-emit only what moved.

The reference keeps one persistent ``Layer`` across frames and rebuilds it
with ``clear + extend + sort`` every frame (``src/layer.rs:79-88``; the
example app's loop, ``examples/main.rs``).  On TPU the rebuild's cost is
dominated by sorting every emitted cell (~n * 2^dim lanes) even though a
per-frame physics scene moves only slightly and most objects land in the
SAME cells as last frame.

This module is the TPU-first exploitation of that coherence:

* A :class:`TrackedScene` carries the sorted tree plus each object's
  quantized bounds + containment flag from the last frame (cell emission
  is a pure function of exactly those, ``geom.emit_cells``).
* :func:`update` quantizes the new bounds (cheap vector math), diffs them
  per object, stream-compacts only the CHANGED objects into a fixed churn
  buffer, re-emits their old cells as *tombstones* and their new cells as
  inserts, sorts that small buffer, and bitonic-merges it into the
  previous sorted tree (``ops/merge.py``, log(n) gather-free stages).  A
  tombstone sorts via a tag key column directly after the tree entry it
  cancels; one adjacent-compare pass + a single streaming compaction
  removes both.  No full-tree sort anywhere.

The result is bit-identical to ``layer.build`` from scratch on the new
bounds — same keys, ids, aux bits, count, and flags (differential-tested
in ``tests/test_update.py``) — because emission is pure and the tree's
(key, id) tuples are unique.

Contract / limits (all flagged, never silent):

* Object ids must be UNIQUE and positionally stable across frames (the
  diff is per object slot; duplicate ids could cancel an interchangeable
  twin's entry with a different aux bit).  Use :func:`layer.build` for
  duplicate-id scenes.
* ``churn_cap`` bounds the changed-object count per frame; exceeding it
  sets ``state.overflow`` — rebuild from scratch that frame.
* A tree that was already truncated (``state.overflow``) stays flagged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import geom, index as bidx
from .index import IndexSpec
from .layer import (PAD_ID, LayerState, _slot_aux, _use_pallas_expand,
                    build, capacity_of)
from .ops.merge import bitonic_merge
from .ops.u64 import U64


class TrackedScene(NamedTuple):
    """A sorted layer plus the per-object emission inputs of its frame."""

    state: LayerState
    ids: jnp.ndarray         # (N,) uint32 — positionally stable object ids
    lmin: jnp.ndarray        # (N, dim) uint32 quantized bounds
    lmax: jnp.ndarray        # (N, dim) uint32
    contained: jnp.ndarray   # (N,) bool — inside the system box last frame


def _compact(keep, cols, fills):
    """Streaming compaction: Pallas single pass on TPU, log-shift off."""
    if _use_pallas_expand():
        from .ops.pallas_compact import stream_compact
        return stream_compact(keep, cols, fills=fills,
                              interpret=jax.default_backend() != "tpu")
    from .ops.compact import stable_compact
    return stable_compact(keep, cols,
                          tuple(jnp.uint32(f) for f in fills))


def build_tracked(spec: IndexSpec, system_min, system_max,
                  bounds_min, bounds_max, ids,
                  slots_per_axis: int = 2, min_depth=0,
                  out_capacity: Optional[int] = None) -> TrackedScene:
    """Full build (``layer.build``) + capture the emission inputs."""
    state = build(spec, system_min, system_max, bounds_min, bounds_max,
                  ids, slots_per_axis=slots_per_axis, min_depth=min_depth,
                  out_capacity=out_capacity)
    lmin = geom.to_local(system_min, system_max, bounds_min)
    lmax = geom.to_local(system_min, system_max, bounds_max)
    contained = geom.bounds_contains(
        jnp.asarray(system_min, jnp.float32),
        jnp.asarray(system_max, jnp.float32),
        jnp.asarray(bounds_min, jnp.float32),
        jnp.asarray(bounds_max, jnp.float32))
    return TrackedScene(state, jnp.asarray(ids, jnp.uint32), lmin, lmax,
                        contained)


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def update(spec: IndexSpec, tracked: TrackedScene,
           system_min, system_max, bounds_min, bounds_max,
           churn_cap: int, slots_per_axis: int = 2
           ) -> TrackedScene:
    """Advance the tree to this frame's bounds by diff + tombstone merge.

    bounds_min/bounds_max: (N, dim) f32, same object slots as at
    ``build_tracked``.  ``churn_cap`` (static) bounds how many objects may
    change per frame.  Returns a TrackedScene whose state is bit-identical
    to a from-scratch ``layer.build`` on the new bounds (unique-id scenes).
    """
    state = tracked.state
    cap = capacity_of(state)
    dim = spec.dim
    S = slots_per_axis ** dim
    C = churn_cap
    smin = jnp.asarray(system_min, jnp.float32)
    smax = jnp.asarray(system_max, jnp.float32)
    bmin = jnp.asarray(bounds_min, jnp.float32)
    bmax = jnp.asarray(bounds_max, jnp.float32)
    n = tracked.ids.shape[0]

    contained = geom.bounds_contains(smin, smax, bmin, bmax)
    lmin = geom.to_local(smin, smax, bmin)
    lmax = geom.to_local(smin, smax, bmax)

    changed = (jnp.any(lmin != tracked.lmin, axis=-1)
               | jnp.any(lmax != tracked.lmax, axis=-1)
               | (contained != tracked.contained))
    changed_total = jnp.sum(changed.astype(jnp.int32))

    # pull the changed objects (new + old emission inputs) into the churn
    # buffer; a live-lane flag rides along so fill lanes emit nothing
    cols = ([lmin[:, k] for k in range(dim)]
            + [lmax[:, k] for k in range(dim)]
            + [tracked.lmin[:, k] for k in range(dim)]
            + [tracked.lmax[:, k] for k in range(dim)]
            + [tracked.ids, contained.astype(jnp.uint32),
               tracked.contained.astype(jnp.uint32),
               jnp.ones((n,), jnp.uint32)])
    compacted, _cnt = _compact(changed, tuple(cols),
                               (0,) * (len(cols) - 1) + (0,))
    compacted = tuple(c[:C] if c.shape[0] >= C else
                      jnp.pad(c, (0, C - c.shape[0])) for c in compacted)
    c_lmin = jnp.stack(compacted[0:dim], axis=-1)
    c_lmax = jnp.stack(compacted[dim:2 * dim], axis=-1)
    c_plmin = jnp.stack(compacted[2 * dim:3 * dim], axis=-1)
    c_plmax = jnp.stack(compacted[3 * dim:4 * dim], axis=-1)
    c_ids = compacted[4 * dim]
    c_cont = compacted[4 * dim + 1] != 0
    c_pcont = compacted[4 * dim + 2] != 0
    c_live = compacted[4 * dim + 3] != 0

    # re-emit: new cells (inserts, tag 2) and last frame's cells
    # (tombstones, tag 1) — emission is pure, so the tombstones equal the
    # tree's current entries for those objects bit for bit
    md = state.min_depth
    new_keys, new_valid, new_ovf = geom.emit_cells(spec, c_lmin, c_lmax,
                                                   md, slots_per_axis)
    old_keys, old_valid, _ = geom.emit_cells(spec, c_plmin, c_plmax,
                                             md, slots_per_axis)
    new_valid = new_valid & (c_cont & c_live)[:, None]
    old_valid = old_valid & (c_pcont & c_live)[:, None]
    cell_ovf = jnp.any(new_ovf & c_cont & c_live)

    aux_row = _slot_aux(spec, slots_per_axis)[None, :]          # (1, S)

    def _flat(keys, valid, tag):
        pad = spec.pad_key((C, S))
        k = bidx.key_where(spec, valid, keys, pad)
        i = jnp.where(valid, jnp.broadcast_to(c_ids[:, None], (C, S)),
                      PAD_ID)
        a = jnp.where(valid, jnp.broadcast_to(aux_row, (C, S)),
                      jnp.uint32(0))
        t = jnp.where(valid, jnp.uint32(tag), jnp.uint32(0))
        cols = bidx.sort_operands(spec, k) + (i, t, a)
        return tuple(c.reshape(C * S) for c in cols)

    churn = tuple(jnp.concatenate([x, y]) for x, y in zip(
        _flat(old_keys, old_valid, 1), _flat(new_keys, new_valid, 2)))
    # sort the churn buffer by (key, id, tag); aux is payload
    churn = jax.lax.sort(churn, num_keys=len(churn) - 1)

    # merge into the previous sorted tree (tag 0)
    kc = bidx.sort_operands(spec, state.keys)
    tree_cols = kc + (state.ids, jnp.zeros((cap,), jnp.uint32), state.aux)
    merged = bitonic_merge(tree_cols, churn, num_keys=len(kc) + 2)

    mk = bidx.key_from_columns(spec, merged[:len(kc)])
    m_ids = merged[len(kc)]
    m_tag = merged[len(kc) + 1]
    m_aux = merged[len(kc) + 2]

    # cancel: a tree entry directly followed by its tombstone dies with it
    # (adjacent access via shifts — a gather over m lanes would be ~80 ms
    # at 8M; these are pure vector passes)
    def _shift1(c):
        return jnp.concatenate([c[1:], c[:1]])
    nxt_key = bidx.key_from_columns(
        spec, tuple(_shift1(c) for c in merged[:len(kc)]))
    nxt_id = _shift1(m_ids)
    nxt_tag = _shift1(m_tag)
    same = bidx.key_eq(spec, mk, nxt_key) & (m_ids == nxt_id)
    dead = (same & (nxt_tag == 1)) | (m_tag == 1)
    keep = ~dead

    new_count = jnp.sum((keep & (m_ids != PAD_ID)).astype(jnp.int32))
    out_cols = bidx.sort_operands(spec, mk) + (m_ids, m_aux)
    fills = (0xFFFF_FFFF,) * (len(out_cols) - 1) + (0,)
    out, _ = _compact(keep, out_cols, fills)
    out = tuple(c[:cap] for c in out)

    overflow = (state.overflow | cell_ovf | (changed_total > C)
                | (new_count > cap))
    new_state = state._replace(
        keys=bidx.key_from_columns(spec, out[:-2]),
        ids=out[-2],
        aux=out[-1],
        count=jnp.minimum(new_count, cap),
        sorted=jnp.bool_(True),
        invalid_count=jnp.sum((~contained).astype(jnp.int32)),
        overflow=overflow,
    )
    return TrackedScene(new_state, tracked.ids, lmin, lmax, contained)
