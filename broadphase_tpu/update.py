"""Temporal-coherence tree updates: re-sort only what changed cells.

The reference keeps one persistent ``Layer`` across frames and rebuilds it
with ``clear + extend + sort`` every frame (``src/layer.rs:79-88``; the
example app's loop, ``examples/main.rs``).  On TPU the rebuild's cost is
dominated by sorting every emitted cell (~n * 2^dim lanes) even though a
per-frame physics scene moves only slightly and most objects stay in the
SAME cells as last frame.

This module exploits that coherence TPU-first:

* A :class:`TrackedScene` carries the sorted tree plus the per-object
  emission table of its frame — each object's up-to-2^dim (cell key,
  valid) slots, exactly what ``geom.emit_cells`` produced.
* :func:`update` re-runs the emission *vector math* on the new bounds (no
  sort — this is the cheap part of a build) and diffs the table per
  object.  Objects that drifted **within** their cells emit identical
  slots and cost nothing — the common physics case; the diff is on cells,
  not on raw coordinates, so sub-cell motion of every object is zero
  churn.
* Changed objects' OLD slots become *tombstones* and their NEW slots
  inserts; both stream-compact into a fixed churn buffer, get one small
  sort, and bitonic-merge into the previous sorted tree
  (``ops/merge.py``, log(n) gather-free stages).  A tombstone sorts via a
  tag key column directly after the tree entry it cancels; one
  adjacent-compare pass + a single streaming compaction removes both.
  No full-tree sort anywhere.

The result is bit-identical to ``layer.build`` from scratch on the new
bounds — same keys, ids, aux bits, count, and flags (differential-tested
in ``tests/test_update.py``) — because emission is pure and the tree's
(key, id) tuples are unique.

Contract / limits (all flagged, never silent):

* Object ids must be UNIQUE and positionally stable across frames (the
  diff is per object slot; duplicate ids could cancel an interchangeable
  twin's entry with a different aux bit).  Use :func:`layer.build` for
  duplicate-id scenes.
* ``churn_cap`` bounds the changed CELL SLOTS per frame (tombstones and
  inserts each); exceeding it sets ``state.overflow`` — rebuild from
  scratch that frame.
* A tree that was already truncated (``state.overflow``) stays flagged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import geom, index as bidx
from .index import IndexSpec, Key
from .layer import (PAD_ID, LayerState, _slot_aux, _use_pallas_expand,
                    build, capacity_of)
from .ops.merge import bitonic_merge


class TrackedScene(NamedTuple):
    """A sorted layer plus the emission table that produced it."""

    state: LayerState
    ids: jnp.ndarray         # (N,) uint32 — positionally stable object ids
    emit_keys: Key           # (N, S) cell keys emitted last frame
    emit_valid: jnp.ndarray  # (N, S) bool slot validity (incl. containment)


def _compact(keep, cols, fills):
    """Streaming compaction: Pallas single pass on TPU, log-shift off."""
    if _use_pallas_expand():
        from .ops.pallas_compact import stream_compact
        return stream_compact(keep, cols, fills=fills,
                              interpret=jax.default_backend() != "tpu")
    from .ops.compact import stable_compact
    return stable_compact(keep, cols,
                          tuple(jnp.uint32(f) for f in fills))


def _emit_table(spec: IndexSpec, system_min, system_max,
                bounds_min, bounds_max, min_depth, slots_per_axis: int):
    """(keys (N,S), valid (N,S), contained (N,), cell_ovf ()) — the same
    emission ``layer.build``/``extend`` run, kept in table form."""
    smin = jnp.asarray(system_min, jnp.float32)
    smax = jnp.asarray(system_max, jnp.float32)
    bmin = jnp.asarray(bounds_min, jnp.float32)
    bmax = jnp.asarray(bounds_max, jnp.float32)
    contained = geom.bounds_contains(smin, smax, bmin, bmax)
    lmin = geom.to_local(smin, smax, bmin)
    lmax = geom.to_local(smin, smax, bmax)
    keys, valid, cell_ovf = geom.emit_cells(spec, lmin, lmax, min_depth,
                                            slots_per_axis)
    valid = valid & contained[:, None]
    return keys, valid, contained, jnp.any(cell_ovf & contained)


def build_tracked(spec: IndexSpec, system_min, system_max,
                  bounds_min, bounds_max, ids,
                  slots_per_axis: int = 2, min_depth=0,
                  out_capacity: Optional[int] = None) -> TrackedScene:
    """Full build (``layer.build``) + capture the emission table."""
    state = build(spec, system_min, system_max, bounds_min, bounds_max,
                  ids, slots_per_axis=slots_per_axis, min_depth=min_depth,
                  out_capacity=out_capacity)
    keys, valid, _, _ = _emit_table(spec, system_min, system_max,
                                    bounds_min, bounds_max,
                                    jnp.uint32(min_depth), slots_per_axis)
    return TrackedScene(state, jnp.asarray(ids, jnp.uint32), keys, valid)


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def update(spec: IndexSpec, tracked: TrackedScene,
           system_min, system_max, bounds_min, bounds_max,
           churn_cap: int, slots_per_axis: int = 2
           ) -> TrackedScene:
    """Advance the tree to this frame's bounds by cell diff + tombstone
    merge.

    bounds_min/bounds_max: (N, dim) f32, same object slots as at
    ``build_tracked``.  ``churn_cap`` (static) bounds the changed cell
    slots per frame.  Returns a TrackedScene whose state is bit-identical
    to a from-scratch ``layer.build`` on the new bounds (unique-id
    scenes).
    """
    state = tracked.state
    cap = capacity_of(state)
    dim = spec.dim
    S = slots_per_axis ** dim
    C = churn_cap
    n = tracked.ids.shape[0]

    new_keys, new_valid, contained, cell_ovf = _emit_table(
        spec, system_min, system_max, bounds_min, bounds_max,
        state.min_depth, slots_per_axis)

    # per-object cell diff: identical slots (the within-cell-drift common
    # case) cost nothing
    slot_diff = (~bidx.key_eq(spec, new_keys, tracked.emit_keys)
                 & (new_valid | tracked.emit_valid)) \
        | (new_valid != tracked.emit_valid)
    changed = jnp.any(slot_diff, axis=-1)                      # (N,)

    ids_b = jnp.broadcast_to(tracked.ids[:, None], (n, S))
    aux_b = jnp.broadcast_to(_slot_aux(spec, slots_per_axis)[None, :],
                             (n, S))

    def _side(keys, valid, tag):
        """Stream-compact one side's changed live slots to (C,) columns +
        a tag column (tag rides AFTER compaction via the live count)."""
        keep = (changed[:, None] & valid).reshape(n * S)
        kc = bidx.sort_operands(spec, keys)
        cols = tuple(c.reshape(n * S) for c in kc) \
            + (ids_b.reshape(n * S), aux_b.reshape(n * S))
        fills = (0xFFFF_FFFF,) * (len(cols) - 1) + (0,)
        out, cnt = _compact(keep, cols, fills)
        out = tuple(c[:C] if c.shape[0] >= C else
                    jnp.pad(c, (0, C - c.shape[0]),
                            constant_values=(0 if i == len(cols) - 1
                                             else 0xFFFF_FFFF))
                    for i, c in enumerate(out))
        lane = jnp.arange(C, dtype=jnp.int32)
        t = jnp.where(lane < cnt, jnp.uint32(tag), jnp.uint32(0))
        nk = len(cols) - 2
        return out[:nk] + (out[-2], t, out[-1]), cnt

    tomb, tomb_cnt = _side(tracked.emit_keys, tracked.emit_valid, 1)
    ins, ins_cnt = _side(new_keys, new_valid, 2)
    churn_ovf = (tomb_cnt > C) | (ins_cnt > C)

    churn = tuple(jnp.concatenate([a, b]) for a, b in zip(tomb, ins))
    # sort the churn buffer by (key, id, tag); aux is payload
    churn = jax.lax.sort(churn, num_keys=len(churn) - 1)

    # merge into the previous sorted tree (tag 0)
    kc = bidx.sort_operands(spec, state.keys)
    tree_cols = kc + (state.ids, jnp.zeros((cap,), jnp.uint32), state.aux)
    merged = bitonic_merge(tree_cols, churn, num_keys=len(kc) + 2)

    m_ids = merged[len(kc)]
    m_tag = merged[len(kc) + 1]
    m_aux = merged[len(kc) + 2]

    # cancel: a tree entry directly followed by its tombstone dies with it
    # (adjacent access via shifts — a gather over the merged lanes would
    # cost ~10 ns/elem; these are pure vector passes)
    def _shift1(c):
        return jnp.concatenate([c[1:], c[:1]])
    nxt_key = bidx.key_from_columns(
        spec, tuple(_shift1(c) for c in merged[:len(kc)]))
    mk = bidx.key_from_columns(spec, merged[:len(kc)])
    same = bidx.key_eq(spec, mk, nxt_key) & (m_ids == _shift1(m_ids))
    dead = (same & (_shift1(m_tag) == 1)) | (m_tag == 1)
    keep = ~dead

    new_count = jnp.sum((keep & (m_ids != PAD_ID)).astype(jnp.int32))
    out_cols = merged[:len(kc)] + (m_ids, m_aux)
    fills = (0xFFFF_FFFF,) * (len(out_cols) - 1) + (0,)
    out, _ = _compact(keep, out_cols, fills)
    out = tuple(c[:cap] for c in out)

    overflow = (state.overflow | cell_ovf | churn_ovf | (new_count > cap))
    new_state = state._replace(
        keys=bidx.key_from_columns(spec, out[:-2]),
        ids=out[-2],
        aux=out[-1],
        count=jnp.minimum(new_count, cap),
        sorted=jnp.bool_(True),
        invalid_count=jnp.sum((~contained).astype(jnp.int32)),
        overflow=overflow,
    )
    return TrackedScene(new_state, tracked.ids, new_keys, new_valid)
