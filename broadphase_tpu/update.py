"""Temporal-coherence tree updates: re-sort only what changed cells.

The reference keeps one persistent ``Layer`` across frames and rebuilds it
with ``clear + extend + sort`` every frame (``src/layer.rs:84-121``; the
example app's loop, ``examples/main.rs``).  On TPU the rebuild's cost is
dominated by sorting every emitted cell (~n * 2^dim lanes) even though a
per-frame physics scene moves only slightly and most objects stay in the
SAME cells as last frame.

This module exploits that coherence TPU-first:

* A :class:`TrackedScene` carries the sorted tree plus last frame's raw
  bounds and per-object emission SIGNATURE — (depth, truncated local
  min/max, containment), the exact determinants of ``geom.emit_cells``'
  output.
* :func:`update` recomputes only the signature on the new bounds —
  quantize + truncation, (N, dim) integer math, NO Morton spread — and
  diffs it per object.  Objects that drifted **within** their cells have
  identical signatures and add no churn — the common physics case.
* Changed objects are extracted at OBJECT granularity: one single-column
  stream compaction over the n object lanes finds the changed-object
  index list, and the full emission (Morton grid walk) runs on ONLY
  those objects' gathered bounds rows — old bounds for tombstones
  (bit-identical re-derivation; ``to_local``'s barriers pin the f32 op
  sequence elementwise), new bounds for inserts.  Emission cost scales
  with the churn bound, not the scene.
* Tombstones and inserts sort into one small churn buffer and merge into
  the previous sorted tree.  On TPU a fused Pallas kernel
  (``ops/pallas_merge.py``) streams the tree once in sorted tiles,
  merging each tile's churn window in VMEM, cancelling tombstones (a
  tombstone sorts via a low tag bit directly after the tree entry it
  kills), and writing the compacted stream — one pass instead of three
  full-tree XLA passes.  No full-tree sort anywhere.  When every id fits
  28 bits the (id, aux, tag) triple packs into ONE u32 column (monotone
  in id), so the whole pipeline runs on three u32 columns — the minimum
  the 64-bit key itself dictates.

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
  inserts each); ``obj_cap`` (default ``churn_cap``) bounds the changed
  OBJECTS per frame.  Exceeding either sets ``state.overflow`` — rebuild
  from scratch that frame.
* ``wide_ids`` (static): ids >= 2^28 - 1 don't fit the packed column;
  pass True to run the unpacked (one extra sort column) path.  Leaving
  it False with wide ids present sets ``state.overflow`` (never silent).
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

# ids strictly below this pack (id << (dim+1)) | (aux << 1) | tag into one
# u32 that stays below the all-ones pad for dim <= 3 (strict: id = 2^28-1
# with all aux/tag bits set would collide with the pad sentinel)
_PACK_ID_BOUND = jnp.uint32((1 << 28) - 1)


class TrackedScene(NamedTuple):
    """A sorted layer plus last frame's bounds and emission SIGNATURE.

    The per-object signature (depth, truncated local min/max, containment)
    determines the emitted cell set exactly (``geom.emit_cells`` is a pure
    function of it), so the per-frame diff needs only (N, dim)-shaped
    integer compares — NO Morton spread over the full scene.  The raw
    bounds are kept so changed objects' OLD emissions can be re-derived
    (bit-identically: ``to_local``'s barriers pin the f32 op sequence
    elementwise) for tombstones without storing the (N, S) key table."""

    state: LayerState
    ids: jnp.ndarray           # (N,) uint32 — positionally stable ids
    bounds_min: jnp.ndarray    # (N, dim) f32 — last frame's raw bounds
    bounds_max: jnp.ndarray
    sig_depth: jnp.ndarray     # (N,) u32
    sig_tmin: jnp.ndarray      # (N, dim) u32 truncated local min
    sig_tmax: jnp.ndarray      # (N, dim) u32 truncated local max
    sig_contained: jnp.ndarray  # (N,) bool


def _compact(keep, cols, fills):
    """Streaming compaction: Pallas single pass on TPU, log-shift off."""
    if _use_pallas_expand():
        from .ops.pallas_compact import stream_compact
        return stream_compact(keep, cols, fills=fills,
                              interpret=jax.default_backend() != "tpu")
    from .ops.compact import stable_compact
    return stable_compact(keep, cols,
                          tuple(jnp.uint32(f) for f in fills))


def _signature(spec: IndexSpec, system_min, system_max,
               bounds_min, bounds_max, min_depth):
    """(depth (N,), tmin (N,dim), tmax (N,dim), contained (N,)) — the
    exact determinants of ``geom.emit_cells``' output for each object."""
    smin = jnp.asarray(system_min, jnp.float32)
    smax = jnp.asarray(system_max, jnp.float32)
    bmin = jnp.asarray(bounds_min, jnp.float32)
    bmax = jnp.asarray(bounds_max, jnp.float32)
    contained = geom.bounds_contains(smin, smax, bmin, bmax)
    lmin = geom.to_local(smin, smax, bmin)
    lmax = geom.to_local(smin, smax, bmax)
    depth = geom.depth_for_bounds(spec, lmin, lmax, min_depth)
    tmin = geom.truncate_to_depth(lmin, depth[:, None])
    tmax = geom.truncate_to_depth(lmax, depth[:, None])
    return depth, tmin, tmax, contained


def _sig_slot_count(depth, tmin, tmax, contained, A: int):
    """Live emitted slots per object implied by a signature, plus the
    per-object cell-overflow flag — pure vector math, no Morton spread."""
    shift = jnp.minimum(jnp.uint32(32) - depth, jnp.uint32(31))
    span = (tmax - tmin) >> shift[:, None]
    naxis = jnp.where(depth[:, None] == 0, jnp.uint32(1),
                      span + jnp.uint32(1))
    ovf = jnp.any(naxis > jnp.uint32(A), axis=-1) & contained
    cnt = jnp.prod(jnp.minimum(naxis, jnp.uint32(A)),
                   axis=-1).astype(jnp.int32)
    return jnp.where(contained, cnt, 0), ovf


def build_tracked(spec: IndexSpec, system_min, system_max,
                  bounds_min, bounds_max, ids,
                  slots_per_axis: int = 2, min_depth=0,
                  out_capacity: Optional[int] = None) -> TrackedScene:
    """Full build (``layer.build``) + capture bounds and signature."""
    state = build(spec, system_min, system_max, bounds_min, bounds_max,
                  ids, slots_per_axis=slots_per_axis, min_depth=min_depth,
                  out_capacity=out_capacity)
    depth, tmin, tmax, contained = _signature(
        spec, system_min, system_max, bounds_min, bounds_max,
        jnp.uint32(min_depth))
    return TrackedScene(state, jnp.asarray(ids, jnp.uint32),
                        jnp.asarray(bounds_min, jnp.float32),
                        jnp.asarray(bounds_max, jnp.float32),
                        depth, tmin, tmax, contained)


def _emit_rows(spec: IndexSpec, system_min, system_max,
               bmin_rows, bmax_rows, min_depth, slots_per_axis: int):
    """Full emission (quantize + Morton grid walk) on GATHERED object
    rows only — the spread cost scales with the churn bound, not the
    scene.  Returns (key sort cols (OC,S)..., valid (OC,S))."""
    smin = jnp.asarray(system_min, jnp.float32)
    smax = jnp.asarray(system_max, jnp.float32)
    contained = geom.bounds_contains(smin, smax, bmin_rows, bmax_rows)
    lmin = geom.to_local(smin, smax, bmin_rows)
    lmax = geom.to_local(smin, smax, bmax_rows)
    keys, valid, _ = geom.emit_cells(spec, lmin, lmax, min_depth,
                                     slots_per_axis)
    return bidx.sort_operands(spec, keys), valid & contained[:, None]


def _pack_meta(dim: int, ids2, aux2, tag):
    """(id, aux, tag) -> one u32, monotone in (id, aux, tag)."""
    return ((ids2 << jnp.uint32(dim + 1)) | (aux2 << jnp.uint32(1))
            | jnp.uint32(tag))


def _churn_stream(spec: IndexSpec, ids_rows, aux_row, k_rows, v_rows,
                  tag: int, wide_ids: bool):
    """One churn side's (key cols + meta cols) flat stream + keep mask.

    k_rows: key sort cols (OC, S); v_rows: (OC, S) validity; ids_rows:
    (OC,); aux_row: (S,) static slot-aux.  Invalid lanes are all-ones."""
    OC, S = v_rows.shape
    dim = spec.dim
    kc = tuple(c.reshape(OC * S) for c in k_rows)
    keep = v_rows.reshape(OC * S)
    ids2 = jnp.broadcast_to(ids_rows[:, None], (OC, S)).reshape(OC * S)
    aux2 = jnp.broadcast_to(aux_row[None, :], (OC, S)).reshape(OC * S)
    if wide_ids:
        # build drops aux to zeros for wide ids (layer._sort_now:
        # emit-once degrades to keep-all), so parity requires the same
        # here; the meta column carries only the tag
        meta = (ids2, jnp.full_like(ids2, jnp.uint32(tag)))
    else:
        meta = (_pack_meta(dim, ids2, aux2, tag),)
    ones = jnp.uint32(0xFFFF_FFFF)
    return tuple(jnp.where(keep, c, ones) for c in kc + meta), keep


def _tree_merge_cols(spec: IndexSpec, state: LayerState, wide_ids: bool):
    """The sorted tree as merge columns (key cols + (id, aux, tag=0)
    meta); pads stay all-ones in every column."""
    kc = bidx.sort_operands(spec, state.keys)
    t_live = state.ids != PAD_ID
    ones = jnp.uint32(0xFFFF_FFFF)
    if wide_ids:
        return kc + (state.ids, jnp.where(t_live, jnp.uint32(0), ones))
    return kc + (jnp.where(t_live,
                           _pack_meta(spec.dim, state.ids, state.aux, 0),
                           ones),)


def _merge_churn(spec: IndexSpec, tree_cols, churn, churn_live,
                 cap: int, C: int, wide_ids: bool):
    """Merge a SORTED churn buffer (2C lanes) into sorted tree columns,
    cancel tombstones, compact.  Returns (out cols (cap,), count,
    window_overflow, used_kernel).

    Kernel viability: the fused Pallas merge (ops/pallas_merge.py)
    streams the tree ONCE with per-tile churn windows; it fits when the
    average window (2.5x headroom) is within a tile.  Whole-tree churn
    (tests, degenerate scenes) exceeds any window — the global XLA
    formulation runs there."""
    nk = spec.bits // 32
    dim = spec.dim
    from .ops.pallas_merge import LANES as _L, TILE_ROWS as _TR
    _TL = _TR * _L
    capN = -(-cap // _TL) * _TL
    wr_needed = -(-5 * 2 * C * _TL // (2 * max(capN, 1) * _L))
    # the sublane-aligned window buffer must fit the tile: wr + 8 <= TR
    use_kernel = _use_pallas_expand() and wr_needed <= _TR - 8

    if use_kernel:
        from .ops.pallas_merge import merge_cancel_compact
        out, new_count, merge_ovf = merge_cancel_compact(
            tree_cols, churn, churn_live, cap,
            window_rows=int(max(8, wr_needed)),
            interpret=jax.default_backend() != "tpu")
        return out, new_count, merge_ovf, True

    merged = bitonic_merge(tree_cols, churn, num_keys=len(tree_cols))
    m_key = bidx.key_from_columns(spec, merged[:nk])
    if wide_ids:
        m_ids = merged[nk]
        m_tag = merged[nk + 1] & jnp.uint32(3)
    else:
        m_ids = merged[nk] >> jnp.uint32(dim + 1)
        m_tag = merged[nk] & jnp.uint32(1)

    # cancel: a tree entry directly followed by its tombstone dies with
    # it (adjacent access via shifts — a gather over the merged lanes
    # would cost ~10 ns/elem; these are pure vector passes).  The packing
    # guarantees adjacency: tree entry and tombstone differ only in the
    # lowest tag bit, so nothing sorts between them.
    def _shift1(c):
        return jnp.concatenate([c[1:], c[:1]])
    nxt_key = bidx.key_from_columns(
        spec, tuple(_shift1(c) for c in merged[:nk]))
    same = bidx.key_eq(spec, m_key, nxt_key) & (m_ids == _shift1(m_ids))
    # pad lanes (all-ones keys — never a live cell: the depth field of an
    # all-ones key exceeds clamp_depth in every spec) are dead weight the
    # compaction drops and the fill re-pads
    pad_mask = bidx.key_eq(spec, m_key, spec.pad_key(m_ids.shape))
    is_tomb = m_tag == 1
    keep = ~((same & (_shift1(is_tomb))) | is_tomb | pad_mask)

    new_count = jnp.sum(keep.astype(jnp.int32))
    out, _ = _compact(keep, merged, (0xFFFF_FFFF,) * len(merged))
    return (tuple(c[:cap] for c in out), new_count, jnp.bool_(False),
            False)


def _unpack_meta(spec: IndexSpec, out, cap: int, new_count,
                 wide_ids: bool):
    """(ids, aux) of the merged output's live prefix."""
    nk = spec.bits // 32
    dim = spec.dim
    lane = jnp.arange(cap, dtype=jnp.int32)
    live = lane < jnp.minimum(new_count, cap)
    if wide_ids:
        return (jnp.where(live, out[nk], PAD_ID),
                jnp.where(live, out[nk + 1] >> jnp.uint32(2), 0))
    return (jnp.where(live, out[nk] >> jnp.uint32(dim + 1), PAD_ID),
            jnp.where(live, (out[nk] >> jnp.uint32(1))
                      & jnp.uint32((1 << dim) - 1), 0))


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8, 9, 10))
def update(spec: IndexSpec, tracked: TrackedScene,
           system_min, system_max, bounds_min, bounds_max,
           churn_cap: int, slots_per_axis: int = 2,
           obj_cap: Optional[int] = None, wide_ids: bool = False,
           _stage: str = "full") -> TrackedScene:
    """Advance the tree to this frame's bounds by cell diff + tombstone
    merge.

    bounds_min/bounds_max: (N, dim) f32, same object slots as at
    ``build_tracked``.  ``churn_cap`` (static) bounds the changed cell
    slots per frame (each side); ``obj_cap`` (static, default churn_cap)
    bounds the changed objects.  Returns a TrackedScene whose state is
    bit-identical to a from-scratch ``layer.build`` on the new bounds
    (unique-id scenes).
    """
    state = tracked.state
    cap = capacity_of(state)
    dim = spec.dim
    S = slots_per_axis ** dim
    C = churn_cap
    OC = obj_cap if obj_cap is not None else churn_cap
    n = tracked.ids.shape[0]

    bmin_f = jnp.asarray(bounds_min, jnp.float32)
    bmax_f = jnp.asarray(bounds_max, jnp.float32)
    depth_n, tmin_n, tmax_n, cont_n = _signature(
        spec, system_min, system_max, bmin_f, bmax_f, state.min_depth)

    # per-object SIGNATURE diff: equal (depth, truncated bounds,
    # containment) implies identical emissions (emit_cells is a pure
    # function of the signature), so within-cell drift of every object is
    # zero churn and the diff never touches the Morton spread.  Objects
    # outside the system on both frames emit nothing either way.
    changed = ((depth_n != tracked.sig_depth)
               | (cont_n != tracked.sig_contained)
               | jnp.any((tmin_n != tracked.sig_tmin)
                         | (tmax_n != tracked.sig_tmax), axis=-1)) \
        & (cont_n | tracked.sig_contained)

    # exact churn counts derived from the signatures (caps are checked
    # against these, so a truncated extraction can never pass silently)
    old_cnt, _old_ovf = _sig_slot_count(
        tracked.sig_depth, tracked.sig_tmin, tracked.sig_tmax,
        tracked.sig_contained, slots_per_axis)
    new_cnt, new_ovf = _sig_slot_count(depth_n, tmin_n, tmax_n, cont_n,
                                       slots_per_axis)
    cell_ovf = jnp.any(new_ovf)
    contained = cont_n
    tomb_cnt = jnp.sum(jnp.where(changed, old_cnt, 0))
    ins_cnt = jnp.sum(jnp.where(changed, new_cnt, 0))
    obj_cnt = jnp.sum(changed.astype(jnp.int32))
    churn_ovf = (tomb_cnt > C) | (ins_cnt > C) | (obj_cnt > OC)
    if _stage == "emit_diff":      # profiler prefix (tools/profile_update)
        return tomb_cnt, ins_cnt, obj_cnt, cell_ovf

    # --- object-granular extraction: one 1-column compaction over the n
    # object lanes, then bounds-row gathers + emission of ONLY the
    # changed objects (old rows re-derive last frame's cells bit-exactly
    # from the stored bounds) -------------------------------------------
    (obj_idx_u,), _cnt = _compact(changed,
                                  (jnp.arange(n, dtype=jnp.uint32),),
                                  (n,))
    obj_idx_u = obj_idx_u[:OC] if obj_idx_u.shape[0] >= OC else jnp.pad(
        obj_idx_u, (0, OC - obj_idx_u.shape[0]), constant_values=n)
    row_live = jnp.arange(OC, dtype=jnp.int32) < jnp.minimum(obj_cnt, OC)
    obj_idx = jnp.clip(obj_idx_u.astype(jnp.int32), 0, max(n - 1, 0))

    old_k_rows, old_v = _emit_rows(
        spec, system_min, system_max, tracked.bounds_min[obj_idx],
        tracked.bounds_max[obj_idx], state.min_depth, slots_per_axis)
    new_k_rows, new_v = _emit_rows(
        spec, system_min, system_max, bmin_f[obj_idx], bmax_f[obj_idx],
        state.min_depth, slots_per_axis)
    old_v_rows = old_v & row_live[:, None]
    new_v_rows = new_v & row_live[:, None]
    ids_rows = tracked.ids[obj_idx]                            # (OC,)

    aux_row = _slot_aux(spec, slots_per_axis)                  # (S,)
    narrow = (jnp.max(jnp.where(tracked.ids != PAD_ID, tracked.ids, 0))
              < _PACK_ID_BOUND) if n else jnp.bool_(True)
    pack_ovf = jnp.bool_(False) if wide_ids else ~narrow

    t_cols, t_keep = _churn_stream(spec, ids_rows, aux_row, old_k_rows,
                                   old_v_rows, 1, wide_ids)  # tombstones
    i_cols, i_keep = _churn_stream(spec, ids_rows, aux_row, new_k_rows,
                                   new_v_rows, 0, wide_ids)  # inserts
    if _stage == "extract":        # profiler prefix
        return (tomb_cnt, t_cols[0][::64].sum(), i_cols[0][::64].sum(),
                jnp.sum(t_keep), jnp.sum(i_keep))
    churn_raw = tuple(jnp.concatenate([a, b])
                      for a, b in zip(t_cols, i_cols))
    churn_keep = jnp.concatenate([t_keep, i_keep])
    nk = spec.bits // 32                                   # key columns

    # compact the 2*OC*S churn lanes to the 2C merge budget, then one
    # small sort orders the churn buffer (every column is a sort key —
    # the (id, aux, tag) meta IS the tie-break that lands a tombstone
    # directly after the tree entry it cancels)
    fills = (0xFFFF_FFFF,) * len(churn_raw)
    churn_c, _ccnt = _compact(churn_keep, churn_raw, fills)
    churn = tuple(c[:2 * C] if c.shape[0] >= 2 * C else
                  jnp.pad(c, (0, 2 * C - c.shape[0]),
                          constant_values=jnp.uint32(0xFFFF_FFFF))
                  for c in churn_c)
    churn = jax.lax.sort(churn, num_keys=len(churn))
    if _stage == "churn":          # profiler prefix
        return tuple(c[::64].sum() for c in churn)

    tree_cols = _tree_merge_cols(spec, state, wide_ids)
    out, new_count, merge_ovf, _fused = _merge_churn(
        spec, tree_cols, churn, jnp.minimum(_ccnt, 2 * C), cap, C,
        wide_ids)
    if _stage == "merge":          # profiler prefix (on the kernel path
        # the merge is fused with cancel+compact, so merge ~= full)
        return tuple(c[::4096].sum() for c in out)

    o_ids, o_aux = _unpack_meta(spec, out, cap, new_count, wide_ids)

    overflow = (state.overflow | cell_ovf | churn_ovf | pack_ovf
                | merge_ovf | (new_count > cap))
    new_state = state._replace(
        keys=bidx.key_from_columns(spec, out[:nk]),
        ids=o_ids,
        aux=o_aux,
        count=jnp.minimum(new_count, cap),
        sorted=jnp.bool_(True),
        invalid_count=jnp.sum((~contained).astype(jnp.int32)),
        overflow=overflow,
    )
    return TrackedScene(new_state, tracked.ids, bmin_f, bmax_f,
                        depth_n, tmin_n, tmax_n, cont_n)
