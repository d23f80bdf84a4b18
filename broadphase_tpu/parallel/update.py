"""Sharded temporal-coherence update: per-frame churn routed over ICI.

Completes the persistent multi-chip surface (``parallel/layer.py``): a
:class:`ShardedTracked` scene keeps the tree as per-device fragments
(owned contiguous Morton ranges) and the OBJECTS (bounds + emission
signature) sharded by object index.  Per frame:

1. each device diffs the signatures of its object shard — (n/D, dim)
   integer math, no Morton spread, no communication;
2. changed objects' old/new emissions are derived locally (gathered
   bounds rows only) and become tombstone/insert churn entries;
3. the churn is routed to its KEY owner with the same sort+``all_to_all``
   scheme as the sharded build — a tombstone carries the identical key
   as the tree entry it kills, so it always lands on the fragment that
   holds its victim;
4. each device merges its received churn into its fragment with the same
   merge-cancel-compact as the single-chip update (the fused Pallas
   kernel on TPU, the XLA formulation elsewhere).

The updated fragments are bit-identical to a from-scratch
``make_build_sharded`` on the new bounds (``tests/test_sharded_update.py``,
8-device CPU mesh).  The reference has no distributed analog at all — its
``parallel`` feature is shared-memory rayon (``src/layer.rs:522-548``);
this is the mesh-native extension of its persistent-layer idea.

Capacities (per device, all overflow-flagged): ``obj_cap`` changed
objects per object shard; ``route_cap`` churn entries per (src, dst)
routing row; ``churn_cap`` merge budget per fragment (each side).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import index as bidx
from ..index import IndexSpec
from ..layer import PAD_ID, _slot_aux
from ..update import (_churn_stream, _emit_rows, _merge_churn, _signature,
                      _sig_slot_count, _tree_merge_cols, _unpack_meta,
                      _PACK_ID_BOUND)
from ..ops.compact import stable_compact
from .layer import ShardedLayer, _local_state, make_build_sharded
from .scan import _bucket_rows, _make_bucket_of, min_depth_for_devices


class ShardedTracked(NamedTuple):
    """Persistent sharded layer + object-sharded bounds and signatures."""

    layer: ShardedLayer          # fragments, sharded by key range
    ids: jnp.ndarray             # (N,) uint32, sharded by object
    bounds_min: jnp.ndarray      # (N, dim) f32, sharded by object
    bounds_max: jnp.ndarray
    sig_depth: jnp.ndarray       # (N,) u32, sharded by object
    sig_tmin: jnp.ndarray        # (N, dim) u32
    sig_tmax: jnp.ndarray
    sig_contained: jnp.ndarray   # (N,) bool


def make_build_tracked_sharded(spec: IndexSpec, mesh: Mesh, axis_name: str,
                               *, fragment_capacity: int,
                               min_depth: int = 0,
                               slots_per_axis: int = 2):
    """``fn(smin, smax, bmin, bmax, ids) -> ShardedTracked``: the sharded
    build plus the object-sharded emission signature (pure elementwise —
    GSPMD shards it with the inputs, no shard_map needed)."""
    n_dev = mesh.shape[axis_name]
    eff_md = max(int(min_depth), min_depth_for_devices(spec, n_dev))
    build = make_build_sharded(spec, mesh, axis_name,
                               min_depth=min_depth,
                               slots_per_axis=slots_per_axis,
                               fragment_capacity=fragment_capacity)

    @jax.jit
    def fn(system_min, system_max, bounds_min, bounds_max, ids):
        lyr = build(system_min, system_max, bounds_min, bounds_max, ids)
        depth, tmin, tmax, cont = _signature(
            spec, system_min, system_max, bounds_min, bounds_max,
            jnp.uint32(eff_md))
        return ShardedTracked(lyr, jnp.asarray(ids, jnp.uint32),
                              jnp.asarray(bounds_min, jnp.float32),
                              jnp.asarray(bounds_max, jnp.float32),
                              depth, tmin, tmax, cont)

    return fn


def make_update_sharded(spec: IndexSpec, mesh: Mesh, axis_name: str,
                        *, churn_cap: int, obj_cap: Optional[int] = None,
                        route_cap: Optional[int] = None,
                        min_depth: int = 0, slots_per_axis: int = 2,
                        wide_ids: bool = False):
    """``fn(tracked, smin, smax, bmin, bmax) -> ShardedTracked``.

    bounds are globally shaped, sharded by object like the build inputs.
    All capacities are PER DEVICE; overflow anywhere sets the returned
    layer's global overflow flag (rebuild that frame)."""
    n_dev = mesh.shape[axis_name]
    eff_md = max(int(min_depth), min_depth_for_devices(spec, n_dev))
    bucket_of = _make_bucket_of(spec, n_dev)
    dim = spec.dim
    S = slots_per_axis ** dim
    C = int(churn_cap)
    OC = int(obj_cap) if obj_cap is not None else C
    RC = int(route_cap) if route_cap is not None else -(-2 * C // n_dev)
    nk = spec.bits // 32
    nc = nk + (2 if wide_ids else 1)

    def _device_fn(kc_frag, ids_frag, aux_frag, counts, g_ovf,
                   system_min, system_max, o_bmin, o_bmax, n_bmin, n_bmax,
                   ids_l, sigd, sigtmin, sigtmax, sigcont):
        n_local = ids_l.shape[0]
        md = jnp.uint32(eff_md)

        # --- 1. local signature diff (object shard) -----------------------
        depth_n, tmin_n, tmax_n, cont_n = _signature(
            spec, system_min, system_max, n_bmin, n_bmax, md)
        changed = ((depth_n != sigd) | (cont_n != sigcont)
                   | jnp.any((tmin_n != sigtmin) | (tmax_n != sigtmax),
                             axis=-1)) & (cont_n | sigcont)
        old_cnt, _ = _sig_slot_count(sigd, sigtmin, sigtmax, sigcont,
                                     slots_per_axis)
        new_cnt, new_ovf = _sig_slot_count(depth_n, tmin_n, tmax_n,
                                           cont_n, slots_per_axis)
        obj_cnt = jnp.sum(changed.astype(jnp.int32))
        local_ovf = jnp.any(new_ovf) | (obj_cnt > OC)
        if not wide_ids:
            local_ovf = local_ovf | (jnp.max(jnp.where(
                ids_l != PAD_ID, ids_l, 0)) >= _PACK_ID_BOUND)

        # --- 2. changed-object extraction + local emissions ---------------
        (obj_idx_u,), _ = stable_compact(
            changed, (jnp.arange(n_local, dtype=jnp.uint32),),
            (jnp.uint32(n_local),))
        obj_idx_u = obj_idx_u[:OC] if obj_idx_u.shape[0] >= OC else \
            jnp.pad(obj_idx_u, (0, OC - obj_idx_u.shape[0]),
                    constant_values=jnp.uint32(n_local))
        row_live = jnp.arange(OC, dtype=jnp.int32) \
            < jnp.minimum(obj_cnt, OC)
        oi = jnp.clip(obj_idx_u.astype(jnp.int32), 0, max(n_local - 1, 0))
        old_k, old_v = _emit_rows(spec, system_min, system_max,
                                  o_bmin[oi], o_bmax[oi], md,
                                  slots_per_axis)
        new_k, new_v = _emit_rows(spec, system_min, system_max,
                                  n_bmin[oi], n_bmax[oi], md,
                                  slots_per_axis)
        aux_row = _slot_aux(spec, slots_per_axis)
        t_cols, _tk = _churn_stream(spec, ids_l[oi], aux_row, old_k,
                                    old_v & row_live[:, None], 1,
                                    wide_ids)
        i_cols, _ik = _churn_stream(spec, ids_l[oi], aux_row, new_k,
                                    new_v & row_live[:, None], 0,
                                    wide_ids)
        churn_raw = tuple(jnp.concatenate([a, b])
                          for a, b in zip(t_cols, i_cols))

        # --- 3. route churn to its key owner: sorting the (already
        # all-ones-padded) stream groups it by destination bucket (top key
        # bits are monotone in key), exactly the build's routing ----------
        sorted_cols = jax.lax.sort(churn_raw, num_keys=len(churn_raw))
        skeys = bidx.key_from_columns(spec, sorted_cols[:nk])
        live = ~bidx.key_eq(spec, skeys,
                            spec.pad_key((2 * OC * S,)))
        rows, _, route_ovf = _bucket_rows(
            sorted_cols, bucket_of(skeys), live, n_dev, RC,
            pads=(0xFFFF_FFFF,) * len(sorted_cols))
        rows = tuple(
            jax.lax.all_to_all(r, axis_name, split_axis=0, concat_axis=0)
            for r in rows)

        # --- 4. received churn -> per-fragment merge budget ---------------
        recv = tuple(r.reshape(n_dev * RC) for r in rows)
        recv = jax.lax.sort(recv, num_keys=len(recv))
        recv_live = jnp.sum((~bidx.key_eq(
            spec, bidx.key_from_columns(spec, recv[:nk]),
            spec.pad_key((n_dev * RC,)))).astype(jnp.int32))
        recv_ovf = recv_live > 2 * C
        churn = tuple(
            c[:2 * C] if c.shape[0] >= 2 * C else
            jnp.pad(c, (0, 2 * C - c.shape[0]),
                    constant_values=jnp.uint32(0xFFFF_FFFF))
            for c in recv)

        frag_len = ids_frag.shape[0]
        st = _local_state(spec, bidx.key_from_columns(spec, kc_frag),
                          ids_frag, aux_frag, counts[0], eff_md,
                          jnp.bool_(False))
        tree_cols = _tree_merge_cols(spec, st, wide_ids)
        out, new_count, merge_ovf, _ = _merge_churn(
            spec, tree_cols, churn, jnp.minimum(recv_live, 2 * C),
            frag_len, C, wide_ids)
        o_ids, o_aux = _unpack_meta(spec, out, frag_len, new_count,
                                    wide_ids)

        any_ovf = jax.lax.psum(
            (local_ovf | route_ovf | recv_ovf | merge_ovf
             | (new_count > frag_len)).astype(jnp.int32), axis_name) > 0
        inv_total = jax.lax.psum(
            jnp.sum((~cont_n).astype(jnp.int32)), axis_name)
        return (out[:nk] + (o_ids, o_aux,
                jnp.minimum(new_count, frag_len).reshape(1),
                inv_total, any_ovf | g_ovf,
                depth_n, tmin_n, tmax_n, cont_n))

    sharded = jax.shard_map(
        _device_fn, mesh=mesh,
        in_specs=(tuple([P(axis_name)] * nk), P(axis_name), P(axis_name),
                  P(axis_name), P(),
                  P(), P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name)),
        out_specs=(tuple([P(axis_name)] * nk)
                   + (P(axis_name), P(axis_name), P(axis_name), P(), P(),
                      P(axis_name), P(axis_name), P(axis_name),
                      P(axis_name))),
        check_vma=False,
    )

    @jax.jit
    def fn(tracked: ShardedTracked, system_min, system_max,
           bounds_min, bounds_max) -> ShardedTracked:
        lyr = tracked.layer
        kc = bidx.sort_operands(spec, lyr.keys)
        bmin = jnp.asarray(bounds_min, jnp.float32)
        bmax = jnp.asarray(bounds_max, jnp.float32)
        out = sharded(kc, lyr.ids, lyr.aux, lyr.counts, lyr.overflow,
                      jnp.asarray(system_min, jnp.float32),
                      jnp.asarray(system_max, jnp.float32),
                      tracked.bounds_min, tracked.bounds_max, bmin, bmax,
                      tracked.ids, tracked.sig_depth, tracked.sig_tmin,
                      tracked.sig_tmax, tracked.sig_contained)
        new_lyr = ShardedLayer(
            keys=bidx.key_from_columns(spec, out[:nk]),
            ids=out[nk], aux=out[nk + 1], counts=out[nk + 2],
            invalid_count=out[nk + 3], overflow=out[nk + 4])
        return ShardedTracked(new_lyr, tracked.ids, bmin, bmax,
                              out[nk + 5], out[nk + 6], out[nk + 7],
                              out[nk + 8])

    return fn
