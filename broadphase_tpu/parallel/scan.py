"""Multi-chip sharded broadphase step: shard_map + all_to_all exchanges.

The reference parallelizes its scan with rayon fork-join, splitting the sorted
tree only at ``min_depth``-cell boundaries so no collision pair spans a chunk
cut (``src/layer.rs:522-548``; correctness argument in SURVEY.md §3.3).  The
TPU rebuild applies the same rule at *device* granularity:

* Every key's top ``B = ceil(log2 n_devices)`` significant bits select a
  destination device (a contiguous Morton key range per device).
* If ``min_depth * dim >= B``, every cell in the tree is at depth >=
  ``min_depth``, so all keys of one min_depth cell share their top
  ``dim * min_depth`` >= B bits — a cell can never straddle two devices, and
  therefore no candidate pair can either.  :func:`min_depth_for_devices`
  computes the floor, mirroring the reference's LayerBuilder guidance
  ("log4/log8 of processor count", ``src/layer.rs:640-646``).

The step is one ``shard_map`` program per device: local quantize+emit
(:func:`broadphase_tpu.geom.emit_cells`), ONE local sort that both orders the
tree fragment and groups it by destination device (the device bucket is the
top key bits, so key order IS bucket order — routing costs a sort plus one
gather, independent of the device count), one ``all_to_all`` over the mesh
axis (rides ICI), local ``lax.sort``, then the shared data-parallel pair
expansion (:func:`broadphase_tpu.layer.scan_pairs`).

One object's cells may land on different devices, so the *same id pair* can
be emitted by two shards.  A second all_to_all routes every pair to the
device owning ``hash(pair_a) % n_dev`` (Fibonacci hash — ownership is
decorrelated from application id patterns); cross-shard duplicates
therefore collide on one device and are removed by the local canonical
sort+dedup — the global dedup happens ON DEVICE, ``total_count`` is exact,
and the only host work left in :func:`gather_pairs` is merging the
disjoint per-device classes into one sorted list (the reference's
canonical par_scan output, ``src/layer.rs:516-517``).

Weak-scaling cost model (per-device byte counts of both all_to_alls, the
``n_dev * xcap`` exchange-buffer growth, id-skew, and the min_depth
consequence at 64-256 devices): **docs/SCALING.md**.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import geom
from .. import index as bidx
from ..index import IndexSpec
from ..layer import (PAD_ID, _NARROW_ID_BOUND, _slot_aux, canonical_pairs,
                     scan_pairs)
from ..ops.u64 import U64


class ShardedScanResult(NamedTuple):
    pairs_a: jnp.ndarray       # (n_dev * out_cap,) uint32, sharded; each
    pairs_b: jnp.ndarray       #   shard holds its hash(a)-owned class,
    #                              sorted + globally deduped
    shard_counts: jnp.ndarray  # (n_dev,) int32 deduped pairs per shard
    total_count: jnp.ndarray   # () int32 exact global deduped pair count
    invalid_count: jnp.ndarray  # () int32 objects dropped by bounds check
    overflow: jnp.ndarray      # () bool any buffer overflow anywhere


def min_depth_for_devices(spec: IndexSpec, n_devices: int) -> int:
    """Smallest min_depth such that no pair spans a device key-range cut."""
    if n_devices <= 1:
        return 0
    bits = (n_devices - 1).bit_length()  # ceil(log2 n)
    return -(-bits // spec.dim)          # ceil(bits / dim)


def _bucket_rows(cols, bucket, live, n_dev: int, row_cap: int, pads):
    """Regroup sorted columns into (n_dev, row_cap) destination rows.

    ``bucket`` must be non-decreasing over live entries (live entries
    grouped by destination), ``live`` a mask with all live entries first or
    interspersed — only counts matter.  One gather per column; O(n) work
    independent of n_dev (replaces round 1's per-device cumsum+scatter loop,
    VERDICT.md round 1 Weak #5).

    Returns (rows..., counts, overflow).
    """
    d = jnp.arange(n_dev, dtype=jnp.int32)
    bkt = jnp.where(live, bucket, n_dev)
    counts = jnp.sum(bkt[None, :] == d[:, None], axis=1)          # (n_dev,)
    starts = jnp.cumsum(counts) - counts
    src = starts[:, None] + jnp.arange(row_cap, dtype=jnp.int32)[None, :]
    take = jnp.arange(row_cap, dtype=jnp.int32)[None, :] < counts[:, None]
    src = jnp.clip(src, 0, bucket.shape[0] - 1)
    rows = tuple(jnp.where(take, c[src], jnp.asarray(pad, c.dtype))
                 for c, pad in zip(cols, pads))
    return rows, counts, jnp.any(counts > row_cap)


def _local_sorted_fragment(spec: IndexSpec, axis_name: str, n_dev: int,
                           eff_min_depth: int, slots_per_axis: int,
                           bcap: int, bucket_of,
                           system_min, system_max,
                           bounds_min, bounds_max, ids):
    """Per-device body of the sharded BUILD: local emit, route by top key
    bits via one sort + one all_to_all (rides ICI), local sort.  Returns
    the device's sorted tree fragment — the keys in its owned contiguous
    Morton range — as (keys, ids, aux, count, invalid_count, overflow).
    Shared by :func:`make_sharded_step` (fused build+scan) and the
    persistent :func:`broadphase_tpu.parallel.layer.make_build_sharded`.
    """
    n_local = ids.shape[0]
    md = jnp.uint32(eff_min_depth)
    S = slots_per_axis ** spec.dim

    # --- local extend -----------------------------------------------------
    contained = geom.bounds_contains(system_min, system_max,
                                     bounds_min, bounds_max)
    lmin = geom.to_local(system_min, system_max, bounds_min)
    lmax = geom.to_local(system_min, system_max, bounds_max)
    keys, valid, cell_ovf = geom.emit_cells(
        spec, lmin, lmax, md, slots_per_axis)
    valid = valid & contained[:, None]
    flat_valid = valid.reshape(n_local * S)
    flat_ids = jnp.where(
        flat_valid,
        jnp.broadcast_to(jnp.asarray(ids, jnp.uint32)[:, None],
                         (n_local, S)).reshape(n_local * S),
        PAD_ID)
    # emit-once aux bools ride the id column through BOTH routing
    # sorts and the all_to_all as (id << dim) | aux — monotone in id,
    # so tuple order and bucket grouping are unchanged.  The narrow
    # gate must agree across devices: reduce the max id globally.
    dim = spec.dim
    m_aux = jnp.uint32((1 << dim) - 1)
    flat_aux = jnp.where(
        flat_valid,
        jnp.broadcast_to(_slot_aux(spec, slots_per_axis)[None, :],
                         (n_local, S)).reshape(n_local * S),
        jnp.uint32(0))
    local_max = jnp.max(jnp.where(flat_valid, flat_ids, 0))
    narrow = jax.lax.pmax(local_max, axis_name) < _NARROW_ID_BOUND
    packed = jnp.where(flat_ids == PAD_ID, PAD_ID,
                       (flat_ids << dim) | (flat_aux & m_aux))
    flat_ids = jnp.where(narrow, packed, flat_ids)
    pad = spec.pad_key((n_local, S))
    keys = bidx.key_where(spec, valid, keys, pad)
    if spec.bits == 32:
        key_cols = (keys.reshape(n_local * S),)
    else:
        key_cols = (keys.hi.reshape(n_local * S),
                    keys.lo.reshape(n_local * S))

    # --- route by key sort: bucket = top key bits, so one sort groups
    # by destination (pads at the tail), then one gather builds rows -------
    sorted_cols = jax.lax.sort(key_cols + (flat_ids,),
                               num_keys=len(key_cols))
    skeys_flat = bidx.key_from_columns(spec, sorted_cols[:-1])
    live = ~bidx.key_eq(spec, skeys_flat, spec.pad_key((n_local * S,)))
    rows, _, route_ovf = _bucket_rows(
        sorted_cols, bucket_of(skeys_flat), live, n_dev, bcap,
        pads=(0xFFFF_FFFF,) * len(sorted_cols))
    key_rows, id_rows = rows[:-1], rows[-1]

    # --- the exchange: one all_to_all over ICI ----------------------------
    key_rows = tuple(
        jax.lax.all_to_all(c, axis_name, split_axis=0, concat_axis=0)
        for c in key_rows)
    rids = jax.lax.all_to_all(id_rows, axis_name,
                              split_axis=0, concat_axis=0)

    # --- local sort: the device's fragment of the global sorted tree ------
    total = n_dev * bcap
    cols = tuple(c.reshape(total) for c in key_rows) + (rids.reshape(total),)
    sorted_cols = jax.lax.sort(cols, num_keys=len(cols))
    skeys = bidx.key_from_columns(spec, sorted_cols[:-1])
    sc = sorted_cols[-1]
    sids = jnp.where(narrow,
                     jnp.where(sc == PAD_ID, PAD_ID, sc >> dim), sc)
    saux = jnp.where(narrow & (sc != PAD_ID), sc & m_aux,
                     jnp.uint32(0))
    live = ~bidx.key_eq(spec, skeys, spec.pad_key((total,)))
    count = jnp.sum(live.astype(jnp.int32))

    inv_local = jnp.sum((~contained).astype(jnp.int32))
    local_ovf = jnp.any(cell_ovf & contained) | route_ovf
    return skeys, sids, saux, count, inv_local, local_ovf


def _dedup_exchange(axis_name: str, n_dev: int, xcap: int, pa, pb):
    """Global pair dedup: route pairs to the owner device of hash(pair_a)
    so duplicates collide on one device, then canonical sort+dedup
    locally.  Any deterministic function of pair_a works (duplicates
    of one pair share pair_a); the Fibonacci hash decorrelates
    ownership from application id patterns — a plain a % n_dev would
    send e.g. an all-even id scene's every pair to half the devices
    (see docs/SCALING.md, id-skew).  Returns (out_a, out_b, dcount,
    x_ovf) — this device's hash-owned class, sorted + deduped."""
    plive = pa != PAD_ID
    pbkt = jnp.where(plive, ((pa * jnp.uint32(0x9E3779B1))
                             % jnp.uint32(max(n_dev, 1))
                             ).astype(jnp.int32), n_dev)
    sb, spa, spb = jax.lax.sort(
        (pbkt.astype(jnp.uint32), pa, pb), num_keys=3)
    prows, _, x_ovf = _bucket_rows(
        (spa, spb), sb.astype(jnp.int32), sb != jnp.uint32(n_dev),
        n_dev, xcap, pads=(PAD_ID, PAD_ID))
    # NOTE scaling: the exchanged buffer is n_dev * xcap lanes per
    # device — xcap bounds ONE device's hash-owned class of the deduped
    # pair list, so for fixed global pair count it can shrink ~1/n_dev;
    # keep n_dev * xcap within HBM when scaling out (docs/SCALING.md).
    xa = jax.lax.all_to_all(prows[0], axis_name,
                            split_axis=0, concat_axis=0).reshape(-1)
    xb = jax.lax.all_to_all(prows[1], axis_name,
                            split_axis=0, concat_axis=0).reshape(-1)
    from ..layer import _use_pallas_expand
    out_a, out_b, dcount = canonical_pairs(
        xa, xb, xa != PAD_ID,
        compaction="stream" if _use_pallas_expand() else "shift")
    return out_a, out_b, dcount, x_ovf


def _make_bucket_of(spec: IndexSpec, n_dev: int):
    """Top-B significant key bits -> destination device, monotone in key."""
    B = (n_dev - 1).bit_length() if n_dev > 1 else 0

    def bucket_of(keys) -> jnp.ndarray:
        if B == 0:
            base = keys.lo if isinstance(keys, U64) else keys
            return jnp.zeros(base.shape, dtype=jnp.int32)
        shift = spec.key_bits - B
        b = spec.ops.to_u32(spec.ops.shri(keys, shift)).astype(jnp.int32)
        return jnp.minimum(b, n_dev - 1)

    return bucket_of


def make_sharded_step(spec: IndexSpec, mesh: Mesh, axis_name: str,
                      *, min_depth: int = 0, slots_per_axis: int = 2,
                      bucket_capacity: int, pair_capacity: int,
                      exchange_capacity: Optional[int] = None,
                      filter_fn: Optional[Callable] = None,
                      nested_ids: bool = False):
    """Build a jitted sharded step:
    ``fn(system_min, system_max, bounds_min, bounds_max, ids) -> ShardedScanResult``.

    Input arrays are globally shaped, sharded along the leading (object) axis
    over ``axis_name``; ``bucket_capacity`` / ``pair_capacity`` /
    ``exchange_capacity`` are *per-device* buffer sizes (exchange_capacity
    bounds one device's share of the deduped pair list and defaults to
    ``pair_capacity``).

    ``nested_ids`` applies the reference sweep's id-on-stack skip
    (``layer.scan_pairs``) per shard; the min_depth boundary rule makes
    that exact — an ancestor chain shares its descendants' top-B key bits
    once element depth >= ceil(log2(n_dev)/dim), so same-id nestings never
    straddle devices.
    """
    n_dev = mesh.shape[axis_name]
    eff_min_depth = max(int(min_depth), min_depth_for_devices(spec, n_dev))
    bcap = int(bucket_capacity)
    xcap = int(exchange_capacity or pair_capacity)
    _bucket_of = _make_bucket_of(spec, n_dev)

    def _device_fn(system_min, system_max, bounds_min, bounds_max, ids):
        skeys, sids, saux, count, inv_local, local_ovf = \
            _local_sorted_fragment(spec, axis_name, n_dev, eff_min_depth,
                                   slots_per_axis, bcap, _bucket_of,
                                   system_min, system_max,
                                   bounds_min, bounds_max, ids)
        res = scan_pairs(spec, skeys, sids, count, pair_capacity,
                         filter_fn, extra_overflow=local_ovf, aux=saux,
                         nested_ids=nested_ids)
        out_a, out_b, dcount, x_ovf = _dedup_exchange(
            axis_name, n_dev, xcap, res.pairs_a, res.pairs_b)

        # --- global reductions --------------------------------------------
        total_pairs = jax.lax.psum(dcount, axis_name)
        invalid_total = jax.lax.psum(inv_local, axis_name)
        any_ovf = jax.lax.psum(
            (res.overflow | x_ovf).astype(jnp.int32), axis_name) > 0
        return (out_a, out_b, dcount.reshape(1),
                total_pairs, invalid_total, any_ovf)

    sharded = jax.shard_map(
        _device_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(system_min, system_max, bounds_min, bounds_max, ids):
        out = sharded(jnp.asarray(system_min, jnp.float32),
                      jnp.asarray(system_max, jnp.float32),
                      jnp.asarray(bounds_min, jnp.float32),
                      jnp.asarray(bounds_max, jnp.float32),
                      jnp.asarray(ids, jnp.uint32))
        return ShardedScanResult(*out)

    return step


def sharded_scan_step(spec: IndexSpec, mesh: Mesh, axis_name: str,
                      system_min, system_max, bounds_min, bounds_max, ids,
                      **config) -> ShardedScanResult:
    """One-shot convenience wrapper around :func:`make_sharded_step`."""
    step = make_sharded_step(spec, mesh, axis_name, **config)
    return step(system_min, system_max, bounds_min, bounds_max, ids)


def gather_pairs(result: ShardedScanResult):
    """Host-side: merge the per-shard hash-owned classes into one sorted
    list.  Shards are already globally deduped on device (hash(a)
    ownership makes the classes disjoint), so this is a reorder, not a
    dedup."""
    counts = np.asarray(result.shard_counts, np.int64)
    n_dev = counts.shape[0]
    pa = np.asarray(result.pairs_a, np.uint32).reshape(n_dev, -1)
    pb = np.asarray(result.pairs_b, np.uint32).reshape(n_dev, -1)
    chunks = [np.stack([pa[d, :counts[d]], pb[d, :counts[d]]], axis=1)
              for d in range(n_dev)]
    allp = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, 2), np.uint32)
    if allp.shape[0]:
        order = np.lexsort((allp[:, 1], allp[:, 0]))
        allp = allp[order]
    return [(int(a), int(b)) for a, b in allp]
