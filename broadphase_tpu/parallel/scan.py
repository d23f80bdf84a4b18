"""Multi-chip sharded broadphase step: shard_map + all_to_all bucket exchange.

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
(:func:`broadphase_tpu.geom.emit_cells`), bucket-scatter into fixed-capacity
per-device rows, one ``all_to_all`` over the mesh axis (rides ICI), local
``lax.sort``, then the shared data-parallel pair expansion
(:func:`broadphase_tpu.layer.scan_pairs`).  The only collectives are the
all_to_all and the final ``psum`` of counts/overflow flags — the scan itself
is embarrassingly parallel by the boundary rule above.

Note: one object's cells may land on different devices, so the *same id pair*
can be emitted by two shards (each shard dedups locally, exactly like the
reference's per-thread TLS buffers).  :func:`gather_pairs` reproduces the
reference's canonical globally sorted + deduplicated output
(``src/layer.rs:516-517``).
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
from ..layer import PAD_ID, scan_pairs
from ..ops.u64 import U64


class ShardedScanResult(NamedTuple):
    pairs_a: jnp.ndarray       # (n_dev * pair_cap,) uint32, sharded
    pairs_b: jnp.ndarray       # (n_dev * pair_cap,) uint32, sharded
    shard_counts: jnp.ndarray  # (n_dev,) int32 live pairs per shard
    total_count: jnp.ndarray   # () int32 (sum over shards; pre-global-dedup)
    invalid_count: jnp.ndarray  # () int32 objects dropped by bounds check
    overflow: jnp.ndarray      # () bool any buffer overflow anywhere


def min_depth_for_devices(spec: IndexSpec, n_devices: int) -> int:
    """Smallest min_depth such that no pair spans a device key-range cut."""
    if n_devices <= 1:
        return 0
    bits = (n_devices - 1).bit_length()  # ceil(log2 n)
    return -(-bits // spec.dim)          # ceil(bits / dim)


def make_sharded_step(spec: IndexSpec, mesh: Mesh, axis_name: str,
                      *, min_depth: int = 0, slots_per_axis: int = 2,
                      bucket_capacity: int, pair_capacity: int,
                      filter_fn: Optional[Callable] = None):
    """Build a jitted sharded step:
    ``fn(system_min, system_max, bounds_min, bounds_max, ids) -> ShardedScanResult``.

    Input arrays are globally shaped, sharded along the leading (object) axis
    over ``axis_name``; ``bucket_capacity`` / ``pair_capacity`` are
    *per-device* buffer sizes.
    """
    n_dev = mesh.shape[axis_name]
    B = (n_dev - 1).bit_length() if n_dev > 1 else 0
    eff_min_depth = max(int(min_depth), min_depth_for_devices(spec, n_dev))
    S = slots_per_axis ** spec.dim
    bcap = int(bucket_capacity)

    def _bucket_of(keys) -> jnp.ndarray:
        """Top-B significant key bits -> destination device, monotone in key."""
        if B == 0:
            base = keys.lo if isinstance(keys, U64) else keys
            return jnp.zeros(base.shape, dtype=jnp.int32)
        shift = spec.key_bits - B
        b = spec.ops.to_u32(spec.ops.shri(keys, shift)).astype(jnp.int32)
        return jnp.minimum(b, n_dev - 1)

    def _device_fn(system_min, system_max, bounds_min, bounds_max, ids):
        n_local = ids.shape[0]
        md = jnp.uint32(eff_min_depth)

        # --- local extend -------------------------------------------------
        contained = geom.bounds_contains(system_min, system_max,
                                         bounds_min, bounds_max)
        lmin = geom.to_local(system_min, system_max, bounds_min)
        lmax = geom.to_local(system_min, system_max, bounds_max)
        keys, valid, cell_ovf = geom.emit_cells(
            spec, lmin, lmax, md, slots_per_axis)
        valid = valid & contained[:, None]
        flat_valid = valid.reshape(n_local * S)
        flat_ids = jnp.broadcast_to(
            jnp.asarray(ids, jnp.uint32)[:, None],
            (n_local, S)).reshape(n_local * S)
        if spec.bits == 32:
            flat_keys = keys.reshape(n_local * S)
        else:
            flat_keys = U64(keys.hi.reshape(n_local * S),
                            keys.lo.reshape(n_local * S))

        # --- bucket scatter into (n_dev, bcap) rows -----------------------
        bucket = _bucket_of(flat_keys)
        total = n_dev * bcap
        dest = jnp.full((n_local * S,), total, dtype=jnp.int32)
        route_ovf = jnp.bool_(False)
        for d in range(n_dev):
            m = flat_valid & (bucket == d)
            pos = jnp.cumsum(m.astype(jnp.int32)) - 1
            in_row = m & (pos < bcap)
            dest = jnp.where(in_row, d * bcap + pos, dest)
            route_ovf = route_ovf | (jnp.sum(m.astype(jnp.int32)) > bcap)

        out_ids = jnp.full((total,), PAD_ID, jnp.uint32
                           ).at[dest].set(flat_ids, mode="drop")
        if spec.bits == 32:
            out_keys = jnp.full((total,), 0xFFFF_FFFF, jnp.uint32
                                ).at[dest].set(flat_keys, mode="drop")
            key_cols = (out_keys.reshape(n_dev, bcap),)
        else:
            hi = jnp.full((total,), 0xFFFF_FFFF, jnp.uint32
                          ).at[dest].set(flat_keys.hi, mode="drop")
            lo = jnp.full((total,), 0xFFFF_FFFF, jnp.uint32
                          ).at[dest].set(flat_keys.lo, mode="drop")
            key_cols = (hi.reshape(n_dev, bcap), lo.reshape(n_dev, bcap))

        # --- the exchange: one all_to_all over ICI ------------------------
        key_cols = tuple(
            jax.lax.all_to_all(c, axis_name, split_axis=0, concat_axis=0)
            for c in key_cols)
        rids = jax.lax.all_to_all(out_ids.reshape(n_dev, bcap), axis_name,
                                  split_axis=0, concat_axis=0)

        # --- local sort + pair expansion ----------------------------------
        cols = tuple(c.reshape(total) for c in key_cols) + (rids.reshape(total),)
        sorted_cols = jax.lax.sort(cols, num_keys=len(cols))
        skeys = bidx.key_from_columns(spec, sorted_cols[:-1])
        sids = sorted_cols[-1]
        live = ~bidx.key_eq(spec, skeys, spec.pad_key((total,)))
        count = jnp.sum(live.astype(jnp.int32))

        local_ovf = jnp.any(cell_ovf & contained) | route_ovf
        res = scan_pairs(spec, skeys, sids, count, pair_capacity,
                         filter_fn, extra_overflow=local_ovf)

        # --- global reductions --------------------------------------------
        inv_local = jnp.sum((~contained).astype(jnp.int32))
        total_pairs = jax.lax.psum(res.count, axis_name)
        invalid_total = jax.lax.psum(inv_local, axis_name)
        any_ovf = jax.lax.psum(res.overflow.astype(jnp.int32), axis_name) > 0
        return (res.pairs_a, res.pairs_b, res.count.reshape(1),
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
    """Host-side: concatenate live per-shard pairs, globally sort + dedup —
    the reference's canonical par_scan output (``src/layer.rs:516-517``)."""
    counts = np.asarray(result.shard_counts, np.int64)
    n_dev = counts.shape[0]
    pa = np.asarray(result.pairs_a, np.uint32).reshape(n_dev, -1)
    pb = np.asarray(result.pairs_b, np.uint32).reshape(n_dev, -1)
    chunks = [np.stack([pa[d, :counts[d]], pb[d, :counts[d]]], axis=1)
              for d in range(n_dev)]
    allp = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, 2), np.uint32)
    if allp.shape[0]:
        allp = np.unique(allp, axis=0)  # lexicographic sort + dedup
    return [(int(a), int(b)) for a, b in allp]
