"""Persistent sharded layer: build once on a mesh, scan and query it
repeatedly without ever gathering the tree to one chip.

The reference's ``parallel`` feature spans its whole API — ``par_sort``
serves queries as much as scans (``/root/reference/src/layer.rs:146-165``;
every query implicitly sorts, ``:259``).  Round 4 sharded only the fused
one-shot build+scan step; this module adds the persistent surface
(VERDICT round 4 #4):

* :class:`ShardedLayer` — per-device sorted tree fragments.  Each device
  owns one contiguous Morton key range (the top ``ceil(log2 n_dev)`` key
  bits select the owner, exactly the routing of
  ``parallel.scan._local_sorted_fragment``), so the concatenation of the
  fragments in device order IS the globally sorted tree.  A scene too big
  for one chip's HBM lives as n_dev fragments.
* :func:`make_build_sharded` — one jitted program: local emit, one
  routing sort, one ``all_to_all`` over ICI, one local sort.
* :func:`make_scan_sharded` — repeated scans of a built layer: per-device
  ``scan_pairs`` on the local fragment (exact by the min_depth boundary
  rule, SURVEY.md §3.3) + the hash-ownership dedup exchange.
* :func:`make_queries_sharded` — batched ``test_box`` / ``test_ray`` /
  ``pick_ray`` over the fragments: each device answers from its local
  cells with the single-chip *linear* engines (elementwise replay needs
  no global structure, so a fragment is self-contained), then one
  ``all_gather`` merges per-query results.  Box/ray results are the
  sorted-unique union; picks reduce lexicographically by (distance,
  reference DFS visit rank, global tree position) — the visit rank is a
  global function of the cell and fragment order is global key order, so
  the winner matches the single-chip tie-break bit for bit.

Parity: every output is bit-identical to the single-chip engines on the
same scene (``tests/test_sharded_layer.py``, virtual 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import index as bidx
from ..index import IndexSpec, Key
from ..layer import PAD_ID, LayerState, TestResult, scan_pairs
from ..query import (_id_sorted_view, _map_queries, _ray_intervals_cells,
                     _ray_visit_rank, PickResult)
from ..ops.compact import stable_compact
from .scan import (ShardedScanResult, _dedup_exchange, _local_sorted_fragment,
                   _make_bucket_of, min_depth_for_devices)


class ShardedLayer(NamedTuple):
    """Device-resident sharded tree: global arrays whose leading axis is
    sharded over the mesh axis; device d holds lanes
    ``[d * fragment_capacity, (d+1) * fragment_capacity)`` — its sorted
    fragment of the global tree (pads at the fragment tail)."""

    keys: Key                  # (n_dev * frag_cap,) sharded
    ids: jnp.ndarray           # (n_dev * frag_cap,) uint32, sharded
    aux: jnp.ndarray           # (n_dev * frag_cap,) uint32, sharded
    counts: jnp.ndarray        # (n_dev,) int32 live lanes per fragment
    invalid_count: jnp.ndarray  # () int32 global
    overflow: jnp.ndarray      # () bool global


def _local_state(spec: IndexSpec, frag_keys, frag_ids, frag_aux, count,
                 min_depth: int, overflow) -> LayerState:
    """A fragment viewed as a plain (sorted) LayerState for the
    single-chip engines."""
    return LayerState(
        keys=frag_keys, ids=frag_ids, aux=frag_aux,
        count=count, sorted=jnp.bool_(True),
        min_depth=jnp.uint32(min_depth),
        invalid_count=jnp.int32(0), overflow=overflow)


def make_build_sharded(spec: IndexSpec, mesh: Mesh, axis_name: str,
                       *, min_depth: int = 0, slots_per_axis: int = 2,
                       fragment_capacity: int):
    """Jitted ``fn(system_min, system_max, bounds_min, bounds_max, ids)
    -> ShardedLayer``.  Inputs are globally shaped, sharded along the
    object axis; ``fragment_capacity`` is the per-device tree buffer.
    ``min_depth`` is raised to :func:`min_depth_for_devices` so no pair
    or ancestor relation can span a fragment cut."""
    n_dev = mesh.shape[axis_name]
    eff_min_depth = max(int(min_depth), min_depth_for_devices(spec, n_dev))
    bucket_of = _make_bucket_of(spec, n_dev)
    # the received fragment is the all_to_all concat of n_dev bucket rows,
    # so the per-(src, dst) routing row holds fragment_capacity / n_dev;
    # row overflow under source skew is flagged like any other overflow
    bcap = -(-int(fragment_capacity) // n_dev)

    def _device_fn(system_min, system_max, bounds_min, bounds_max, ids):
        skeys, sids, saux, count, inv_local, local_ovf = \
            _local_sorted_fragment(spec, axis_name, n_dev, eff_min_depth,
                                   slots_per_axis, bcap, bucket_of,
                                   system_min, system_max,
                                   bounds_min, bounds_max, ids)
        invalid_total = jax.lax.psum(inv_local, axis_name)
        any_ovf = jax.lax.psum(local_ovf.astype(jnp.int32), axis_name) > 0
        kc = bidx.sort_operands(spec, skeys)
        return kc + (sids, saux, count.reshape(1), invalid_total, any_ovf)

    nk = spec.bits // 32
    sharded = jax.shard_map(
        _device_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=tuple([P(axis_name)] * (nk + 3)) + (P(), P()),
        check_vma=False,
    )

    @jax.jit
    def build(system_min, system_max, bounds_min, bounds_max, ids):
        out = sharded(jnp.asarray(system_min, jnp.float32),
                      jnp.asarray(system_max, jnp.float32),
                      jnp.asarray(bounds_min, jnp.float32),
                      jnp.asarray(bounds_max, jnp.float32),
                      jnp.asarray(ids, jnp.uint32))
        keys = bidx.key_from_columns(spec, out[:nk])
        return ShardedLayer(keys=keys, ids=out[nk], aux=out[nk + 1],
                            counts=out[nk + 2],
                            invalid_count=out[nk + 3], overflow=out[nk + 4])

    return build


def make_scan_sharded(spec: IndexSpec, mesh: Mesh, axis_name: str,
                      *, pair_capacity: int,
                      exchange_capacity: Optional[int] = None,
                      filter_fn: Optional[Callable] = None,
                      nested_ids: bool = False):
    """Jitted ``fn(layer: ShardedLayer) -> ShardedScanResult`` — repeated
    scans of a persistent sharded layer (capacities are per-device, as in
    ``make_sharded_step``)."""
    n_dev = mesh.shape[axis_name]
    xcap = int(exchange_capacity or pair_capacity)

    def _device_fn(kc, ids, aux, counts, overflow):
        skeys = bidx.key_from_columns(spec, kc)
        count = counts[0]
        res = scan_pairs(spec, skeys, ids, count, pair_capacity,
                         filter_fn, extra_overflow=overflow, aux=aux,
                         nested_ids=nested_ids)
        out_a, out_b, dcount, x_ovf = _dedup_exchange(
            axis_name, n_dev, xcap, res.pairs_a, res.pairs_b)
        total_pairs = jax.lax.psum(dcount, axis_name)
        any_ovf = jax.lax.psum(
            (res.overflow | x_ovf).astype(jnp.int32), axis_name) > 0
        return (out_a, out_b, dcount.reshape(1), total_pairs, any_ovf)

    sharded = jax.shard_map(
        _device_fn, mesh=mesh,
        in_specs=(tuple([P(axis_name)] * (spec.bits // 32)),
                  P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def scan(layer: ShardedLayer) -> ShardedScanResult:
        kc = bidx.sort_operands(spec, layer.keys)
        out = sharded(kc, layer.ids, layer.aux, layer.counts,
                      layer.overflow)
        return ShardedScanResult(out[0], out[1], out[2], out[3],
                                 layer.invalid_count, out[4])

    return scan


def gather_layer(spec: IndexSpec, lyr: ShardedLayer, *, min_depth: int = 0,
                 capacity: Optional[int] = None) -> LayerState:
    """Host-side: concatenate the live fragment prefixes in device order
    (fragment order IS global Morton order) into one single-chip
    :class:`LayerState` — the checkpoint bridge: the result round-trips
    through BR_SCENE via ``layer.layer_to_scene_layer`` like any other
    layer.  Eager (pulls the fragments to host); not for the hot path."""
    import numpy as np

    n_dev = int(lyr.counts.shape[0])
    frag = np.asarray(lyr.ids).size // n_dev
    keys_np = bidx.keys_to_numpy(spec, lyr.keys).reshape(n_dev, frag)
    ids_np = np.asarray(lyr.ids).reshape(n_dev, frag)
    aux_np = np.asarray(lyr.aux).reshape(n_dev, frag)
    counts = np.asarray(lyr.counts)
    gk = np.concatenate([keys_np[d, :counts[d]] for d in range(n_dev)])
    gi = np.concatenate([ids_np[d, :counts[d]] for d in range(n_dev)])
    ga = np.concatenate([aux_np[d, :counts[d]] for d in range(n_dev)])
    cap = int(capacity) if capacity is not None else n_dev * frag
    if cap < len(gk):
        raise ValueError(f"capacity {cap} < live entries {len(gk)}")
    pad_key = bidx.keys_to_numpy(spec, spec.pad_key(()))
    gk = np.concatenate([gk, np.full(cap - len(gk), pad_key, gk.dtype)])
    gi = np.concatenate([gi, np.full(cap - len(gi), PAD_ID, np.uint32)])
    ga = np.concatenate([ga, np.zeros(cap - len(ga), np.uint32)])
    return LayerState(
        keys=bidx.keys_from_numpy(spec, gk), ids=jnp.asarray(gi),
        aux=jnp.asarray(ga), count=jnp.int32(counts.sum()),
        sorted=jnp.bool_(True), min_depth=jnp.uint32(min_depth),
        invalid_count=jnp.asarray(lyr.invalid_count, jnp.int32),
        overflow=jnp.asarray(lyr.overflow, jnp.bool_))


def shard_layer(spec: IndexSpec, state: LayerState, n_dev: int,
                *, fragment_capacity: int) -> ShardedLayer:
    """Host-side: partition a (sorted) single-chip layer into per-device
    fragments under the mesh ownership rule (top ``ceil(log2 n_dev)``
    significant key bits — ``_make_bucket_of``), the restore direction of
    :func:`gather_layer`: load a BR_SCENE checkpoint with
    ``layer.layer_from_scene_layer`` and place it on a mesh without
    rebuilding.  Raises if any fragment exceeds ``fragment_capacity``
    (host-side, so overflow is loud rather than flagged).

    The layer must have been built with ``min_depth >=
    min_depth_for_devices(spec, n_dev)`` for *scans* of the result to be
    exact (the fragment-cut rule, SURVEY.md §3.3); a smaller value only
    logs a warning since gather/query use is still correct."""
    import numpy as np

    from ..layer import sort as sort_layer

    state = sort_layer(spec, state)
    cnt = int(state.count)
    keys_np = bidx.keys_to_numpy(spec, state.keys)[:cnt]
    ids_np = np.asarray(state.ids)[:cnt]
    aux_np = np.asarray(state.aux)[:cnt]

    md_need = min_depth_for_devices(spec, n_dev)
    if int(state.min_depth) < md_need:
        import logging
        logging.getLogger("broadphase_tpu").warning(
            "shard_layer: layer min_depth %d < min_depth_for_devices %d; "
            "scans of the sharded layer may split pairs across fragments",
            int(state.min_depth), md_need)

    B = (n_dev - 1).bit_length() if n_dev > 1 else 0
    if B == 0:
        bucket = np.zeros(cnt, np.int64)
    else:
        wide = keys_np.astype(np.uint64)
        bucket = np.minimum(wide >> np.uint64(spec.key_bits - B),
                            n_dev - 1).astype(np.int64)
    counts = np.bincount(bucket, minlength=n_dev).astype(np.int32)
    fcap = int(fragment_capacity)
    if counts.max(initial=0) > fcap:
        raise ValueError(
            f"fragment_capacity {fcap} < largest fragment "
            f"{int(counts.max())} (counts per device: {counts.tolist()})")
    pad_key = bidx.keys_to_numpy(spec, spec.pad_key(()))
    fk = np.full((n_dev, fcap), pad_key, keys_np.dtype)
    fi = np.full((n_dev, fcap), PAD_ID, np.uint32)
    fa = np.zeros((n_dev, fcap), np.uint32)
    off = 0
    for d in range(n_dev):
        c = int(counts[d])
        fk[d, :c] = keys_np[off:off + c]
        fi[d, :c] = ids_np[off:off + c]
        fa[d, :c] = aux_np[off:off + c]
        off += c
    return ShardedLayer(
        keys=bidx.keys_from_numpy(spec, fk.reshape(-1)),
        ids=jnp.asarray(fi.reshape(-1)), aux=jnp.asarray(fa.reshape(-1)),
        counts=jnp.asarray(counts),
        invalid_count=jnp.asarray(state.invalid_count, jnp.int32),
        overflow=jnp.asarray(state.overflow, jnp.bool_))


def make_merge_sharded(spec: IndexSpec, mesh: Mesh, axis_name: str,
                       *, fragment_capacity: Optional[int] = None):
    """Jitted ``fn(a: ShardedLayer, b: ShardedLayer) -> ShardedLayer`` —
    the multi-chip ``Layer::merge`` (reference ``src/layer.rs:127-138``;
    under the parallel feature its re-sort is ``par_sort``, ``:146-165``).

    Key ownership is a pure function of the key and the device count
    (``_make_bucket_of``), so two layers built on the SAME mesh axis hold,
    on each device, fragments covering the SAME global key range — the
    merge needs **no collectives**: one local bitonic merge per device
    (``ops/merge.py``), exactly the single-chip sorted x sorted fast path
    (``layer._merge_jit``), plus one psum for the overflow flag.  The
    merged fragments concatenated in device order equal the single-chip
    ``merge``-then-``sort`` tree bit for bit.

    ``fragment_capacity`` is the per-device output buffer; the default
    (sum of the input fragment capacities) can never overflow.  If the two
    layers share ids, one id can occupy NESTED cells in the merged tree —
    scan it with ``nested_ids=True`` (same invariant as the single-chip
    merge)."""
    n_dev = mesh.shape[axis_name]
    nk = spec.bits // 32
    del n_dev  # ownership congruence needs only that the meshes match

    def _device_fn(kca, ids_a, aux_a, counts_a, kcb, ids_b, aux_b,
                   counts_b):
        from ..ops.merge import bitonic_merge
        out_cap = (ids_a.shape[0] + ids_b.shape[0]
                   if fragment_capacity is None else int(fragment_capacity))
        out = bitonic_merge(tuple(kca) + (ids_a, aux_a),
                            tuple(kcb) + (ids_b, aux_b),
                            num_keys=nk + 1)
        out = tuple(c[:out_cap] for c in out)
        ids_m = out[nk]
        # the merger's power-of-two padding is all-ones in every column;
        # restore the layer convention of zero aux on pad entries
        aux_m = jnp.where(ids_m == PAD_ID, jnp.uint32(0), out[nk + 1])
        cnt = counts_a[0] + counts_b[0]
        local_ovf = cnt > out_cap
        any_ovf = jax.lax.psum(local_ovf.astype(jnp.int32), axis_name) > 0
        return out[:nk] + (ids_m, aux_m,
                           jnp.minimum(cnt, out_cap).reshape(1), any_ovf)

    sharded = jax.shard_map(
        _device_fn, mesh=mesh,
        in_specs=(tuple([P(axis_name)] * nk), P(axis_name), P(axis_name),
                  P(axis_name)) * 2,
        out_specs=tuple([P(axis_name)] * (nk + 3)) + (P(),),
        check_vma=False,
    )

    @jax.jit
    def merge(a: ShardedLayer, b: ShardedLayer) -> ShardedLayer:
        out = sharded(bidx.sort_operands(spec, a.keys), a.ids, a.aux,
                      a.counts,
                      bidx.sort_operands(spec, b.keys), b.ids, b.aux,
                      b.counts)
        return ShardedLayer(
            keys=bidx.key_from_columns(spec, out[:nk]),
            ids=out[nk], aux=out[nk + 1], counts=out[nk + 2],
            invalid_count=a.invalid_count + b.invalid_count,
            overflow=out[nk + 3] | a.overflow | b.overflow)

    return merge


def make_queries_sharded(spec: IndexSpec, mesh: Mesh, axis_name: str,
                         *, min_depth: int = 0, result_cap: int = 4096,
                         chunk: int = 64):
    """Batched query programs over a persistent :class:`ShardedLayer`:
    returns ``(test_box_batch, test_ray_batch, pick_ray_batch)``.

    Each device answers from its fragment with the linear engines'
    elementwise replay; one ``all_gather`` merges per-query results.  The
    merge sorts ``n_dev * result_cap`` lanes per query — size
    ``result_cap`` for the per-DEVICE result share when scaling out.
    Results are replicated on every device and bit-identical to the
    single-chip batched engines.
    """
    n_dev = mesh.shape[axis_name]
    nk = spec.bits // 32

    def _frag_state(kc, ids, aux, counts):
        return _local_state(spec, bidx.key_from_columns(spec, kc), ids,
                            aux, counts[0], min_depth, jnp.bool_(False))

    def _merge_results(res: TestResult) -> TestResult:
        """all_gather per-device unique lists -> global sorted unique."""
        g_ids = jax.lax.all_gather(res.ids, axis_name)     # (n_dev, Q, cap)
        g_ovf = jax.lax.psum(res.overflow.astype(jnp.int32), axis_name) > 0

        def one(ids_q):                                    # (n_dev, cap)
            flat = ids_q.reshape(-1)
            s = jax.lax.sort((flat,), num_keys=1)[0]
            prev = jnp.concatenate([s[:1] ^ jnp.uint32(1), s[:-1]])
            keep = (s != PAD_ID) & (s != prev)
            (vals,), cnt = stable_compact(keep, (s,), (PAD_ID,))
            vals = vals[:result_cap] if vals.shape[0] >= result_cap else \
                jnp.pad(vals, (0, result_cap - vals.shape[0]),
                        constant_values=PAD_ID)
            return TestResult(vals, jnp.minimum(cnt, result_cap),
                              cnt > result_cap)

        Q = g_ids.shape[1]
        merged = _map_queries(one, (jnp.swapaxes(g_ids, 0, 1),), Q, chunk)
        return merged._replace(overflow=merged.overflow | g_ovf)

    # --- test_box ---------------------------------------------------------
    def _box_fn(kc, ids, aux, counts, smin, smax, qmin, qmax):
        st = _frag_state(kc, ids, aux, counts)
        from ..query import test_box_batch
        _, res = test_box_batch(spec, st, smin, smax, (qmin, qmax),
                                result_cap, chunk=chunk)
        r = _merge_results(res)
        return r.ids, r.count, r.overflow

    # --- test_ray ---------------------------------------------------------
    def _ray_fn(kc, ids, aux, counts, smin, smax, ro, rd, rmn, rmx):
        st = _frag_state(kc, ids, aux, counts)
        from ..query import test_ray_batch
        _, res = test_ray_batch(spec, st, smin, smax, ro, rd, rmn, rmx,
                                result_cap, chunk=chunk)
        r = _merge_results(res)
        return r.ids, r.count, r.overflow

    def _make(fn, extra_in):
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(tuple([P(axis_name)] * nk), P(axis_name),
                      P(axis_name), P(axis_name)) + extra_in,
            out_specs=(P(), P(), P()),
            check_vma=False,
        )

    box_sharded = _make(_box_fn, (P(), P(), P(), P()))
    ray_sharded = _make(_ray_fn, (P(), P(), P(), P(), P(), P()))

    @jax.jit
    def test_box_batch(layer: ShardedLayer, system_min, system_max,
                       query_bounds) -> TestResult:
        kc = bidx.sort_operands(spec, layer.keys)
        out = box_sharded(kc, layer.ids, layer.aux, layer.counts,
                          jnp.asarray(system_min, jnp.float32),
                          jnp.asarray(system_max, jnp.float32),
                          jnp.asarray(query_bounds[0], jnp.float32),
                          jnp.asarray(query_bounds[1], jnp.float32))
        return TestResult(out[0], out[1], out[2] | layer.overflow)

    @jax.jit
    def test_ray_batch(layer: ShardedLayer, system_min, system_max,
                       ray_origins, ray_dirs, range_min, range_max
                       ) -> TestResult:
        kc = bidx.sort_operands(spec, layer.keys)
        ro = jnp.asarray(ray_origins, jnp.float32)
        Q = ro.shape[0]
        rmn = jnp.broadcast_to(jnp.asarray(range_min, jnp.float32), (Q,))
        rmx = jnp.broadcast_to(jnp.asarray(range_max, jnp.float32), (Q,))
        out = ray_sharded(kc, layer.ids, layer.aux, layer.counts,
                          jnp.asarray(system_min, jnp.float32),
                          jnp.asarray(system_max, jnp.float32),
                          ro, jnp.asarray(ray_dirs, jnp.float32), rmn, rmx)
        return TestResult(out[0], out[1], out[2] | layer.overflow)

    def make_pick_ray_batch(get_dist: Callable):
        """Pick needs the user's vectorized narrow phase at trace time."""

        def _pick_fn(kc, ids, aux, counts, smin, smax, ro, rd, md, args):
            st = _frag_state(kc, ids, aux, counts)
            dev = jax.lax.axis_index(axis_name)
            # global tree position of each local lane: fragment order is
            # global key order, so offset by the earlier fragments' counts
            all_counts = jax.lax.all_gather(counts[0], axis_name)
            offset = jnp.sum(jnp.where(
                jnp.arange(n_dev) < dev, all_counts, 0)).astype(jnp.uint32)
            ids_s, pos_s, cmin, cmax, live, extra = _id_sorted_view(
                spec, st, smin, smax, None, with_ray=True)
            origin_s, depth_s = tuple(extra[:spec.dim]), extra[spec.dim]
            gpos = pos_s + offset

            def one(ro_i, rd_i, md_i, args_i):
                rmin, rmax = _ray_intervals_cells(
                    spec, cmin, cmax, smin, smax, ro_i, rd_i, 0.0, md_i)
                cand = (rmin < rmax) & (rmin < md_i) & live
                d = jnp.asarray(get_dist(ids_s, cand, *args_i),
                                jnp.float32)
                d = jnp.where(jnp.isfinite(d) & cand, d, jnp.inf)
                rank = _ray_visit_rank(spec, origin_s, depth_s, rd_i)
                # local winner as a comparable tuple (dist, rank cols,
                # global pos, id): the same progressive lexicographic
                # narrowing as _argmin_pick_ranked, keeping the winning
                # column values for the cross-device reduction
                hit = d < md_i
                dd = jnp.where(hit, d, jnp.inf)
                dmin = jnp.min(dd)
                tie = dd == dmin
                cols = []
                for col in rank + (gpos,):
                    m = jnp.min(jnp.where(tie, col,
                                          jnp.uint32(0xFFFF_FFFF)))
                    tie = tie & (col == m)
                    cols.append(m)
                win = jnp.min(jnp.where(tie, ids_s, PAD_ID))
                found = jnp.any(hit)
                return ((jnp.where(found, dmin, jnp.inf),)
                        + tuple(cols)
                        + (jnp.where(found, win, PAD_ID),))

            Q = ro.shape[0]
            local = _map_queries(one, (ro, rd, md, tuple(args)), Q, chunk)
            # lexicographic min across devices of (dist, rank, gpos):
            gath = tuple(jax.lax.all_gather(c, axis_name) for c in local)
            d_all = gath[0]                                # (n_dev, Q)
            best = jnp.min(d_all, axis=0)
            tie = d_all == best[None, :]
            for col in gath[1:-1]:
                m = jnp.min(jnp.where(tie, col, jnp.uint32(0xFFFF_FFFF)),
                            axis=0)
                tie = tie & (col == m[None, :])
            win = jnp.min(jnp.where(tie, gath[-1], PAD_ID), axis=0)
            found = jnp.isfinite(best)
            return (jnp.where(found, best, jnp.inf),
                    jnp.where(found, win, PAD_ID), found)

        pick_sharded = jax.shard_map(
            _pick_fn, mesh=mesh,
            in_specs=(tuple([P(axis_name)] * nk), P(axis_name),
                      P(axis_name), P(axis_name),
                      P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )

        @jax.jit
        def pick_ray_batch(layer: ShardedLayer, system_min, system_max,
                           ray_origins, ray_dirs, max_distance,
                           get_dist_args=()) -> PickResult:
            kc = bidx.sort_operands(spec, layer.keys)
            ro = jnp.asarray(ray_origins, jnp.float32)
            Q = ro.shape[0]
            md = jnp.broadcast_to(
                jnp.asarray(max_distance, jnp.float32), (Q,))
            out = pick_sharded(kc, layer.ids, layer.aux, layer.counts,
                               jnp.asarray(system_min, jnp.float32),
                               jnp.asarray(system_max, jnp.float32),
                               ro, jnp.asarray(ray_dirs, jnp.float32),
                               md, tuple(get_dist_args))
            ovf = jnp.broadcast_to(layer.overflow, out[2].shape)
            return PickResult(out[0], out[1], out[2], ovf)

        return pick_ray_batch

    return test_box_batch, test_ray_batch, make_pick_ray_batch
