"""Persistent sharded layer: build once, scan + query repeatedly — every
output bit-identical to the single-chip engines on the same scene.

Runs on the virtual 8-device CPU mesh (tests/conftest.py).  The single-chip
reference uses the same eff. min_depth as the sharded build so the trees
are cell-for-cell identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from broadphase_tpu import Index32_2D, Index64_3D, layer, query
from broadphase_tpu.layer import PAD_ID
from broadphase_tpu.parallel import (ShardedLayer, gather_pairs,
                                     make_build_sharded,
                                     make_merge_sharded,
                                     make_queries_sharded,
                                     make_scan_sharded,
                                     min_depth_for_devices)

N_DEV = 8


def _mesh():
    return Mesh(np.array(jax.devices()[:N_DEV]), ("objects",))


def _scene(spec, n, seed, lo=-60.0, hi=60.0):
    rng = np.random.default_rng(seed)
    dim = spec.dim
    size = rng.uniform(0.5, 9.0, size=(n, dim)).astype(np.float32)
    bmin = rng.uniform(lo, hi - 9.0, size=(n, dim)).astype(np.float32)
    bmax = bmin + size
    ids = np.arange(n, dtype=np.uint32)
    smin = np.full(dim, lo, np.float32)
    smax = np.full(dim, hi, np.float32)
    return smin, smax, bmin, bmax, ids, rng


def _single_chip_state(spec, smin, smax, bmin, bmax, ids, md):
    return layer.build(spec, smin, smax, bmin, bmax, ids,
                       min_depth=md, out_capacity=8 * len(ids))


@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
def test_sharded_build_fragments_concat_to_global_tree(spec):
    n = 24 * N_DEV
    smin, smax, bmin, bmax, ids, _ = _scene(spec, n, seed=11)
    mesh = _mesh()
    md = min_depth_for_devices(spec, N_DEV)
    fcap = 8 * n
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=fcap)
    lyr = build(smin, smax, bmin, bmax, ids)
    assert not bool(lyr.overflow)

    # concat live fragment prefixes in device order == single-chip tree
    want = _single_chip_state(spec, smin, smax, bmin, bmax, ids, md)
    wk, wi, wc = layer.tree_to_numpy(spec, want)
    from broadphase_tpu import index as bidx
    frag = np.asarray(lyr.ids).size // N_DEV
    keys_np = bidx.keys_to_numpy(spec, lyr.keys).reshape(N_DEV, frag)
    ids_np = np.asarray(lyr.ids).reshape(N_DEV, frag)
    aux_np = np.asarray(lyr.aux).reshape(N_DEV, frag)
    counts = np.asarray(lyr.counts)
    gk = np.concatenate([keys_np[d, :counts[d]] for d in range(N_DEV)])
    gi = np.concatenate([ids_np[d, :counts[d]] for d in range(N_DEV)])
    ga = np.concatenate([aux_np[d, :counts[d]] for d in range(N_DEV)])
    assert counts.sum() == wc
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gi, wi)
    np.testing.assert_array_equal(ga, np.asarray(want.aux)[:wc])
    assert int(lyr.invalid_count) == int(want.invalid_count)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_layer_scan_matches_oracle(spec):
    n = 32 * N_DEV
    smin, smax, bmin, bmax, ids, _ = _scene(spec, n, seed=13)
    mesh = _mesh()
    md = min_depth_for_devices(spec, N_DEV)
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * n)
    scan = make_scan_sharded(spec, mesh, "objects", pair_capacity=16 * n)
    lyr = build(smin, smax, bmin, bmax, ids)

    want_state = _single_chip_state(spec, smin, smax, bmin, bmax, ids, md)
    _, want = layer.scan(spec, want_state, 16 * n * N_DEV)
    want_pairs = layer.scan_result_to_numpy(want)

    # scan TWICE: the layer is persistent, results must be stable
    for _ in range(2):
        res = scan(lyr)
        assert not bool(res.overflow)
        got = gather_pairs(res)
        assert got == want_pairs
        assert int(res.total_count) == len(want_pairs)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_layer_scan_nested_ids(spec):
    """Duplicate ids at nested cells: the per-shard id-on-stack skip must
    match the single-chip nested_ids scan."""
    n = 16 * N_DEV
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=17)
    # duplicate each id at a bigger concentric box: nested same-id cells
    big = 3.0
    bmin2 = np.concatenate([bmin, bmin - big]).astype(np.float32)
    bmax2 = np.concatenate([bmax, bmax + big]).astype(np.float32)
    ids2 = np.concatenate([ids, ids]).astype(np.uint32)
    keep = (bmin2 > smin).all(1) & (bmax2 < smax).all(1)
    bmin2, bmax2, ids2 = bmin2[keep], bmax2[keep], ids2[keep]
    # object-axis sharding needs a multiple of N_DEV
    cut = (len(ids2) // N_DEV) * N_DEV
    bmin2, bmax2, ids2 = bmin2[:cut], bmax2[:cut], ids2[:cut]

    mesh = _mesh()
    md = min_depth_for_devices(spec, N_DEV)
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * cut)
    scan = make_scan_sharded(spec, mesh, "objects",
                             pair_capacity=64 * cut, nested_ids=True)
    lyr = build(smin, smax, bmin2, bmax2, ids2)
    res = scan(lyr)
    assert not bool(res.overflow)
    got = gather_pairs(res)

    want_state = _single_chip_state(spec, smin, smax, bmin2, bmax2, ids2,
                                    md)
    _, want = layer.scan(spec, want_state, 64 * cut, nested_ids=True)
    assert not bool(want.overflow)
    assert got == layer.scan_result_to_numpy(want)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_scan_filtered_matches_single_chip(spec):
    """make_scan_sharded(filter_fn=...) must equal the single-chip
    scan_filtered pair set (the filter runs per-shard before the dedup
    exchange, same scan_pairs core)."""
    n = 24 * N_DEV
    smin, smax, bmin, bmax, ids, _ = _scene(spec, n, seed=47)
    mesh = _mesh()
    md = min_depth_for_devices(spec, N_DEV)

    def filt(a, b):
        return (a + b) % 3 == 0

    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * n)
    scan = make_scan_sharded(spec, mesh, "objects", pair_capacity=16 * n,
                             filter_fn=filt)
    res = scan(build(smin, smax, bmin, bmax, ids))
    assert not bool(res.overflow)

    st = _single_chip_state(spec, smin, smax, bmin, bmax, ids, md)
    _, want = layer.scan_filtered(spec, st, 16 * n * N_DEV, filt)
    assert not bool(want.overflow)
    assert gather_pairs(res) == layer.scan_result_to_numpy(want)


@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
def test_sharded_queries_match_single_chip(spec):
    n = 24 * N_DEV
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=19)
    mesh = _mesh()
    md = min_depth_for_devices(spec, N_DEV)
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * n)
    box_q, ray_q, make_pick = make_queries_sharded(
        spec, mesh, "objects", min_depth=md, result_cap=512)
    lyr = build(smin, smax, bmin, bmax, ids)
    st = _single_chip_state(spec, smin, smax, bmin, bmax, ids, md)

    Q = 16
    qmin = rng.uniform(-60, 30, (Q, spec.dim)).astype(np.float32)
    qmax = qmin + rng.uniform(2, 40, (Q, spec.dim)).astype(np.float32)
    got = box_q(lyr, smin, smax, (qmin, qmax))
    _, want = query.test_box_batch(spec, st, smin, smax, (qmin, qmax), 512)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))

    ro = rng.uniform(-60, 60, (Q, spec.dim)).astype(np.float32)
    rd = rng.uniform(-1, 1, (Q, spec.dim)).astype(np.float32)
    got = ray_q(lyr, smin, smax, ro, rd, 0.0, np.inf)
    _, want = query.test_ray_batch(spec, st, smin, smax, ro, rd,
                                   0.0, np.inf, 512)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))

    def get_dist(cand_ids, mask, *a):
        # coarse distances force plenty of ties: the (rank, position)
        # tie-break must agree across the device cut
        return jnp.where(mask, (cand_ids % 4).astype(jnp.float32), jnp.inf)

    pick_q = make_pick(get_dist)
    got = pick_q(lyr, smin, smax, ro, rd, np.float32(1e9))
    _, want = query.pick_ray_batch(spec, st, smin, smax, ro, rd,
                                   np.float32(1e9), get_dist)
    np.testing.assert_array_equal(np.asarray(got.obj_id),
                                  np.asarray(want.obj_id))
    np.testing.assert_array_equal(np.asarray(got.distance),
                                  np.asarray(want.distance))
    np.testing.assert_array_equal(np.asarray(got.found),
                                  np.asarray(want.found))


def _global_tree(spec, lyr):
    """Concat live fragment prefixes in device order (= the global tree)."""
    from broadphase_tpu import index as bidx
    frag = np.asarray(lyr.ids).size // N_DEV
    keys_np = bidx.keys_to_numpy(spec, lyr.keys).reshape(N_DEV, frag)
    ids_np = np.asarray(lyr.ids).reshape(N_DEV, frag)
    aux_np = np.asarray(lyr.aux).reshape(N_DEV, frag)
    counts = np.asarray(lyr.counts)
    gk = np.concatenate([keys_np[d, :counts[d]] for d in range(N_DEV)])
    gi = np.concatenate([ids_np[d, :counts[d]] for d in range(N_DEV)])
    ga = np.concatenate([aux_np[d, :counts[d]] for d in range(N_DEV)])
    return gk, gi, ga


@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
def test_sharded_merge_matches_single_chip(spec):
    """Merging two sharded layers (collective-free local bitonic merges)
    equals the single-chip merge-then-sort tree bit for bit."""
    n = 24 * N_DEV
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=29)
    # second, disjoint-id scene in the same system bounds
    size2 = rng.uniform(0.5, 9.0, size=(n, spec.dim)).astype(np.float32)
    bmin2 = rng.uniform(-60.0, 51.0, size=(n, spec.dim)).astype(np.float32)
    bmax2 = bmin2 + size2
    ids2 = np.arange(n, 2 * n, dtype=np.uint32)

    mesh = _mesh()
    md = min_depth_for_devices(spec, N_DEV)
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * n)
    merge = make_merge_sharded(spec, mesh, "objects")
    a = build(smin, smax, bmin, bmax, ids)
    b = build(smin, smax, bmin2, bmax2, ids2)
    m = merge(a, b)
    assert not bool(m.overflow)
    assert np.asarray(m.counts).sum() == \
        np.asarray(a.counts).sum() + np.asarray(b.counts).sum()

    # single-chip reference: merge into an empty WIDE layer first (build's
    # capacity is clamped to n * slots, too small for the merged tree)
    sa = _single_chip_state(spec, smin, smax, bmin, bmax, ids, md)
    sb = _single_chip_state(spec, smin, smax, bmin2, bmax2, ids2, md)
    wide = layer.make_layer(spec, 4 * 8 * n, md)
    want = layer.sort(spec, layer.merge(spec, layer.merge(spec, wide, sa),
                                        sb))
    assert not bool(want.overflow)
    wk, wi, wc = layer.tree_to_numpy(spec, want)

    gk, gi, ga = _global_tree(spec, m)
    assert len(gk) == wc
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gi, wi)
    np.testing.assert_array_equal(ga, np.asarray(want.aux)[:wc])

    # the merged layer is a live ShardedLayer: scan it and check the
    # pair set against the single-chip scan of the merged tree
    scan = make_scan_sharded(spec, mesh, "objects", pair_capacity=32 * n)
    res = scan(m)
    assert not bool(res.overflow)
    _, wres = layer.scan(spec, want, 32 * n * N_DEV)
    assert not bool(wres.overflow)
    assert gather_pairs(res) == layer.scan_result_to_numpy(wres)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_merge_shared_ids_nested_scan(spec):
    """Merging layers that SHARE ids creates nested same-id cells; the
    nested_ids sharded scan of the merged layer must match the single-chip
    nested_ids scan (the id-on-stack skip across the merge)."""
    n = 16 * N_DEV
    smin, smax, bmin, bmax, ids, _ = _scene(spec, n, seed=31)
    big = 2.5
    bmin2 = np.clip(bmin - big, smin + 0.5, None).astype(np.float32)
    bmax2 = np.clip(bmax + big, None, smax - 0.5).astype(np.float32)

    mesh = _mesh()
    md = min_depth_for_devices(spec, N_DEV)
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * n)
    merge = make_merge_sharded(spec, mesh, "objects")
    m = merge(build(smin, smax, bmin, bmax, ids),
              build(smin, smax, bmin2, bmax2, ids))
    assert not bool(m.overflow)

    scan = make_scan_sharded(spec, mesh, "objects",
                             pair_capacity=64 * n, nested_ids=True)
    res = scan(m)
    assert not bool(res.overflow)

    sa = _single_chip_state(spec, smin, smax, bmin, bmax, ids, md)
    sb = _single_chip_state(spec, smin, smax, bmin2, bmax2, ids, md)
    wide = layer.make_layer(spec, 4 * 8 * n, md)
    want = layer.sort(spec, layer.merge(spec, layer.merge(spec, wide, sa),
                                        sb))
    assert not bool(want.overflow)
    _, wres = layer.scan(spec, want, 64 * n * N_DEV, nested_ids=True)
    assert not bool(wres.overflow)
    assert gather_pairs(res) == layer.scan_result_to_numpy(wres)


@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
def test_gather_shard_layer_round_trip(spec):
    """Checkpoint bridge: sharded build -> gather_layer == single-chip
    build; shard_layer(single-chip) -> sharded scan == oracle; the two
    directions invert each other."""
    from broadphase_tpu.parallel import gather_layer, shard_layer

    n = 24 * N_DEV
    smin, smax, bmin, bmax, ids, _ = _scene(spec, n, seed=41)
    mesh = _mesh()
    md = min_depth_for_devices(spec, N_DEV)
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * n)
    lyr = build(smin, smax, bmin, bmax, ids)

    # gather: equals the single-chip build, and is scannable as-is
    st = gather_layer(spec, lyr, min_depth=md)
    want = _single_chip_state(spec, smin, smax, bmin, bmax, ids, md)
    gk, gi, gc = layer.tree_to_numpy(spec, st)
    wk, wi, wc = layer.tree_to_numpy(spec, want)
    assert gc == wc
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gi, wi)
    np.testing.assert_array_equal(np.asarray(st.aux)[:gc],
                                  np.asarray(want.aux)[:wc])

    # shard: the restore direction — fragments equal the original build's
    back = shard_layer(spec, st, N_DEV, fragment_capacity=8 * n)
    np.testing.assert_array_equal(np.asarray(back.counts),
                                  np.asarray(lyr.counts))
    bk, bi, ba = _global_tree(spec, back)
    ok, oi, oa = _global_tree(spec, lyr)
    np.testing.assert_array_equal(bk, ok)
    np.testing.assert_array_equal(bi, oi)
    np.testing.assert_array_equal(ba, oa)

    # and the restored sharded layer scans identically
    scan = make_scan_sharded(spec, mesh, "objects", pair_capacity=16 * n)
    _, wres = layer.scan(spec, want, 16 * n * N_DEV)
    assert gather_pairs(scan(back)) == layer.scan_result_to_numpy(wres)

    # fragment overflow is loud
    with pytest.raises(ValueError):
        shard_layer(spec, st, N_DEV, fragment_capacity=2)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_merge_mixed_fragment_capacities(spec):
    """Layers with different per-device buffer sizes (e.g. a big static
    tree + a small dynamic one) merge correctly; result capacity defaults
    to the sum of the two."""
    n = 16 * N_DEV
    m_small = 8 * N_DEV
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=43)
    sb_min = rng.uniform(-60.0, 51.0, (m_small, spec.dim)).astype(
        np.float32)
    sb_max = sb_min + rng.uniform(0.5, 6.0, (m_small, spec.dim)).astype(
        np.float32)
    sids = np.arange(n, n + m_small, dtype=np.uint32)

    mesh = _mesh()
    big = make_build_sharded(spec, mesh, "objects",
                             fragment_capacity=8 * n)
    small = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * m_small)
    merge = make_merge_sharded(spec, mesh, "objects")
    m = merge(big(smin, smax, bmin, bmax, ids),
              small(smin, smax, sb_min, sb_max, sids))
    assert not bool(m.overflow)
    assert np.asarray(m.ids).size // N_DEV == 8 * n + 8 * m_small

    md = min_depth_for_devices(spec, N_DEV)
    union = _single_chip_state(
        spec, smin, smax,
        np.concatenate([bmin, sb_min]), np.concatenate([bmax, sb_max]),
        np.concatenate([ids, sids]), md)
    wk, wi, wc = layer.tree_to_numpy(spec, union)
    gk, gi, _ = _global_tree(spec, m)
    assert len(gk) == wc
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gi, wi)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_merge_fragment_overflow_flagged(spec):
    """A fragment_capacity smaller than a merged fragment must flag, never
    silently truncate."""
    n = 16 * N_DEV
    smin, smax, bmin, bmax, ids, _ = _scene(spec, n, seed=37)
    mesh = _mesh()
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * n)
    a = build(smin, smax, bmin, bmax, ids)
    # 2 lanes per device cannot hold any real fragment pair
    merge = make_merge_sharded(spec, mesh, "objects", fragment_capacity=2)
    m = merge(a, a)
    assert bool(m.overflow)
    assert np.asarray(m.counts).max() <= 2


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_query_result_cap_overflow_flagged(spec):
    n = 24 * N_DEV
    smin, smax, bmin, bmax, ids, _ = _scene(spec, n, seed=23)
    mesh = _mesh()
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=8 * n)
    box_q, _, _ = make_queries_sharded(spec, mesh, "objects",
                                       min_depth=min_depth_for_devices(
                                           spec, N_DEV), result_cap=4)
    lyr = build(smin, smax, bmin, bmax, ids)
    # a whole-system box hits everything: 4-slot result must flag
    got = box_q(lyr, smin, smax, (smin[None, :].repeat(1, 0),
                                  smax[None, :].repeat(1, 0)))
    assert bool(np.asarray(got.overflow).any())
    assert int(np.asarray(got.count)[0]) <= 4
