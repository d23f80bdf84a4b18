"""Emit-once dedup rule: duplicate candidate-pair emissions are killed at
the source (one canonical cell per pair) instead of by the canonical sort.

The rule (``layer._emit_once_keep``; kernel copy in ``ops/pallas_expand2``)
must keep every candidate pair EXACTLY once: a miss loses a pair (silent
wrong answer), a double-keep is caught by the downstream dedup but wastes
the tighter ``pair_capacity``.  These tests check the exactly-once property
directly against the oracle pair count, and end-to-end scan equality with
split emit/pair capacities, across index types, depth mixes, grid-edge
clamping, and slots_per_axis > 2 (where block offsets exceed one cell).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu import index as bidx
from broadphase_tpu import layer as L
from broadphase_tpu.index import ALL_SPECS, Index64_3D
from broadphase_tpu.ops import search
from broadphase_tpu.utils import gen, oracle


def _oracle_pairs(spec, smin, smax, bmin, bmax, ids, min_depth=0):
    pk, pi, _ = oracle.extend(spec, smin, smax, bmin, bmax, ids,
                              min_depth=min_depth)
    pk, pi = oracle.sort_tree(pk, pi)
    return oracle.scan(spec, pk, pi)


def _precanonical_valid_count(spec, st, emit_cap):
    """Number of emissions surviving (a != b) & emit-once keep on the XLA
    formulation — must equal the deduped pair count exactly."""
    st = L.sort(spec, st)
    dep = bidx.depth_of(spec, st.keys)
    e = search.descendant_run_ends(spec, st.keys, dep)
    cap = st.ids.shape[0]
    lane = jnp.arange(cap, dtype=jnp.int32)
    em = jnp.minimum(e, st.count)
    run = jnp.where(lane < st.count, jnp.maximum(em - (lane + 1), 0), 0)
    si = jnp.cumsum(run)
    starts = si - run
    total = int(si[cap - 1])
    assert total <= emit_cap
    j, off = search.expand_runs(starts, emit_cap)
    j = jnp.clip(j, 0, cap - 1)
    off = jnp.maximum(off, 0)
    i = jnp.clip(j + 1 + off, 0, cap - 1)
    a = st.ids[i]
    b = search.segmented_broadcast(starts, run, st.ids, emit_cap)
    t = jnp.arange(emit_cap, dtype=jnp.int32)
    dim = spec.dim
    meta8 = ((dep << jnp.uint32(dim))
             | (st.aux & jnp.uint32((1 << dim) - 1))) & jnp.uint32(0xFF)
    ameta = L._alpha_meta(spec, st.keys, dep, st.aux)
    bmeta = search.segmented_broadcast(starts, run, meta8, emit_cap)
    keep = L._emit_once_keep(dim, ameta[i], bmeta)
    return int(jnp.sum((t < total) & (a != b) & keep))


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exactly_once_generated_scenes(spec, seed):
    sc = gen.gen_boxes(count=500, density=1.0 / 1000.0, seed=seed)
    bmin = sc.bounds_min[:, :spec.dim]
    bmax = sc.bounds_max[:, :spec.dim]
    smin, smax = sc.system_min[:spec.dim], sc.system_max[:spec.dim]
    st = L.build(spec, smin, smax, bmin, bmax, sc.ids)
    want = _oracle_pairs(spec, smin, smax, bmin, bmax, sc.ids)
    got = _precanonical_valid_count(spec, st, 65536)
    assert got == len(want)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_scan_split_capacities_matches_oracle(spec):
    sc = gen.gen_boxes(count=700, density=1.0 / 1000.0, seed=5)
    bmin = sc.bounds_min[:, :spec.dim]
    bmax = sc.bounds_max[:, :spec.dim]
    smin, smax = sc.system_min[:spec.dim], sc.system_max[:spec.dim]
    st = L.build(spec, smin, smax, bmin, bmax, sc.ids)
    # pair_capacity below the raw emission count, above the unique count
    st2, res = L.scan(spec, st, pair_capacity=16384, emit_capacity=131072)
    assert not bool(res.overflow)
    want = _oracle_pairs(spec, smin, smax, bmin, bmax, sc.ids)
    got = list(zip(np.asarray(res.pairs_a)[:int(res.count)].tolist(),
                   np.asarray(res.pairs_b)[:int(res.count)].tolist()))
    assert got == [(int(a), int(b)) for a, b in want]


def test_exactly_once_grid_edge_clamp():
    """Objects hugging the system max get clamped blocks (partial product
    sets) — the canonical cell must still be emitted exactly once."""
    spec = Index64_3D
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 100.0, np.float32)
    rng = np.random.default_rng(9)
    n = 200
    # push boxes against the far corner so truncation clamps spans
    lo = (100.0 - rng.uniform(0.5, 20.0, size=(n, 3))).astype(np.float32)
    hi = np.minimum(lo + rng.uniform(0.5, 15.0, size=(n, 3)).astype(
        np.float32), 99.9999).astype(np.float32)
    lo = np.minimum(lo, hi)
    ids = np.arange(n, dtype=np.uint32)
    st = L.build(spec, smin, smax, lo, hi, ids)
    want = _oracle_pairs(spec, smin, smax, lo, hi, ids)
    got = _precanonical_valid_count(spec, st, 1 << 17)
    assert got == len(want)
    st2, res = L.scan(spec, st, pair_capacity=1 << 15,
                      emit_capacity=1 << 17)
    assert not bool(res.overflow)
    pairs = list(zip(np.asarray(res.pairs_a)[:int(res.count)].tolist(),
                     np.asarray(res.pairs_b)[:int(res.count)].tolist()))
    assert pairs == [(int(a), int(b)) for a, b in want]


def test_exactly_once_mixed_depths_nested():
    """Large shallow objects over many deep small ones: every pair is an
    ancestor/descendant pair with s > 0 (the tz-alignment branch)."""
    spec = Index64_3D
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 64.0, np.float32)
    rng = np.random.default_rng(3)
    big_lo = rng.uniform(0, 30, size=(6, 3)).astype(np.float32)
    big_hi = big_lo + rng.uniform(15, 30, size=(6, 3)).astype(np.float32)
    big_hi = np.minimum(big_hi, 63.999).astype(np.float32)
    small_lo = rng.uniform(0, 62, size=(150, 3)).astype(np.float32)
    small_hi = small_lo + rng.uniform(0.2, 1.5, size=(150, 3)).astype(
        np.float32)
    small_hi = np.minimum(small_hi, 63.999).astype(np.float32)
    lo = np.concatenate([big_lo, small_lo])
    hi = np.concatenate([big_hi, small_hi])
    ids = np.arange(len(lo), dtype=np.uint32)
    st = L.build(spec, smin, smax, lo, hi, ids)
    want = _oracle_pairs(spec, smin, smax, lo, hi, ids)
    got = _precanonical_valid_count(spec, st, 1 << 17)
    assert got == len(want)


def test_exactly_once_slots_per_axis_4():
    """min_depth forces blocks wider than 2 cells per axis: the e-bools
    collapse offsets > 1 to 'not block min' and the rule must still pick
    exactly one canonical cell."""
    spec = Index64_3D
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 32.0, np.float32)
    rng = np.random.default_rng(11)
    n = 120
    # depth-4 cells are 2 units wide: keep sizes <= 4 so spans stay
    # within the 4-cells-per-axis budget (overflow would drop cells and
    # legitimately lose pairs — that regime is covered by the flag)
    lo = rng.uniform(0, 26, size=(n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.5, 4.0, size=(n, 3)).astype(np.float32)
    hi = np.minimum(hi, 31.999).astype(np.float32)
    ids = np.arange(n, dtype=np.uint32)
    st = L.build(spec, smin, smax, lo, hi, ids, slots_per_axis=4,
                 min_depth=4)
    assert not bool(st.overflow)
    want = _oracle_pairs(spec, smin, smax, lo, hi, ids, min_depth=4)
    got = _precanonical_valid_count(spec, st, 1 << 18)
    assert got == len(want)
    st2, res = L.scan(spec, st, pair_capacity=1 << 15,
                      emit_capacity=1 << 18)
    assert not bool(res.overflow)
    pairs = list(zip(np.asarray(res.pairs_a)[:int(res.count)].tolist(),
                     np.asarray(res.pairs_b)[:int(res.count)].tolist()))
    assert pairs == [(int(a), int(b)) for a, b in want]


def test_degenerate_identical_cluster():
    """All objects identical, straddling cell boundaries (each occupies
    the same 2x2x2 block): every pair shares all 8 cells, the worst
    duplication ratio — the rule must keep each pair exactly once."""
    spec = Index64_3D
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 10.0, np.float32)
    n = 40
    lo = np.full((n, 3), 1.0, np.float32)
    hi = np.full((n, 3), 1.4, np.float32)
    ids = np.arange(n, dtype=np.uint32)
    st = L.build(spec, smin, smax, lo, hi, ids)
    want = _oracle_pairs(spec, smin, smax, lo, hi, ids)
    assert len(want) == n * (n - 1) // 2
    got = _precanonical_valid_count(spec, st, 1 << 17)
    assert got == len(want)


def test_aux_zeros_degrades_to_keep_all():
    """A layer whose aux bits are absent (all zero) must still scan
    exactly — duplicates survive to the canonical sort as before.  (A
    BR_SCENE restore now RECONSTRUCTS aux — covered in test_layer.py —
    so the degraded state is built by zeroing aux explicitly, the state
    of any consumer that bypasses the restore helper.)"""
    spec = Index64_3D
    sc = gen.gen_boxes(count=300, density=1.0 / 1000.0, seed=7)
    st = L.build(spec, sc.system_min, sc.system_max,
                 sc.bounds_min, sc.bounds_max, sc.ids)
    st0 = L.sort(spec, st)._replace(aux=jnp.zeros_like(st.aux))
    # capacities NOT split: without aux the pair buffer must hold raw
    # emissions
    _, res = L.scan(spec, st0, pair_capacity=65536)
    assert not bool(res.overflow)
    want = _oracle_pairs(spec, sc.system_min, sc.system_max,
                         sc.bounds_min, sc.bounds_max, sc.ids)
    got = list(zip(np.asarray(res.pairs_a)[:int(res.count)].tolist(),
                   np.asarray(res.pairs_b)[:int(res.count)].tolist()))
    assert got == [(int(a), int(b)) for a, b in want]


def test_wide_ids_degrade_to_keep_all():
    """Ids above the 29-bit packing bound: aux is dropped in the sort and
    the scan must fall back to keep-all while staying exact."""
    spec = Index64_3D
    sc = gen.gen_boxes(count=200, density=1.0 / 1000.0, seed=2)
    wide_ids = (np.arange(200, dtype=np.uint32) + np.uint32(1 << 30))
    st = L.build(spec, sc.system_min, sc.system_max,
                 sc.bounds_min, sc.bounds_max, wide_ids)
    assert int(jnp.sum(st.aux)) == 0          # packing declined
    _, res = L.scan(spec, st, pair_capacity=65536)
    assert not bool(res.overflow)
    want = _oracle_pairs(spec, sc.system_min, sc.system_max,
                         sc.bounds_min, sc.bounds_max, wide_ids)
    got = list(zip(np.asarray(res.pairs_a)[:int(res.count)].tolist(),
                   np.asarray(res.pairs_b)[:int(res.count)].tolist()))
    assert got == [(int(a), int(b)) for a, b in want]


def test_deep_keys_wide_sort_tier():
    """Tiny objects quantize to depth ~19 (keys > 2^41), forcing the
    build sort off the 2-column packed tier — order must stay exact."""
    spec = Index64_3D
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 1000.0, np.float32)
    rng = np.random.default_rng(21)
    n = 150
    lo = rng.uniform(0, 999, size=(n, 3)).astype(np.float32)
    hi = lo + rng.uniform(1e-4, 4e-3, size=(n, 3)).astype(np.float32)
    # a couple of clustered tiny boxes so at least some pairs exist
    lo[:10] = lo[0] + rng.uniform(0, 2e-3, size=(10, 3)).astype(np.float32)
    hi[:10] = lo[:10] + 3e-3
    ids = np.arange(n, dtype=np.uint32)
    st = L.build(spec, smin, smax, lo, hi, ids)
    import broadphase_tpu.index as bx
    d = np.asarray(bx.depth_of(spec, st.keys))[:int(st.count)]
    assert d.max() >= 15          # the scene really is deep
    kk, ii, _ = L.tree_to_numpy(spec, st)
    pk, pi, _ = oracle.extend(spec, smin, smax, lo, hi, ids)
    pk, pi = oracle.sort_tree(pk, pi)
    np.testing.assert_array_equal(kk, np.array(pk, np.uint64))
    np.testing.assert_array_equal(ii, np.array(pi, np.uint32))
    want = _oracle_pairs(spec, smin, smax, lo, hi, ids)
    got = _precanonical_valid_count(spec, st, 1 << 15)
    assert got == len(want)
