"""Randomized end-to-end pipeline fuzz: build -> scan == sequential oracle.

Deterministic seeds; every trial asserts EXACT pair-list equality (order
included) against the Python oracle (`utils/oracle.py`, the semantic port
of the reference's `scan_impl`, ``src/layer.rs:141-165``).  Dimensions
fuzzed: index type, scene size/density, min_depth, slots_per_axis,
duplicate object ids, split emit/pair capacities, filter predicates,
merged layers, and deliberate pair-capacity overflow (flag, never
silent).

Scale trials with BROADPHASE_FUZZ_TRIALS (default keeps CI fast).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu import layer as L
from broadphase_tpu.index import ALL_SPECS
from broadphase_tpu.utils import oracle

TRIALS = int(os.environ.get("BROADPHASE_FUZZ_TRIALS", "6"))


def _random_scene(rng, spec, n, world=100.0, max_size=8.0, dup_ids=False):
    dim = spec.dim
    smin = np.full(dim, -world / 2, np.float32)
    smax = np.full(dim, world / 2, np.float32)
    size = rng.uniform(0.01, max_size, size=(n, dim)).astype(np.float32)
    bmin = rng.uniform(-world / 2, world / 2 - max_size,
                       size=(n, dim)).astype(np.float32)
    bmax = bmin + size
    if dup_ids:
        ids = rng.integers(0, max(n // 2, 1), size=n,
                           endpoint=False).astype(np.uint32)
    else:
        ids = np.arange(n, dtype=np.uint32)
    return smin, smax, bmin, bmax, ids


def _oracle_pairs(spec, smin, smax, bmin, bmax, ids, min_depth=0):
    pk, pi, _ = oracle.extend(spec, smin, smax, bmin, bmax, ids,
                              min_depth=min_depth)
    pk, pi = oracle.sort_tree(pk, pi)
    return oracle.scan(spec, pk, pi)


def _got_pairs(res):
    return list(zip(np.asarray(res.pairs_a)[:int(res.count)].tolist(),
                    np.asarray(res.pairs_b)[:int(res.count)].tolist()))


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_fuzz_build_scan_oracle_parity(spec):
    rng = np.random.default_rng(0xF022 + spec.dim + spec.bits)
    for trial in range(TRIALS):
        n = int(rng.integers(2, 1200))
        dup = bool(trial % 3 == 2)
        min_depth = int(rng.integers(0, 3))
        slots = 2 if trial % 4 else 3
        smin, smax, bmin, bmax, ids = _random_scene(
            rng, spec, n, max_size=float(rng.uniform(0.5, 20.0)),
            dup_ids=dup)
        st = L.build(spec, smin, smax, bmin, bmax, ids,
                     min_depth=min_depth, slots_per_axis=slots)
        want = _oracle_pairs(spec, smin, smax, bmin, bmax, ids,
                             min_depth=min_depth)

        emit_cap = max(512 * n, 8192)
        if dup:
            # duplicate ids at mixed sizes nest: the reference sweep's
            # id-on-stack skip must be applied, and the pair buffer holds
            # raw emissions (emit-once degrades)
            st, res = L.scan(spec, st, pair_capacity=emit_cap,
                             nested_ids=True)
        else:
            # exact-fit pair cap: the emit-once rule must keep each pair
            # EXACTLY once or this overflows
            st, res = L.scan(spec, st, pair_capacity=max(len(want), 8),
                             emit_capacity=emit_cap)
        ctx = (spec.name, trial, n, min_depth, slots, dup)
        assert not bool(res.overflow), ctx
        assert _got_pairs(res) == [(int(a), int(b)) for a, b in want], ctx


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_fuzz_scan_filtered_oracle_parity(spec):
    rng = np.random.default_rng(0xF117 + spec.bits)

    def filt(a, b):
        return ((a + b) % jnp.uint32(3)) != 0

    for trial in range(max(TRIALS // 2, 2)):
        n = int(rng.integers(10, 800))
        smin, smax, bmin, bmax, ids = _random_scene(rng, spec, n)
        st = L.build(spec, smin, smax, bmin, bmax, ids)
        want = [(a, b) for a, b in
                _oracle_pairs(spec, smin, smax, bmin, bmax, ids)
                if (a + b) % 3 != 0]
        st, res = L.scan_filtered(spec, st, pair_capacity=max(len(want), 8),
                                  filter_fn=filt,
                                  emit_capacity=max(256 * n, 8192))
        assert not bool(res.overflow), (spec.name, trial, n)
        assert _got_pairs(res) == want, (spec.name, trial, n)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_fuzz_merge_scan_oracle_parity(spec):
    """Two independently built layers merged, then scanned: must equal the
    oracle over the concatenated element set (reference static+dynamic
    layer pattern, README.md:28)."""
    rng = np.random.default_rng(0xF344 + spec.bits)
    for trial in range(max(TRIALS // 2, 2)):
        n1 = int(rng.integers(5, 400))
        n2 = int(rng.integers(5, 400))
        smin, smax, bmin1, bmax1, _ = _random_scene(rng, spec, n1)
        _, _, bmin2, bmax2, _ = _random_scene(rng, spec, n2)
        ids1 = np.arange(n1, dtype=np.uint32)
        ids2 = np.arange(n1, n1 + n2, dtype=np.uint32)
        a = L.build(spec, smin, smax, bmin1, bmax1, ids1)
        b = L.build(spec, smin, smax, bmin2, bmax2, ids2)
        # merge keeps the RECEIVING layer's capacity (truncation is
        # flagged) — merge into a layer big enough for both trees
        base = L.make_layer(spec, (n1 + n2) * spec.fanout)
        merged = L.merge(spec, L.merge(spec, base, a), b)
        want = _oracle_pairs(spec, smin, smax,
                             np.concatenate([bmin1, bmin2]),
                             np.concatenate([bmax1, bmax2]),
                             np.concatenate([ids1, ids2]))
        merged, res = L.scan(spec, merged, pair_capacity=max(len(want), 8),
                             emit_capacity=max(512 * (n1 + n2), 8192))
        assert not bool(res.overflow), (spec.name, trial)
        assert _got_pairs(res) == [(int(x), int(y)) for x, y in want], \
            (spec.name, trial)


def test_fuzz_overflow_is_flagged_never_silent():
    """Whenever pair_capacity < true pair count the overflow flag MUST be
    set; when >= it must NOT be (across random scenes)."""
    spec = ALL_SPECS[-1]
    rng = np.random.default_rng(0xF0F0)
    checked_over = 0
    for trial in range(max(TRIALS, 4)):
        n = int(rng.integers(50, 600))
        smin, smax, bmin, bmax, ids = _random_scene(
            rng, spec, n, max_size=float(rng.uniform(5.0, 25.0)))
        st = L.build(spec, smin, smax, bmin, bmax, ids)
        want = _oracle_pairs(spec, smin, smax, bmin, bmax, ids)
        if len(want) < 4:
            continue
        small = max(len(want) // 2, 1)
        st, res = L.scan(spec, st, pair_capacity=small,
                         emit_capacity=max(64 * n, 4096))
        assert bool(res.overflow), (trial, n, len(want))
        assert int(res.count) <= small
        checked_over += 1
    assert checked_over >= 2


def test_nested_same_id_skip_rule():
    """Deterministic reference corner (``src/layer.rs:563-565``): one id
    extended at two sizes nests — the sweep skips the inner instance, so
    pairs reachable only through it must NOT be reported.  A second id
    pair proves the non-nested path is untouched."""
    spec = ALL_SPECS[-1]
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 64.0, np.float32)
    # id 7: a 30-unit box (depth 1) and a 2-unit box inside it (depth ~5)
    # id 3: a 2-unit box overlapping ONLY the small id-7 instance
    # id 9: a 30-unit box overlapping the big id-7 instance
    bmin = np.array([[1.0, 1.0, 1.0],
                     [4.0, 4.0, 4.0],
                     [4.5, 4.5, 4.5],
                     [2.0, 2.0, 2.0]], np.float32)
    bmax = np.array([[31.0, 31.0, 31.0],
                     [6.0, 6.0, 6.0],
                     [6.5, 6.5, 6.5],
                     [32.0, 32.0, 32.0]], np.float32)
    ids = np.array([7, 7, 3, 9], np.uint32)
    st = L.build(spec, smin, smax, bmin, bmax, ids)
    want = _oracle_pairs(spec, smin, smax, bmin, bmax, ids)
    st, res = L.scan(spec, st, pair_capacity=4096, nested_ids=True)
    assert not bool(res.overflow)
    assert _got_pairs(res) == [(int(a), int(b)) for a, b in want]
    # the oracle skip really fired: without it the inner id-7 instance
    # pairs with id 3's cells too
    st, res_no = L.scan(spec, st, pair_capacity=4096)
    assert len(_got_pairs(res_no)) >= len(want)
