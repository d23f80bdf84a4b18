"""Temporal-coherence update() vs from-scratch build parity.

update() must produce a tree bit-identical to layer.build on the new
bounds — keys, ids, aux bits, count, flags — for unique-id scenes, at any
churn fraction, across frames, including objects leaving/entering the
system bounds and depth changes.
"""

import numpy as np
import pytest

from broadphase_tpu import Index32_2D, Index64_2D, Index64_3D, layer
from broadphase_tpu.update import build_tracked, update

SPECS = [Index32_2D, Index64_2D, Index64_3D]


def _scene(spec, n, seed, lo=-50.0, hi=50.0):
    rng = np.random.default_rng(seed)
    dim = spec.dim
    size = rng.uniform(0.5, 8.0, size=(n, dim)).astype(np.float32)
    bmin = rng.uniform(lo, hi - 8.0, size=(n, dim)).astype(np.float32)
    bmax = bmin + size
    ids = np.arange(n, dtype=np.uint32)
    smin = np.full(dim, lo, np.float32)
    smax = np.full(dim, hi, np.float32)
    return smin, smax, bmin, bmax, ids, rng


def _assert_state_equal(spec, got, want):
    assert layer.layers_equal(spec, got, want)
    cnt = int(want.count)
    np.testing.assert_array_equal(np.asarray(got.aux[:cnt]),
                                  np.asarray(want.aux[:cnt]))
    assert int(got.invalid_count) == int(want.invalid_count)
    assert bool(got.overflow) == bool(want.overflow)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("churn_frac", [0.05, 0.5, 1.0])
def test_update_matches_build(spec, churn_frac):
    n = 400
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=51)
    cap = n * spec.fanout
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=cap)
    _assert_state_equal(
        spec, tracked.state,
        layer.build(spec, smin, smax, bmin, bmax, ids, out_capacity=cap))

    for frame in range(4):
        move = rng.random(n) < churn_frac
        # mix of small drifts (often same cells) and large jumps
        delta = rng.normal(0, 1.0 if frame % 2 == 0 else 15.0,
                           size=(n, spec.dim)).astype(np.float32)
        bmin = np.where(move[:, None], bmin + delta, bmin).astype(np.float32)
        bmax = np.where(move[:, None], bmax + delta, bmax).astype(np.float32)
        tracked = update(spec, tracked, smin, smax, bmin, bmax,
                         churn_cap=n * spec.fanout)
        want = layer.build(spec, smin, smax, bmin, bmax, ids,
                           out_capacity=cap)
        _assert_state_equal(spec, tracked.state, want)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_update_objects_leaving_and_entering(spec):
    """Objects crossing the system boundary toggle containment."""
    n = 200
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=53)
    cap = n * spec.fanout
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=cap)
    for frame in range(3):
        kick = rng.random(n) < 0.2
        delta = rng.normal(0, 40.0, size=(n, spec.dim)).astype(np.float32)
        bmin = np.where(kick[:, None], bmin + delta, bmin).astype(np.float32)
        bmax = np.where(kick[:, None], bmax + delta, bmax).astype(np.float32)
        tracked = update(spec, tracked, smin, smax, bmin, bmax, churn_cap=n * spec.fanout)
        want = layer.build(spec, smin, smax, bmin, bmax, ids,
                           out_capacity=cap)
        _assert_state_equal(spec, tracked.state, want)
        assert int(tracked.state.invalid_count) > 0 or frame == 0


@pytest.mark.parametrize("spec", [Index32_2D], ids=lambda s: s.name)
def test_update_scan_parity(spec):
    """The updated tree scans to the same pair list as a fresh build."""
    n = 300
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=55)
    cap = n * spec.fanout
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=cap)
    delta = rng.normal(0, 3.0, size=(n, spec.dim)).astype(np.float32)
    mask = rng.random(n) < 0.3
    bmin = np.where(mask[:, None], bmin + delta, bmin).astype(np.float32)
    bmax = np.where(mask[:, None], bmax + delta, bmax).astype(np.float32)
    tracked = update(spec, tracked, smin, smax, bmin, bmax, churn_cap=n * spec.fanout)
    fresh = layer.build(spec, smin, smax, bmin, bmax, ids, out_capacity=cap)
    _, got = layer.scan(spec, tracked.state, 1 << 15)
    _, want = layer.scan(spec, fresh, 1 << 15)
    assert int(got.count) == int(want.count)
    c = int(want.count)
    np.testing.assert_array_equal(np.asarray(got.pairs_a[:c]),
                                  np.asarray(want.pairs_a[:c]))
    np.testing.assert_array_equal(np.asarray(got.pairs_b[:c]),
                                  np.asarray(want.pairs_b[:c]))


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_update_churn_overflow_flagged(spec):
    n = 300
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=57)
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=n * spec.fanout)
    delta = rng.normal(0, 20.0, size=(n, spec.dim)).astype(np.float32)
    tracked = update(spec, tracked, smin, smax,
                     (bmin + delta).astype(np.float32),
                     (bmax + delta).astype(np.float32), churn_cap=16)
    assert bool(tracked.state.overflow)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_update_obj_cap_overflow_flagged(spec):
    """More changed OBJECTS than obj_cap must flag, never truncate
    silently (the slot caps alone can't see a truncated row gather)."""
    n = 300
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=63)
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=n * spec.fanout)
    delta = rng.normal(0, 20.0, size=(n, spec.dim)).astype(np.float32)
    tracked = update(spec, tracked, smin, smax,
                     (bmin + delta).astype(np.float32),
                     (bmax + delta).astype(np.float32),
                     churn_cap=n * spec.fanout, obj_cap=8)
    assert bool(tracked.state.overflow)


@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
def test_update_wide_ids(spec):
    """Ids >= 2^28-1 don't fit the packed (id, aux, tag) column: the
    default path must FLAG (never silently mis-sort), and the
    wide_ids=True path must match build exactly."""
    n = 200
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=65)
    ids = (ids.astype(np.uint64) + (1 << 29)).astype(np.uint32)
    cap = n * spec.fanout
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=cap)
    delta = rng.normal(0, 10.0, size=(n, spec.dim)).astype(np.float32)
    mask = rng.random(n) < 0.3
    b2min = np.where(mask[:, None], bmin + delta, bmin).astype(np.float32)
    b2max = np.where(mask[:, None], bmax + delta, bmax).astype(np.float32)

    flagged = update(spec, tracked, smin, smax, b2min, b2max,
                     churn_cap=n * spec.fanout)
    assert bool(flagged.state.overflow)

    t2 = update(spec, tracked, smin, smax, b2min, b2max,
                churn_cap=n * spec.fanout, wide_ids=True)
    want = layer.build(spec, smin, smax, b2min, b2max, ids,
                       out_capacity=cap)
    _assert_state_equal(spec, t2.state, want)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_update_kernel_merge_path_parity(spec, monkeypatch):
    """The fused Pallas merge-cancel-compact path (taken when churn_cap
    is small relative to the tree, i.e. the temporal-coherence operating
    regime) must match build exactly — forced here via
    BROADPHASE_FORCE_PALLAS (interpret mode off-TPU)."""
    monkeypatch.setenv("BROADPHASE_FORCE_PALLAS", "1")
    n = 3000
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=67)
    cap = n * spec.fanout
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=cap)
    for frame in range(2):
        move = rng.random(n) < 0.02
        delta = rng.normal(0, 12.0, size=(n, spec.dim)).astype(np.float32)
        bmin = np.where(move[:, None], bmin + delta, bmin).astype(np.float32)
        bmax = np.where(move[:, None], bmax + delta, bmax).astype(np.float32)
        tracked = update(spec, tracked, smin, smax, bmin, bmax,
                         churn_cap=1024, obj_cap=512)
        want = layer.build(spec, smin, smax, bmin, bmax, ids,
                           out_capacity=cap)
        _assert_state_equal(spec, tracked.state, want)


@pytest.mark.parametrize("spec", [Index32_2D], ids=lambda s: s.name)
def test_update_no_change_is_identity(spec):
    n = 256
    smin, smax, bmin, bmax, ids, _ = _scene(spec, n, seed=59)
    cap = n * spec.fanout
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=cap)
    t2 = update(spec, tracked, smin, smax, bmin, bmax, churn_cap=64)
    _assert_state_equal(spec, t2.state, tracked.state)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_update_subcell_drift_is_zero_churn(spec):
    """The real-physics case: EVERY object drifts a little but stays in
    its cells — the diff is on emitted cells, not raw coordinates, so a
    tiny churn_cap must suffice (no overflow) and parity must hold."""
    n = 300
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=61)
    cap = n * spec.fanout
    tracked = build_tracked(spec, smin, smax, bmin, bmax, ids,
                            out_capacity=cap)
    for _ in range(3):
        # drift far smaller than any cell: quantized bounds change for
        # most objects, emitted cells for almost none
        delta = rng.normal(0, 1e-4, size=(n, spec.dim)).astype(np.float32)
        bmin = (bmin + delta).astype(np.float32)
        bmax = (bmax + delta).astype(np.float32)
        tracked = update(spec, tracked, smin, smax, bmin, bmax,
                         churn_cap=64)
        want = layer.build(spec, smin, smax, bmin, bmax, ids,
                           out_capacity=cap)
        if bool(tracked.state.overflow):
            pytest.fail("sub-cell drift overflowed a 64-slot churn buffer"
                        " — the diff is not on cells")
        _assert_state_equal(spec, tracked.state, want)
