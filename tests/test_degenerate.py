"""Degenerate-scene family (round-1 VERDICT #8): shapes that historically
break spatial hashes.  The invariant under test: fixed-capacity outputs are
either bit-identical to the sequential oracle or flagged overflow — NEVER
silently truncated or garbage.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from broadphase_tpu import Index32_2D, Index64_3D, layer
from broadphase_tpu.utils import oracle


def _device_vs_oracle(spec, smin, smax, bmin, bmax, ids, pair_cap,
                      min_depth=0):
    st = layer.build(spec, smin, smax, bmin, bmax, ids, min_depth=min_depth)
    st, res = layer.scan(spec, st, pair_cap)
    keys, tids, _ = layer.tree_to_numpy(spec, st)
    want = oracle.scan(spec, keys, tids)
    return st, res, want


def test_all_boxes_one_cell_overflow_flagged_never_garbage():
    # 200 identical boxes in one cell: C(200,2) = 19900 pairs.  With a
    # too-small pair buffer the overflow flag MUST fire; with a big enough
    # buffer the output must be oracle-exact.
    spec = Index64_3D
    n = 200
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 100.0, np.float32)
    bmin = np.broadcast_to(np.float32(42.0), (n, 3)).copy()
    bmax = bmin + np.float32(0.5)
    ids = np.arange(n, dtype=np.uint32)

    # too small: must flag
    _, res_small, _ = _device_vs_oracle(spec, smin, smax, bmin, bmax, ids,
                                        pair_cap=1024)
    assert bool(res_small.overflow)

    # big enough: must be exact (19900 valid + dups from multi-cell emission)
    _, res, want = _device_vs_oracle(spec, smin, smax, bmin, bmax, ids,
                                     pair_cap=1 << 18)
    assert not bool(res.overflow)
    assert layer.scan_result_to_numpy(res) == want
    assert int(res.count) == n * (n - 1) // 2


def test_identical_keys_deep_cell_2d():
    spec = Index32_2D
    n = 64
    smin = np.zeros(2, np.float32)
    smax = np.ones(2, np.float32)
    bmin = np.broadcast_to(np.float32(0.111), (n, 2)).copy()
    bmax = bmin + np.float32(1e-5)
    ids = np.arange(n, dtype=np.uint32) * 3  # non-contiguous ids
    _, res, want = _device_vs_oracle(spec, smin, smax, bmin, bmax, ids,
                                     pair_cap=16 * 1024)
    assert not bool(res.overflow)
    assert layer.scan_result_to_numpy(res) == want


def test_boxes_exactly_on_cell_boundaries():
    # straddling the root split planes -> shallow cells covering everything
    spec = Index64_3D
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 64.0, np.float32)
    centers = np.array([
        [32.0, 32.0, 32.0],   # root center: depth-0/1 cell
        [16.0, 32.0, 48.0],   # mixed quadrant planes
        [32.0, 16.0, 16.0],
        [8.0, 8.0, 8.0],
        [32.0, 32.0, 32.0],
    ], np.float32)
    half = np.array([[2.0], [1.0], [0.5], [0.25], [16.0]], np.float32)
    bmin = centers - half
    bmax = centers + half
    ids = np.arange(len(centers), dtype=np.uint32)
    _, res, want = _device_vs_oracle(spec, smin, smax, bmin, bmax, ids,
                                     pair_cap=1024)
    assert not bool(res.overflow)
    assert layer.scan_result_to_numpy(res) == want


def test_zero_size_boxes():
    spec = Index64_3D
    rng = np.random.default_rng(0)
    n = 500
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 100.0, np.float32)
    bmin = rng.uniform(1, 99, (n, 3)).astype(np.float32)
    bmax = bmin.copy()                       # degenerate points
    # plus a few normal boxes overlapping them
    bmin2 = rng.uniform(1, 89, (20, 3)).astype(np.float32)
    bmax2 = bmin2 + np.float32(10.0)
    bmin = np.concatenate([bmin, bmin2])
    bmax = np.concatenate([bmax, bmax2])
    ids = np.arange(n + 20, dtype=np.uint32)
    _, res, want = _device_vs_oracle(spec, smin, smax, bmin, bmax, ids,
                                     pair_cap=64 * 1024)
    assert not bool(res.overflow)
    assert layer.scan_result_to_numpy(res) == want


def test_empty_scene_scan():
    spec = Index64_3D
    st = layer.make_layer(spec, capacity=256)
    st, res = layer.scan(spec, st, 1024)
    assert int(res.count) == 0
    assert not bool(res.overflow)
    assert np.all(np.asarray(res.pairs_a) == 0xFFFFFFFF)


def test_one_cell_pallas_path_interpret(monkeypatch):
    # the same one-cell blowup on the forced (interpret) Pallas path
    monkeypatch.setenv("BROADPHASE_FORCE_PALLAS", "1")
    spec = Index32_2D
    n = 100
    smin = np.zeros(2, np.float32)
    smax = np.ones(2, np.float32)
    bmin = np.broadcast_to(np.float32(0.7), (n, 2)).copy()
    bmax = bmin + np.float32(1e-4)
    ids = np.arange(n, dtype=np.uint32)
    st = layer.build(spec, smin, smax, bmin, bmax, ids)
    # unique tile-aligned capacity => fresh trace under the forced env var
    st, res = layer.scan(spec, st, 23 * 1024)
    assert not bool(res.overflow)
    keys, tids, _ = layer.tree_to_numpy(spec, st)
    assert layer.scan_result_to_numpy(res) == oracle.scan(spec, keys, tids)
    assert int(res.count) == n * (n - 1) // 2
