"""Fused Pallas build-emission kernel vs the XLA emit+compact path.

The fused kernel (ops/pallas_build.py) must produce the IDENTICAL sorted
tree as the XLA path for every spec: emission order within a tile differs
(slot-major vs object-major), but build sorts by the full (key, id) tuple,
which is duplicate-free, so the sorted trees are bit-equal.  Runs in
interpret mode on CPU (tests/conftest.py pins cpu); compiled-Mosaic
behavior is covered by tools/tpu_smoke.py.
"""

import os

import numpy as np
import pytest

from broadphase_tpu import Index32_2D, Index64_2D, Index64_3D, layer
from broadphase_tpu.utils import gen


def _build_both(spec, smin, smax, bmin, bmax, ids, out_capacity=None,
                min_depth=0):
    os.environ["BROADPHASE_FORCE_PALLAS"] = "1"
    try:
        fused = layer.build.__wrapped__(spec, smin, smax, bmin, bmax, ids,
                                        2, min_depth, out_capacity)
    finally:
        del os.environ["BROADPHASE_FORCE_PALLAS"]
    xla = layer.build.__wrapped__(spec, smin, smax, bmin, bmax, ids,
                                  2, min_depth, out_capacity)
    return fused, xla


def _assert_equal(spec, fused, xla, check_contents=True):
    assert int(fused.count) == int(xla.count)
    assert bool(fused.overflow) == bool(xla.overflow)
    assert int(fused.invalid_count) == int(xla.invalid_count)
    if not check_contents:
        return
    kf, idf, _ = layer.tree_to_numpy(spec, fused)
    kx, idx_, _ = layer.tree_to_numpy(spec, xla)
    np.testing.assert_array_equal(kf, kx)
    np.testing.assert_array_equal(idf, idx_)


def test_generated_scene_3d():
    sc = gen.gen_boxes(count=3000, density=1.0 / 1000.0, seed=2)
    for cap in (None, 4 * 3000):
        fused, xla = _build_both(Index64_3D, sc.system_min, sc.system_max,
                                 sc.bounds_min, sc.bounds_max, sc.ids,
                                 out_capacity=cap)
        _assert_equal(Index64_3D, fused, xla)


def test_overflow_flag_parity():
    """Over capacity, which lanes survive differs by emission order; the
    overflow flag (the contract) must agree."""
    sc = gen.gen_boxes(count=3000, density=1.0 / 1000.0, seed=2)
    fused, xla = _build_both(Index64_3D, sc.system_min, sc.system_max,
                             sc.bounds_min, sc.bounds_max, sc.ids,
                             out_capacity=1024)
    assert bool(fused.overflow) and bool(xla.overflow)
    _assert_equal(Index64_3D, fused, xla, check_contents=False)


@pytest.mark.parametrize("spec", [Index32_2D, Index64_2D])
def test_2d_specs_min_depth(spec):
    rng = np.random.default_rng(0)
    n = 2000
    smin = np.zeros(2, np.float32)
    smax = np.ones(2, np.float32)
    r = rng.uniform(0.004, 0.01, n).astype(np.float32)
    p = rng.uniform(0.05, 0.95, (n, 2)).astype(np.float32)
    ids = np.arange(n, dtype=np.uint32)
    md = 4 if spec is Index32_2D else 0       # ball-pit config for 32-bit
    fused, xla = _build_both(spec, smin, smax, p - r[:, None],
                             p + r[:, None], ids, min_depth=md)
    _assert_equal(spec, fused, xla)


def test_invalid_and_depth0_objects():
    """Out-of-bounds objects are dropped+counted; huge boxes hit depth 0
    (the whole-system zero cell)."""
    rng = np.random.default_rng(1)
    n = 500
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 100.0, np.float32)
    bmin = rng.uniform(-20, 90, (n, 3)).astype(np.float32)
    bmax = bmin + rng.uniform(0.5, 60, (n, 3)).astype(np.float32)
    fused, xla = _build_both(Index64_3D, smin, smax, bmin, bmax,
                             np.arange(n, dtype=np.uint32))
    assert int(fused.invalid_count) > 0
    _assert_equal(Index64_3D, fused, xla)


def test_empty_build():
    fused, xla = _build_both(
        Index64_3D, np.zeros(3, np.float32), np.full(3, 100.0, np.float32),
        np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
        np.zeros(0, np.uint32), out_capacity=256)
    assert int(fused.count) == 0
    _assert_equal(Index64_3D, fused, xla)
