"""C++ host library vs Python oracle vs device engine — three-way parity.

The native library (native/broadphase_host.cpp) is the golden reference at
scales where the Python oracle is too slow; this test proves the three
implementations agree exactly at test scale.
"""

import numpy as np
import pytest

from broadphase_tpu import Index64_3D, layer
from broadphase_tpu.utils import gen, oracle
from broadphase_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

SPEC = Index64_3D


def test_native_codec_matches_python_oracle():
    rng = np.random.default_rng(0)
    n = 2000
    xyz = rng.integers(0, 2**32, (n, 3), dtype=np.uint32)
    depth = rng.integers(0, 20, n, dtype=np.uint32)
    keys = native.encode_index64_3d(xyz, depth)
    for i in range(0, n, 97):
        want = oracle.make_key(SPEC, [int(v) for v in xyz[i]],
                               int(depth[i]))
        assert int(keys[i]) == want
    xyz2, depth2 = native.decode_index64_3d(keys)
    # decode returns truncated (top axis_bits) coordinates
    mask = np.uint32(0xFFFFFFFF) << np.uint32(32 - SPEC.axis_bits)
    np.testing.assert_array_equal(xyz2, xyz & mask)
    np.testing.assert_array_equal(depth2, np.minimum(depth, SPEC.axis_bits))


def test_native_pipeline_matches_python_oracle():
    sc = gen.gen_boxes(count=800, density=1.0 / 1000.0, seed=5)
    # python oracle
    pk, pi, pinv = oracle.extend(SPEC, sc.system_min, sc.system_max,
                                 sc.bounds_min, sc.bounds_max, sc.ids)
    # native — append order must match the reference's sequential loop
    nk, ni, ninv = native.extend(sc.system_min, sc.system_max,
                                 sc.bounds_min, sc.bounds_max, sc.ids)
    assert ninv == len(pinv)
    np.testing.assert_array_equal(nk, np.array(pk, np.uint64))
    np.testing.assert_array_equal(ni, np.array(pi, np.uint32))
    pk, pi = oracle.sort_tree(pk, pi)
    ppairs = oracle.scan(SPEC, pk, pi)
    nk, ni = native.sort_tree(nk, ni)
    np.testing.assert_array_equal(nk, np.array(pk, np.uint64))
    npairs = native.scan_seq(nk, ni)
    assert [(int(a), int(b)) for a, b in npairs] == ppairs


def test_native_brute_force_matches_python():
    sc = gen.gen_boxes(count=600, density=1.0 / 1000.0, seed=9)
    want = sorted(oracle.brute_force_pairs(sc.bounds_min, sc.bounds_max,
                                           sc.ids))
    got = [(int(a), int(b))
           for a, b in native.brute_force_pairs(sc.bounds_min,
                                                sc.bounds_max, sc.ids)]
    assert got == want


def test_device_scan_matches_native_at_scale():
    """30k objects — too slow for the Python oracle, easy for C++."""
    sc = gen.gen_boxes(count=30_000, density=1.0 / 1000.0, seed=1)
    nk, ni, _ = native.extend(sc.system_min, sc.system_max,
                              sc.bounds_min, sc.bounds_max, sc.ids)
    nk, ni = native.sort_tree(nk, ni)
    npairs = native.scan_seq(nk, ni)

    state = layer.build(SPEC, sc.system_min, sc.system_max,
                        sc.bounds_min, sc.bounds_max, sc.ids)
    state, res = layer.scan(SPEC, state, 32 * len(sc.ids))
    assert not bool(res.overflow)
    got = layer.scan_result_to_numpy(res)
    assert got == [(int(a), int(b)) for a, b in npairs]


def test_native_scene_io_interops_with_python_codec():
    from broadphase_tpu.utils import scene as scene_io
    sc = gen.gen_boxes(count=300, density=1.0 / 1000.0, seed=2)
    nk, ni, _ = native.extend(sc.system_min, sc.system_max,
                              sc.bounds_min, sc.bounds_max, sc.ids)
    nk, ni = native.sort_tree(nk, ni)
    pairs = native.scan_seq(nk, ni)

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.br_scene")
        native.scene_save(p, sc.system_min, sc.system_max, sc.bounds_min,
                          sc.bounds_max, sc.ids,
                          layer={"min_depth": 0, "keys": nk, "ids": ni,
                                 "sorted": True},
                          collisions=pairs)
        # python codec reads the native-written bytes
        sc2 = scene_io.load(p)
        np.testing.assert_array_equal(sc2.bounds_min, sc.bounds_min)
        np.testing.assert_array_equal(sc2.layer.keys, nk)
        np.testing.assert_array_equal(sc2.collisions, pairs)
        # and native reads the python-written bytes
        p2 = os.path.join(td, "t2.br_scene")
        scene_io.save(p2, sc2)
        d = native.scene_load(p2)
        np.testing.assert_array_equal(d["layer"]["keys"], nk)
        np.testing.assert_array_equal(d["collisions"], pairs)


def test_fuzz_many_seeds_device_vs_native():
    """Property-style sweep: 10 deterministic scenes, pair-for-pair parity."""
    n = 1500
    P = 96 * 1024
    for seed in range(10):
        sc = gen.gen_boxes(count=n, density=1.0 / 1000.0,
                           size_range=(0.5, 12.0), seed=seed)
        st = layer.build(SPEC, sc.system_min, sc.system_max,
                         sc.bounds_min, sc.bounds_max, sc.ids)
        st, res = layer.scan(SPEC, st, P)
        assert not bool(res.overflow), seed
        got = layer.scan_result_to_numpy(res)
        nk, ni, _ = native.extend(sc.system_min, sc.system_max,
                                  sc.bounds_min, sc.bounds_max, sc.ids)
        nk, ni = native.sort_tree(nk, ni)
        want = [(int(a), int(b)) for a, b in native.scan_seq(nk, ni)]
        assert got == want, f"seed {seed}: {len(got)} vs {len(want)}"


def test_nested_dup_ids_three_way_parity():
    """Duplicate ids at mixed sizes (the sweep's id-on-stack skip,
    src/layer.rs:563-565): Python oracle, C++ sweep, and the device scan
    with nested_ids=True must agree pair-for-pair."""
    rng = np.random.default_rng(31)
    n = 500
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 200.0, np.float32)
    size = rng.uniform(0.5, 40.0, size=(n, 3)).astype(np.float32)
    bmin = rng.uniform(0, 160, size=(n, 3)).astype(np.float32)
    bmax = bmin + size
    ids = rng.integers(0, n // 3, size=n).astype(np.uint32)

    pk, pi, _ = oracle.extend(SPEC, smin, smax, bmin, bmax, ids)
    pk, pi = oracle.sort_tree(pk, pi)
    want = oracle.scan(SPEC, pk, pi)

    nk, ni, _ = native.extend(smin, smax, bmin, bmax, ids)
    nk, ni = native.sort_tree(nk, ni)
    npairs = [(int(a), int(b)) for a, b in native.scan_seq(nk, ni)]
    assert npairs == want

    st = layer.build(SPEC, smin, smax, bmin, bmax, ids)
    st, res = layer.scan(SPEC, st, pair_capacity=256 * n, nested_ids=True)
    assert not bool(res.overflow)
    got = layer.scan_result_to_numpy(res)
    assert got == [(int(a), int(b)) for a, b in want]
