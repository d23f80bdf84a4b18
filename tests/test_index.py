"""Codec parity: JAX magic-mask Morton codec vs naive per-bit oracle.

Mirrors the reference's in-module index tests (src/index.rs:337-375) and adds
exhaustive cross-implementation checks for all three index types.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from broadphase_tpu import index as bidx
from broadphase_tpu.index import ALL_SPECS, Index64_3D
from broadphase_tpu.utils import oracle

RNG = np.random.default_rng(0)


def _keys_np(spec, key):
    return np.asarray(bidx.keys_to_numpy(spec, key), dtype=np.uint64)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_encode_axis_matches_oracle(spec):
    vals = RNG.integers(0, 1 << 32, size=512, dtype=np.uint32)
    got = _keys_np(spec, bidx.encode_axis(spec, jnp.asarray(vals)))
    want = np.array([oracle.encode_axis(spec, int(v)) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_decode_axis_round_trip(spec):
    vals = RNG.integers(0, 1 << 32, size=512, dtype=np.uint32)
    # decoding an encoded axis returns the value truncated to axis_bits
    expected = (vals >> (32 - spec.axis_bits)) << (32 - spec.axis_bits)
    enc = bidx.encode_axis(spec, jnp.asarray(vals))
    got = np.asarray(bidx.decode_axis(spec, enc), dtype=np.uint32)
    np.testing.assert_array_equal(got, expected)


def test_known_vectors_index64_3d():
    """The reference's own known octal vectors (src/index.rs:342-364)."""
    spread = 0o0_001_111_111_111_111_111_111
    axis = 0o1_777_777 << 13
    got = oracle.decode_axis(Index64_3D, spread)
    assert got == axis
    assert oracle.encode_axis(Index64_3D, axis) == spread
    # and the device codec agrees
    k = bidx.keys_from_numpy(Index64_3D, np.array([spread], dtype=np.uint64))
    got_dev = int(np.asarray(bidx.decode_axis(Index64_3D, k))[0])
    assert got_dev == axis
    enc_dev = _keys_np(Index64_3D, bidx.encode_axis(
        Index64_3D, jnp.asarray(np.array([axis], dtype=np.uint32))))[0]
    assert int(enc_dev) == spread
    # zero vector
    assert oracle.decode_axis(Index64_3D, 0o0_006_666_666_666_666_666_666) == 0


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_make_key_and_accessors(spec):
    n = 256
    origins = [RNG.integers(0, 1 << 32, size=n, dtype=np.uint32)
               for _ in range(spec.dim)]
    depths = RNG.integers(0, spec.axis_bits + 1, size=n).astype(np.uint32)
    key = bidx.make_key(spec, [jnp.asarray(o) for o in origins],
                        jnp.asarray(depths))
    got = _keys_np(spec, key)
    want = np.array(
        [oracle.make_key(spec, [int(o[i]) for o in origins], int(depths[i]))
         for i in range(n)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)

    # depth accessor
    np.testing.assert_array_equal(np.asarray(bidx.depth_of(spec, key)), depths)

    # origin accessor: truncated to axis_bits
    dev_origin = bidx.origin_of(spec, key)
    for ax in range(spec.dim):
        expected = (origins[ax] >> (32 - spec.axis_bits)) << (32 - spec.axis_bits)
        np.testing.assert_array_equal(np.asarray(dev_origin[ax]), expected)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_level_mask_and_same_cell(spec):
    depths = np.arange(0, spec.axis_bits + 1, dtype=np.uint32)
    got = _keys_np(spec, bidx.level_mask(spec, jnp.asarray(depths)))
    want = np.array([oracle.level_mask(spec, int(d)) for d in depths],
                    dtype=np.uint64)
    np.testing.assert_array_equal(got, want)

    n = 512
    ka = np.array([oracle.make_key(
        spec,
        [int(v) for v in RNG.integers(0, 1 << 32, size=spec.dim, dtype=np.uint32)],
        int(RNG.integers(0, spec.axis_bits + 1))) for _ in range(n)],
        dtype=np.uint64)
    # half the partners share a prefix with ka, half are random
    kb = ka.copy()
    flip = RNG.integers(0, 2, size=n).astype(bool)
    kb[flip] = np.array([oracle.make_key(
        spec,
        [int(v) for v in RNG.integers(0, 1 << 32, size=spec.dim, dtype=np.uint32)],
        int(RNG.integers(0, spec.axis_bits + 1))) for _ in range(int(flip.sum()))],
        dtype=np.uint64)
    d = RNG.integers(0, spec.axis_bits + 1, size=n).astype(np.uint32)

    a = bidx.keys_from_numpy(spec, ka)
    b = bidx.keys_from_numpy(spec, kb)
    got_same = np.asarray(bidx.same_cell_at_depth(spec, a, b, jnp.asarray(d)))
    want_same = np.array([oracle.same_cell_at_depth(spec, int(ka[i]), int(kb[i]), int(d[i]))
                          for i in range(n)])
    np.testing.assert_array_equal(got_same, want_same)

    got_ov = np.asarray(bidx.overlaps(spec, a, b))
    want_ov = np.array([oracle.overlaps(spec, int(ka[i]), int(kb[i]))
                        for i in range(n)])
    np.testing.assert_array_equal(got_ov, want_ov)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_subdivide(spec):
    n = 128
    keys_py = [oracle.make_key(
        spec,
        [int(v) for v in RNG.integers(0, 1 << 32, size=spec.dim, dtype=np.uint32)],
        int(RNG.integers(0, spec.axis_bits + 1))) for _ in range(n)]
    # truncate origins to their depth so children are well-formed
    keys_py = [
        (k & ~oracle.level_mask(spec, spec.axis_bits)) |
        (k & oracle.level_mask(spec, oracle.depth_of(spec, k))) |
        oracle.depth_of(spec, k)
        for k in keys_py
    ]
    ka = np.array(keys_py, dtype=np.uint64)
    key = bidx.keys_from_numpy(spec, ka)
    children, valid = bidx.subdivide(spec, key)
    got_children = _keys_np(spec, children)  # (fanout, n)
    got_valid = np.asarray(valid)
    for i, k in enumerate(keys_py):
        want = oracle.subdivide(spec, k)
        if want is None:
            assert not got_valid[i]
        else:
            assert got_valid[i]
            np.testing.assert_array_equal(got_children[:, i],
                                          np.array(want, dtype=np.uint64))
            # children must be in sorted order (src/index.rs:55)
            assert all(want[j] < want[j + 1] for j in range(len(want) - 1))


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_descendant_max(spec):
    n = 256
    keys_py = []
    for _ in range(n):
        d = int(RNG.integers(0, spec.axis_bits + 1))
        origin = [int(oracle.truncate_to_depth(
            int(RNG.integers(0, 1 << 32)), d)) if d else 0
            for _ in range(spec.dim)]
        keys_py.append(oracle.make_key(spec, origin, d))
    ka = np.array(keys_py, dtype=np.uint64)
    key = bidx.keys_from_numpy(spec, ka)
    got = _keys_np(spec, bidx.descendant_max(spec, key))
    want = np.array([oracle.descendant_max(spec, int(k)) for k in keys_py],
                    dtype=np.uint64)
    np.testing.assert_array_equal(got, want)

    # semantic check: descendants are exactly the keys in (key, max]
    for k in keys_py[:32]:
        children = oracle.subdivide(spec, k)
        if children:
            for c in children:
                assert k < c <= oracle.descendant_max(spec, k)
                assert oracle.overlaps(spec, k, c)


def test_round_trip_axis_chacha_style():
    """Analog of the reference's 10k-iteration round trip (src/index.rs:367-374)."""
    rng = np.random.default_rng(0)
    vals = (rng.integers(0, 0o2_000_000, size=10000, dtype=np.uint32) << 13)
    enc = bidx.encode_axis(Index64_3D, jnp.asarray(vals))
    got = np.asarray(bidx.decode_axis(Index64_3D, enc), dtype=np.uint32)
    np.testing.assert_array_equal(got, vals)


def test_format_key_round_trips_origin_and_depth():
    from broadphase_tpu import index as bidx
    from broadphase_tpu.utils import oracle

    for spec in bidx.ALL_SPECS:
        origin = tuple(
            (0x9E3779B9 * (i + 3)) & 0xFFFFFFFF for i in range(spec.dim))
        origin = tuple(oracle.truncate_to_depth(o, 5) for o in origin)
        k = oracle.make_key(spec, origin, 5)
        s = bidx.format_key(spec, k)
        assert spec.name in s and "depth: 5" in s
        for o in origin:
            assert f"0o{o:011o}" in s


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_tz_pack_matches_perbit_oracle(spec):
    """tz_pack (per-axis depth-unit trailing zeros, 5-bit fields) vs a
    direct per-bit recomputation from decoded coordinates.  Feeds the
    scan's emit-once rule, so alignment must be exact at every depth,
    including depth 0 / coordinate 0 (clamped to 31)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 4000
    ab = spec.axis_bits
    dim = spec.dim
    depths = rng.integers(0, ab + 1, n)
    keys_np = np.zeros(n, np.uint64)
    coords = np.zeros((n, dim), np.uint32)
    for i in range(n):
        d = int(depths[i])
        ax = [(int(rng.integers(0, 1 << ab)) >> (ab - d)) << (ab - d)
              for _ in range(dim)]
        coords[i] = ax
        morton = 0
        for b in range(ab):
            for k in range(dim):
                morton |= ((ax[k] >> b) & 1) << (b * dim + k)
        keys_np[i] = np.uint64((morton << spec.origin_shift) | d)
    keys = bidx.keys_from_numpy(spec, keys_np)
    got = np.asarray(bidx.tz_pack(spec, keys))
    for k in range(dim):
        tz_got = (got >> (5 * k)) & 31
        want = np.zeros(n, np.int64)
        for i in range(n):
            c = int(coords[i][k])
            d = int(depths[i])
            # depth-unit trailing zeros: bit j of the coordinate is depth
            # unit ab - 1 - j ... tz = (#trailing zero bits) - (ab - d)
            if c == 0:
                want[i] = 31
            else:
                tzbits = (c & -c).bit_length() - 1
                want[i] = min(max(tzbits - (ab - d), 0), 31)
        np.testing.assert_array_equal(tz_got, want, err_msg=f"axis {k}")
