"""Scene serialization + deterministic generator tests.

The ChaCha20 core is validated against the djb/RFC keystream vectors; the
BR_SCENE codec against a byte-level round trip; gen_boxes against the
reference's parameter-derivation rules (``utils/src/gen_test_data.rs``).
"""

import numpy as np

from broadphase_tpu.utils import gen, scene


def test_chacha20_zero_key_keystream():
    # djb ChaCha20 test vector: all-zero key, nonce 0, counter 0
    words = gen.chacha20_words(b"\x00" * 32, 0, 2)
    stream = words.astype("<u4").tobytes()
    assert stream[:16].hex() == "76b8e0ada0f13d90405d6ae55386bd28"
    assert stream[16:32].hex() == "bdd219b8a08ded1aa836efcc8b770dc7"
    # block 1 (counter = 1)
    assert stream[64:80].hex() == "9f07e7be5551387a98ba977c732d080d"


def test_seed_from_u64_expansion_properties():
    s0 = gen.seed_from_u64(0)
    s1 = gen.seed_from_u64(1)
    assert len(s0) == 32 and len(s1) == 32
    assert s0 != s1
    assert gen.seed_from_u64(0) == s0  # deterministic


def test_gen_range_f32_bounds_and_determinism():
    rng1 = gen.ChaCha20Rng(0)
    rng2 = gen.ChaCha20Rng(0)
    vals1 = [rng1.gen_range_f32(1.0, 10.0) for _ in range(1000)]
    vals2 = [rng2.gen_range_f32(1.0, 10.0) for _ in range(1000)]
    assert vals1 == vals2
    assert all(1.0 <= v < 10.0 for v in vals1)


def test_gen_boxes_matches_reference_shape_rules():
    sc = gen.gen_boxes(count=10_000, density=1.0 / 1000.0,
                       size_range=(1.0, 10.0), seed=0)
    # linear size = cbrt(count/density) + avg_size (gen_test_data.rs:118)
    linear = np.float32(np.cbrt(np.float32(10_000) / np.float32(0.001))
                        + np.float32(5.5))
    np.testing.assert_allclose(sc.system_max, np.full(3, linear), rtol=1e-6)
    assert (sc.system_min == 0).all()
    assert len(sc.ids) == 10_000
    assert (sc.ids == np.arange(10_000)).all()
    size = sc.bounds_max - sc.bounds_min
    assert (size >= 1.0).all() and (size < 10.0).all()
    assert (sc.bounds_min >= sc.system_min).all()
    assert (sc.bounds_max <= sc.system_max).all()
    # deterministic
    sc2 = gen.gen_boxes(count=10_000, density=1.0 / 1000.0,
                        size_range=(1.0, 10.0), seed=0)
    np.testing.assert_array_equal(sc.bounds_min, sc2.bounds_min)
    # fast batch path must equal the scalar reference path exactly
    sc3 = gen.gen_boxes(count=50, density=1.0 / 1000.0,
                        size_range=(1.0, 10.0), seed=0)
    rng = gen.ChaCha20Rng(0)
    for i in range(50):
        s = [rng.gen_range_f32(1.0, 10.0) for _ in range(3)]
        for a in range(3):
            v = rng.gen_range_f32(sc3.system_min[a],
                                  np.float32(sc3.system_max[a] - s[a]))
            assert v == sc3.bounds_min[i, a], (i, a)
            assert np.float32(v + s[a]) == sc3.bounds_max[i, a], (i, a)


def test_scene_roundtrip():
    sc = gen.gen_boxes(count=500, density=1.0 / 1000.0, seed=3)
    sc.layer = scene.SceneLayer(
        min_depth=2,
        keys=np.array([1, 5, 9], np.uint64),
        ids=np.array([0, 1, 2], np.uint32),
        sorted=True,
    )
    sc.collisions = np.array([[3, 1], [9, 4]], np.uint32)
    sc.hits = np.array([7], np.uint32)
    sc.nearest = (12, 3.5)

    data = scene.dumps(sc)
    assert data[:8] == b"BR_SCENE"
    sc2 = scene.loads(data)
    np.testing.assert_array_equal(sc.bounds_min, sc2.bounds_min)
    np.testing.assert_array_equal(sc.bounds_max, sc2.bounds_max)
    np.testing.assert_array_equal(sc.ids, sc2.ids)
    np.testing.assert_array_equal(sc.layer.keys, sc2.layer.keys)
    np.testing.assert_array_equal(sc.layer.ids, sc2.layer.ids)
    assert sc2.layer.min_depth == 2 and sc2.layer.sorted
    np.testing.assert_array_equal(sc.collisions, sc2.collisions)
    np.testing.assert_array_equal(sc.hits, sc2.hits)
    assert sc2.nearest == (12, 3.5)
    # byte-stability: dumps(loads(x)) == x
    assert scene.dumps(sc2) == data


def test_scene_header_validation():
    import pytest
    with pytest.raises(ValueError):
        scene.loads(b"NOT_A_SC" + b"\x00" * 20)


def test_seed_from_u64_pcg_cross_check():
    """Independent re-derivation of rand_core 0.5's seed_from_u64 (PCG-XSH-RR
    with the standard multiplier; state advanced BEFORE output) — catches
    implementation slips in the production port.  Plus pinned regression
    vectors of this port's output so any future drift is loud.

    Residual risk (documented in BASELINE.md): no official rand_chacha
    fixture bytes exist in this environment, so reference-exactness of the
    expansion and of rand 0.7's f32 sample_single rests on a reading of the
    rand-core/rand sources; everything downstream is additionally validated
    by ChaCha RFC vectors, batch==scalar equivalence, and oracle parity of
    every pipeline consuming the generated scenes.
    """
    def pcg_xsh_rr_stream(state):
        out = []
        for _ in range(8):
            state = (state * 6364136223846793005 + 11634580027462260723) \
                % (1 << 64)
            xorshifted = (((state >> 18) ^ state) >> 27) % (1 << 32)
            rot = state >> 59
            out.append(((xorshifted >> rot)
                        | (xorshifted << (32 - rot))) % (1 << 32)
                       if rot else xorshifted)
        return b"".join(x.to_bytes(4, "little") for x in out)

    for seed in (0, 1, 42, 2**64 - 1):
        assert gen.seed_from_u64(seed) == pcg_xsh_rr_stream(seed), seed

    # pinned regression vectors (this port's values, not external fixtures)
    assert gen.seed_from_u64(0).hex() == (
        "ecf273f981b5cd4587f0467306ad6cad"
        "d0d0a3e33317e767f29bea72d78a7dfe")
    assert gen.seed_from_u64(1).hex() == (
        "ead81d725d26104e899c3bf842ce782e"
        "bad303da9997d2c2120256ac7366fb1b")
    r = gen.ChaCha20Rng(0)
    assert [r.next_u32() for _ in range(4)] == [
        2180380594, 104652502, 1862083240, 4217733758]
