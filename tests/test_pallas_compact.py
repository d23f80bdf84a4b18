"""Streaming (single-pass) Pallas compaction vs numpy, interpret mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu.ops.pallas_compact import TILE, stream_compact

FILL = np.uint32(0xFFFF_FFFF)


def _check(keep, cols):
    got_cols, cnt = stream_compact(jnp.asarray(keep),
                                   tuple(jnp.asarray(c) for c in cols),
                                   interpret=True)
    cnt = int(cnt)
    assert cnt == int(keep.sum())
    for g, c in zip(got_cols, cols):
        g = np.asarray(g)
        np.testing.assert_array_equal(g[:cnt], c[keep])
        np.testing.assert_array_equal(g[cnt:], np.full(len(g) - cnt, FILL))


@pytest.mark.parametrize("seed,n_tiles,p", [
    (0, 1, 0.5), (1, 1, 0.0), (2, 1, 1.0),
    (3, 4, 0.3), (4, 4, 0.95), (5, 8, 0.02), (6, 3, 0.6),
])
def test_random(seed, n_tiles, p):
    rng = np.random.default_rng(seed)
    N = n_tiles * TILE
    keep = rng.uniform(size=N) < p
    cols = (rng.integers(0, 2**32 - 2, N, dtype=np.uint32),
            rng.integers(0, 2**32 - 2, N, dtype=np.uint32))
    _check(keep, cols)


def test_exact_block_boundaries():
    # kept count crossing flush boundaries exactly
    N = 4 * TILE
    keep = np.zeros(N, bool)
    keep[:TILE] = True                  # first tile fully kept
    keep[2 * TILE + 512:3 * TILE + 512] = True  # straddles a tile boundary
    vals = np.arange(N, dtype=np.uint32)
    _check(keep, (vals,))


def test_single_survivor_last_lane():
    N = 2 * TILE
    keep = np.zeros(N, bool)
    keep[-1] = True
    _check(keep, (np.arange(N, dtype=np.uint32),))


def test_canonical_pairs_stream_matches_shift():
    from broadphase_tpu import layer

    rng = np.random.default_rng(11)
    P = 4 * TILE
    a = rng.integers(0, 500, P).astype(np.uint32)
    b = rng.integers(0, 500, P).astype(np.uint32)
    valid = rng.uniform(size=P) < 0.8
    va, vb, vv = jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid)
    sa, sb, sc = layer.canonical_pairs(va, vb, vv, "shift")
    ga, gb, gc = layer.canonical_pairs(va, vb, vv, "stream")
    assert int(gc) == int(sc)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(sa))
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(sb))


@pytest.mark.parametrize("n", [16384, 100_000])
def test_big_tile_rows(n):
    """tile_rows=128 (the auto choice for multi-million inputs) must
    match the default-tile semantics exactly, incl. unaligned length."""
    rng = np.random.default_rng(42)
    keep = rng.uniform(size=n) < 0.44
    cols = (rng.integers(0, 2**32 - 2, n, dtype=np.uint32),
            rng.integers(0, 2**32 - 2, n, dtype=np.uint32))
    got_cols, cnt = stream_compact(jnp.asarray(keep),
                                   tuple(jnp.asarray(c) for c in cols),
                                   tile_rows=128, interpret=True)
    cnt = int(cnt)
    assert cnt == int(keep.sum())
    for g, c in zip(got_cols, cols):
        g = np.asarray(g)
        np.testing.assert_array_equal(g[:cnt], c[keep])
        np.testing.assert_array_equal(g[cnt:], np.full(len(g) - cnt, FILL))
