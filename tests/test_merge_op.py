"""ops/merge.py bitonic merger vs lax.sort ground truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from broadphase_tpu.ops.merge import bitonic_merge


@pytest.mark.parametrize("na,nb", [(8, 8), (16, 64), (100, 37), (1, 5),
                                   (1000, 1000), (513, 255)])
@pytest.mark.parametrize("ncols,num_keys", [(1, 1), (3, 2), (4, 3)])
def test_bitonic_merge_matches_sort(na, nb, ncols, num_keys):
    rng = np.random.default_rng(na * 1000 + nb + ncols)
    # globally unique key tuples (the layer invariant: live (key, id)
    # tuples never repeat) so payload routing is exact — the merger's tie
    # order across inputs is unspecified
    def make(n, parity):
        cols = rng.integers(0, 50, size=(ncols, n), dtype=np.uint32)
        cols[num_keys - 1] = (rng.permutation(n).astype(np.uint32) * 2
                              + parity)
        order = np.lexsort(cols[:num_keys][::-1])
        return [jnp.asarray(c[order]) for c in cols]

    a = make(na, 0)
    b = make(nb, 1)
    got = bitonic_merge(a, b, num_keys)
    ref = jax.lax.sort(tuple(jnp.concatenate([x, y]) for x, y in zip(a, b)),
                       num_keys=num_keys)
    n = na + nb
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g[:n]), np.asarray(r[:n]))
    # power-of-two padding sorts to the tail as all-ones
    for g in got[:num_keys]:
        assert np.all(np.asarray(g[n:]) == np.uint32(0xFFFFFFFF))


@pytest.mark.parametrize("na,nb", [(5000, 3000), (8192, 8192), (6000, 100)])
@pytest.mark.parametrize("tail_rows", [1, 16, 2048, 32768])
def test_bitonic_merge_hybrid_tail(na, nb, tail_rows):
    """Exercise the hybrid cutoff: sizes ABOVE the default tail_rows so the
    compare-exchange stages actually run, across cutoffs that put the
    network/row-sort boundary at every interesting place (pure network,
    mid-network handoff, default, and cutoff > m i.e. pure row sort)."""
    rng = np.random.default_rng(na + nb * 7 + tail_rows)
    def make(n, parity):
        k = np.sort(rng.integers(0, 1 << 20, size=n, dtype=np.uint32))
        i = np.arange(n, dtype=np.uint32) * 2 + parity  # unique across inputs
        return jnp.asarray(k), jnp.asarray(i)

    a = make(na, 0)
    b = make(nb, 1)
    got = bitonic_merge(a, b, num_keys=2, tail_rows=tail_rows)
    ref = jax.lax.sort(tuple(jnp.concatenate([x, y]) for x, y in zip(a, b)),
                       num_keys=2)
    n = na + nb
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g[:n]), np.asarray(r[:n]))
    assert np.all(np.asarray(got[0][n:]) == np.uint32(0xFFFFFFFF))


def test_bitonic_merge_with_pad_tails():
    """Layer-shaped inputs: live prefix + all-ones pad tail on both sides."""
    rng = np.random.default_rng(3)
    def make(cap, count, parity=0):
        k = np.sort(rng.integers(0, 1 << 29, size=count,
                                 dtype=np.uint32) * 2 + parity)
        i = rng.permutation(count).astype(np.uint32)
        kf = np.full(cap, 0xFFFFFFFF, np.uint32)
        idf = np.full(cap, 0xFFFFFFFF, np.uint32)
        kf[:count] = k
        idf[:count] = i[np.argsort(k, kind="stable")] if False else i
        return jnp.asarray(kf), jnp.asarray(idf)

    ka, ia = make(64, 40, 0)
    kb, ib = make(32, 20, 1)
    got = bitonic_merge((ka, ia), (kb, ib), num_keys=2)
    ref = jax.lax.sort((jnp.concatenate([ka, kb]),
                        jnp.concatenate([ia, ib])), num_keys=2)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g[:96]), np.asarray(r))
