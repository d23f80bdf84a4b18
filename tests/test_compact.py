"""stable_compact must equal the stable-sort-on-drop-flag compaction."""

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu.ops.compact import stable_compact

PAD = np.uint32(0xFFFF_FFFF)


@pytest.mark.parametrize("seed,P,p_keep", [
    (0, 1024, 0.5), (1, 1024, 0.05), (2, 1024, 0.95),
    (3, 4096, 0.3), (4, 128, 0.0), (5, 128, 1.0),
    (6, 8192, 0.7), (7, 1, 0.5), (8, 2, 0.5),
])
def test_matches_numpy_compaction(seed, P, p_keep):
    rng = np.random.default_rng(seed)
    keep = rng.uniform(size=P) < p_keep
    a = rng.integers(0, 2**32 - 2, size=P, dtype=np.uint32)
    b = rng.integers(0, 2**32 - 2, size=P, dtype=np.uint32)
    (ca, cb), cnt = stable_compact(jnp.asarray(keep),
                                   (jnp.asarray(a), jnp.asarray(b)),
                                   (PAD, PAD))
    cnt = int(cnt)
    assert cnt == int(keep.sum())
    np.testing.assert_array_equal(np.asarray(ca)[:cnt], a[keep])
    np.testing.assert_array_equal(np.asarray(cb)[:cnt], b[keep])
    np.testing.assert_array_equal(np.asarray(ca)[cnt:],
                                  np.full(P - cnt, PAD))
    np.testing.assert_array_equal(np.asarray(cb)[cnt:],
                                  np.full(P - cnt, PAD))


def test_worst_case_single_survivor_at_tail():
    P = 4096
    keep = np.zeros(P, bool)
    keep[-1] = True
    vals = np.arange(P, dtype=np.uint32)
    (c,), cnt = stable_compact(jnp.asarray(keep), (jnp.asarray(vals),),
                               (PAD,))
    assert int(cnt) == 1 and int(c[0]) == P - 1 and int(c[1]) == int(PAD)


def test_alternating():
    P = 2048
    keep = (np.arange(P) % 2).astype(bool)
    vals = np.arange(P, dtype=np.uint32)
    (c,), cnt = stable_compact(jnp.asarray(keep), (jnp.asarray(vals),),
                               (PAD,))
    np.testing.assert_array_equal(np.asarray(c)[:P // 2],
                                  np.arange(1, P, 2, dtype=np.uint32))
