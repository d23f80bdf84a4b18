"""Fused run-prefix-sum + compaction kernel (ops/pallas_prep.py) vs numpy.

Runs in interpret mode on CPU (conftest pins cpu); compiled behavior is
covered by tools/tpu_smoke.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from broadphase_tpu.ops.pallas_prep import _HUGE, prep_runs


@pytest.mark.parametrize("cap,count_frac,style,tile_rows", [
    (4096, 1.0, "random", 0),
    (10000, 0.7, "random", 0),       # unaligned cap + dead tail
    (8192, 1.0, "dense", 0),         # every run nonempty
    (1 << 15, 0.9, "sparse", 0),     # few long runs
    (4096, 0.0, "empty", 0),
    (10000, 0.7, "random", 128),     # big-input auto tile, partial tail
    (1 << 15, 0.9, "sparse", 128),
    (8192, 1.0, "dense", 128),       # single partial tile, dense flushes
])
def test_prep_runs_matches_numpy(cap, count_frac, style, tile_rows):
    rng = np.random.default_rng(cap + int(count_frac * 10))
    ids = rng.integers(0, 1 << 32, cap, dtype=np.uint32)
    count = int(cap * count_frac)
    e = np.zeros(cap, np.int32)
    if style == "random":
        e = (np.arange(cap) + rng.integers(0, 50, cap)).astype(np.int32)
    elif style == "dense":
        e = (np.arange(cap) + 2).astype(np.int32)
    elif style == "sparse":
        e = np.arange(cap, dtype=np.int32)
        hot = rng.choice(cap, 100, replace=False)
        e[hot] += rng.integers(1, 2000, 100).astype(np.int32)
    em = np.minimum(e, count)
    pos = np.arange(cap)
    run = np.where(pos < count,
                   np.maximum(em - pos - 1, 0), 0).astype(np.int64)
    starts = np.cumsum(run) - run
    nz = np.nonzero(run)[0]

    sv, ab, bid, m, total, wrapped = prep_runs(
        jnp.asarray(e), jnp.asarray(ids), jnp.int32(count),
        tile_rows=tile_rows, interpret=True)
    m = int(m)
    assert m == len(nz)
    assert int(total) == int(run.sum())
    assert not bool(wrapped)
    np.testing.assert_array_equal(np.asarray(sv)[:m],
                                  starts[nz].astype(np.int32))
    np.testing.assert_array_equal(np.asarray(ab)[:m],
                                  (nz + 1 - starts[nz]).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(bid)[:m], ids[nz])
    assert np.all(np.asarray(sv)[m:] == _HUGE)
