"""Pallas bitonic sort vs lax.sort (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from broadphase_tpu.ops.pallas_sort import CHUNK, sort_u32_columns


def _check(cols_np):
    cols = tuple(jnp.asarray(c) for c in cols_np)
    got = sort_u32_columns(cols, interpret=True)
    want = jax.lax.sort(cols, num_keys=len(cols))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("n,seed", [
    (1000, 0),            # far below one chunk (pads to CHUNK)
    (CHUNK, 1),           # exactly one chunk
    (CHUNK + 5000, 2),    # two chunks + crossing stages
    (4 * CHUNK, 3),       # multiple k-phases
])
def test_two_column_sort_matches_lax(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**32, n, dtype=np.uint32)
    b = rng.integers(0, 2**32, n, dtype=np.uint32)
    _check((a, b))


def test_three_column_sort_matches_lax():
    rng = np.random.default_rng(7)
    n = 2 * CHUNK + 777
    cols = tuple(rng.integers(0, 2**32, n, dtype=np.uint32)
                 for _ in range(3))
    _check(cols)


def test_many_duplicates_and_pads():
    rng = np.random.default_rng(9)
    n = CHUNK + 123
    a = rng.integers(0, 4, n, dtype=np.uint32)        # heavy duplicates
    b = rng.integers(0, 2**32, n, dtype=np.uint32)
    a[100:200] = 0xFFFFFFFF                            # PAD-like keys
    _check((a, b))


def test_presorted_and_reverse():
    n = CHUNK
    asc = np.arange(n, dtype=np.uint32)
    _check((asc, asc[::-1].copy()))
    _check((asc[::-1].copy(), asc))
