"""Pallas multi-window pair-expansion kernel vs the XLA reference path.

Runs in interpret mode on the CPU mesh so CI exercises the exact kernel
logic that compiles on TPU (tests/conftest.py pins the cpu backend, which
makes the scan's production path the XLA one; here we invoke the kernel
directly, plus force the full scan onto the Pallas path for oracle parity).

The adversarial cases reproduce round-1 VERDICT.md Weak #1 — the shapes
that silently broke the single-window kernel:

  * one descendant run longer than the 4096-id window (a ground plane /
    merged static layer overlapping many small boxes);
  * two runs more than a window apart inside one 1024-pair tile.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from broadphase_tpu import Index64_3D, Index32_2D, layer
from broadphase_tpu import index as bidx
from broadphase_tpu.ops import search
from broadphase_tpu.ops.pallas_expand import TILE, expand_gather
from broadphase_tpu.utils import gen, oracle


def _expand_via_numpy(ids, j, o, valid):
    ids = np.asarray(ids)
    j = np.asarray(j)
    i = j + 1 + np.asarray(o)
    a = np.where(valid, ids[np.clip(i, 0, len(ids) - 1)], 0xFFFFFFFF)
    b = np.where(valid, ids[np.clip(j, 0, len(ids) - 1)], 0xFFFFFFFF)
    return a.astype(np.uint32), b.astype(np.uint32)


def _check(ids, j, o, valid):
    j = jnp.asarray(j, jnp.int32)
    o = jnp.asarray(o, jnp.int32)
    v = jnp.asarray(valid, jnp.bool_)
    a, b = expand_gather(jnp.asarray(ids, jnp.uint32), j, o, v,
                         interpret=True)
    a_want, b_want = _expand_via_numpy(ids, j, o, np.asarray(valid))
    np.testing.assert_array_equal(np.asarray(a), a_want)
    np.testing.assert_array_equal(np.asarray(b), b_want)


def test_single_run_longer_than_window():
    # One run of 8192 pairs: i = j+1+o walks 8192 ids — double the window.
    # Round 1's kernel clamped these and returned 4097 wrong ids.
    cap = 16384
    ids = np.arange(cap, dtype=np.uint32) * 3 + 1
    P = 8 * TILE
    t = np.arange(P)
    total = 8192
    _check(ids, np.zeros(P, np.int32), t, t < total)


def test_sparse_tile_runs_far_apart():
    # Two runs inside ONE tile whose j (and i) are > a window apart.
    # Round 1's kernel returned ids[4095] instead of ids[6000].
    cap = 16384
    ids = np.arange(cap, dtype=np.uint32) * 7 + 5
    P = TILE
    j = np.where(np.arange(P) < 512, 0, 6000).astype(np.int32)
    o = np.where(np.arange(P) < 512, np.arange(P), np.arange(P) - 512)
    _check(ids, j, o.astype(np.int32), np.ones(P, bool))


def test_many_scattered_runs_one_tile():
    # Worst case: every slot in a tile from a different, distant run.
    cap = 1 << 20
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 1 << 31, cap, dtype=np.uint32)
    P = 2 * TILE
    j = np.sort(rng.integers(0, cap - 2, P).astype(np.int32))
    o = rng.integers(0, 1, P).astype(np.int32)
    valid = rng.random(P) < 0.9
    _check(ids, j, o, valid)


def test_all_invalid_tile_emits_pad():
    cap = 4096
    ids = np.arange(cap, dtype=np.uint32)
    P = TILE
    a, b = expand_gather(jnp.asarray(ids), jnp.zeros(P, jnp.int32),
                         jnp.zeros(P, jnp.int32),
                         jnp.zeros(P, jnp.bool_), interpret=True)
    assert np.all(np.asarray(a) == 0xFFFFFFFF)
    assert np.all(np.asarray(b) == 0xFFFFFFFF)


@pytest.mark.parametrize("spec,n,seed", [
    (Index64_3D, 3000, 1),
    (Index64_3D, 500, 7),
    (Index32_2D, 2000, 11),
])
def test_expand_gather_matches_xla_path(spec, n, seed):
    if spec.dim == 3:
        sc = gen.gen_boxes(count=n, density=1.0 / 1000.0, seed=seed)
        smin, smax = sc.system_min, sc.system_max
        bmin, bmax, ids = sc.bounds_min, sc.bounds_max, sc.ids
    else:
        rng = np.random.default_rng(seed)
        smin = np.zeros(2, np.float32)
        smax = np.full(2, 100.0, np.float32)
        bmin = rng.uniform(0, 90, (n, 2)).astype(np.float32)
        bmax = bmin + rng.uniform(0.5, 8, (n, 2)).astype(np.float32)
        ids = np.arange(n, dtype=np.uint32)

    st = layer.build(spec, smin, smax, bmin, bmax, ids)
    keys, ids_arr, count = st.keys, st.ids, st.count
    cap = ids_arr.shape[0]
    dmax = bidx.descendant_max(spec, keys)
    e = jnp.minimum(search.merged_upper_bound(spec, keys, dmax), count)
    j_idx = jnp.arange(cap, dtype=jnp.int32)
    run = jnp.where(j_idx < count, jnp.maximum(e - (j_idx + 1), 0), 0)
    si = jnp.cumsum(run)
    starts = si - run
    total = int(si[cap - 1])
    P = ((32 * n) // TILE + 1) * TILE
    j, o = search.expand_runs(starts, P)
    j = jnp.clip(j, 0, cap - 1)
    o = jnp.maximum(o, 0)
    t = jnp.arange(P, dtype=jnp.int32)

    # XLA reference path
    i = jnp.clip(j + 1 + o, 0, cap - 1)
    a_want = np.asarray(ids_arr)[np.asarray(i)]
    b_want = np.asarray(search.segmented_broadcast(starts, run, ids_arr, P))

    a, b = expand_gather(ids_arr, j, o, t < total, interpret=True)
    mask = np.arange(P) < total
    np.testing.assert_array_equal(np.asarray(a)[mask], a_want[mask])
    np.testing.assert_array_equal(np.asarray(b)[mask], b_want[mask])


def _one_big_box_scene(n_small: int, seed: int):
    """A ground-plane box overlapping n_small small boxes: ONE descendant
    run of length ~n_small — the merged-static-layer shape that broke the
    round-1 kernel."""
    rng = np.random.default_rng(seed)
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 100.0, np.float32)
    bmin = rng.uniform(1, 95, (n_small, 3)).astype(np.float32)
    bmax = bmin + rng.uniform(0.1, 2.0, (n_small, 3)).astype(np.float32)
    big_min = np.array([[0.5, 0.5, 0.5]], np.float32)
    big_max = np.array([[99.0, 99.0, 99.0]], np.float32)
    bmin = np.concatenate([big_min, bmin])
    bmax = np.concatenate([big_max, bmax])
    ids = np.arange(n_small + 1, dtype=np.uint32)
    return smin, smax, bmin, bmax, ids


@pytest.mark.parametrize("n_small", [6000])
def test_full_scan_pallas_path_big_static_box(n_small, monkeypatch):
    """End-to-end scan on the forced (interpret-mode) Pallas path for the
    merged big-static-box scene, pair-for-pair against the oracle."""
    monkeypatch.setenv("BROADPHASE_FORCE_PALLAS", "1")
    smin, smax, bmin, bmax, ids = _one_big_box_scene(n_small, seed=5)
    spec = Index64_3D
    st = layer.build(spec, smin, smax, bmin, bmax, ids)
    # unique pair capacity => fresh jit trace under the forced env var
    pair_cap = 64 * 1024 + 13 * 1024
    st, res = layer.scan(spec, st, pair_cap)
    assert not bool(res.overflow)
    got = layer.scan_result_to_numpy(res)

    keys, ids_np, cnt = layer.tree_to_numpy(spec, st)
    want = oracle.scan(spec, keys, ids_np)
    assert got == want
