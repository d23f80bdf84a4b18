"""Pallas pair-expansion kernel vs a numpy reference of the run semantics.

Runs in interpret mode on the CPU mesh so CI exercises the exact kernel
logic that compiles on TPU (tests/conftest.py pins the cpu backend, which
makes the scan's production path the XLA one; here we invoke the kernel
directly, plus force the full scan onto the Pallas path for oracle parity).

The adversarial cases cover the shapes that broke earlier generations:

  * one descendant run longer than the 4096-id window (a ground plane /
    merged static layer overlapping many small boxes) — round-1 silent bug;
  * two runs more than a window apart inside one 1024-pair tile;
  * long stretches of EMPTY runs between nonempty ones (the v2 kernel
    binary-searches a compacted starts window — empties must vanish);
  * exactly-dense 1-slot runs (1025-entry span = the window bound).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from broadphase_tpu import Index64_3D, Index32_2D, layer
from broadphase_tpu import index as bidx
from broadphase_tpu.ops import search
from broadphase_tpu.ops.pallas_expand import TILE
from broadphase_tpu.ops import pallas_expand, pallas_expand2
from broadphase_tpu.utils import gen, oracle

PAD = np.uint32(0xFFFFFFFF)

# every case runs against BOTH kernel generations: v2 (per-lane binary
# search) stays as the A/B fallback, v3 (ranked-spread placement) is the
# production path
KERNELS = [pytest.param(pallas_expand.expand_pairs, id="v2"),
           pytest.param(pallas_expand2.expand_pairs, id="v3")]


def _reference(ids, run, P):
    """Numpy oracle of the run-expansion semantics."""
    ids = np.asarray(ids)
    a = np.full(P, PAD, np.uint32)
    b = np.full(P, PAD, np.uint32)
    t = 0
    for j, r in enumerate(np.asarray(run)):
        for off in range(int(r)):
            if t < P:
                a[t] = ids[j + 1 + off]
                b[t] = ids[j]
            t += 1
    return a, b, min(t, P)


def _check(expand_pairs, ids, run, P):
    run = np.asarray(run, np.int32)
    cap = len(np.asarray(ids))
    assert len(run) == cap
    starts = np.cumsum(run) - run
    total = int(run.sum())
    a, b = expand_pairs(jnp.asarray(ids, jnp.uint32),
                        jnp.asarray(starts, jnp.int32),
                        jnp.asarray(run, jnp.int32),
                        jnp.int32(total), P, interpret=True)
    a_want, b_want, _ = _reference(ids, run, P)
    np.testing.assert_array_equal(np.asarray(a), a_want)
    np.testing.assert_array_equal(np.asarray(b), b_want)


@pytest.mark.parametrize("expand_pairs", KERNELS)
def test_single_run_longer_than_window(expand_pairs):
    # One run of 8192 pairs: i = j+1+o walks 8192 ids — double the id
    # window.  Round 1's kernel clamped these and returned wrong ids.
    cap = 16384
    ids = np.arange(cap, dtype=np.uint32) * 3 + 1
    run = np.zeros(cap, np.int32)
    run[0] = 8192
    _check(expand_pairs, ids, run, 8 * TILE)


@pytest.mark.parametrize("expand_pairs", KERNELS)
def test_sparse_tile_runs_far_apart(expand_pairs):
    # Two runs inside ONE tile whose elements are > an id window apart,
    # with 5999 empty runs between them in the starts array.
    cap = 16384
    ids = np.arange(cap, dtype=np.uint32) * 7 + 5
    run = np.zeros(cap, np.int32)
    run[0] = 512
    run[6000] = 512
    _check(expand_pairs, ids, run, TILE)


@pytest.mark.parametrize("expand_pairs", KERNELS)
def test_massive_empty_stretch(expand_pairs):
    # The covering-run window is over COMPACTED starts: a million-element
    # gap of empty runs must not displace the window.
    cap = 1 << 17
    ids = np.arange(cap, dtype=np.uint32)
    run = np.zeros(cap, np.int32)
    run[3] = 7
    run[cap - 2] = 1
    _check(expand_pairs, ids, run, TILE)


@pytest.mark.parametrize("expand_pairs", KERNELS)
def test_exactly_dense_single_slot_runs(expand_pairs):
    # Every slot from a different run: a tile spans 1024 consecutive
    # nonempty entries (+1 covering) = the 2048-window sufficiency bound,
    # with alignment pushing the base up to 1023 entries below j0.
    cap = 8192
    ids = np.arange(cap, dtype=np.uint32) * 5 + 2
    run = np.zeros(cap, np.int32)
    run[: cap // 2] = 1          # 4096 one-slot runs -> 4 full tiles
    _check(expand_pairs, ids, run, 4 * TILE)


@pytest.mark.parametrize("expand_pairs", KERNELS)
def test_mixed_run_lengths_random(expand_pairs):
    rng = np.random.default_rng(3)
    cap = 1 << 15
    ids = rng.integers(0, 1 << 31, cap, dtype=np.uint32)
    run = np.zeros(cap, np.int32)
    chosen = rng.choice(cap - 64, 500, replace=False)
    run[chosen] = rng.integers(1, 48, 500)
    # clamp runs so j + 1 + off stays in range
    for j in np.nonzero(run)[0]:
        run[j] = min(run[j], cap - 1 - j)
    _check(expand_pairs, ids, run, ((int(run.sum()) // TILE) + 2) * TILE)


@pytest.mark.parametrize("idw_rows", [8, 16])
def test_narrow_id_window(idw_rows):
    """v3 with a narrow a-side id window must still resolve every slot
    (multi-window guaranteed-progress loop) — including runs far longer
    than the window and runs whose ids sit behind the speculative base."""
    rng = np.random.default_rng(7)
    cap = 1 << 14
    ids = rng.integers(0, 1 << 31, cap, dtype=np.uint32)
    run = np.zeros(cap, np.int32)
    run[5] = 9000                         # one run >> window (1024/2048)
    chosen = rng.choice(np.arange(6, cap - 64), 300, replace=False)
    run[chosen] = rng.integers(1, 40, 300)
    for j in np.nonzero(run)[0]:
        run[j] = min(run[j], cap - 1 - j)
    starts = np.cumsum(run) - run
    total = int(run.sum())
    P = ((total // TILE) + 2) * TILE
    from broadphase_tpu.ops.pallas_compact import stream_compact
    j32 = np.arange(cap, dtype=np.int32)
    (sv, ab, bid), _ = stream_compact(
        jnp.asarray(run > 0),
        (jnp.asarray(starts, np.int32), jnp.asarray(j32 + 1 - starts),
         jnp.asarray(ids)),
        fills=(0x7FFF_FFFF, 0, PAD), interpret=True)
    a, b = pallas_expand2.expand_pairs_prepped(
        jnp.asarray(ids, jnp.uint32), sv.astype(jnp.int32),
        ab.astype(jnp.int32), bid, jnp.int32(total), P,
        idw_rows=idw_rows, interpret=True)
    a_want, b_want, _ = _reference(ids, run, P)
    np.testing.assert_array_equal(np.asarray(a), a_want)
    np.testing.assert_array_equal(np.asarray(b), b_want)


@pytest.mark.parametrize("expand_pairs", KERNELS)
def test_total_mid_tile_and_dead_tail(expand_pairs):
    cap = 4096
    ids = np.arange(cap, dtype=np.uint32)
    run = np.zeros(cap, np.int32)
    run[10] = 700                 # total = 700: tile 0 half dead, tile 1+ dead
    _check(expand_pairs, ids, run, 4 * TILE)


@pytest.mark.parametrize("expand_pairs", KERNELS)
def test_all_empty_emits_pad(expand_pairs):
    cap = 4096
    ids = np.arange(cap, dtype=np.uint32)
    a, b = expand_pairs(jnp.asarray(ids), jnp.zeros(cap, jnp.int32),
                        jnp.zeros(cap, jnp.int32), jnp.int32(0), TILE,
                        interpret=True)
    assert np.all(np.asarray(a) == PAD)
    assert np.all(np.asarray(b) == PAD)


@pytest.mark.parametrize("expand_pairs", KERNELS)
@pytest.mark.parametrize("spec,n,seed", [
    (Index64_3D, 3000, 1),
    (Index64_3D, 500, 7),
    (Index32_2D, 2000, 11),
])
def test_expand_pairs_matches_xla_path(expand_pairs, spec, n, seed):
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
    e = search.descendant_run_ends(spec, keys, bidx.depth_of(spec, keys))
    e = jnp.minimum(e, count)
    j_idx = jnp.arange(cap, dtype=jnp.int32)
    run = jnp.where(j_idx < count, jnp.maximum(e - (j_idx + 1), 0), 0)
    si = jnp.cumsum(run)
    starts = si - run
    total = si[cap - 1]
    P = ((32 * n) // TILE + 1) * TILE

    # XLA reference path
    j, o = search.expand_runs(starts, P)
    j = jnp.clip(j, 0, cap - 1)
    o = jnp.maximum(o, 0)
    i = jnp.clip(j + 1 + o, 0, cap - 1)
    a_want = np.asarray(ids_arr)[np.asarray(i)]
    b_want = np.asarray(search.segmented_broadcast(starts, run, ids_arr, P))

    a, b = expand_pairs(ids_arr, starts, run, total, P, interpret=True)
    mask = np.arange(P) < int(total)
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
