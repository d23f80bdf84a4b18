"""Layer engine parity: device extend/sort/scan vs the sequential oracle.

This reproduces the reference's golden-file test trio
(tests/test_layer.rs:25-124) with regenerated scenes: the oracle plays the
role of the missing LFS fixtures (SURVEY.md §4).
"""

import numpy as np
import pytest

from broadphase_tpu import index as bidx
from broadphase_tpu import layer as blayer
from broadphase_tpu.index import Index32_2D, Index64_2D, Index64_3D
from broadphase_tpu.utils import oracle


def random_scene(dim, n, seed=0, density=0.001, smin=1.0, smax=10.0):
    """Uniform boxes in a cube sized for the given density (analog of the
    reference's gen_boxes, utils/src/gen_test_data.rs:100-155)."""
    rng = np.random.default_rng(seed)
    volume = n / density
    L = volume ** (1.0 / dim) + (smin + smax) / 2
    sys_min = np.zeros(dim, np.float32)
    sys_max = np.full(dim, L, np.float32)
    size = rng.uniform(smin, smax, size=(n, dim)).astype(np.float32)
    bmin = (rng.uniform(0, 1, size=(n, dim)).astype(np.float32)
            * (sys_max - size - sys_min) + sys_min).astype(np.float32)
    bmax = bmin + size
    ids = np.arange(n, dtype=np.uint32)
    return sys_min, sys_max, bmin, bmax, ids


CASES = [
    (Index64_3D, 3, 500, 0),
    (Index64_3D, 3, 2000, 1),
    (Index32_2D, 2, 500, 2),
    (Index64_2D, 2, 500, 3),
    (Index64_3D, 3, 500, 4),
]


@pytest.mark.parametrize("spec,dim,n,seed", CASES,
                         ids=lambda c: getattr(c, "name", str(c)))
def test_extend_sort_scan_parity(spec, dim, n, seed):
    sys_min, sys_max, bmin, bmax, ids = random_scene(dim, n, seed)

    # --- oracle
    okeys, oids, oinvalid = oracle.extend(spec, sys_min, sys_max,
                                          bmin, bmax, ids, min_depth=0)
    skeys, sids = oracle.sort_tree(okeys, oids)
    opairs = oracle.scan(spec, skeys, sids)

    # --- device
    state = blayer.make_layer(spec, capacity=n * spec.fanout)
    state = blayer.extend(spec, state, sys_min, sys_max, bmin, bmax, ids)
    assert not bool(state.overflow)
    assert int(state.invalid_count) == len(oinvalid)

    # extend parity: unsorted tree equals oracle append order exactly
    dkeys, dids, dcount = blayer.tree_to_numpy(spec, state)
    assert dcount == len(okeys)
    np.testing.assert_array_equal(dkeys, np.array(okeys, dtype=np.uint64))
    np.testing.assert_array_equal(dids, np.array(oids, dtype=np.uint32))

    # sort parity: full (key, id) tuple order
    state = blayer.sort(spec, state)
    dkeys, dids, _ = blayer.tree_to_numpy(spec, state)
    np.testing.assert_array_equal(dkeys, np.array(skeys, dtype=np.uint64))
    np.testing.assert_array_equal(dids, np.array(sids, dtype=np.uint32))

    # scan parity: sorted + deduped (later, earlier) pairs, bit-identical
    state, result = blayer.scan(spec, state, pair_capacity=max(64, n * 32))
    assert not bool(result.overflow)
    dpairs = blayer.scan_result_to_numpy(result)
    assert dpairs == opairs

    # sanity: candidates are a superset of true f32 AABB overlaps
    brute = oracle.brute_force_pairs(bmin, bmax, ids)
    got_unordered = {(min(a, b), max(a, b)) for a, b in dpairs}
    missing = brute - got_unordered
    assert not missing, f"missed {len(missing)} true overlap pairs"


@pytest.mark.parametrize("id_offset", [
    np.uint32(0x8000_0000),          # big ids: flat 2-key sort branch
    np.uint32(0xFFFFF - 400),        # straddles the 2^20-1 packing bound
])
def test_scan_parity_wide_ids(id_offset):
    """canonical_pairs packs (a, b) into (u32, u8) keys only when both ids
    are < 2^20 - 1 (checked at runtime); ids above or straddling the bound
    must take the flat branch and still match the oracle bit-for-bit."""
    spec = Index64_3D
    sys_min, sys_max, bmin, bmax, ids = random_scene(3, 400, seed=6)
    ids = (ids + id_offset).astype(np.uint32)

    okeys, oids, _ = oracle.extend(spec, sys_min, sys_max, bmin, bmax, ids)
    skeys, sids = oracle.sort_tree(okeys, oids)
    opairs = oracle.scan(spec, skeys, sids)

    state = blayer.build(spec, sys_min, sys_max, bmin, bmax, ids)
    state, result = blayer.scan(spec, state, pair_capacity=400 * 32)
    assert not bool(result.overflow)
    assert blayer.scan_result_to_numpy(result) == opairs


def test_scan_filtered():
    spec = Index64_3D
    sys_min, sys_max, bmin, bmax, ids = random_scene(3, 500, seed=5)

    def filt_py(a, b):
        return (a + b) % 3 == 0

    okeys, oids, _ = oracle.extend(spec, sys_min, sys_max, bmin, bmax, ids)
    skeys, sids = oracle.sort_tree(okeys, oids)
    opairs = oracle.scan(spec, skeys, sids,
                         filter_fn=lambda a, b: (a + b) % 3 == 0)

    state = blayer.make_layer(spec, capacity=500 * 8)
    state = blayer.extend(spec, state, sys_min, sys_max, bmin, bmax, ids)

    def filt_dev(a, b):
        return (a + b) % 3 == 0

    state, result = blayer.scan_filtered(spec, state, 16384, filt_dev)
    assert blayer.scan_result_to_numpy(result) == opairs


def test_merge_and_clear():
    spec = Index64_3D
    sys_min, sys_max, bmin, bmax, ids = random_scene(3, 300, seed=6)
    half = 150

    # one layer built in two halves via merge == one layer built at once
    a = blayer.make_layer(spec, capacity=300 * 8)
    a = blayer.extend(spec, a, sys_min, sys_max,
                      bmin[:half], bmax[:half], ids[:half])
    b = blayer.make_layer(spec, capacity=150 * 8)
    b = blayer.extend(spec, b, sys_min, sys_max,
                      bmin[half:], bmax[half:], ids[half:])
    merged = blayer.merge(spec, a, b)

    whole = blayer.make_layer(spec, capacity=300 * 8)
    whole = blayer.extend(spec, whole, sys_min, sys_max, bmin, bmax, ids)

    merged = blayer.sort(spec, merged)
    whole = blayer.sort(spec, whole)
    mk, mi, mc = blayer.tree_to_numpy(spec, merged)
    wk, wi, wc = blayer.tree_to_numpy(spec, whole)
    assert mc == wc
    np.testing.assert_array_equal(mk, wk)
    np.testing.assert_array_equal(mi, wi)

    _, rm = blayer.scan(spec, merged, 16384)
    _, rw = blayer.scan(spec, whole, 16384)
    assert blayer.scan_result_to_numpy(rm) == blayer.scan_result_to_numpy(rw)

    # clear resets
    cleared = blayer.clear(merged)
    assert int(cleared.count) == 0 and bool(cleared.sorted)
    _, rc = blayer.scan(spec, cleared, 64)
    assert int(rc.count) == 0


def test_sorted_merge_fast_path():
    """Merging two BUILT (sorted) layers takes the scatter-free sorted
    merge: result is already sorted and equals the build-at-once tree."""
    spec = Index64_3D
    sys_min, sys_max, bmin, bmax, ids = random_scene(3, 300, seed=8)
    half = 150
    a = blayer.build(spec, sys_min, sys_max, bmin[:half], bmax[:half],
                     ids[:half], out_capacity=300 * 8)
    b = blayer.build(spec, sys_min, sys_max, bmin[half:], bmax[half:],
                     ids[half:], out_capacity=150 * 8)
    merged = blayer.merge(spec, a, b)
    assert bool(merged.sorted)

    whole = blayer.build(spec, sys_min, sys_max, bmin, bmax, ids,
                         out_capacity=300 * 8)
    mk, mi, mc = blayer.tree_to_numpy(spec, merged)
    wk, wi, wc = blayer.tree_to_numpy(spec, whole)
    assert mc == wc
    np.testing.assert_array_equal(mk, wk)
    np.testing.assert_array_equal(mi, wi)

    _, rm = blayer.scan(spec, merged, 16384)
    _, rw = blayer.scan(spec, whole, 16384)
    assert blayer.scan_result_to_numpy(rm) == blayer.scan_result_to_numpy(rw)

    # the static-merge production config: split emit/pair capacities over
    # a merged tree — aux must have survived the merge for the tight pair
    # budget to hold exactly the unique pairs
    np.testing.assert_array_equal(
        np.asarray(merged.aux)[:mc], np.asarray(whole.aux)[:wc])
    _, rm2 = blayer.scan(spec, merged, 8192, emit_capacity=32768)
    assert not bool(rm2.overflow)
    assert blayer.scan_result_to_numpy(rm2) == \
        blayer.scan_result_to_numpy(rw)


def test_min_depth_parity():
    """min_depth forces deeper cells (more slots); parity with oracle using
    a slots_per_axis wide enough to avoid overflow."""
    spec = Index64_3D
    sys_min, sys_max, bmin, bmax, ids = random_scene(3, 200, seed=7)

    min_depth = 4
    okeys, oids, _ = oracle.extend(spec, sys_min, sys_max, bmin, bmax, ids,
                                   min_depth=min_depth)
    skeys, sids = oracle.sort_tree(okeys, oids)
    opairs = oracle.scan(spec, skeys, sids)

    state = blayer.make_layer(spec, capacity=len(okeys) + 64,
                              min_depth=min_depth)
    state = blayer.extend(spec, state, sys_min, sys_max, bmin, bmax, ids,
                          slots_per_axis=4)
    assert not bool(state.overflow)
    dkeys, dids, dcount = blayer.tree_to_numpy(spec, state)
    assert dcount == len(okeys)
    np.testing.assert_array_equal(dkeys, np.array(okeys, dtype=np.uint64))
    np.testing.assert_array_equal(dids, np.array(oids, dtype=np.uint32))

    state, result = blayer.scan(spec, state, 65536)
    assert blayer.scan_result_to_numpy(result) == opairs


def test_pair_capacity_overflow_flag():
    spec = Index64_3D
    sys_min, sys_max, bmin, bmax, ids = random_scene(3, 500, seed=8)
    state = blayer.make_layer(spec, capacity=500 * 8)
    state = blayer.extend(spec, state, sys_min, sys_max, bmin, bmax, ids)
    _, big = blayer.scan(spec, state, 16384)
    n_pairs = int(big.count)
    assert n_pairs > 4
    _, small = blayer.scan(spec, state, 4)
    assert bool(small.overflow)


@pytest.mark.parametrize("spec", [Index64_2D, Index64_3D],
                         ids=lambda s: s.name)
@pytest.mark.parametrize("dmax_kind", ["shallow", "boundary", "deep"])
def test_sort_now_tier2_packing(spec, dmax_kind):
    """The depth-aware two-column packed sort (layer._sort_now tier 2)
    must match a numpy (key, id) lexsort exactly: shallow scenes take the
    packed branch, depths just past the gate fall back to three columns,
    and both orders (and the aux payload) must be identical."""
    import jax.numpy as jnp

    dim = spec.dim
    ds = spec.origin_shift
    gate = (63 - (20 + dim) - ds) // dim      # dmax bound of the gate
    dmax = {"shallow": max(gate - 2, 1), "boundary": gate,
            "deep": min(gate + 1, spec.axis_bits)}[dmax_kind]
    rng = np.random.default_rng(dmax * 7 + dim)
    n = 1500
    cap = 2048
    depths = rng.integers(0, dmax + 1, n)
    origins = [rng.integers(0, 1 << 30, n).astype(np.uint32)
               for _ in range(dim)]
    keys_np = np.zeros(n, np.uint64)
    for i in range(n):
        d = int(depths[i])
        # truncate each axis coordinate to a depth-d boundary (low
        # axis_bits - d bits zero), as the grid walk guarantees
        ax = [(int(origins[k][i]) % (1 << spec.axis_bits))
              >> (spec.axis_bits - d) << (spec.axis_bits - d)
              for k in range(dim)]
        morton = 0
        for b in range(spec.axis_bits):
            for k in range(dim):
                morton |= ((ax[k] >> b) & 1) << (b * dim + k)
        keys_np[i] = np.uint64((morton << ds) | d)
    ids_np = rng.permutation(n).astype(np.uint32)
    aux_np = rng.integers(0, 1 << dim, n).astype(np.uint32)

    # pad to capacity
    pad = cap - n
    keys_full = np.concatenate([keys_np, np.full(pad, (1 << 64) - 1,
                                                 np.uint64)])
    ids_full = np.concatenate([ids_np, np.full(pad, 0xFFFF_FFFF,
                                               np.uint32)])
    aux_full = np.concatenate([aux_np, np.zeros(pad, np.uint32)])

    keys = bidx.keys_from_numpy(spec, keys_full)
    skeys, sids, saux = blayer._sort_now(
        spec, keys, jnp.asarray(ids_full), jnp.asarray(aux_full))

    order = np.lexsort((ids_np, keys_np))
    want_keys = keys_np[order]
    want_ids = ids_np[order]
    want_aux = aux_np[order]
    got_keys = np.asarray(bidx.keys_to_numpy(spec, skeys))[:n]
    np.testing.assert_array_equal(got_keys, want_keys)
    np.testing.assert_array_equal(np.asarray(sids)[:n], want_ids)
    np.testing.assert_array_equal(np.asarray(saux)[:n], want_aux)
    assert np.all(np.asarray(sids)[n:] == 0xFFFF_FFFF)


def test_scene_layer_restore_reconstructs_aux():
    """layer_from_scene_layer rebuilds the emit-once aux bits (BR_SCENE
    predates the field): bit-equal to the build-time aux for a normal
    tree, zero (safe keep-all) for groups that are not one full block."""
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = random_scene(spec.dim, 400, seed=21)
    st = blayer.build(spec, smin, smax, bmin, bmax, ids,
                      out_capacity=8 * 400)
    sl = blayer.layer_to_scene_layer(spec, st)
    st2 = blayer.layer_from_scene_layer(spec, sl, capacity=8 * 400)
    cnt = int(st.count)
    assert int(st2.count) == cnt
    np.testing.assert_array_equal(np.asarray(st.aux)[:cnt],
                                  np.asarray(st2.aux)[:cnt])
    # end-to-end: the restored layer scans with the tight (unique-pairs)
    # capacity contract and matches the original pair list exactly
    st, res = blayer.scan(spec, st, 24 * 400, emit_capacity=64 * 400)
    st2, res2 = blayer.scan(spec, st2, 24 * 400, emit_capacity=64 * 400)
    assert int(res2.count) == int(res.count)
    np.testing.assert_array_equal(np.asarray(res.pairs_a),
                                  np.asarray(res2.pairs_a))

    # not-one-block group (same id twice, disjoint cells): aux falls back
    # to zero for that id, scan stays exact vs the oracle
    from broadphase_tpu.utils.scene import SceneLayer
    dup_ids = np.array([7, 7], np.uint32)
    k1, i1, c1 = blayer.tree_to_numpy(spec, st)
    # take two well-separated cells of different objects, relabel both 7
    pos_a, pos_b = 0, c1 - 1
    keys_np = np.array([k1[pos_a], k1[pos_b]], k1.dtype)
    sl2 = SceneLayer(min_depth=0, keys=keys_np, ids=dup_ids, sorted=False)
    st3 = blayer.layer_from_scene_layer(spec, sl2, capacity=16)
    np.testing.assert_array_equal(np.asarray(st3.aux)[:2],
                                  np.zeros(2, np.uint32))


@pytest.mark.parametrize("spec,dim", [(Index64_3D, 3), (Index32_2D, 2)])
def test_scan_canonical_false_same_unique_set(spec, dim):
    """scan(..., canonical=False) skips the sort post-pass but must return
    the SAME pair set, duplicate-free (the emit-once rule guarantees
    uniqueness for narrow unique-id layers; VERDICT round 3 #1c)."""
    sys_min, sys_max, bmin, bmax, ids = random_scene(dim, 1500, seed=7)
    st = blayer.build(spec, sys_min, sys_max, bmin, bmax, ids,
                      out_capacity=4 * 1500)
    st, res_c = blayer.scan(spec, st, 16 * 1500, emit_capacity=32 * 1500)
    st, res_u = blayer.scan(spec, st, 16 * 1500, emit_capacity=32 * 1500,
                            canonical=False)
    assert not bool(res_c.overflow) and not bool(res_u.overflow)
    nc, nu = int(res_c.count), int(res_u.count)
    pairs_c = set(blayer.scan_result_to_numpy(res_c))
    pairs_u_list = blayer.scan_result_to_numpy(res_u)
    pairs_u = set(pairs_u_list)
    assert nc == nu == len(pairs_u)       # no duplicates survived
    assert pairs_c == pairs_u             # same set, order-free
    # pads stay PAD beyond count
    assert np.all(np.asarray(res_u.pairs_a, np.uint32)[nu:] == 0xFFFF_FFFF)
