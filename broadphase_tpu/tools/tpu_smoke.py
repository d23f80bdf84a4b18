"""Compiled-kernel smoke suite for the REAL TPU (pre-bench gate).

CI (tests/) runs every Pallas kernel in interpret mode on a CPU mesh, which
exercises the kernel *logic* but not Mosaic's compiled semantics (i1
selects, (1,1) broadcasts, roll constraints, DMA alignment...).  This suite
re-runs the adversarial kernel regressions COMPILED on the actual chip
(VERDICT round 2, next-round item #4):

  * the pair-expansion shapes that broke earlier kernel generations
    (mirrors tests/test_pallas_expand.py:61-101);
  * the degenerate all-one-cell scene (O(n^2) pairs in one run);
  * stream-compaction parity, including unaligned lengths;
  * run-ends (adjacent-LCA suffix-min kernel) parity vs the XLA path;
  * a 30k generated scene scanned on device vs the C++ sequential oracle,
    pair-for-pair;
  * the round-4 engines compiled: bitonic_merge vs lax.sort, the
    temporal-coherence update() vs a from-scratch build (bit-identical
    trees), and the sublinear single-query engine vs the linear replay.

Run:  python -u -m broadphase_tpu.tools.tpu_smoke
Exit status 0 = all green.  Shapes are stable so reruns hit .jax_cache.
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "..", "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp

_FAILED = []


def _case(name):
    def deco(fn):
        fn._smoke_name = name
        _CASES.append(fn)
        return fn
    return deco


_CASES = []


def _expand_reference(ids, run, P):
    """Numpy oracle of the run-expansion semantics (same as the CI test)."""
    PAD = np.uint32(0xFFFFFFFF)
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
    return a, b


def _check_expand(ids, run, P):
    # production expansion kernel (v3, ranked-spread placement)
    from ..ops.pallas_expand2 import expand_pairs

    run = np.asarray(run, np.int32)
    starts = np.cumsum(run) - run
    total = int(run.sum())
    a, b = expand_pairs(jnp.asarray(ids, jnp.uint32),
                        jnp.asarray(starts, jnp.int32),
                        jnp.asarray(run, jnp.int32),
                        jnp.int32(total), P, interpret=False)
    a_want, b_want = _expand_reference(ids, run, P)
    np.testing.assert_array_equal(np.asarray(a), a_want)
    np.testing.assert_array_equal(np.asarray(b), b_want)


@_case("expand: run longer than id window")
def smoke_expand_long_run():
    cap = 16384
    ids = np.arange(cap, dtype=np.uint32) * 3 + 1
    run = np.zeros(cap, np.int32)
    run[0] = 8192
    _check_expand(ids, run, 8 * 1024)


@_case("expand: sparse runs far apart in one tile")
def smoke_expand_sparse():
    cap = 16384
    ids = np.arange(cap, dtype=np.uint32) * 7 + 5
    run = np.zeros(cap, np.int32)
    run[0] = 512
    run[6000] = 512
    _check_expand(ids, run, 1024)


@_case("expand: massive empty stretch")
def smoke_expand_empty_stretch():
    cap = 1 << 17
    ids = np.arange(cap, dtype=np.uint32)
    run = np.zeros(cap, np.int32)
    run[3] = 7
    run[cap - 2] = 1
    _check_expand(ids, run, 1024)


@_case("expand: exactly-dense one-slot runs")
def smoke_expand_dense():
    cap = 8192
    ids = np.arange(cap, dtype=np.uint32) * 5 + 2
    run = np.zeros(cap, np.int32)
    run[: cap // 2] = 1
    _check_expand(ids, run, 4 * 1024)


@_case("prep_runs: fused prefix-sum+compaction vs numpy")
def smoke_prep_runs():
    from ..ops.pallas_prep import _HUGE, prep_runs

    rng = np.random.default_rng(11)
    cap = 100_000                         # NOT tile-aligned
    count = 90_000
    ids = rng.integers(0, 1 << 32, cap, dtype=np.uint32)
    e = (np.arange(cap) + rng.integers(0, 50, cap)).astype(np.int32)
    em = np.minimum(e, count)
    pos = np.arange(cap)
    run = np.where(pos < count, np.maximum(em - pos - 1, 0), 0)
    starts = np.cumsum(run) - run
    nz = np.nonzero(run)[0]

    sv, ab, bid, m, total, wrapped = prep_runs(
        jnp.asarray(e), jnp.asarray(ids), jnp.int32(count),
        interpret=False)
    m = int(m)
    assert m == len(nz) and int(total) == int(run.sum())
    assert not bool(wrapped)
    np.testing.assert_array_equal(np.asarray(sv)[:m],
                                  starts[nz].astype(np.int32))
    np.testing.assert_array_equal(np.asarray(ab)[:m],
                                  (nz + 1 - starts[nz]).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(bid)[:m], ids[nz])
    assert np.all(np.asarray(sv)[m:] == _HUGE)


@_case("build: fused emission kernel vs XLA emit path")
def smoke_build_fused():
    from ..index import Index64_3D, Index32_2D
    from .. import layer
    from ..utils import gen
    import jax.numpy as jnp

    sc = gen.gen_boxes(count=20_000, density=1.0 / 1000.0, seed=4)
    fused = layer.build.__wrapped__(Index64_3D, sc.system_min, sc.system_max,
                                    sc.bounds_min, sc.bounds_max, sc.ids,
                                    2, 0, 4 * 20_000)
    os.environ["BROADPHASE_NO_PALLAS"] = "1"
    try:
        xla = layer.build.__wrapped__(Index64_3D, sc.system_min,
                                      sc.system_max, sc.bounds_min,
                                      sc.bounds_max, sc.ids, 2, 0,
                                      4 * 20_000)
    finally:
        del os.environ["BROADPHASE_NO_PALLAS"]
    assert int(fused.count) == int(xla.count)
    kf, idf, _ = layer.tree_to_numpy(Index64_3D, fused)
    kx, idx_, _ = layer.tree_to_numpy(Index64_3D, xla)
    assert np.array_equal(kf, kx) and np.array_equal(idf, idx_)


@_case("stream_compact: parity incl. unaligned length")
def smoke_stream_compact():
    from ..ops.pallas_compact import stream_compact

    rng = np.random.default_rng(0)
    for n, tr in ((4096, 0), (100_000, 0), (100_000, 128)):
        # 100_000 is NOT tile-aligned; tr=128 is the auto big-input tile
        keep = rng.random(n) < 0.37
        c0 = rng.integers(0, 1 << 32, n, dtype=np.uint32)
        c1 = rng.integers(0, 1 << 32, n, dtype=np.uint32)
        (o0, o1), cnt = stream_compact(jnp.asarray(keep),
                                       (jnp.asarray(c0), jnp.asarray(c1)),
                                       tile_rows=tr, interpret=False)
        k = int(keep.sum())
        assert int(cnt) == k, (int(cnt), k)
        np.testing.assert_array_equal(np.asarray(o0)[:k], c0[keep])
        np.testing.assert_array_equal(np.asarray(o1)[:k], c1[keep])
        assert np.all(np.asarray(o0)[k:] == 0xFFFFFFFF)


@_case("run_ends: Pallas kernel vs XLA formulation")
def smoke_run_ends():
    from .. import index as bidx
    from ..index import Index64_3D
    from ..ops import search
    from ..utils import gen

    spec = Index64_3D
    sc = gen.gen_boxes(count=20_000, density=1.0 / 1000.0, seed=3)
    from .. import layer
    st = layer.build(spec, sc.system_min, sc.system_max,
                     sc.bounds_min, sc.bounds_max, sc.ids)
    depth = bidx.depth_of(spec, st.keys)

    e_pallas = jax.jit(
        lambda k, d: search.descendant_run_ends(spec, k, d))(st.keys, depth)

    os.environ["BROADPHASE_NO_PALLAS"] = "1"
    try:
        e_xla = jax.jit(
            lambda k, d: search.descendant_run_ends(spec, k, d),
            # fresh trace under the flipped env var
            static_argnums=())(st.keys, depth)
    finally:
        del os.environ["BROADPHASE_NO_PALLAS"]
    np.testing.assert_array_equal(np.asarray(e_pallas), np.asarray(e_xla))

    # big-input auto tile (128 rows): same result from the compiled kernel
    from ..ops.pallas_runends import run_ends
    lca = search.adjacent_lca_depth(spec, st.keys)
    e_big = run_ends(lca, depth.astype(jnp.int32), spec.axis_bits + 1,
                     tile_rows=128, interpret=False)
    np.testing.assert_array_equal(np.asarray(e_big), np.asarray(e_xla))


@_case("prep_runs: 128-row tile vs default, compiled")
def smoke_prep_big_tiles():
    from ..ops.pallas_prep import prep_runs

    rng = np.random.default_rng(17)
    cap = 50_000                        # several 16384 tiles + partial tail
    count = 47_311
    ids = rng.integers(0, 1 << 32, cap, dtype=np.uint32)
    e = (np.arange(cap) + rng.integers(0, 60, cap)).astype(np.int32)
    e[12_000:15_000] = 40_000           # long runs crossing tile bounds
    outs = [prep_runs(jnp.asarray(e), jnp.asarray(ids), jnp.int32(count),
                      tile_rows=tr, interpret=False) for tr in (32, 128)]
    (sv0, ab0, bid0, m0, t0, w0), (sv1, ab1, bid1, m1, t1, w1) = outs
    assert int(m0) == int(m1) and int(t0) == int(t1)
    assert not (bool(w0) or bool(w1))
    m = int(m0)
    np.testing.assert_array_equal(np.asarray(sv0)[:m], np.asarray(sv1)[:m])
    np.testing.assert_array_equal(np.asarray(ab0)[:m], np.asarray(ab1)[:m])
    np.testing.assert_array_equal(np.asarray(bid0)[:m],
                                  np.asarray(bid1)[:m])


@_case("expand: narrow id window (idw_rows=16), compiled")
def smoke_expand_narrow_window():
    """The multi-window resolve loop, pl.multiple_of alignment, and the
    windowed DMA are compiled-only behaviors; exercise a non-default
    window size end-to-end through layer.scan before any on-chip sweep
    trusts BROADPHASE_IDW_ROWS."""
    from ..index import Index64_3D
    from .. import layer
    from ..utils import gen, oracle

    spec = Index64_3D
    sc = gen.gen_boxes(count=5_000, density=1.0 / 1000.0, seed=5)
    st = layer.build(spec, sc.system_min, sc.system_max,
                     sc.bounds_min, sc.bounds_max, sc.ids)
    os.environ["BROADPHASE_IDW_ROWS"] = "16"
    try:
        st, res = layer.scan(spec, st, 16 * 5_000, emit_capacity=32 * 5_000)
    finally:
        del os.environ["BROADPHASE_IDW_ROWS"]
    assert not bool(res.overflow)
    got = layer.scan_result_to_numpy(res)
    keys, tids, _ = layer.tree_to_numpy(spec, st)
    want = oracle.scan(spec, keys, tids)
    assert got == want, (len(got), len(want))


@_case("scan: degenerate all-one-cell scene")
def smoke_degenerate_one_cell():
    from ..index import Index64_3D
    from .. import layer
    from ..utils import oracle

    spec = Index64_3D
    n = 192                              # 192*191/2 = 18336 pairs, one run
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 1000.0, np.float32)
    rng = np.random.default_rng(9)
    bmin = rng.uniform(400.0, 401.0, (n, 3)).astype(np.float32)
    bmax = bmin + np.float32(0.5)
    ids = np.arange(n, dtype=np.uint32)
    st = layer.build(spec, smin, smax, bmin, bmax, ids)
    st, res = layer.scan(spec, st, 64 * 1024)
    assert not bool(res.overflow)
    got = layer.scan_result_to_numpy(res)
    keys, ids_np, _ = layer.tree_to_numpy(spec, st)
    want = oracle.scan(spec, keys, ids_np)
    assert got == want, (len(got), len(want))


@_case("scan: 30k generated scene vs C++ sequential oracle")
def smoke_scan_vs_native():
    from ..index import Index64_3D
    from .. import layer
    from ..utils import gen, native

    spec = Index64_3D
    n = 30_000
    sc = gen.gen_boxes(count=n, density=1.0 / 1000.0, seed=0)
    st = layer.build(spec, sc.system_min, sc.system_max,
                     sc.bounds_min, sc.bounds_max, sc.ids,
                     out_capacity=4 * n)
    st, res = layer.scan(spec, st, 16 * n)
    assert not bool(res.overflow)
    cnt = int(res.count)
    got = np.stack([np.asarray(res.pairs_a, np.uint32)[:cnt],
                    np.asarray(res.pairs_b, np.uint32)[:cnt]], axis=1)
    keys_np, ids_np, _ = layer.tree_to_numpy(spec, st)
    want = native.scan_seq(keys_np, ids_np, pair_slack=32)
    assert got.shape == want.shape and np.array_equal(got, want), (
        got.shape, want.shape)


@_case("scan: emit-once split capacities (pair_cap < emissions)")
def smoke_scan_emit_once_split():
    # the production bench configuration: the pair buffer holds only
    # UNIQUE pairs (10n) while emissions use 16n — exact iff the kernel's
    # emit-once rule keeps every candidate pair exactly once COMPILED
    from ..index import Index64_3D
    from .. import layer
    from ..utils import gen, native

    spec = Index64_3D
    n = 30_000
    sc = gen.gen_boxes(count=n, density=1.0 / 1000.0, seed=0)
    st = layer.build(spec, sc.system_min, sc.system_max,
                     sc.bounds_min, sc.bounds_max, sc.ids,
                     out_capacity=4 * n)
    st, res = layer.scan(spec, st, 10 * n, emit_capacity=16 * n)
    assert not bool(res.overflow)
    cnt = int(res.count)
    got = np.stack([np.asarray(res.pairs_a, np.uint32)[:cnt],
                    np.asarray(res.pairs_b, np.uint32)[:cnt]], axis=1)
    keys_np, ids_np, _ = layer.tree_to_numpy(spec, st)
    want = native.scan_seq(keys_np, ids_np, pair_slack=32)
    assert got.shape == want.shape and np.array_equal(got, want), (
        got.shape, want.shape)


@_case("bitonic_merge: sorted-column merge vs lax.sort, compiled")
def smoke_bitonic_merge():
    # round-4 merge primitive (update() + sorted-layer merge fast path);
    # CI runs it on CPU-XLA only — exercise the compiled roll/select path
    from ..ops.merge import bitonic_merge

    rng = np.random.default_rng(23)
    for na, nb in ((4096, 4096), (100_000, 4_096), (65_536, 1)):
        # unique key tuples across both inputs (the documented contract)
        keys = rng.choice(np.uint64(1) << 40, size=na + nb, replace=False)
        hi = (keys >> 32).astype(np.uint32)
        lo = (keys & 0xFFFFFFFF).astype(np.uint32)
        pay = rng.integers(0, 1 << 32, na + nb, dtype=np.uint32)
        oa = np.lexsort((lo[:na], hi[:na]))
        ob = np.lexsort((lo[na:], hi[na:]))
        cols_a = (hi[:na][oa], lo[:na][oa], pay[:na][oa])
        cols_b = (hi[na:][ob], lo[na:][ob], pay[na:][ob])
        out = bitonic_merge([jnp.asarray(c) for c in cols_a],
                            [jnp.asarray(c) for c in cols_b], num_keys=2)
        want_o = np.lexsort((lo, hi))
        for got, want in zip(out, (hi[want_o], lo[want_o], pay[want_o])):
            # output is next_pow2-padded; pads sort to the tail
            np.testing.assert_array_equal(np.asarray(got)[: na + nb], want)


@_case("update: temporal-coherence frame advance vs build, compiled")
def smoke_update_vs_build():
    from ..index import Index64_3D
    from .. import layer
    from ..update import build_tracked, update
    from ..utils import gen

    spec = Index64_3D
    n = 20_000
    sc = gen.gen_boxes(count=n, density=1.0 / 1000.0, seed=6)
    cap = 4 * n
    tracked = build_tracked(spec, sc.system_min, sc.system_max,
                            sc.bounds_min, sc.bounds_max, sc.ids,
                            out_capacity=cap)
    rng = np.random.default_rng(29)
    bmin, bmax = np.asarray(sc.bounds_min), np.asarray(sc.bounds_max)
    for frame in range(2):
        move = rng.random(n) < 0.05
        delta = rng.normal(0, 12.0, size=bmin.shape).astype(np.float32)
        bmin = np.where(move[:, None], bmin + delta, bmin).astype(np.float32)
        bmax = np.where(move[:, None], bmax + delta, bmax).astype(np.float32)
        # churn_cap chosen so the fused Pallas merge kernel path runs
        # (the production temporal-coherence regime)
        tracked = update(spec, tracked, sc.system_min, sc.system_max,
                         bmin, bmax, churn_cap=8_192)
        want = layer.build(spec, sc.system_min, sc.system_max,
                           bmin, bmax, sc.ids, out_capacity=cap)
        assert not bool(tracked.state.overflow)
        assert layer.layers_equal(spec, tracked.state, want), f"frame {frame}"
        cnt = int(want.count)
        np.testing.assert_array_equal(np.asarray(tracked.state.aux[:cnt]),
                                      np.asarray(want.aux[:cnt]))


@_case("singleq: tree-descent engine vs linear replay, compiled")
def smoke_singleq_vs_linear():
    from ..index import Index64_3D
    from .. import layer, query
    from ..utils import gen

    spec = Index64_3D
    sc = gen.gen_boxes(count=20_000, density=1.0 / 1000.0, seed=7)
    st = layer.build(spec, sc.system_min, sc.system_max,
                     sc.bounds_min, sc.bounds_max, sc.ids)
    smin = np.asarray(sc.system_min, np.float32)
    smax = np.asarray(sc.system_max, np.float32)
    # small interactive-scale box (a few percent of the extent per axis):
    # large boxes legitimately overflow the fixed candidate buffer, which
    # flags overflow — a different case than the parity this checks
    qmin = (smin + 0.25 * (smax - smin)).astype(np.float32)
    qmax = (qmin + 0.04 * (smax - smin)).astype(np.float32)
    ro = smin.copy()
    rd = (smax - smin).astype(np.float32)

    def res_tuple(res):
        k = int(res.count)
        return list(np.asarray(res.ids[:k])), k, bool(res.overflow)

    _, want = query.test_box(spec, st, smin, smax, (qmin, qmax),
                             result_cap=8192, engine="linear")
    _, got = query.test_box(spec, st, smin, smax, (qmin, qmax),
                            result_cap=8192, engine="tree",
                            candidate_cap=16384)
    assert res_tuple(got) == res_tuple(want)

    _, want = query.test_ray(spec, st, smin, smax, ro, rd, 0.0, np.inf,
                             result_cap=8192, engine="linear")
    _, got = query.test_ray(spec, st, smin, smax, ro, rd, 0.0, np.inf,
                            result_cap=8192, engine="tree",
                            candidate_cap=16384, frontier_cap=1024)
    assert res_tuple(got) == res_tuple(want)

    def get_dist(cand_ids, mask, *a):
        return jnp.where(mask, cand_ids.astype(jnp.float32), jnp.inf)

    _, want = query.pick_ray(spec, st, smin, smax, ro, rd,
                             np.float32(1e9), get_dist, engine="linear")
    _, got = query.pick_ray(spec, st, smin, smax, ro, rd,
                            np.float32(1e9), get_dist, engine="tree",
                            candidate_cap=16384, frontier_cap=1024)
    assert (int(got.obj_id) == int(want.obj_id)
            and bool(got.found) == bool(want.found)
            and float(got.distance) == float(want.distance))


@_case("pallas_merge: fused merge-cancel-compact vs XLA reference, compiled")
def smoke_pallas_merge():
    # round-5 update-path kernel at its production tile/window sizes;
    # CI covers interpret mode only (tests/test_pallas_merge.py)
    from ..ops.compact import stable_compact
    from ..ops.merge import bitonic_merge
    from ..ops.pallas_merge import merge_cancel_compact

    rng = np.random.default_rng(31)
    n_tree, n_tomb, n_ins = 100_000, 3_000, 2_500
    total = n_tree + n_ins
    keys = rng.choice(np.uint64(1) << 40, size=total,
                      replace=False).astype(np.uint64)
    meta = (rng.integers(0, 1 << 24, total).astype(np.uint64) << 1)
    tk, ik = keys[:n_tree], keys[n_tree:]
    tm, im = meta[:n_tree], meta[n_tree:]
    o = np.argsort(tk, kind="stable")
    tk, tm = tk[o], tm[o]
    ti = rng.choice(n_tree, size=n_tomb, replace=False)
    ck = np.concatenate([tk[ti], ik])
    cm = np.concatenate([tm[ti] | 1, im])
    o = np.lexsort((cm, ck))
    ck, cm = ck[o], cm[o]
    cap = n_tree + n_ins + 128
    cbuf = 8192

    def pad(cols, n):
        return tuple(jnp.asarray(np.concatenate(
            [c, np.full(n - len(c), 0xFFFF_FFFF, np.uint32)]))
            for c in cols)

    tc = pad(((tk >> 32).astype(np.uint32),
              (tk & 0xFFFFFFFF).astype(np.uint32),
              tm.astype(np.uint32)), cap)
    cc = pad(((ck >> 32).astype(np.uint32),
              (ck & 0xFFFFFFFF).astype(np.uint32),
              cm.astype(np.uint32)), cbuf)

    got_cols, got_cnt, w_ovf = merge_cancel_compact(
        tc, cc, jnp.int32(n_tomb + n_ins), cap, interpret=False)
    assert not bool(w_ovf)
    assert int(got_cnt) == n_tree + n_ins - n_tomb

    merged = bitonic_merge(tc, cc, num_keys=3)
    nxt = tuple(jnp.concatenate([c[1:], c[:1]]) for c in merged)
    eq = (merged[0] == nxt[0]) & (merged[1] == nxt[1]) \
        & ((merged[2] >> 1) == (nxt[2] >> 1))
    dead = (eq & ((nxt[2] & 1) == 1)) | ((merged[2] & 1) == 1)
    want_cols, _ = stable_compact(~dead, merged,
                                  tuple(jnp.uint32(0xFFFF_FFFF)
                                        for _ in range(3)))
    for g, w in zip(got_cols, want_cols):
        np.testing.assert_array_equal(np.asarray(g),
                                      np.asarray(w[:cap]))


def main():
    dev = jax.devices()[0]
    print(f"tpu_smoke on {dev.platform} "
          f"{getattr(dev, 'device_kind', '?')}", file=sys.stderr)
    if dev.platform not in ("tpu", "axon"):
        print("WARNING: not a TPU — kernels will run compiled on "
              f"{dev.platform}, which does not validate Mosaic semantics",
              file=sys.stderr)
    t_all = time.perf_counter()
    for fn in _CASES:
        name = fn._smoke_name
        t0 = time.perf_counter()
        try:
            fn()
            print(f"  PASS  {name}  ({time.perf_counter() - t0:.1f}s)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report and continue
            _FAILED.append(name)
            print(f"  FAIL  {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
    dt = time.perf_counter() - t_all
    if _FAILED:
        print(f"tpu_smoke: {len(_FAILED)}/{len(_CASES)} FAILED "
              f"({dt:.0f}s): {_FAILED}", file=sys.stderr)
        sys.exit(1)
    print(f"tpu_smoke: all {len(_CASES)} cases green ({dt:.0f}s)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
