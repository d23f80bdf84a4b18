"""Benchmark: full broadphase step (clear + extend + sort + scan) on device.

Reproduces the reference's headline configuration scaled 100x: the reference
does 10,000 dynamic objects in ~6 ms on a 2015 desktop CPU
(``/root/reference/README.md:17-19``); the TPU target (BASELINE.md) is a
1M-object full step in < 6 ms on one chip.

Prints ONE JSON line:
  {"metric": "full_step_1M_p50_ms", "value": <p50 ms>, "unit": "ms",
   "vs_baseline": <pairs-throughput speedup vs the reference baseline>}

vs_baseline = (1e6 objects / p50) / (1e4 objects / 6 ms): 100.0 means the
1M-in-6ms north star exactly; higher is better.

Resilience contract (VERDICT round 2, item #3): the top-level process is a
pure-stdlib orchestrator that runs the measurements in a CHILD process and
retries on failure.  This environment's TPU backend can transiently wedge
(FAILED_PRECONDITION at init, or a hung backend handshake that burns no
CPU); a wedged chip recovers when the process holding it dies, so the
orchestrator watches the child's CPU clock, kills it (by exact pid) when
the clock stops advancing, and retries with backoff instead of letting the
round's bench record become a crash.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# persistent XLA compile cache (shared with tests/conftest.py): Pallas
# kernels take minutes to compile through the TPU tunnel on first use;
# reruns must be disk hits.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
os.makedirs(_cache, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def _scene(dim, n, seed=0, density=1.0 / 1000.0, size_range=(1.0, 10.0)):
    """Deterministic boxes scene shaped like the reference generator's
    (``utils/src/gen_test_data.rs:100-155``): cubic system bounds with volume
    n/density, uniform sizes in [s0, s1), uniform placement."""
    rng = np.random.default_rng(seed)
    extent = (n / density) ** (1.0 / dim)
    lo, hi = 0.0, float(extent)
    size = rng.uniform(size_range[0], size_range[1], size=(n, dim)).astype(np.float32)
    bmin = (rng.uniform(lo, hi, size=(n, dim)).astype(np.float32)
            * ((hi - size_range[1]) / hi)).astype(np.float32)
    bmax = bmin + size
    ids = np.arange(n, dtype=np.uint32)
    smin = np.full(dim, lo, np.float32)
    smax = np.full(dim, hi, np.float32)
    return smin, smax, bmin, bmax, ids


def _pipelined_p50(step, args, iters=30, warmup=3, batch=10):
    """Steady-state ms/step: time batches with one device sync per batch.

    Per-call `block_until_ready` adds a fixed ~30 ms host<->device sync
    latency in this environment, which a real per-frame pipeline (physics
    state stays on device; the host never reads back each frame) does not
    pay.  The blocking latency is reported separately."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(step(*args))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(step(*args))
        lat.append((time.perf_counter() - t0) * 1e3)
    batches = []
    for _ in range(max(1, iters // batch)):
        t0 = time.perf_counter()
        outs = [step(*args) for _ in range(batch)]
        jax.block_until_ready(outs)
        batches.append((time.perf_counter() - t0) / batch * 1e3)
    return float(np.percentile(batches, 50)), float(np.percentile(lat, 50))


def bench_full_step(n, iters=30, warmup=3, pair_slack=None, emit_slack=None):
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_3D, layer
    from broadphase_tpu import bench_caps

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    # capacity rationale lives in broadphase_tpu/bench_caps.py (shared
    # with tools/profile_step.py so stage profiles run the bench shapes);
    # overflow is carried into the JSON record and fails VERIFY
    pair_cap = bench_caps.pair_capacity(
        n, pair_slack or bench_caps.PAIR_SLACK)
    emit_cap = bench_caps.emit_capacity(
        n, emit_slack or bench_caps.EMIT_SLACK)
    tree_cap = bench_caps.tree_capacity(n)

    @jax.jit
    def step(bounds_min, bounds_max, obj_ids):
        state = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                            bounds_min, bounds_max, obj_ids,
                            out_capacity=tree_cap)
        state, result = layer.scan(spec, state, pair_cap,
                                   emit_capacity=emit_cap)
        return result.pairs_a, result.pairs_b, result.count, result.overflow

    d_bmin, d_bmax, d_ids = (jax.device_put(x) for x in (bmin, bmax, ids))
    out = step(d_bmin, d_bmax, d_ids)
    jax.block_until_ready(out)
    if bool(out[3]):
        print(f"WARNING: n={n} overflowed buffers", file=sys.stderr)

    if os.environ.get("BROADPHASE_VERIFY") == "1":
        _verify_against_native(spec, smin, smax, bmin, bmax, ids, n, out)

    # batch amortizes the ~30 ms host<->device sync of this environment:
    # at batch=4 the sync alone inflated the 1M p50 by ~7 ms/step
    p50, lat = _pipelined_p50(step, (d_bmin, d_bmax, d_ids),
                              iters=90 if n < 100_000 else iters,
                              warmup=warmup, batch=30 if n < 100_000 else 10)
    print(f"  (n={n}: blocking-latency p50 {lat:.2f} ms incl ~30 ms "
          f"host sync)", file=sys.stderr)
    pairs = int(out[2])
    return p50, pairs, lat, bool(out[3])


def _verify_against_native(spec, smin, smax, bmin, bmax, ids, n, out):
    """Pair-for-pair check of the device scan against the C++ sequential
    oracle (native/broadphase_host.cpp) at benchmark scale — re-proves
    correctness of the production (Pallas) path for every perf change
    (VERDICT.md round 1, next-round item #2).  Opt-in: BROADPHASE_VERIFY=1."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import layer
    from broadphase_tpu.utils import native

    print(f"VERIFY n={n}: rebuilding tree on device and comparing the "
          f"device scan pair-for-pair vs native.scan_seq ...", file=sys.stderr)
    t0 = time.perf_counter()
    state = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                        jnp.asarray(bmin), jnp.asarray(bmax),
                        jnp.asarray(ids), out_capacity=4 * n)
    jax.block_until_ready(state)
    keys_np, ids_np, cnt = layer.tree_to_numpy(spec, state)
    want = native.scan_seq(keys_np, ids_np,
                           pair_slack=max(4, 24_000_000 // max(cnt, 1)))
    got_count = int(out[2])
    got = np.stack([np.asarray(out[0], np.uint32)[:got_count],
                    np.asarray(out[1], np.uint32)[:got_count]], axis=1)
    if got.shape != want.shape or not np.array_equal(got, want):
        nbad = (int(np.sum(np.any(got != want[:len(got)], axis=1)))
                if got.shape == want.shape else -1)
        raise SystemExit(
            f"VERIFY FAILED at n={n}: device {got.shape[0]} pairs vs native "
            f"{want.shape[0]} pairs, mismatched rows={nbad}")
    print(f"VERIFY n={n}: OK — {want.shape[0]} pairs bit-identical "
          f"({time.perf_counter() - t0:.1f} s)", file=sys.stderr)


def _verify_30k():
    """Unconditional correctness gate on every bench run (VERDICT round 3
    #3): build + scan a 30k generated scene on the device and compare the
    pair list pair-for-pair against the C++ sequential oracle
    (``native/broadphase_host.cpp``).  Returns True iff bit-identical —
    the result is published as ``"verified"`` in the JSON record, and the
    orchestrator treats ``verified=false`` like a crash.  The full-scale
    (1M) pair-for-pair check stays opt-in via BROADPHASE_VERIFY=1."""
    from broadphase_tpu import Index64_3D, layer
    from broadphase_tpu.utils import gen, native

    spec = Index64_3D
    n = 30_000
    t0 = time.perf_counter()
    try:
        sc = gen.gen_boxes(count=n, density=1.0 / 1000.0, seed=0)
        st = layer.build(spec, sc.system_min, sc.system_max,
                         sc.bounds_min, sc.bounds_max, sc.ids,
                         out_capacity=4 * n)
        st, res = layer.scan(spec, st, 10 * n, emit_capacity=16 * n)
        if bool(res.overflow):
            print("VERIFY-30k: FAILED (overflow)", file=sys.stderr)
            return False
        cnt = int(res.count)
        got = np.stack([np.asarray(res.pairs_a, np.uint32)[:cnt],
                        np.asarray(res.pairs_b, np.uint32)[:cnt]], axis=1)
        keys_np, ids_np, _ = layer.tree_to_numpy(spec, st)
        want = native.scan_seq(keys_np, ids_np, pair_slack=32)
        ok = got.shape == want.shape and bool(np.array_equal(got, want))
        # canonical=False product contract (VERDICT r4 #3): the unsorted
        # pair list must be the SAME SET as the C++ oracle's canonical
        # list — row-sort on host and compare
        st, ures = layer.scan(spec, st, 10 * n, emit_capacity=16 * n,
                              canonical=False)
        ucnt = int(ures.count)
        ugot = np.stack([np.asarray(ures.pairs_a, np.uint32)[:ucnt],
                         np.asarray(ures.pairs_b, np.uint32)[:ucnt]],
                        axis=1)
        uok = not bool(ures.overflow) and ugot.shape == want.shape
        if uok:
            order = np.lexsort((ugot[:, 1], ugot[:, 0]))
            uok = bool(np.array_equal(ugot[order], want))
        ok = ok and uok
        print(f"VERIFY-30k: {'OK' if ok else 'FAILED'} — device "
              f"{got.shape[0]} pairs vs native {want.shape[0]}, "
              f"unsorted-set {'OK' if uok else 'FAILED'} "
              f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)
        return ok
    except Exception as e:  # noqa: BLE001 — a broken verify is a failure
        print(f"VERIFY-30k: FAILED ({type(e).__name__}: {e})",
              file=sys.stderr)
        return False


def bench_full_step_unsorted(n, iters=30, warmup=3):
    """The ``canonical=False`` product contract as a verified headline
    metric (VERDICT r4 #3): same full step, but the scan returns the
    emit-once-unique pair list in emission order, skipping the canonical
    presentation sort — the measured 1M bottleneck.  Verified here by SET
    equality against the canonical step's (oracle-checked) output: same
    count, identical rows after a host row-sort.
    Returns (p50_ms, pairs, overflow, set_ok)."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_3D, layer
    from broadphase_tpu import bench_caps

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    pair_cap = bench_caps.pair_capacity(n)
    emit_cap = bench_caps.emit_capacity(n)
    tree_cap = bench_caps.tree_capacity(n)

    def make_step(canonical):
        @jax.jit
        def step(bounds_min, bounds_max, obj_ids):
            state = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                                bounds_min, bounds_max, obj_ids,
                                out_capacity=tree_cap)
            state, result = layer.scan(spec, state, pair_cap,
                                       emit_capacity=emit_cap,
                                       canonical=canonical)
            return (result.pairs_a, result.pairs_b, result.count,
                    result.overflow)
        return step

    d_args = tuple(jax.device_put(x) for x in (bmin, bmax, ids))
    step_u = make_step(False)
    out_u = step_u(*d_args)
    jax.block_until_ready(out_u)

    # set-equality vs the canonical step (itself oracle-verified at 30k
    # every run, and at full scale under BROADPHASE_VERIFY=1)
    out_c = make_step(True)(*d_args)
    jax.block_until_ready(out_c)
    cnt_u, cnt_c = int(out_u[2]), int(out_c[2])
    got = np.stack([np.asarray(out_u[0], np.uint32)[:cnt_u],
                    np.asarray(out_u[1], np.uint32)[:cnt_u]], axis=1)
    want = np.stack([np.asarray(out_c[0], np.uint32)[:cnt_c],
                     np.asarray(out_c[1], np.uint32)[:cnt_c]], axis=1)
    set_ok = (not bool(out_u[3])) and cnt_u == cnt_c
    if set_ok:
        order = np.lexsort((got[:, 1], got[:, 0]))
        set_ok = bool(np.array_equal(got[order], want))

    p50, _lat = _pipelined_p50(step_u, d_args,
                               iters=90 if n < 100_000 else iters,
                               warmup=warmup,
                               batch=30 if n < 100_000 else 10)
    return p50, cnt_u, bool(out_u[3]), set_ok


def bench_ball_pit_2d(n=10_000, iters=20):
    """The reference's headline config: 2D circles, Index32_2D, min_depth=4
    (examples/main.rs:364-374), full clear+extend+sort+scan per frame."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index32_2D, layer

    spec = Index32_2D
    rng = np.random.default_rng(0)
    radius = rng.uniform(0.004, 0.01, n).astype(np.float32)
    pos = rng.uniform(0.05, 0.95, (n, 2)).astype(np.float32)
    smin = np.zeros(2, np.float32)
    smax = np.ones(2, np.float32)
    ids = np.arange(n, dtype=np.uint32)
    # min_depth=4 multiplies cells/object, so raw emissions need 32n; the
    # emit-once rule keeps only unique pairs — measured 176,365 at n=10k
    # (17.64n; the pit is dense), so budget 24n with ~36% headroom.  12n
    # truncated the list (overflow=True in the record) — never shrink a
    # cap without re-measuring the scene's true pair count on CPU.
    pair_cap = ((24 * n) // 1024) * 1024
    emit_cap = ((32 * n) // 1024) * 1024

    @jax.jit
    def step(p, r):
        bmin = p - r[:, None]
        bmax = p + r[:, None]
        st = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                         bmin, bmax, jnp.asarray(ids), min_depth=4)
        st, res = layer.scan(spec, st, pair_cap, emit_capacity=emit_cap)
        return res.count, res.overflow

    d_pos, d_rad = jax.device_put(pos), jax.device_put(radius)
    out = step(d_pos, d_rad)
    jax.block_until_ready(out)
    p50, _ = _pipelined_p50(step, (d_pos, d_rad), iters=90, batch=30)
    return p50, int(out[0]), bool(out[1])


def bench_full_step_wide(n, iters=20):
    """The wide-id regime (VERDICT r4 #5): ids above 2^24 disable the
    emit-once packing, so the scan degrades to keep-all — the pair buffer
    must hold RAW emissions (~15.7 slots/object at this scene) and the
    canonical sort runs over them; ids above 2^20 also disable the pair-
    key packing and the two-column tree-sort tier.  This measures that
    cliff instead of assuming narrow ids everywhere.
    Returns (p50_ms, pairs, overflow)."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_3D, layer
    from broadphase_tpu import bench_caps

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    ids = (ids + (1 << 25)).astype(np.uint32)       # wide: emit-once off
    # raw emissions: 15.72/obj measured at 1M; small scenes have edge
    # effects (relatively larger boxes), so give them far more slack
    emit_cap = bench_caps.emit_capacity(n, 18 if n >= 500_000 else 40)
    tree_cap = bench_caps.tree_capacity(n)

    @jax.jit
    def step(bounds_min, bounds_max, obj_ids):
        state = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                            bounds_min, bounds_max, obj_ids,
                            out_capacity=tree_cap)
        state, result = layer.scan(spec, state, emit_cap)
        return result.pairs_a, result.pairs_b, result.count, result.overflow

    d_args = tuple(jax.device_put(x) for x in (bmin, bmax, ids))
    out = step(*d_args)
    jax.block_until_ready(out)
    p50, _ = _pipelined_p50(step, d_args, iters=iters, batch=8)
    return p50, int(out[2]), bool(out[3])


def bench_index64_2d(n, iters=20):
    """One Index64_2D scene through the full step (BASELINE config matrix;
    the reference exercises all three index types).  2D at this density is
    pair-sparse (~0.15 pairs/object measured), so the caps are modest.
    Returns (p50_ms, pairs, overflow)."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_2D, layer

    spec = Index64_2D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    # measured: tree ~2.5 cells/obj, ~0.3 unique pairs/obj at this density
    pair_cap = ((1 * n) // 1024) * 1024
    emit_cap = ((3 * n) // 1024) * 1024
    tree_cap = ((3 * n) // 1024) * 1024

    @jax.jit
    def step(bounds_min, bounds_max, obj_ids):
        state = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                            bounds_min, bounds_max, obj_ids,
                            out_capacity=tree_cap)
        state, result = layer.scan(spec, state, pair_cap,
                                   emit_capacity=emit_cap)
        return result.pairs_a, result.pairs_b, result.count, result.overflow

    d_args = tuple(jax.device_put(x) for x in (bmin, bmax, ids))
    out = step(*d_args)
    jax.block_until_ready(out)
    p50, _ = _pipelined_p50(step, d_args, iters=iters, batch=8)
    return p50, int(out[2]), bool(out[3])


def bench_ball_pit_lifecycle(n=10_000, frames=120):
    """The example app's Lifecycle soak (reference examples/main.rs
    spawn/expire loop) as a bench row: run the headless ball pit with
    --lifecycle in a subprocess and parse its ms/frame summary.
    Returns (ms_per_frame or None, total_collisions or None)."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        r = subprocess.run(
            [sys.executable, "-u", os.path.join(here, "examples",
                                                "ball_pit.py"),
             "--balls", str(n), "--frames", str(frames), "--lifecycle",
             "--chunk", "10"],
            capture_output=True, text=True, timeout=1500, cwd=here)
    except subprocess.TimeoutExpired:
        return None, None
    if r.returncode != 0:
        print(f"ball_pit --lifecycle failed: {r.stderr[-500:]}",
              file=sys.stderr)
        return None, None
    ms = cols = None
    for line in r.stdout.splitlines():
        if "ms/frame" in line:
            try:
                ms = float(line.split("ms/frame")[0].split(",")[-1].strip())
                cols = int(line.rsplit("total collisions", 1)[1].strip())
            except (ValueError, IndexError):
                pass
    return ms, cols


def bench_queries(n=100_000, iters=30):
    """test_box / test_ray / pick_ray on a generated scene
    (BASELINE.md query config)."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_3D, layer, query

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    state = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                        jnp.asarray(bmin), jnp.asarray(bmax),
                        jnp.asarray(ids), out_capacity=4 * n)
    jax.block_until_ready(state)

    qmin = jnp.asarray(smin + 10.0)
    qmax = jnp.asarray(smin + 60.0)
    ro = jnp.asarray(smin)
    rd = jnp.asarray(smax - smin)

    def get_dist(cand_ids, mask, *a):
        return jnp.where(mask, cand_ids.astype(jnp.float32), jnp.inf)

    out = {}
    for eng in ("tree", "linear"):
        box = jax.jit(lambda s: query.test_box(
            spec, s, smin, smax, (qmin, qmax), 65536,
            engine=eng)[1].count)
        ray = jax.jit(lambda s: query.test_ray(
            spec, s, smin, smax, ro, rd, 0.0, np.inf, 65536,
            engine=eng)[1].count)
        pick = jax.jit(lambda s: query.pick_ray(
            spec, s, smin, smax, ro, rd, np.float32(1e9), get_dist,
            engine=eng)[1].obj_id)
        for name, fn in (("test_box", box), ("test_ray", ray),
                         ("pick_ray", pick)):
            jax.block_until_ready(fn(state))
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(state))
                times.append((time.perf_counter() - t0) * 1e3)
            out[f"{name}[{eng}]"] = float(np.percentile(times, 50))
    return out


def bench_single_query_tree(n=1_000_000, iters=12):
    """Single-query DEVICE time on a big tree via the sublinear engine
    (singleq.py, VERDICT round 3 #2), measured by chain-length
    differencing: per CLAUDE.md, block_until_ready can no-op on this
    tunnel and a single blocking call is dominated by the ~30 ms host
    sync, so we time k=1 vs k=5 data-dependent query chains (each query's
    box/ray is perturbed by the previous result's count) and difference.
    Queries are interactive-scale (a ~5%-extent box, a short pick ray —
    the reference example's one-pick-per-frame pattern) with explicit
    candidate/frontier caps sized for them; a one-shot overflow check
    guards against silently timing a truncated query.
    Returns ({name: device_ms_per_query}, any_overflow)."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_3D, layer, query
    from broadphase_tpu import bench_caps

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    state = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                        jnp.asarray(bmin), jnp.asarray(bmax),
                        jnp.asarray(ids),
                        out_capacity=bench_caps.tree_capacity(n))
    jax.block_until_ready(state)
    extent = float(smax[0] - smin[0])
    q0 = jnp.asarray(smin + 0.25 * extent, jnp.float32)
    q1 = jnp.asarray(smin + 0.30 * extent, jnp.float32)
    ro = jnp.asarray(smin + 0.40 * extent, jnp.float32)
    rd = jnp.asarray(np.ones(spec.dim, np.float32))
    rmax = np.float32(0.20 * extent)          # short interactive pick ray
    # FCAP=256 (the module default): the prune-before-search descent fits
    # interactive rays comfortably (overflow is checked below) and probe
    # cost scales with the frontier width — measured 2.6 ms vs 5.2 ms at
    # FCAP=1024 on the 1M scene
    CCAP, FCAP = 32768, 256

    def get_dist(cand_ids, mask, *a):
        return jnp.where(mask, cand_ids.astype(jnp.float32), jnp.inf)

    def one(kind, s, eps):
        if kind == "test_box":
            _, res = query.test_box(spec, s, smin, smax,
                                    (q0 + eps, q1 + eps), 8192,
                                    engine="tree", candidate_cap=CCAP)
            return res.count, res.overflow
        if kind == "test_ray":
            _, res = query.test_ray(spec, s, smin, smax, ro + eps,
                                    rd, 0.0, rmax, 8192,
                                    engine="tree", candidate_cap=CCAP,
                                    frontier_cap=FCAP)
            return res.count, res.overflow
        _, res = query.pick_ray(spec, s, smin, smax, ro + eps,
                                rd, rmax, get_dist,
                                engine="tree", candidate_cap=CCAP,
                                frontier_cap=FCAP)
        return res.obj_id.astype(jnp.int32), res.overflow

    def make_chain(kind, k):
        @jax.jit
        def fn(s):
            c = jnp.int32(0)
            ovf = jnp.bool_(False)
            for _ in range(k):
                eps = c.astype(jnp.float32) * jnp.float32(1e-9)
                c, o = one(kind, s, eps)
                c = c.astype(jnp.int32)
                ovf = ovf | o
            return c, ovf
        return fn

    out = {}
    any_ovf = False
    for kind in ("test_box", "test_ray", "pick_ray"):
        p50 = {}
        for k in (1, 5):
            fn = make_chain(kind, k)
            c, ovf = fn(state)
            int(c)                              # compile + warm (readback)
            any_ovf = any_ovf or bool(ovf)
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                int(fn(state)[0])               # forced scalar readback
                ts.append((time.perf_counter() - t0) * 1e3)
            p50[k] = float(np.percentile(ts, 50))
        out[kind] = (p50[5] - p50[1]) / 4.0
    return out, any_ovf


def bench_update_sweep(n=1_000_000, fracs=(0.005, 0.01, 0.03, 0.10),
                       iters=16):
    """Moving-scene temporal-coherence bench (VERDICT round 4 #1): a CHURN
    SWEEP — at each fraction, that share of objects jump across cells each
    frame while the rest drift within their cells; update() (object-granular
    diff + tombstone bitonic-merge) vs a from-scratch build() on identical
    bounds, each sweep point with a one-shot exact-parity check.
    Returns (sweep {frac: p50_ms}, build_p50_ms, parity_all, overflow_any,
    break_even_frac — the largest benched fraction where update wins)."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_3D, layer
    from broadphase_tpu import bench_caps
    from broadphase_tpu.update import build_tracked, update

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    tree_cap = bench_caps.tree_capacity(n)

    bld = jax.jit(lambda lo, hi: layer.build(
        spec, jnp.asarray(smin), jnp.asarray(smax), lo, hi,
        jnp.asarray(ids), out_capacity=tree_cap))
    batch = 8

    sweep = {}
    parity_all = True
    ovf_any = False
    bld_p50 = None
    for frac in fracs:
        churn_cap, obj_cap = bench_caps.update_caps(n, frac)
        rng = np.random.default_rng(3)
        moving = rng.random(n) < frac
        jump = (rng.uniform(-5.0, 5.0, size=bmin.shape).astype(np.float32)
                * moving[:, None])
        drift = np.float32(1e-4)              # sub-cell, all objects
        A = (jnp.asarray(bmin), jnp.asarray(bmax))
        B = (jnp.asarray(bmin + jump + drift),
             jnp.asarray(bmax + jump + drift))

        tracked = build_tracked(spec, smin, smax, A[0], A[1], ids,
                                out_capacity=tree_cap)
        jax.block_until_ready(tracked)
        upd = jax.jit(lambda tr, lo, hi, c=churn_cap, o=obj_cap: update(
            spec, tr, smin, smax, lo, hi, c, obj_cap=o))

        # one-shot exact parity (self-verifying, like the 30k scan gate)
        t_b = upd(tracked, *B)
        want = bld(*B)
        jax.block_until_ready((t_b, want))
        parity_all = parity_all and layer.layers_equal(spec, t_b.state, want)
        ovf_any = ovf_any or bool(t_b.state.overflow)

        if bld_p50 is None:                   # build reference, once
            jax.block_until_ready(bld(*B))
            times = []
            for _ in range(max(1, iters // batch)):
                t0 = time.perf_counter()
                outs = [bld(*B) for _ in range(batch)]
                jax.block_until_ready(outs)
                times.append((time.perf_counter() - t0) / batch * 1e3)
            bld_p50 = float(np.percentile(times, 50))

        # steady state: alternate A/B so every frame has real churn; the
        # tracked state chains through, so the timing chain is
        # data-dependent
        for w in range(3):
            tracked = upd(tracked, *(A if w % 2 else B))
        jax.block_until_ready(tracked)
        times = []
        for _ in range(max(1, iters // batch)):
            t0 = time.perf_counter()
            for i in range(batch):
                tracked = upd(tracked, *(A if i % 2 else B))
            jax.block_until_ready(tracked)
            times.append((time.perf_counter() - t0) / batch * 1e3)
        sweep[frac] = float(np.percentile(times, 50))

    break_even = 0.0
    for frac in sorted(fracs):
        if sweep[frac] < bld_p50:
            break_even = frac
    return sweep, bld_p50, parity_all, ovf_any, break_even


def bench_queries_batched(n=100_000, Q=512, iters=30):
    """Q queries per launch (query.test_box_batch / test_ray_batch /
    pick_ray_batch): the TPU-native query shape — one id-sorted view
    amortized over the whole batch, chunked through lax.map so Q scales
    past the old 64-query temporary bound (VERDICT round 2 #7); reported
    as per-query microseconds at steady state."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_3D, layer, query

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    state = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                        jnp.asarray(bmin), jnp.asarray(bmax),
                        jnp.asarray(ids), out_capacity=4 * n)
    jax.block_until_ready(state)
    rng = np.random.default_rng(1)
    qmin = jnp.asarray(rng.uniform(0, smax[0] * 0.8, (Q, 3)), jnp.float32)
    qmax = qmin + 50.0
    ro = jnp.asarray(rng.uniform(0, smax[0], (Q, 3)), jnp.float32)
    rd = jnp.asarray(rng.uniform(-1, 1, (Q, 3)), jnp.float32)

    def get_dist(cand_ids, mask, *a):
        return jnp.where(mask, cand_ids.astype(jnp.float32), jnp.inf)

    box = jax.jit(lambda s, a, b: query.test_box_batch(
        spec, s, smin, smax, (a, b), 4096)[1].count.sum())
    ray = jax.jit(lambda s, o, d: query.test_ray_batch(
        spec, s, smin, smax, o, d, 0.0, np.inf, 4096)[1].count.sum())
    pick = jax.jit(lambda s, o, d: query.pick_ray_batch(
        spec, s, smin, smax, o, d, np.float32(1e9),
        get_dist)[1].obj_id.sum())
    out = {}
    for name, fn, args in (("test_box", box, (qmin, qmax)),
                           ("test_ray", ray, (ro, rd)),
                           ("pick_ray", pick, (ro, rd))):
        p50, _ = _pipelined_p50(lambda *a: fn(state, *a), args,
                                iters=iters, batch=5)
        out[name] = p50 * 1e3 / Q          # us per query
    return out


def bench_merge_scan_filtered(n=100_000, iters=30):
    """Precomputed static layer merged into a dynamic one + scan_filtered
    (BASELINE.md config; reference README.md:28 static-layer pattern)."""
    import jax
    import jax.numpy as jnp

    from broadphase_tpu import Index64_3D, layer

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    half = n // 2
    static = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                         jnp.asarray(bmin[:half]), jnp.asarray(bmax[:half]),
                         jnp.asarray(ids[:half]), out_capacity=4 * half)
    jax.block_until_ready(static)
    pair_cap = ((10 * n) // 1024) * 1024
    emit_cap = ((16 * n) // 1024) * 1024

    @jax.jit
    def step(st, dmin, dmax, dids):
        # the merge target must hold both trees: size it for the total
        dyn = layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                          dmin, dmax, dids, out_capacity=4 * n)
        merged = layer.merge(spec, dyn, st)
        merged, res = layer.scan_filtered(
            spec, merged, pair_cap, lambda a, b: (a % 2) == (b % 2),
            emit_cap)
        return res.count, res.overflow

    args = (static, jnp.asarray(bmin[half:]), jnp.asarray(bmax[half:]),
            jnp.asarray(ids[half:]))
    out = step(*args)
    jax.block_until_ready(out)
    p50, _ = _pipelined_p50(step, args, iters=iters, batch=4)
    return p50, int(out[0]), bool(out[1])


def child_main():
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    on_tpu = dev.platform == "tpu"
    n_small = 10_000
    n_big = 1_000_000 if on_tpu else 30_000

    verified = _verify_30k()

    bp_p50, bp_pairs, bp_ovf = bench_ball_pit_2d(n_small)
    print(f"ball_pit_2d n={n_small}: p50={bp_p50:.3f} ms "
          f"pairs={bp_pairs} overflow={bp_ovf} "
          f"(reference: ~6 ms on i5-6600K)", file=sys.stderr)

    q = bench_queries(100_000 if on_tpu else 10_000)
    print(f"queries on 100k-scene blocking p50 ms (incl ~30 ms host "
          f"sync): {q}", file=sys.stderr)

    sq, sq_ovf = bench_single_query_tree(1_000_000 if on_tpu else 50_000)
    print(f"single-query tree-engine DEVICE ms on 1M scene "
          f"(chain-differenced): {sq} overflow={sq_ovf}", file=sys.stderr)

    u_sweep, b_p50, u_parity, u_ovf, u_be = bench_update_sweep(
        1_000_000 if on_tpu else 50_000)
    print(f"update_1M churn sweep (update p50 ms by cross-cell churn): "
          f"{ {f'{k:.1%}': round(v, 3) for k, v in u_sweep.items()} } "
          f"vs build p50={b_p50:.3f} ms, break_even={u_be:.1%}, "
          f"parity={u_parity} overflow={u_ovf}", file=sys.stderr)
    u_p50 = u_sweep.get(0.03, min(u_sweep.values()))

    qb = bench_queries_batched(100_000 if on_tpu else 10_000,
                               Q=512 if on_tpu else 16)
    print(f"batched queries (Q per launch) p50 us/query: {qb}",
          file=sys.stderr)

    m_n = 1_000_000 if on_tpu else 5_000
    m_p50, m_pairs, m_ovf = bench_merge_scan_filtered(m_n)
    print(f"merge_static+scan_filtered n={m_n}: p50={m_p50:.3f} ms "
          f"pairs={m_pairs} overflow={m_ovf}", file=sys.stderr)

    w_p50, w_pairs, w_ovf = bench_full_step_wide(
        1_000_000 if on_tpu else 20_000)
    print(f"full_step_wide_ids n={n_big} (ids >= 2^25, emit-once off): "
          f"p50={w_p50:.3f} ms pairs={w_pairs} overflow={w_ovf}",
          file=sys.stderr)

    d2_p50, d2_pairs, d2_ovf = bench_index64_2d(
        1_000_000 if on_tpu else 20_000)
    print(f"index64_2d full_step n={n_big}: p50={d2_p50:.3f} ms "
          f"pairs={d2_pairs} overflow={d2_ovf}", file=sys.stderr)

    # the reference Lifecycle caps the population at 2500 balls
    # (examples/main.rs:303-306) — soak at reference parity
    lc_ms, lc_cols = bench_ball_pit_lifecycle(
        2_500 if on_tpu else 1_000, frames=240 if on_tpu else 30)
    print(f"ball_pit --lifecycle soak: "
          f"{lc_ms if lc_ms is not None else 'FAILED'} ms/frame, "
          f"collisions={lc_cols}", file=sys.stderr)

    p50_small, pairs_small, lat_small, ovf_small = \
        bench_full_step(n_small)
    print(f"full_step n={n_small}: p50={p50_small:.3f} ms "
          f"(blocking {lat_small:.3f} ms), pairs={pairs_small}, "
          f"pairs/sec={pairs_small / (p50_small * 1e-3):.3e}", file=sys.stderr)

    p50_big, pairs_big, lat_big, ovf_big = \
        bench_full_step(n_big, iters=30)
    print(f"full_step n={n_big}: p50={p50_big:.3f} ms "
          f"(blocking {lat_big:.3f} ms), pairs={pairs_big}, "
          f"pairs/sec={pairs_big / (p50_big * 1e-3):.3e}", file=sys.stderr)

    u_big_p50, u_big_pairs, u_big_ovf, u_set_ok = \
        bench_full_step_unsorted(n_big, iters=30)
    print(f"full_step_unsorted n={n_big} (canonical=False): "
          f"p50={u_big_p50:.3f} ms, pairs={u_big_pairs}, "
          f"set_verified={u_set_ok}, "
          f"pairs/sec={u_big_pairs / (u_big_p50 * 1e-3):.3e}",
          file=sys.stderr)

    # reference baseline: 10k objects per 6 ms (README.md:17-19)
    ref_objs_per_ms = 10_000 / 6.0
    our_objs_per_ms = n_big / p50_big
    vs_baseline = our_objs_per_ms / ref_objs_per_ms

    metric = "full_step_1M_p50_ms" if n_big == 1_000_000 else \
        f"full_step_{n_big}_p50_ms"
    # Both methodologies published so round-over-round comparisons can't
    # silently switch: `value` is the pipelined (steady-state) p50; the
    # blocking per-call p50 (includes the ~30 ms host<->device sync of this
    # environment) rides along as `blocking_p50_ms`.
    print(json.dumps({
        "metric": metric,
        "value": round(p50_big, 4),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 2),
        "blocking_p50_ms": round(lat_big, 4),
        # any benched scene's buffer overflow truncates its pair list: the
        # record is visibly invalid instead of silently publishing a
        # fast-but-wrong number (stderr already warns; this puts it in the
        # record itself) — includes the ball-pit and merge scenes (ADVICE
        # round 3)
        "overflow": bool(ovf_small or ovf_big or bp_ovf or m_ovf or u_ovf
                         or sq_ovf or u_big_ovf or w_ovf or d2_ovf),
        # pair-for-pair 30k device-vs-C++-oracle check, run unconditionally
        # this process; false invalidates the record (orchestrator retries)
        # — the update() bench's exact-parity check and the unsorted
        # (canonical=False) set-equality check fold in too
        "verified": bool(verified and u_parity and u_set_ok),
        # the canonical=False product contract as a first-class verified
        # metric (VERDICT r4 #3): same unique pair set, emission order,
        # no presentation sort
        "full_step_1M_unsorted_p50_ms": round(u_big_p50, 4),
        "unsorted_set_verified": bool(u_set_ok),
        # round-4 engines (secondary metrics, same record); sq_ovf means a
        # query buffer truncated — the timing would be for an incomplete
        # query, so it invalidates these lines (and the record's overflow)
        "single_query_1M_ms": {k: round(v, 4) for k, v in sq.items()},
        "single_query_overflow": bool(sq_ovf),
        "update_1M_p50_ms": round(u_p50, 4),
        "build_1M_p50_ms": round(b_p50, 4),
        # churn sweep (VERDICT r4 #1): update p50 per cross-cell churn
        # fraction + the largest benched fraction where update beats build
        "update_1M_sweep_ms": {f"{k:.3f}": round(v, 4)
                               for k, v in u_sweep.items()},
        "update_break_even_frac": u_be,
        # BASELINE config matrix rows (VERDICT r4 #5/#6)
        "full_step_1M_wide_p50_ms": round(w_p50, 4),
        "merge_scan_filtered_1M_p50_ms": round(m_p50, 4),
        "index64_2d_1M_p50_ms": round(d2_p50, 4),
        "ball_pit_lifecycle_ms_frame": lc_ms,
    }))


# ---------------------------------------------------------------------------
# Orchestrator: subprocess + CPU-clock watchdog + bounded retry
# ---------------------------------------------------------------------------

def _cpu_ticks(pid: int):
    """utime+stime of a process from /proc (None once it exits)."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            parts = f.read().split(b")")[-1].split()
        return int(parts[11]) + int(parts[12])   # utime, stime
    except (OSError, IndexError, ValueError):
        return None


def _run_attempt(timeout_s: float, stall_s: float):
    """One child run.  Returns the parsed JSON record or None.

    The child inherits stderr (live logs); stdout is captured and scanned
    for the one JSON result line.  Two watchdogs: an absolute wall-clock
    cap, and a CPU-clock stall detector — a TPU process whose CPU time
    stops advancing for minutes is wedged on the backend (CLAUDE.md), and
    killing it lets the chip recover for the retry.
    """
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, stderr=None, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))

    import threading
    lines = []

    def _pump():
        for line in proc.stdout:
            lines.append(line)
    t = threading.Thread(target=_pump, daemon=True)
    t.start()

    deadline = time.monotonic() + timeout_s
    last_ticks, last_change = _cpu_ticks(proc.pid), time.monotonic()
    killed_why = None
    while proc.poll() is None:
        time.sleep(5.0)
        now = time.monotonic()
        ticks = _cpu_ticks(proc.pid)
        if ticks is not None and ticks != last_ticks:
            last_ticks, last_change = ticks, now
        if now > deadline:
            killed_why = f"wall-clock timeout ({timeout_s:.0f}s)"
        elif now - last_change > stall_s:
            killed_why = (f"CPU clock stalled {stall_s:.0f}s "
                          "(wedged TPU backend)")
        if killed_why:
            proc.kill()
            proc.wait()
            break
    t.join(timeout=10.0)

    if killed_why:
        print(f"bench attempt killed: {killed_why}", file=sys.stderr)
        return None
    if proc.returncode != 0:
        print(f"bench attempt exited rc={proc.returncode}", file=sys.stderr)
        return None
    for line in reversed(lines):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                if "metric" in rec and "value" in rec:
                    if rec.get("verified") is False:
                        # a fast-but-wrong record is a crash, not a result
                        print("bench attempt FAILED verification "
                              "(device scan != C++ oracle)", file=sys.stderr)
                        return None
                    return rec
            except json.JSONDecodeError:
                continue
    print("bench attempt produced no JSON result line", file=sys.stderr)
    return None


def _wait_for_backend(budget_s: float, probe_every_s: float = 120.0):
    """Block until the TPU backend answers a cheap device probe (tiny
    subprocess; a down tunnel hangs register() at interpreter start with
    ~0 CPU, so only a subprocess + timeout can test it safely).  Bounded:
    returns False when the budget runs out — a tunnel outage then fails
    the attempts quickly instead of each one eating its full stall window.
    """
    deadline = time.time() + budget_s
    first = True
    while True:
        probe_t = min(180.0, max(10.0, deadline - time.time()))
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('UP')"],
                capture_output=True, text=True, timeout=probe_t)
            if r.returncode == 0 and "UP" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if first:
            print("TPU backend not answering; waiting for the tunnel "
                  f"(budget {budget_s:.0f}s)", file=sys.stderr)
            first = False
        if time.time() + probe_every_s + 60.0 > deadline:
            print("TPU backend still unavailable after the wait budget",
                  file=sys.stderr)
            return False
        time.sleep(probe_every_s)


def main():
    if "--child" in sys.argv:
        child_main()
        return
    _wait_for_backend(float(os.environ.get("BROADPHASE_BENCH_WAIT_S",
                                           "3600")))
    attempts = int(os.environ.get("BROADPHASE_BENCH_ATTEMPTS", "3"))
    timeout_s = float(os.environ.get("BROADPHASE_BENCH_TIMEOUT", "2700"))
    stall_s = float(os.environ.get("BROADPHASE_BENCH_STALL", "900"))
    for attempt in range(attempts):
        if attempt:
            backoff = 60.0 * attempt
            print(f"retrying in {backoff:.0f}s (attempt "
                  f"{attempt + 1}/{attempts})", file=sys.stderr)
            time.sleep(backoff)
        rec = _run_attempt(timeout_s, stall_s)
        if rec is not None:
            print(json.dumps(rec))
            return
    print("bench FAILED: all attempts crashed, hung, or produced no "
          "result (TPU backend unavailable?)", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
