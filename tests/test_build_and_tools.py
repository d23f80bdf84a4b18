"""build()/extend() equivalence, LayerBuilder, and CLI tooling tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from broadphase_tpu import Index32_2D, Index64_3D, LayerBuilder, layer


def _scene(spec, n, seed, lo=-50.0, hi=50.0):
    rng = np.random.default_rng(seed)
    dim = spec.dim
    size = rng.uniform(0.5, 8.0, size=(n, dim)).astype(np.float32)
    bmin = rng.uniform(lo, hi - 8.0, size=(n, dim)).astype(np.float32)
    bmax = bmin + size
    ids = np.arange(n, dtype=np.uint32)
    smin = np.full(dim, lo, np.float32)
    smax = np.full(dim, hi, np.float32)
    return smin, smax, bmin, bmax, ids


@pytest.mark.parametrize("spec", [Index32_2D, Index64_3D],
                         ids=lambda s: s.name)
def test_build_equals_clear_extend_sort(spec):
    smin, smax, bmin, bmax, ids = _scene(spec, 400, seed=3)
    bmin[7] = -1000.0  # one invalid object

    st1 = layer.build(spec, smin, smax, bmin, bmax, ids)
    st2 = layer.make_layer(spec, 400 * 2 ** spec.dim)
    st2 = layer.extend(spec, st2, smin, smax, bmin, bmax, ids)
    st2 = layer.sort(spec, st2)

    k1, i1, c1 = layer.tree_to_numpy(spec, st1)
    k2, i2, c2 = layer.tree_to_numpy(spec, st2)
    assert c1 == c2
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(i1, i2)
    assert int(st1.invalid_count) == int(st2.invalid_count) == 1


def test_build_out_capacity_slices_and_flags():
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=4)
    full = layer.build(spec, smin, smax, bmin, bmax, ids)
    count = int(full.count)
    ok = layer.build(spec, smin, smax, bmin, bmax, ids,
                     out_capacity=count + 8)
    assert not bool(ok.overflow) and int(ok.count) == count
    k1, i1, _ = layer.tree_to_numpy(spec, full)
    k2, i2, _ = layer.tree_to_numpy(spec, ok)
    np.testing.assert_array_equal(k1, k2)

    clipped = layer.build(spec, smin, smax, bmin, bmax, ids,
                          out_capacity=count - 5)
    assert bool(clipped.overflow)
    assert int(clipped.count) == count - 5


def test_layer_builder_roundtrip():
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 200, seed=5)
    cfg = LayerBuilder(min_depth=1, collision_capacity=8192)
    st = cfg.build(spec, smin, smax, bmin, bmax, ids)
    assert int(st.min_depth) == 1
    st, res = cfg.scan(spec, st)
    assert not bool(res.overflow)
    st, res2 = cfg.scan_filtered(spec, st, lambda a, b: a != b)
    assert int(res2.count) == int(res.count)


def test_cli_pipeline(tmp_path):
    # PYTHONPATH="" drops the axon_site sitecustomize hook, which dials the
    # TPU tunnel at interpreter start in EVERY subprocess (hanging the CPU
    # suite whenever the tunnel is down, regardless of JAX_PLATFORMS).
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    scene_path = tmp_path / "s.br_scene"
    r = subprocess.run(
        [sys.executable, "-m", "broadphase_tpu.tools", "gen_boxes",
         "--count", "200", "--density", "0.001", "--out", str(scene_path)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr
    assert scene_path.exists()

    out_dir = tmp_path / "val"
    r = subprocess.run(
        [sys.executable, "-m", "broadphase_tpu.tools",
         "gen_validation_data", "--in", str(scene_path),
         "--out-dir", str(out_dir)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr
    for name in ("0_layer_unsorted", "1_layer_sorted", "2_layer_collisions"):
        assert (out_dir / f"{name}.br_scene").exists()

    # the golden trio is consistent: device build/scan matches file contents
    from broadphase_tpu.utils import scene as scene_io
    sc_sorted = scene_io.load(out_dir / "1_layer_sorted.br_scene")
    sc_col = scene_io.load(out_dir / "2_layer_collisions.br_scene")
    sc = scene_io.load(scene_path)
    st = layer.build(Index64_3D, sc.system_min, sc.system_max,
                     sc.bounds_min, sc.bounds_max, sc.ids)
    keys, tids, cnt = layer.tree_to_numpy(Index64_3D, st)
    np.testing.assert_array_equal(keys, sc_sorted.layer.keys)
    np.testing.assert_array_equal(tids, sc_sorted.layer.ids)
    st, res = layer.scan(Index64_3D, st, 64 * len(sc.ids))
    got = np.array(layer.scan_result_to_numpy(res), np.uint32).reshape(-1, 2)
    np.testing.assert_array_equal(got, sc_col.collisions)


def test_ball_pit_example_runs():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    root = os.path.dirname(os.path.dirname(__file__))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "ball_pit.py"),
         "--balls", "100", "--frames", "5"],
        capture_output=True, text=True, env=env, cwd=root, timeout=1500)
    assert r.returncode == 0, r.stderr
    assert "frames, 100 ball slots" in r.stdout


def test_layers_equal_and_checkpoint_roundtrip():
    from broadphase_tpu.utils import scene as scene_io
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 150, seed=6)
    st = layer.build(spec, smin, smax, bmin, bmax, ids)
    assert layer.layers_equal(spec, st, st)

    sl = layer.layer_to_scene_layer(spec, st)
    st2 = layer.layer_from_scene_layer(spec, sl,
                                       capacity=int(st.count) + 16)
    assert layer.layers_equal(spec, st, st2)

    # different min_depth -> not equal (reference Eq semantics)
    st3 = layer.build(spec, smin, smax, bmin, bmax, ids, min_depth=1)
    assert not layer.layers_equal(spec, st, st3)

    # scan of the restored layer matches the original
    _, r1 = layer.scan(spec, st, 8192)
    _, r2 = layer.scan(spec, st2, 8192)
    assert layer.scan_result_to_numpy(r1) == layer.scan_result_to_numpy(r2)


def test_profiling_utils():
    from broadphase_tpu.utils import profiling
    import jax.numpy as jnp
    import jax
    f = jax.jit(lambda x: (x * 2).sum())
    stats = profiling.timed(f, jnp.arange(1000), iters=3, warmup=1)
    assert stats["p50_ms"] >= 0
    profiling.device_memory_stats()  # must not raise


def test_scan_auto_grows_until_fit():
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 500, seed=8)
    st = layer.build(spec, smin, smax, bmin, bmax, ids)
    # start tiny so at least one doubling must happen
    st, res = layer.scan_auto(spec, st, initial_capacity=64)
    assert not bool(res.overflow)
    _, ref = layer.scan(spec, st, 64 * 1024)
    assert layer.scan_result_to_numpy(res) == layer.scan_result_to_numpy(ref)


def test_compiled_memory_budget_regression():
    """Allocation-regression metric (the reference's counting allocator,
    examples/main.rs:38-104, reimagined for compiler-planned memory):
    XLA's temp budget for the 100k bench-shaped scan step must stay
    within bounds — a silently doubled buffer (e.g. a lost in-place
    reuse, an accidental extra copy of the emit buffer) trips this
    before it trips the TPU HBM limit at 1M."""
    from broadphase_tpu import bench_caps
    from broadphase_tpu.utils.profiling import compiled_memory_analysis

    spec = Index64_3D
    rng = np.random.default_rng(5)
    n = 100_000
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 1000.0, np.float32)
    bmin = rng.uniform(0, 990, (n, 3)).astype(np.float32)
    bmax = bmin + rng.uniform(1, 10, (n, 3)).astype(np.float32)
    ids = np.arange(n, dtype=np.uint32)
    st = layer.build(spec, smin, smax, bmin, bmax, ids,
                     out_capacity=bench_caps.tree_capacity(n))
    ma = compiled_memory_analysis(layer.scan, spec, st,
                                  bench_caps.pair_capacity(n),
                                  bench_caps.emit_capacity(n))
    if ma is None:
        pytest.skip("backend exposes no memory analysis")
    # measured 423 MB on the CPU backend (2026-08); generous headroom for
    # XLA drift, tight enough that a doubled major buffer (+160 MB for a
    # stray emit-buffer copy) fails
    assert ma["temp_size_in_bytes"] < 560 * 1024 * 1024, ma
    # inputs/outputs are fixed by the capacity contract, not XLA's whims
    assert ma["argument_size_in_bytes"] < 8 * 1024 * 1024, ma
    assert ma["output_size_in_bytes"] < 16 * 1024 * 1024, ma


def test_show_html_inspector(tmp_path):
    """`show --html` (the reference GUI's headless analog): the embedded
    sweep-event stream must reproduce the oracle pair set exactly, and
    the file must be self-contained (no external refs)."""
    import json
    import re

    from broadphase_tpu.tools.__main__ import main as tools_main
    from broadphase_tpu.utils import gen, oracle, scene as sio

    scene_p = tmp_path / "s.br_scene"
    html_p = tmp_path / "s.html"
    sc = gen.gen_boxes(count=80, density=1.0 / 1000.0, seed=9)
    sio.save(str(scene_p), sc)
    rc = tools_main(["show", str(scene_p), "--html", str(html_p)])
    assert rc == 0 and html_p.exists()
    src = html_p.read_text()
    assert "http://" not in src.replace("http://www.w3.org/2000/svg", "")
    d = json.loads(re.search(r"const D = (\{.*?\});\n", src, re.S).group(1))
    pairs = set()
    for i, (_pops, _skipped, partners) in enumerate(d["events"]):
        a = d["cells"][i][0]
        for j in partners:
            b = d["cells"][j][0]
            pairs.add((max(a, b), min(a, b)))
    pk, pi, _ = oracle.extend(Index64_3D, sc.system_min, sc.system_max,
                              sc.bounds_min, sc.bounds_max, sc.ids)
    pk, pi = oracle.sort_tree(pk, pi)
    want = set((max(a, b), min(a, b))
               for a, b in oracle.scan(Index64_3D, pk, pi))
    assert pairs == want
    assert len(d["objs"]) == 80
