"""Sublinear tree-descent query engine vs the linear replay engine.

Both engines must be bit-identical (the tree engine gathers a candidate
superset and re-runs the exact replayed accept test — see
``broadphase_tpu/singleq.py``); these tests force ``engine="tree"`` on
scenes small enough that the dispatcher would pick the linear engine, and
compare result-for-result: ids, counts, pick winners and distances,
including distance ties and degenerate query geometry.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu import Index32_2D, Index64_2D, Index64_3D, layer, query
from broadphase_tpu import singleq

SPECS = [Index32_2D, Index64_2D, Index64_3D]


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


def _res_tuple(res):
    n = int(res.count)
    return list(np.asarray(res.ids[:n])), n, bool(res.overflow)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("max_depth", [None, 3])
def test_box_tree_matches_linear(spec, max_depth):
    smin, smax, bmin, bmax, ids = _scene(spec, 400, seed=31)
    state = layer.build(spec, smin, smax, bmin, bmax, ids)

    rng = np.random.default_rng(7)
    queries = []
    for _ in range(6):
        qmin = rng.uniform(-50, 30, spec.dim).astype(np.float32)
        qmax = qmin + rng.uniform(0.5, 20, spec.dim).astype(np.float32)
        queries.append((qmin, qmax))
    # point query, whole-system query, query outside the system box,
    # inverted (empty interior, inclusive-overlap semantics) query
    p = rng.uniform(-40, 40, spec.dim).astype(np.float32)
    queries.append((p, p.copy()))
    queries.append((smin - 1.0, smax + 1.0))
    queries.append((smax + 5.0, smax + 9.0))
    queries.append((p + 3.0, p - 3.0))

    for i, (qmin, qmax) in enumerate(queries):
        _, want = query.test_box(spec, state, smin, smax, (qmin, qmax),
                                 result_cap=1024, max_depth=max_depth,
                                 engine="linear")
        _, got = query.test_box(spec, state, smin, smax, (qmin, qmax),
                                result_cap=1024, max_depth=max_depth,
                                engine="tree", candidate_cap=8192)
        assert _res_tuple(got) == _res_tuple(want), f"query {i}"


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("max_depth", [None, 4])
def test_ray_tree_matches_linear(spec, max_depth):
    smin, smax, bmin, bmax, ids = _scene(spec, 400, seed=33)
    state = layer.build(spec, smin, smax, bmin, bmax, ids)

    rng = np.random.default_rng(9)
    for trial in range(8):
        origin = rng.uniform(-60, 60, spec.dim).astype(np.float32)
        direction = rng.normal(size=spec.dim).astype(np.float32)
        rmin, rmax = 0.0, np.inf
        if trial == 2:
            direction[0] = 0.0           # axis-parallel component
        if trial == 3:
            direction = np.zeros(spec.dim, np.float32)
            direction[-1] = 1.0          # exactly axis-aligned
        if trial == 4:
            rmin, rmax = 5.0, 40.0       # bounded range
        if trial == 5:
            direction = -direction       # backwards
        _, want = query.test_ray(spec, state, smin, smax, origin, direction,
                                 rmin, rmax, result_cap=1024,
                                 max_depth=max_depth, engine="linear")
        _, got = query.test_ray(spec, state, smin, smax, origin, direction,
                                rmin, rmax, result_cap=1024,
                                max_depth=max_depth, engine="tree",
                                candidate_cap=8192)
        assert _res_tuple(got) == _res_tuple(want), f"trial {trial}"


def _sphere_get_dist(centers, radii):
    def get_dist(cand_ids, mask, ro, dirn):
        c = jnp.asarray(centers)[cand_ids] - ro[None, :]
        t = jnp.sum(c * dirn[None, :], axis=-1)
        d2 = jnp.sum(c * c, axis=-1) - t * t
        r2 = jnp.asarray(radii)[cand_ids] ** 2
        hit = (d2 <= r2) & (t + jnp.sqrt(jnp.maximum(r2 - d2, 0.0)) >= 0)
        return jnp.where(hit, t - jnp.sqrt(jnp.maximum(r2 - d2, 0.0)),
                         jnp.inf)
    return get_dist


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pick_ray_tree_matches_linear(spec):
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=35)
    state = layer.build(spec, smin, smax, bmin, bmax, ids)
    centers = ((bmin + bmax) / 2.0).astype(np.float32)
    radii = (np.min(bmax - bmin, axis=1) / 2.0).astype(np.float32)
    get_dist = _sphere_get_dist(centers, radii)

    rng = np.random.default_rng(11)
    for trial in range(6):
        origin = rng.uniform(-45, 45, spec.dim).astype(np.float32)
        direction = rng.normal(size=spec.dim).astype(np.float32)
        direction /= np.linalg.norm(direction)
        md = np.inf if trial % 2 == 0 else 60.0
        _, want = query.pick_ray(spec, state, smin, smax, origin, direction,
                                 md, get_dist,
                                 (jnp.asarray(origin), jnp.asarray(direction)),
                                 engine="linear")
        _, got = query.pick_ray(spec, state, smin, smax, origin, direction,
                                md, get_dist,
                                (jnp.asarray(origin), jnp.asarray(direction)),
                                engine="tree", candidate_cap=8192)
        assert bool(got.found) == bool(want.found), f"trial {trial}"
        assert float(got.distance) == float(want.distance), f"trial {trial}"
        assert int(got.obj_id) == int(want.obj_id), f"trial {trial}"
        assert bool(got.overflow) == bool(want.overflow), f"trial {trial}"


@pytest.mark.parametrize("spec", [Index32_2D, Index64_3D],
                         ids=lambda s: s.name)
def test_pick_ray_tree_distance_tie(spec):
    """Co-located equal objects: the tie must resolve to the linear
    engine's winner (the reference's first-visited object)."""
    dim = spec.dim
    smin = np.full(dim, -50.0, np.float32)
    smax = np.full(dim, 50.0, np.float32)
    n = 12
    bmin = np.tile(np.full(dim, 4.0, np.float32), (n, 1))
    bmax = np.tile(np.full(dim, 6.0, np.float32), (n, 1))
    ids = np.arange(n, dtype=np.uint32)[::-1].copy()   # descending ids
    state = layer.build(spec, smin, smax, bmin, bmax, ids)
    centers = ((bmin + bmax) / 2.0).astype(np.float32)
    radii = np.full(n, 1.0, np.float32)
    get_dist = _sphere_get_dist(centers, radii)

    origin = np.full(dim, -20.0, np.float32)
    direction = (centers[0] - origin).astype(np.float32)
    direction /= np.linalg.norm(direction)
    args = (jnp.asarray(origin), jnp.asarray(direction))
    _, want = query.pick_ray(spec, state, smin, smax, origin, direction,
                             np.inf, get_dist, args, engine="linear")
    _, got = query.pick_ray(spec, state, smin, smax, origin, direction,
                            np.inf, get_dist, args, engine="tree")
    assert bool(want.found) and bool(got.found)
    assert int(got.obj_id) == int(want.obj_id)
    assert float(got.distance) == float(want.distance)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_tree_overflow_flags(spec):
    """Candidate-buffer and frontier overflow must be flagged, never
    silently truncated."""
    smin, smax, bmin, bmax, ids = _scene(spec, 500, seed=37)
    state = layer.build(spec, smin, smax, bmin, bmax, ids)

    # whole-system box: every element is a candidate; 64 slots overflow
    _, res = query.test_box(spec, state, smin, smax, (smin, smax),
                            result_cap=4096, engine="tree",
                            candidate_cap=64)
    assert bool(res.overflow)

    # tiny frontier on a ray through the scene center.  candidate_cap must
    # be SMALL too: the early-exit rule stops the descent (and so never
    # pressures the frontier) as soon as everything under it fits the
    # candidate buffer — with both caps tiny, the descent must continue
    # and the 2-slot frontier truncates, which must be flagged.
    origin = np.full(spec.dim, -49.0, np.float32)
    direction = np.ones(spec.dim, np.float32)
    _, res = singleq.test_ray(spec, state, smin, smax, origin, direction,
                              0.0, np.inf, result_cap=4096,
                              candidate_cap=64, frontier_cap=2)
    assert bool(res.overflow)


def test_dispatcher_env_and_threshold(monkeypatch):
    """The auto dispatcher picks linear below the capacity threshold and
    honours BROADPHASE_QUERY_ENGINE."""
    spec = Index32_2D
    smin, smax, bmin, bmax, ids = _scene(spec, 64, seed=41)
    state = layer.build(spec, smin, smax, bmin, bmax, ids)
    assert query._engine(None, state.ids.shape[0]) == "linear"
    assert query._engine(None, 1 << 20) == "tree"
    monkeypatch.setenv("BROADPHASE_QUERY_ENGINE", "tree")
    assert query._engine(None, 8) == "tree"
    monkeypatch.setenv("BROADPHASE_QUERY_ENGINE", "linear")
    assert query._engine(None, 1 << 20) == "linear"
    with pytest.raises(ValueError):
        query._engine("bogus", 8)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_tree_engines_on_empty_and_duplicate_layers(spec):
    """Empty layer and duplicate-id multi-cell layers behave identically
    under both engines."""
    dim = spec.dim
    smin = np.full(dim, -50.0, np.float32)
    smax = np.full(dim, 50.0, np.float32)
    empty = layer.make_layer(spec, 256)
    q = (np.full(dim, -10.0, np.float32), np.full(dim, 10.0, np.float32))
    _, res = query.test_box(spec, empty, smin, smax, q, result_cap=64,
                            engine="tree")
    assert int(res.count) == 0 and not bool(res.overflow)

    # objects straddling cell boundaries -> one id in several cells
    rng = np.random.default_rng(43)
    n = 200
    bmin = rng.uniform(-49, 39, size=(n, dim)).astype(np.float32)
    bmax = bmin + rng.uniform(5, 10, size=(n, dim)).astype(np.float32)
    ids = (np.arange(n, dtype=np.uint32) % 50)         # duplicate ids too
    state = layer.build(spec, smin, smax, bmin, bmax, ids)
    _, want = query.test_box(spec, state, smin, smax, q, result_cap=256,
                             engine="linear")
    _, got = query.test_box(spec, state, smin, smax, q, result_cap=256,
                            engine="tree")
    assert _res_tuple(got) == _res_tuple(want)
