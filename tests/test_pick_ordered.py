"""Ordered (reference-exact) pick vs the recursive oracle.

`traverse.pick_ordered` must reproduce `Layer::pick`'s full contract
(reference ``src/layer.rs:364-404``): test_order-driven visit order,
shrinking-`nearest` pruning at visit time, one `get_dist` charge per
object id, result = last strictly-improving id — for ARBITRARY get_dist,
including inconsistent ones where the vectorized argmin engine may
legitimately disagree.  The oracle (`utils/oracle.py:run_pick`) is the
reference semantics port these tests compare against.

Callbacks are defined ONCE per test (not per trial) — they are static
jit arguments, so fresh lambdas would recompile every trial.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu import Index32_2D, Index64_2D, Index64_3D, layer, \
    query, traverse
from broadphase_tpu.utils import oracle

from test_query import _built_layer, _scene

SPECS = (Index32_2D, Index64_2D, Index64_3D)


def _hash_dist(oid):
    """Geometry-independent (inconsistent) f32 distance: small integers
    /16, bit-identical between numpy and jnp (explicit u32 wraparound)."""
    return np.float32((int(oid) * 2654435761) % (1 << 32) % 4096) \
        / np.float32(16.0)


def _hash_gd(gstate, nearest, oid):
    return ((oid * jnp.uint32(2654435761)) % jnp.uint32(4096)).astype(
        jnp.float32) / jnp.float32(16.0)


def _hash_gd_ray(nearest, oid):
    return _hash_gd(None, nearest, oid)


def _hash_cb(g, nearest, oid):
    return float(_hash_dist(np.uint32(oid)))


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pick_ordered_box_inconsistent_matches_oracle(spec):
    """Box geometry + geometry-independent get_dist: the early-out and
    processed-set bookkeeping must match the oracle exactly."""
    smin, smax, bmin, bmax, ids = _scene(spec, 200, seed=53)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(7)
    for trial in range(3):
        qmin = rng.uniform(-50, 20, spec.dim).astype(np.float32)
        qmax = qmin + rng.uniform(5, 40, spec.dim).astype(np.float32)
        root, sub, st, to = traverse.box_pick_state(spec, smin, smax,
                                                    qmin, qmax)
        state, got = traverse.pick_ordered(spec, state, root, sub, st, to,
                                           _hash_gd, max_distance=1e9)
        assert not bool(got.overflow)

        geom = oracle.BoxTestGeometry(smin, smax, qmin, qmax)
        want = oracle.run_pick(spec, keys, tids, geom, 1e9, _hash_cb)
        if want is None:
            assert not bool(got.found)
        else:
            assert bool(got.found)
            assert int(got.obj_id) == want[1]
            assert float(got.distance) == np.float32(want[0])


@pytest.mark.parametrize("spec", [Index32_2D, Index64_3D],
                         ids=lambda s: s.name)
def test_pick_ray_ordered_matches_oracle(spec):
    """Random rays, id-hash get_dist (inconsistent — the nearest-driven
    should_test pruning changes which objects are ever evaluated)."""
    smin, smax, bmin, bmax, ids = _scene(spec, 250, seed=59)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(9)
    hits = 0
    for trial in range(6):
        ro = rng.uniform(-45, 45, spec.dim).astype(np.float32)
        rd = rng.normal(size=spec.dim).astype(np.float32)
        if trial == 0:
            rd[0] = 0.0                      # axis-parallel component
        state, got, point = traverse.pick_ray_ordered(
            spec, state, smin, smax, ro, rd, 1e9, _hash_gd_ray)
        assert not bool(got.overflow)

        geom = oracle.RayTestGeometry(smin, smax, ro, rd, 0.0, 1e9)
        want = oracle.run_pick(spec, keys, tids, geom, 1e9, _hash_cb)
        if want is None:
            assert not bool(got.found)
        else:
            hits += 1
            assert bool(got.found)
            assert int(got.obj_id) == want[1]
            assert float(got.distance) == np.float32(want[0])
            np.testing.assert_allclose(
                np.asarray(point), ro + rd * np.float32(want[0]), rtol=1e-6)
    assert hits >= 2            # the comparison actually exercised hits


def _range_gd(gstate, nearest, oid):
    # sub-ray entry distance of the reporting cell, jittered by id
    return gstate[2][0] + _hash_gd(None, nearest, oid)


def _range_cb(g, nearest, oid):
    return float(np.float32(g.range_min) + _hash_dist(np.uint32(oid)))


def test_pick_ordered_first_visit_geometry():
    """get_dist reads the CELL geometry (sub-ray range_min) — the value
    depends on WHICH visit charged the object, so equality with the
    oracle proves both visit order and the once-per-id processed set."""
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 250, seed=61)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(11)
    hits = 0
    for trial in range(5):
        ro = rng.uniform(-45, 45, 3).astype(np.float32)
        rd = rng.normal(size=3).astype(np.float32)
        root, sub, st, to = traverse.ray_pick_state(spec, smin, smax,
                                                    ro, rd, 0.0, 1e9)
        state, got = traverse.pick_ordered(spec, state, root, sub, st, to,
                                           _range_gd, max_distance=1e9)
        geom = oracle.RayTestGeometry(smin, smax, ro, rd, 0.0, 1e9)
        want = oracle.run_pick(spec, keys, tids, geom, 1e9, _range_cb)
        if want is None:
            assert not bool(got.found)
        else:
            hits += 1
            assert bool(got.found)
            assert int(got.obj_id) == want[1]
            assert float(got.distance) == np.float32(want[0])
    assert hits >= 2


@pytest.mark.parametrize("max_depth", [2, 4])
def test_pick_ordered_max_depth(max_depth):
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 200, seed=67)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    ro = np.array([-49.0, -49.0, -49.0], np.float32)
    rd = np.array([1.0, 0.9, 1.1], np.float32)
    state, got, _ = traverse.pick_ray_ordered(
        spec, state, smin, smax, ro, rd, 1e9, _hash_gd_ray,
        max_depth=max_depth)
    geom = oracle.RayTestGeometry(smin, smax, ro, rd, 0.0, 1e9)
    want = oracle.run_pick(spec, keys, tids, geom, 1e9, _hash_cb,
                           max_depth=max_depth)
    assert (want is not None) == bool(got.found)
    if want is not None:
        assert int(got.obj_id) == want[1]
        assert float(got.distance) == np.float32(want[0])


class _ConsistentDist:
    """Projected-center ray distance (consistent narrow phase), usable
    both per-id (ordered engine) and vectorized (argmin engine).  Static
    identity is stable across trials: ray params ride in get_dist_args."""

    def __init__(self, centers):
        self.cj = jnp.asarray(centers)
        self.n = len(centers)

    def one(self, nearest, oid, ro, rd):
        c = self.cj[jnp.minimum(oid, jnp.uint32(self.n - 1))]
        t = jnp.dot(c - ro, rd)
        miss = jnp.linalg.norm(c - (ro + rd * t)) > 6.0
        return jnp.where(miss, jnp.inf, jnp.maximum(t, 0.0))

    def vec(self, cand_ids, mask, ro, rd):
        c = self.cj[jnp.minimum(cand_ids, jnp.uint32(self.n - 1))]
        t = (c - ro[None, :]) @ rd
        miss = jnp.linalg.norm(
            c - (ro[None, :] + rd[None, :] * t[:, None]), axis=-1) > 6.0
        return jnp.where(mask & ~miss, jnp.maximum(t, 0.0), jnp.inf)


def test_pick_ordered_consistent_agrees_with_vectorized():
    """For a CONSISTENT narrow phase (distance >= cell entry distance)
    the ordered engine and the vectorized pick_ray agree — the
    documented regime where the argmin shortcut is exact."""
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 250, seed=71)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    centers = ((bmin + bmax) / 2).astype(np.float32)
    dist = _ConsistentDist(centers)
    rng = np.random.default_rng(13)
    hits = 0
    for trial in range(5):
        ro = rng.uniform(-45, 45, 3).astype(np.float32)
        rd = rng.normal(size=3).astype(np.float32)
        rd /= np.float32(np.linalg.norm(rd))
        roj, rdj = jnp.asarray(ro), jnp.asarray(rd)

        state, got, _ = traverse.pick_ray_ordered(
            spec, state, smin, smax, ro, rd, 1e9, dist.one,
            get_dist_args=(roj, rdj))
        state, want_v = query.pick_ray(spec, state, smin, smax, ro, rd,
                                       1e9, dist.vec,
                                       get_dist_args=(roj, rdj))
        assert bool(got.found) == bool(want_v.found)
        if bool(got.found):
            hits += 1
            assert int(got.obj_id) == int(want_v.obj_id)
            assert float(got.distance) == float(want_v.distance)
    assert hits >= 2


def test_pick_ordered_stack_overflow_flag():
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=73)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    root, sub, st, to = traverse.box_pick_state(spec, smin, smax,
                                                smin, smax)
    state, got = traverse.pick_ordered(spec, state, root, sub, st, to,
                                       _hash_gd, max_distance=1e9,
                                       stack_cap=4)
    assert bool(got.overflow)


def _high_gd(gstate, nearest, oid):
    return _hash_gd(gstate, nearest, oid) + jnp.float32(1e6)


def test_pick_ordered_empty_and_miss():
    spec = Index32_2D
    smin = np.full(2, -50.0, np.float32)
    smax = np.full(2, 50.0, np.float32)
    state = layer.make_layer(spec, 64)
    root, sub, st, to = traverse.box_pick_state(spec, smin, smax,
                                                smin, smax)
    state, got = traverse.pick_ordered(spec, state, root, sub, st, to,
                                       _hash_gd, max_distance=1e9)
    assert not bool(got.found)
    assert np.isinf(float(got.distance))

    # non-empty layer, but every distance above max_distance
    smin2, smax2, bmin, bmax, ids = _scene(spec, 50, seed=79)
    state2, _, _ = _built_layer(spec, smin2, smax2, bmin, bmax, ids)
    root, sub, st, to = traverse.box_pick_state(spec, smin2, smax2,
                                                smin2, smax2)
    state2, got2 = traverse.pick_ordered(spec, state2, root, sub, st, to,
                                         _high_gd, max_distance=10.0)
    assert not bool(got2.found)


# ---------------------------------------------------------------------------
# Adversarial fuzz: custom geometry stressing exactly the ordered contract
# ---------------------------------------------------------------------------

class _WeirdOracleGeometry(oracle.BoxTestGeometry):
    """Box overlap + depth-PERMUTED test_order + nearest-DEPENDENT
    should_test: the two places where a traversal-order bug hides."""

    def __init__(self, cell_min, cell_max, test_min, test_max, depth=0):
        super().__init__(cell_min, cell_max, test_min, test_max)
        self.depth = depth

    def subdivide(self):
        out = []
        for g in super().subdivide():
            out.append(_WeirdOracleGeometry(g.cell_min, g.cell_max,
                                            self.test_min, self.test_max,
                                            self.depth + 1))
        return out

    def test_order(self):
        fanout = 1 << self.dim
        mult = 5 if fanout == 8 else 3          # coprime => permutation
        return [(mult * j + self.depth) % fanout for j in range(fanout)]

    def should_test(self, nearest):
        ext = np.float32(np.max(self.cell_max - self.cell_min))
        return (bool(np.all(self.cell_min <= self.test_max)
                     and np.all(self.cell_max >= self.test_min))
                and nearest > float(ext * np.float32(0.25)))


def _weird_subdivide(gstate):
    cmin, cmax, qmin, qmax, depth = gstate
    dim = cmin.shape[-1]
    center = cmin + (cmax - cmin) / jnp.float32(2)
    mins, maxs = [], []
    for child in range(1 << dim):
        sidev = jnp.array([bool((child >> a) & 1) for a in range(dim)])
        mins.append(jnp.where(sidev[None, :], center, cmin))
        maxs.append(jnp.where(sidev[None, :], cmax, center))
    rep = lambda x: jnp.broadcast_to(x[None], (1 << dim,) + x.shape)
    return (jnp.stack(mins), jnp.stack(maxs), rep(qmin), rep(qmax),
            rep(depth) + 1)


def _weird_should_test(gstate, nearest):
    cmin, cmax, qmin, qmax, _ = gstate
    overlap = jnp.all((cmin <= qmax) & (cmax >= qmin), axis=-1)
    ext = jnp.max(cmax - cmin, axis=-1)
    return overlap & (nearest > ext * jnp.float32(0.25))


def _weird_test_order(gstate):
    dim = gstate[0].shape[-1]
    fanout = 1 << dim
    mult = 5 if fanout == 8 else 3
    depth = gstate[4][0]
    return (mult * jnp.arange(fanout, dtype=jnp.int32) + depth) % fanout


@pytest.mark.parametrize("spec", [Index32_2D, Index64_3D],
                         ids=lambda s: s.name)
def test_pick_ordered_weird_geometry_fuzz(spec):
    rng = np.random.default_rng(97)
    for scene_seed in (101, 103):
        smin, smax, bmin, bmax, ids = _scene(spec, 150, seed=scene_seed)
        state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
        for trial in range(4):
            qmin = rng.uniform(-50, 20, spec.dim).astype(np.float32)
            qmax = qmin + rng.uniform(5, 60, spec.dim).astype(np.float32)
            root = (jnp.asarray(smin).reshape(1, -1),
                    jnp.asarray(smax).reshape(1, -1),
                    jnp.asarray(qmin).reshape(1, -1),
                    jnp.asarray(qmax).reshape(1, -1),
                    jnp.zeros((1,), jnp.int32))
            state, got = traverse.pick_ordered(
                spec, state, root, _weird_subdivide, _weird_should_test,
                _weird_test_order, _hash_gd, max_distance=100.0)
            assert not bool(got.overflow)

            geom = _WeirdOracleGeometry(smin, smax, qmin, qmax)
            want = oracle.run_pick(spec, keys, tids, geom, 100.0, _hash_cb)
            if want is None:
                assert not bool(got.found), (scene_seed, trial)
            else:
                assert bool(got.found), (scene_seed, trial)
                assert int(got.obj_id) == want[1], (scene_seed, trial)
                assert float(got.distance) == np.float32(want[0])


def test_pick_ordered_min_depth_layer():
    """min_depth > 0 trees: the walk's shallow levels hold no keys (all
    slices empty until depth >= min_depth) — partition bookkeeping must
    stay exact."""
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 150, seed=83)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids,
                                     min_depth=2)
    ro = np.array([-40.0, -30.0, -20.0], np.float32)
    rd = np.array([0.7, 1.0, 0.9], np.float32)
    state, got, _ = traverse.pick_ray_ordered(
        spec, state, smin, smax, ro, rd, 1e9, _hash_gd_ray)
    geom = oracle.RayTestGeometry(smin, smax, ro, rd, 0.0, 1e9)
    want = oracle.run_pick(spec, keys, tids, geom, 1e9, _hash_cb)
    assert (want is not None) == bool(got.found)
    if want is not None:
        assert int(got.obj_id) == want[1]
        assert float(got.distance) == np.float32(want[0])


def test_pick_ordered_id_bound_fast_path():
    """id_bound (static dense-id bound) indexes the processed set by id
    directly, skipping the two per-call sorts — must be result-identical
    to the default grouped path."""
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 200, seed=89)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(29)
    for trial in range(3):
        ro = rng.uniform(-45, 45, 3).astype(np.float32)
        rd = rng.normal(size=3).astype(np.float32)
        state, a, _ = traverse.pick_ray_ordered(
            spec, state, smin, smax, ro, rd, 1e9, _hash_gd_ray)
        state, b, _ = traverse.pick_ray_ordered(
            spec, state, smin, smax, ro, rd, 1e9, _hash_gd_ray,
            id_bound=200)
        assert bool(a.found) == bool(b.found)
        if bool(a.found):
            assert int(a.obj_id) == int(b.obj_id)
            assert float(a.distance) == float(b.distance)


def test_pick_ordered_truncated_layer_flags_overflow():
    """A layer built into a too-small capacity drops cells (its overflow
    flag is set); picks on it must surface that — never a silently
    trusted result on a truncated tree."""
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 100, seed=91)
    state = layer.build(spec, smin, smax, bmin, bmax, ids,
                        out_capacity=64)   # << tree size: truncates
    assert bool(state.overflow)
    state, got, _ = traverse.pick_ray_ordered(
        spec, state, smin, smax, np.zeros(3, np.float32),
        np.ones(3, np.float32), 1e9, _hash_gd_ray)
    assert bool(got.overflow)


def test_pick_ordered_identical_cluster_worst_case():
    """All objects identical and co-located: every candidate folds through
    one slice sequentially (the DFS's worst case) — must terminate, match
    the oracle, and not overflow a default stack."""
    spec = Index64_3D
    smin = np.zeros(3, np.float32)
    smax = np.full(3, 10.0, np.float32)
    n = 300
    bmin = np.full((n, 3), 1.0, np.float32)
    bmax = np.full((n, 3), 1.4, np.float32)
    ids = np.arange(n, dtype=np.uint32)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    ro = np.zeros(3, np.float32)
    rd = np.ones(3, np.float32)
    state, got, _ = traverse.pick_ray_ordered(
        spec, state, smin, smax, ro, rd, 1e9, _hash_gd_ray, id_bound=n)
    assert not bool(got.overflow)
    geom = oracle.RayTestGeometry(smin, smax, ro, rd, 0.0, 1e9)
    want = oracle.run_pick(spec, keys, tids, geom, 1e9, _hash_cb)
    assert want is not None and bool(got.found)
    assert int(got.obj_id) == want[1]
    assert float(got.distance) == np.float32(want[0])
