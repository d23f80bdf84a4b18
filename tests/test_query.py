"""Device query engine vs the oracle's recursive test_impl port.

The oracle (tests the reference semantics, ``src/layer.rs:167-239``) walks
the tree recursively with f32 cell halving; the device engine replays each
element's halving path elementwise.  Results must match id-for-id.
"""

import numpy as np
import pytest

from broadphase_tpu import Index32_2D, Index64_2D, Index64_3D, layer, query
from broadphase_tpu.utils import oracle

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


def _built_layer(spec, smin, smax, bmin, bmax, ids, min_depth=0):
    state = layer.build(spec, smin, smax, bmin, bmax, ids,
                        min_depth=min_depth)
    keys, tids, _ = oracle.extend(spec, smin, smax, bmin, bmax, ids,
                                  min_depth=min_depth)
    keys, tids = oracle.sort_tree(keys, tids)
    return state, keys, tids


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("max_depth", [None, 3])
def test_test_box_matches_oracle(spec, max_depth):
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=11)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)

    rng = np.random.default_rng(5)
    for trial in range(4):
        qmin = rng.uniform(-50, 30, spec.dim).astype(np.float32)
        qmax = qmin + rng.uniform(1, 25, spec.dim).astype(np.float32)
        state, res = query.test_box(spec, state, smin, smax,
                                    (qmin, qmax), result_cap=512,
                                    max_depth=max_depth)
        got = list(np.asarray(res.ids[: int(res.count)]))
        geom = oracle.BoxTestGeometry(smin, smax, qmin, qmax)
        want = oracle.run_test(spec, keys, tids, geom, max_depth=max_depth)
        assert got == want, f"trial {trial}"


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("max_depth", [None, 4])
def test_test_ray_matches_oracle(spec, max_depth):
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=13)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)

    rng = np.random.default_rng(6)
    for trial in range(6):
        origin = rng.uniform(-45, 45, spec.dim).astype(np.float32)
        direction = rng.normal(size=spec.dim).astype(np.float32)
        if trial == 2:
            direction[0] = 0.0      # axis-parallel case
        if trial == 3:
            direction = np.zeros(spec.dim, np.float32)
            direction[-1] = 1.0     # exactly axis-aligned
        state, res = query.test_ray(spec, state, smin, smax,
                                    origin, direction, 0.0, np.inf,
                                    result_cap=512, max_depth=max_depth)
        got = list(np.asarray(res.ids[: int(res.count)]))
        geom = oracle.RayTestGeometry(smin, smax, origin, direction,
                                      0.0, np.inf)
        want = oracle.run_test(spec, keys, tids, geom, max_depth=max_depth)
        assert got == want, f"trial {trial}"


@pytest.mark.parametrize("spec", [Index32_2D, Index64_3D],
                         ids=lambda s: s.name)
def test_pick_ray_matches_oracle(spec):
    smin, smax, bmin, bmax, ids = _scene(spec, 200, seed=17)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    centers = (bmin + bmax) / 2.0
    radii = np.min(bmax - bmin, axis=1) / 2.0

    def ray_sphere_np(origin, direction, oid):
        # exact ray->sphere distance; inf on miss
        c = centers[oid] - origin
        dn = direction / np.linalg.norm(direction)
        t = float(np.dot(c, dn))
        d2 = float(np.dot(c, c)) - t * t
        r2 = float(radii[oid]) ** 2
        if d2 > r2 or t + np.sqrt(max(r2 - d2, 0.0)) < 0:
            return np.inf
        return t - np.sqrt(r2 - d2)

    import jax.numpy as jnp

    def get_dist(cand_ids, mask, ro, dirn):
        c = jnp.asarray(centers)[cand_ids] - ro[None, :]
        t = jnp.sum(c * dirn[None, :], axis=-1)
        d2 = jnp.sum(c * c, axis=-1) - t * t
        r2 = jnp.asarray(radii)[cand_ids] ** 2
        hit = (d2 <= r2) & (t + jnp.sqrt(jnp.maximum(r2 - d2, 0.0)) >= 0)
        return jnp.where(hit, t - jnp.sqrt(jnp.maximum(r2 - d2, 0.0)),
                         jnp.inf)

    rng = np.random.default_rng(23)
    hits = 0
    for trial in range(8):
        origin = rng.uniform(-45, 45, spec.dim).astype(np.float32)
        if trial % 2 == 0:
            # aim at a random object's center so rays actually hit
            target = centers[rng.integers(len(ids))]
            direction = (target - origin).astype(np.float32)
        else:
            direction = rng.normal(size=spec.dim).astype(np.float32)
        dirn = (direction / np.linalg.norm(direction)).astype(np.float32)
        state, res = query.pick_ray(spec, state, smin, smax,
                                    origin, direction, np.float32(1e9),
                                    get_dist,
                                    (jnp.asarray(origin), jnp.asarray(dirn)))
        geom = oracle.RayTestGeometry(smin, smax, origin, direction,
                                      0.0, 1e9)
        want = oracle.run_pick(spec, keys, tids, geom, 1e9,
                               lambda g, nearest, oid:
                               ray_sphere_np(origin, direction, oid))
        if want is None:
            assert not bool(res.found), f"trial {trial}"
        else:
            hits += 1
            assert bool(res.found), f"trial {trial}"
            assert int(res.obj_id) == want[1], f"trial {trial}"
            # device narrow phase runs in f32, the numpy oracle in f64
            np.testing.assert_allclose(float(res.distance), want[0],
                                       rtol=1e-4, atol=1e-4)
    assert hits > 0  # at least one ray actually hit something


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_generic_test_protocol(spec):
    """query.test with a custom monotone predicate == test_box with the
    equivalent box predicate."""
    smin, smax, bmin, bmax, ids = _scene(spec, 150, seed=29)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    qmin = np.full(spec.dim, -10.0, np.float32)
    qmax = np.full(spec.dim, 15.0, np.float32)

    import jax.numpy as jnp

    def should_test(cmin, cmax):
        return jnp.all((cmin <= jnp.asarray(qmax)[None, :]) &
                       (cmax >= jnp.asarray(qmin)[None, :]), axis=-1)

    state, res1 = query.test(spec, state, smin, smax, should_test,
                             result_cap=512)
    state, res2 = query.test_box(spec, state, smin, smax, (qmin, qmax),
                                 result_cap=512)
    assert list(np.asarray(res1.ids)) == list(np.asarray(res2.ids))
    assert int(res1.count) == int(res2.count)


# ---------------------------------------------------------------------------
# Batched queries: each row must be bit-identical to the single-query call
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
def test_test_box_batch_matches_single(spec):
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=21)
    state, _, _ = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(9)
    Q = 7
    qmin = rng.uniform(-50, 30, (Q, spec.dim)).astype(np.float32)
    qmax = qmin + rng.uniform(1, 25, (Q, spec.dim)).astype(np.float32)
    state, batch = query.test_box_batch(spec, state, smin, smax,
                                        (qmin, qmax), result_cap=512)
    for q in range(Q):
        state, single = query.test_box(spec, state, smin, smax,
                                       (qmin[q], qmax[q]), result_cap=512)
        assert int(batch.count[q]) == int(single.count)
        np.testing.assert_array_equal(np.asarray(batch.ids[q]),
                                      np.asarray(single.ids))
        assert bool(batch.overflow[q]) == bool(single.overflow)


@pytest.mark.parametrize("spec", [Index64_3D, Index64_2D],
                         ids=lambda s: s.name)
def test_test_ray_batch_matches_single(spec):
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=23)
    state, _, _ = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(11)
    Q = 6
    ro = rng.uniform(-50, 50, (Q, spec.dim)).astype(np.float32)
    rd = rng.uniform(-1, 1, (Q, spec.dim)).astype(np.float32)
    rd[0, 0] = 0.0                              # axis-parallel case
    state, batch = query.test_ray_batch(spec, state, smin, smax, ro, rd,
                                        0.0, np.inf, result_cap=512)
    for q in range(Q):
        state, single = query.test_ray(spec, state, smin, smax,
                                       ro[q], rd[q], 0.0, np.inf,
                                       result_cap=512)
        assert int(batch.count[q]) == int(single.count)
        np.testing.assert_array_equal(np.asarray(batch.ids[q]),
                                      np.asarray(single.ids))


def test_box_batch_chunked_lax_map():
    """Q above the chunk size exercises the lax.map(batch_size) path
    (temporaries bounded to chunk x cap); rows must still equal the
    single-query results."""
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=29)
    state, _, _ = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(17)
    Q = 11
    qmin = rng.uniform(-50, 30, (Q, 3)).astype(np.float32)
    qmax = qmin + rng.uniform(1, 25, (Q, 3)).astype(np.float32)
    state, batch = query.test_box_batch(spec, state, smin, smax,
                                        (qmin, qmax), result_cap=512,
                                        max_depth=None, chunk=4)
    for q in range(Q):
        state, single = query.test_box(spec, state, smin, smax,
                                       (qmin[q], qmax[q]), result_cap=512)
        assert int(batch.count[q]) == int(single.count)
        np.testing.assert_array_equal(np.asarray(batch.ids[q]),
                                      np.asarray(single.ids))


def test_pick_ray_batch_matches_single():
    import jax.numpy as jnp

    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=27)
    state, _, _ = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(13)
    Q = 5
    ro = rng.uniform(-50, 50, (Q, 3)).astype(np.float32)
    rd = rng.uniform(-1, 1, (Q, 3)).astype(np.float32)

    def get_dist(cand_ids, mask, *a):
        return jnp.where(mask, cand_ids.astype(jnp.float32), jnp.inf)

    state, batch = query.pick_ray_batch(spec, state, smin, smax, ro, rd,
                                        np.float32(1e9), get_dist)
    for q in range(Q):
        state, single = query.pick_ray(spec, state, smin, smax,
                                       ro[q], rd[q], np.float32(1e9),
                                       get_dist)
        assert bool(batch.found[q]) == bool(single.found)
        assert int(batch.obj_id[q]) == int(single.obj_id)
        np.testing.assert_allclose(float(batch.distance[q]),
                                   float(single.distance))


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("const,max_depth", [(0.0, None), (17.0, None),
                                             (17.0, 3)])
def test_pick_ray_distance_tie_matches_traversal_order(spec, const,
                                                       max_depth):
    """Adversarial tie-break parity: a constant ``get_dist`` makes EVERY
    candidate tie, so the winner is decided purely by the reference's
    test_order DFS visit order (``src/layer.rs:388`` only overwrites on a
    strict improvement).  The device side must reproduce it through the
    visit-rank argmin — the lowest-id tie-break of rounds 1-2 fails this.

    ids are shuffled so first-visited and lowest-id disagree; directions
    cover sign flips, |axis| ties, and axis-parallel zeros.
    """
    import jax.numpy as jnp

    smin, smax, bmin, bmax, _ = _scene(spec, 150, seed=23)
    rng = np.random.default_rng(3)
    ids = np.sort(rng.choice(100_000, 150, replace=False)
                  .astype(np.uint32))
    rng.shuffle(ids)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)

    def get_dist(cand_ids, mask):
        return jnp.where(mask, jnp.float32(const), jnp.inf)

    dirs = [rng.normal(size=spec.dim).astype(np.float32) for _ in range(3)]
    dirs.append(np.ones(spec.dim, np.float32))            # |axis| ties
    d_neg = -np.ones(spec.dim, np.float32)
    d_neg[-1] = 1.0
    dirs.append(d_neg)                                    # sign flips
    d_par = np.zeros(spec.dim, np.float32)
    d_par[0] = 1.0
    dirs.append(d_par)                                    # axis-parallel
    hits = 0
    for trial, direction in enumerate(dirs):
        origin = rng.uniform(-45, 45, spec.dim).astype(np.float32)
        state, res = query.pick_ray(spec, state, smin, smax, origin,
                                    direction, np.float32(1e9), get_dist,
                                    max_depth=max_depth)
        geom = oracle.RayTestGeometry(smin, smax, origin, direction,
                                      0.0, 1e9)
        want = oracle.run_pick(spec, keys, tids, geom, 1e9,
                               lambda g, nearest, oid: const,
                               max_depth=max_depth)
        if want is None:
            assert not bool(res.found), f"trial {trial}"
        else:
            hits += 1
            assert bool(res.found), f"trial {trial}"
            assert int(res.obj_id) == want[1], (
                f"trial {trial}: got {int(res.obj_id)}, want {want[1]}")
            assert float(res.distance) == pytest.approx(want[0])
    assert hits >= 3          # the scenario actually exercises ties


@pytest.mark.parametrize("spec", [Index32_2D, Index64_3D],
                         ids=lambda s: s.name)
def test_pick_ray_batch_tie_matches_single(spec):
    """The batched pick must reproduce the single-query (reference-exact)
    tie-break row for row."""
    import jax.numpy as jnp

    smin, smax, bmin, bmax, _ = _scene(spec, 120, seed=29)
    rng = np.random.default_rng(7)
    ids = rng.choice(50_000, 120, replace=False).astype(np.uint32)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)

    def get_dist(cand_ids, mask):
        return jnp.where(mask, jnp.float32(5.0), jnp.inf)

    Q = 9
    ro = rng.uniform(-45, 45, (Q, spec.dim)).astype(np.float32)
    rd = rng.normal(size=(Q, spec.dim)).astype(np.float32)
    rd[0] = 1.0                                  # |axis| ties
    rd[1] = -1.0
    state, batch = query.pick_ray_batch(spec, state, smin, smax, ro, rd,
                                        np.float32(1e9), get_dist)
    for q in range(Q):
        state, single = query.pick_ray(spec, state, smin, smax,
                                       ro[q], rd[q], np.float32(1e9),
                                       get_dist)
        assert bool(batch.found[q]) == bool(single.found), q
        if bool(single.found):
            assert int(batch.obj_id[q]) == int(single.obj_id), q
            assert float(batch.distance[q]) == float(single.distance), q
