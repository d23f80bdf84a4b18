"""Generic (non-monotone) TestGeometry traversal vs the recursive oracle.

The BFS walk must reproduce the reference's PRUNING semantics
(``src/layer.rs:167-239``): a subtree dies the moment one cell fails
``should_test``, even if deeper cells would pass their own test — exactly
where the elementwise engine (valid only for monotone geometries) differs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu import Index32_2D, Index64_3D, layer, query, traverse
from broadphase_tpu.utils import oracle

from test_query import _built_layer, _scene


# ---------------------------------------------------------------------------
# Oracle-side geometries
# ---------------------------------------------------------------------------

class ExtentBandBoxGeometry(oracle.BoxTestGeometry):
    """Deliberately NON-monotone: passes only cells whose max extent is
    within [min_extent, max_extent] AND that overlap the query box.  Large
    ancestor cells fail the band, pruning descendants that would pass —
    the recursive engine returns a strict subset of the monotone engine."""

    def __init__(self, cell_min, cell_max, test_min, test_max,
                 min_extent, max_extent):
        super().__init__(cell_min, cell_max, test_min, test_max)
        self.min_extent = min_extent
        self.max_extent = max_extent

    def subdivide(self):
        out = []
        for g in super().subdivide():
            out.append(ExtentBandBoxGeometry(
                g.cell_min, g.cell_max, self.test_min, self.test_max,
                self.min_extent, self.max_extent))
        return out

    def should_test(self, nearest):
        ext = float(np.max(self.cell_max - self.cell_min))
        return (super().should_test(nearest)
                and self.min_extent <= ext <= self.max_extent)


def _device_band_predicate(qmin, qmax, min_ext, max_ext):
    qmin = jnp.asarray(qmin, jnp.float32)
    qmax = jnp.asarray(qmax, jnp.float32)

    def should_test(gstate):
        cmin, cmax = gstate
        overlap = jnp.all((cmin <= qmax) & (cmax >= qmin), axis=-1)
        ext = jnp.max(cmax - cmin, axis=-1)
        return overlap & (ext >= min_ext) & (ext <= max_ext)

    return should_test


@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
def test_generic_monotone_box_matches_test_box(spec):
    """Sanity: with a plain (monotone) box predicate the BFS walk equals
    the elementwise engine."""
    smin, smax, bmin, bmax, ids = _scene(spec, 250, seed=31)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(2)
    qmin = rng.uniform(-50, 20, spec.dim).astype(np.float32)
    qmax = qmin + rng.uniform(5, 30, spec.dim).astype(np.float32)

    root, subdiv = traverse.box_halving_state(spec, smin, smax)
    pred = _device_band_predicate(qmin, qmax, -1.0, 1e9)  # band disabled
    state, got = traverse.test_generic(spec, state, root, subdiv, pred,
                                       result_cap=512)
    state, want = query.test_box(spec, state, smin, smax, (qmin, qmax),
                                 result_cap=512)
    assert int(got.count) == int(want.count)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))


@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
@pytest.mark.parametrize("band", [(0.0, 30.0), (3.0, 60.0), (0.0, 1e9)])
def test_generic_nonmonotone_matches_oracle(spec, band):
    smin, smax, bmin, bmax, ids = _scene(spec, 250, seed=37)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(4)
    qmin = rng.uniform(-50, 10, spec.dim).astype(np.float32)
    qmax = qmin + rng.uniform(10, 40, spec.dim).astype(np.float32)
    lo_e, hi_e = band

    root, subdiv = traverse.box_halving_state(spec, smin, smax)
    pred = _device_band_predicate(qmin, qmax, lo_e, hi_e)
    state, got = traverse.test_generic(spec, state, root, subdiv, pred,
                                       result_cap=1024)
    assert not bool(got.overflow)

    geom = ExtentBandBoxGeometry(smin, smax, qmin, qmax, lo_e, hi_e)
    want = oracle.run_test(spec, keys, tids, geom)
    assert list(np.asarray(got.ids[: int(got.count)])) == want


def test_generic_nonmonotone_differs_from_elementwise():
    """The case that killed the round-1 'partial': a predicate whose root
    cell FAILS (extent band excludes the whole system).  The recursive
    semantics prune everything; the monotone elementwise engine would
    report plenty — the walk must return the oracle's (empty) answer."""
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 200, seed=41)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    qmin, qmax = smin, smax            # query covers everything

    root, subdiv = traverse.box_halving_state(spec, smin, smax)
    pred = _device_band_predicate(qmin, qmax, 0.0, 10.0)  # root extent 100
    state, got = traverse.test_generic(spec, state, root, subdiv, pred,
                                       result_cap=1024)
    geom = ExtentBandBoxGeometry(smin, smax, qmin, qmax, 0.0, 10.0)
    want = oracle.run_test(spec, keys, tids, geom)
    assert want == []
    assert int(got.count) == 0

    # while the monotone engine reports every element in a small cell:
    state, mono = query.test(spec, state, smin, smax,
                             lambda cmin, cmax: jnp.max(cmax - cmin, axis=-1)
                             <= 10.0, result_cap=1024)
    assert int(mono.count) > 0


def test_generic_max_depth_cutoff():
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 200, seed=43)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(6)
    qmin = rng.uniform(-50, 10, 3).astype(np.float32)
    qmax = qmin + 25.0

    root, subdiv = traverse.box_halving_state(spec, smin, smax)
    pred = _device_band_predicate(qmin, qmax, -1.0, 1e9)
    state, got = traverse.test_generic(spec, state, root, subdiv, pred,
                                       result_cap=1024, max_depth=3)
    geom = oracle.BoxTestGeometry(smin, smax, qmin, qmax)
    want = oracle.run_test(spec, keys, tids, geom, max_depth=3)
    assert list(np.asarray(got.ids[: int(got.count)])) == want


def test_pick_generic_matches_oracle():
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec, 200, seed=47)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    qmin, qmax = smin, smax

    root, subdiv = traverse.box_halving_state(spec, smin, smax)
    pred = _device_band_predicate(qmin, qmax, -1.0, 1e9)

    def get_dist(cand_ids, mask, *a):
        return jnp.where(mask, cand_ids.astype(jnp.float32) * 0.5, jnp.inf)

    state, got = traverse.pick_generic(spec, state, root, subdiv, pred,
                                       get_dist, max_distance=1e9)
    geom = oracle.BoxTestGeometry(smin, smax, qmin, qmax)
    want = oracle.run_pick(spec, keys, tids, geom, 1e9,
                           lambda g, nearest, oid: oid * 0.5)
    assert want is not None and bool(got.found)
    assert int(got.obj_id) == want[1]
    np.testing.assert_allclose(float(got.distance), want[0])
