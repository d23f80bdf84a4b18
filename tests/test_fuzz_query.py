"""Randomized query-surface fuzz: test_box / test_ray / batched variants
vs the recursive oracle, with deliberately degenerate inputs.

Degenerate families the reference's f32 math makes subtle: axis-parallel
rays (division by +-0.0 — the sign of zero flips the infinite slab
distances), origins exactly on cell faces (the `ro <= lo` / `ro > hi`
kill boundaries, ``src/geom.rs:565-575``), point-sized query boxes, and
boxes touching exactly at a face (inclusive overlap).

Scale trials with BROADPHASE_FUZZ_TRIALS (default keeps CI fast).
"""

import os

import numpy as np
import pytest

from broadphase_tpu import Index32_2D, Index64_3D, query
from broadphase_tpu.utils import oracle

from test_query import _built_layer, _scene

TRIALS = int(os.environ.get("BROADPHASE_FUZZ_TRIALS", "6"))
SPECS = (Index32_2D, Index64_3D)


def _got_ids(res):
    return list(np.asarray(res.ids[: int(res.count)]))


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_fuzz_test_box(spec):
    smin, smax, bmin, bmax, ids = _scene(spec, 400, seed=211)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(17)
    for trial in range(TRIALS + 3):
        if trial == 0:
            qmin = qmax = np.zeros(spec.dim, np.float32)   # point box
        elif trial == 1:
            # exactly one object's max face (inclusive overlap boundary)
            qmin = bmax[37].copy()
            qmax = qmin + np.float32(1.0)
        elif trial == 2:
            qmin, qmax = smin, smax                         # whole system
        else:
            qmin = rng.uniform(-50, 30, spec.dim).astype(np.float32)
            qmax = qmin + rng.uniform(0.0, 30, spec.dim).astype(np.float32)
        md = None if trial % 2 else 3
        state, res = query.test_box(spec, state, smin, smax, (qmin, qmax),
                                    result_cap=1024, max_depth=md)
        assert not bool(res.overflow)
        geom = oracle.BoxTestGeometry(smin, smax, qmin, qmax)
        want = oracle.run_test(spec, keys, tids, geom, max_depth=md)
        assert _got_ids(res) == want, (spec.name, trial)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_fuzz_test_ray(spec):
    smin, smax, bmin, bmax, ids = _scene(spec, 400, seed=223)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(19)
    centers = ((bmin + bmax) / 2).astype(np.float32)
    for trial in range(TRIALS + 4):
        ro = rng.uniform(-60, 60, spec.dim).astype(np.float32)
        rd = rng.normal(size=spec.dim).astype(np.float32)
        rmin, rmax = np.float32(0.0), np.float32(1e9)
        if trial == 0:
            rd[0] = 0.0                    # axis-parallel (+0.0)
        elif trial == 1:
            rd[0] = -0.0                   # sign-of-zero flip
        elif trial == 2:
            ro = centers[11]               # origin inside an object's cell
        elif trial == 3:
            rmin, rmax = np.float32(5.0), np.float32(40.0)  # clamped range
        md = None if trial % 2 else 4
        state, res = query.test_ray(spec, state, smin, smax, ro, rd,
                                    rmin, rmax, result_cap=1024,
                                    max_depth=md)
        assert not bool(res.overflow)
        geom = oracle.RayTestGeometry(smin, smax, ro, rd, rmin, rmax)
        want = oracle.run_test(spec, keys, tids, geom, max_depth=md)
        assert _got_ids(res) == want, (spec.name, trial)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_fuzz_batched_match_single(spec):
    """Batched engines must equal the single-query engines id-for-id,
    including the degenerate rows."""
    smin, smax, bmin, bmax, ids = _scene(spec, 300, seed=227)
    state, keys, tids = _built_layer(spec, smin, smax, bmin, bmax, ids)
    rng = np.random.default_rng(23)
    Q = 16
    qmin = rng.uniform(-50, 30, (Q, spec.dim)).astype(np.float32)
    qmax = qmin + rng.uniform(0.0, 25, (Q, spec.dim)).astype(np.float32)
    qmax[0] = qmin[0]                                      # point box
    state, batch = query.test_box_batch(spec, state, smin, smax,
                                        (qmin, qmax), result_cap=512)
    for qi in range(Q):
        state, one = query.test_box(spec, state, smin, smax,
                                    (qmin[qi], qmax[qi]), result_cap=512)
        assert int(batch.count[qi]) == int(one.count), qi
        np.testing.assert_array_equal(np.asarray(batch.ids[qi]),
                                      np.asarray(one.ids), err_msg=str(qi))

    ro = rng.uniform(-60, 60, (Q, spec.dim)).astype(np.float32)
    rd = rng.normal(size=(Q, spec.dim)).astype(np.float32)
    rd[0, 0] = 0.0
    rd[1] = np.abs(rd[1])
    state, rbatch = query.test_ray_batch(spec, state, smin, smax, ro, rd,
                                         0.0, 1e9, result_cap=512)
    for qi in range(Q):
        state, one = query.test_ray(spec, state, smin, smax, ro[qi], rd[qi],
                                    0.0, 1e9, result_cap=512)
        assert int(rbatch.count[qi]) == int(one.count), qi
        np.testing.assert_array_equal(np.asarray(rbatch.ids[qi]),
                                      np.asarray(one.ids), err_msg=str(qi))
