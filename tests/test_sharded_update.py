"""Sharded temporal-coherence update vs a from-scratch sharded build.

The updated fragments must be bit-identical to ``make_build_sharded`` on
the new bounds — keys, ids, aux, per-fragment counts — across frames,
including churn whose cells migrate between device key ranges.  Runs on
the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from broadphase_tpu import Index32_2D, Index64_3D, index as bidx
from broadphase_tpu.parallel import make_build_sharded
from broadphase_tpu.parallel.update import (make_build_tracked_sharded,
                                            make_update_sharded)

N_DEV = 8


def _mesh():
    return Mesh(np.array(jax.devices()[:N_DEV]), ("objects",))


def _scene(spec, n, seed, lo=-60.0, hi=60.0):
    rng = np.random.default_rng(seed)
    dim = spec.dim
    size = rng.uniform(0.5, 9.0, size=(n, dim)).astype(np.float32)
    bmin = rng.uniform(lo, hi - 9.0, size=(n, dim)).astype(np.float32)
    bmax = bmin + size
    ids = np.arange(n, dtype=np.uint32)
    smin = np.full(dim, lo, np.float32)
    smax = np.full(dim, hi, np.float32)
    return smin, smax, bmin, bmax, ids, rng


def _frag_tuple(spec, lyr):
    counts = np.asarray(lyr.counts)
    frag = np.asarray(lyr.ids).size // N_DEV
    k = bidx.keys_to_numpy(spec, lyr.keys).reshape(N_DEV, frag)
    i = np.asarray(lyr.ids).reshape(N_DEV, frag)
    a = np.asarray(lyr.aux).reshape(N_DEV, frag)
    return [(counts[d], k[d, :counts[d]].tolist(),
             i[d, :counts[d]].tolist(), a[d, :counts[d]].tolist())
            for d in range(N_DEV)]


@pytest.mark.parametrize("spec", [Index64_3D, Index32_2D],
                         ids=lambda s: s.name)
@pytest.mark.parametrize("churn_frac", [0.05, 0.4])
def test_sharded_update_matches_sharded_build(spec, churn_frac):
    n = 32 * N_DEV
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=31)
    mesh = _mesh()
    fcap = 8 * n
    build_tracked = make_build_tracked_sharded(spec, mesh, "objects",
                                               fragment_capacity=fcap)
    build = make_build_sharded(spec, mesh, "objects",
                               fragment_capacity=fcap)
    upd = make_update_sharded(spec, mesh, "objects",
                              churn_cap=4 * n, obj_cap=n)
    tracked = build_tracked(smin, smax, bmin, bmax, ids)
    assert not bool(tracked.layer.overflow)

    for frame in range(3):
        move = rng.random(n) < churn_frac
        # big jumps cross min_depth cells and device key ranges
        delta = rng.normal(0, 25.0 if frame % 2 else 2.0,
                           size=(n, spec.dim)).astype(np.float32)
        bmin = np.where(move[:, None], bmin + delta, bmin).astype(np.float32)
        bmax = np.where(move[:, None], bmax + delta, bmax).astype(np.float32)
        tracked = upd(tracked, smin, smax, bmin, bmax)
        assert not bool(tracked.layer.overflow), f"frame {frame}"
        want = build(smin, smax, bmin, bmax, ids)
        assert _frag_tuple(spec, tracked.layer) == _frag_tuple(spec, want)
        assert int(tracked.layer.invalid_count) == int(want.invalid_count)


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_update_scan_matches_oracle(spec):
    """An updated sharded layer scans to the sequential oracle's pairs."""
    from broadphase_tpu.parallel import gather_pairs, make_scan_sharded
    from broadphase_tpu.utils import oracle

    n = 24 * N_DEV
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=37)
    mesh = _mesh()
    build_tracked = make_build_tracked_sharded(spec, mesh, "objects",
                                               fragment_capacity=8 * n)
    upd = make_update_sharded(spec, mesh, "objects",
                              churn_cap=4 * n, obj_cap=n)
    scan = make_scan_sharded(spec, mesh, "objects", pair_capacity=16 * n)
    tracked = build_tracked(smin, smax, bmin, bmax, ids)
    delta = rng.normal(0, 10.0, size=(n, spec.dim)).astype(np.float32)
    mask = rng.random(n) < 0.3
    bmin = np.where(mask[:, None], bmin + delta, bmin).astype(np.float32)
    bmax = np.where(mask[:, None], bmax + delta, bmax).astype(np.float32)
    tracked = upd(tracked, smin, smax, bmin, bmax)
    res = scan(tracked.layer)
    assert not bool(res.overflow)

    counts = np.asarray(tracked.layer.counts)
    frag = np.asarray(tracked.layer.ids).size // N_DEV
    k = bidx.keys_to_numpy(spec, tracked.layer.keys).reshape(N_DEV, frag)
    i = np.asarray(tracked.layer.ids).reshape(N_DEV, frag)
    gk = np.concatenate([k[d, :counts[d]] for d in range(N_DEV)])
    gi = np.concatenate([i[d, :counts[d]] for d in range(N_DEV)])
    want = oracle.scan(spec, [int(x) for x in gk], [int(x) for x in gi])
    assert gather_pairs(res) == want


@pytest.mark.parametrize("spec", [Index64_3D], ids=lambda s: s.name)
def test_sharded_update_overflow_flagged(spec):
    n = 16 * N_DEV
    smin, smax, bmin, bmax, ids, rng = _scene(spec, n, seed=41)
    mesh = _mesh()
    build_tracked = make_build_tracked_sharded(spec, mesh, "objects",
                                               fragment_capacity=8 * n)
    upd = make_update_sharded(spec, mesh, "objects",
                              churn_cap=16, obj_cap=4)
    tracked = build_tracked(smin, smax, bmin, bmax, ids)
    delta = rng.normal(0, 25.0, size=(n, spec.dim)).astype(np.float32)
    tracked = upd(tracked, smin, smax,
                  (bmin + delta).astype(np.float32),
                  (bmax + delta).astype(np.float32))
    assert bool(tracked.layer.overflow)
