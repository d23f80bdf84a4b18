"""Unit parity for ops.search primitives.

``descendant_run_ends`` (adjacent-LCA + reverse cummin, sort-free) must
agree exactly with the merged-rank formulation
``merged_upper_bound(keys, descendant_max(keys))`` it replaced in the scan
hot path — both compute the exclusive end of every element's
descendant-or-equal run (reference invariant ``src/layer.rs:550-573``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu import index as bidx
from broadphase_tpu import layer as blayer
from broadphase_tpu.index import ALL_SPECS, Index64_3D
from broadphase_tpu.ops import search

from test_layer import random_scene


def _run_ends_both(spec, state):
    keys, count = state.keys, state.count
    e_new = search.descendant_run_ends(spec, keys,
                                       bidx.depth_of(spec, keys))
    dmax = bidx.descendant_max(spec, keys)
    e_old = search.merged_upper_bound(spec, keys, dmax)
    cap = state.ids.shape[0]
    live = jnp.arange(cap) < count
    return (np.asarray(jnp.where(live, jnp.minimum(e_new, count), 0)),
            np.asarray(jnp.where(live, jnp.minimum(e_old, count), 0)))


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_run_ends_parity_random(spec):
    sys_min, sys_max, bmin, bmax, ids = random_scene(spec.dim, 700, seed=11)
    state = blayer.build(spec, sys_min, sys_max, bmin, bmax, ids)
    e_new, e_old = _run_ends_both(spec, state)
    np.testing.assert_array_equal(e_new, e_old)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_run_ends_parity_nested_and_duplicate(spec):
    """Adversarial structure: one huge box covering everything (a long
    descendant run), exact duplicates (equal keys), and a padded tail."""
    dim = spec.dim
    sys_min = np.zeros(dim, np.float32)
    sys_max = np.full(dim, 1024.0, np.float32)
    rng = np.random.default_rng(5)
    small = rng.uniform(0, 1000, size=(300, dim)).astype(np.float32)
    bmin = np.vstack([sys_min[None, :],          # huge box = whole system
                      small, small[:50]])         # 50 exact duplicates
    bmax = np.vstack([sys_max[None, :] - 1.0,
                      small + 3.0, small[:50] + 3.0]).astype(np.float32)
    ids = np.arange(len(bmin), dtype=np.uint32)
    state = blayer.build(spec, sys_min, sys_max,
                         bmin.astype(np.float32), bmax, ids,
                         out_capacity=2 * len(ids) * spec.fanout)  # pad tail
    e_new, e_old = _run_ends_both(spec, state)
    np.testing.assert_array_equal(e_new, e_old)


def test_run_ends_empty_and_single():
    spec = Index64_3D
    state = blayer.make_layer(spec, 8)
    e_new, e_old = _run_ends_both(spec, state)
    np.testing.assert_array_equal(e_new, e_old)
    np.testing.assert_array_equal(e_new, np.zeros(8, np.int32))


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_run_ends_pallas_kernel_parity(spec, monkeypatch):
    """The reversed-grid Pallas run-ends kernel (interpret mode) must match
    the XLA per-depth cummin formulation, including non-1024-multiple caps
    (internal padding) and nested runs crossing tile boundaries."""
    from broadphase_tpu.ops import search
    import jax.numpy as jnp

    sys_min, sys_max, bmin, bmax, ids = random_scene(spec.dim, 777, seed=3)
    # add a whole-system box: one run crossing every tile boundary
    bmin = np.vstack([sys_min[None, :], bmin]).astype(np.float32)
    bmax = np.vstack([(sys_max - 1.0)[None, :], bmax]).astype(np.float32)
    ids = np.arange(len(bmin), dtype=np.uint32)
    state = blayer.build(spec, sys_min, sys_max, bmin, bmax, ids)
    d = bidx.depth_of(spec, state.keys)

    e_xla = search.descendant_run_ends(spec, state.keys, d)
    monkeypatch.setenv("BROADPHASE_FORCE_PALLAS", "1")
    from broadphase_tpu.ops.pallas_runends import run_ends
    lca = search.adjacent_lca_depth(spec, state.keys)
    for tile_rows in (0, 128):       # default and the big-input auto tile
        e_pl = run_ends(lca, d.astype(jnp.int32), spec.axis_bits + 1,
                        tile_rows=tile_rows, interpret=True)
        np.testing.assert_array_equal(np.asarray(e_pl), np.asarray(e_xla))


def test_run_ends_kernel_big_tiles_synthetic():
    """tile_rows=128 vs the 32-row tile and a numpy oracle over synthetic
    (lca, depth) streams spanning several 16384-element tiles, with carries
    crossing every tile boundary (long runs) and a partial final tile."""
    from broadphase_tpu.ops.pallas_runends import run_ends
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    n = 40_000                        # 2.44 tiles at 16384
    n_depths = 6
    d = rng.integers(0, n_depths, n).astype(np.int32)
    lca = np.minimum(d[:-1], np.roll(d, -1)[:-1]) - \
        rng.integers(0, 2, n - 1).astype(np.int32)
    lca = np.concatenate([lca, [-1]]).astype(np.int32)
    # long runs: clamp lca high over a few wide stretches
    for s in (5_000, 16_000, 30_000):
        lca[s:s + 3_000] = n_depths - 1
    want = np.zeros(n, np.int32)
    # numpy oracle: next position with lca < depth, per depth level
    for dd in range(n_depths):
        qual = np.where(lca < dd, np.arange(n), np.iinfo(np.int32).max)
        nse = np.minimum.accumulate(qual[::-1])[::-1]
        want = np.where(d == dd, nse + 1, want)
    for tile_rows in (32, 128):
        got = run_ends(jnp.asarray(lca), jnp.asarray(d), n_depths,
                       tile_rows=tile_rows, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), want)
