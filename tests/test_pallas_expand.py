"""Pallas windowed pair-expansion kernel vs the XLA reference path.

Runs in interpret mode on the CPU mesh so CI exercises the exact kernel
logic that compiles on TPU (tests/conftest.py pins the cpu backend, which
makes the scan's production path the XLA one; here we invoke the kernel
directly)."""

import numpy as np
import jax.numpy as jnp
import pytest

from broadphase_tpu import Index64_3D, Index32_2D, layer
from broadphase_tpu import index as bidx
from broadphase_tpu.ops import search
from broadphase_tpu.ops.pallas_expand import TILE, expand_gather
from broadphase_tpu.utils import gen


@pytest.mark.parametrize("spec,n,seed", [
    (Index64_3D, 3000, 1),
    (Index64_3D, 500, 7),
    (Index32_2D, 2000, 11),
])
def test_expand_gather_matches_xla_path(spec, n, seed):
    if spec.dim == 3:
        sc = gen.gen_boxes(count=n, density=1.0 / 1000.0, seed=seed)
        smin, smax = sc.system_min, sc.system_max
        bmin, bmax, ids = sc.bounds_min, sc.bounds_max, sc.ids
    else:
        rng = np.random.default_rng(seed)
        smin = np.zeros(2, np.float32)
        smax = np.full(2, 100.0, np.float32)
        bmin = rng.uniform(0, 90, (n, 2)).astype(np.float32)
        bmax = bmin + rng.uniform(0.5, 8, (n, 2)).astype(np.float32)
        ids = np.arange(n, dtype=np.uint32)

    st = layer.build(spec, smin, smax, bmin, bmax, ids)
    keys, ids_arr, count = st.keys, st.ids, st.count
    cap = ids_arr.shape[0]
    dmax = bidx.descendant_max(spec, keys)
    e = jnp.minimum(search.merged_upper_bound(spec, keys, dmax), count)
    j_idx = jnp.arange(cap, dtype=jnp.int32)
    run = jnp.where(j_idx < count, jnp.maximum(e - (j_idx + 1), 0), 0)
    si = jnp.cumsum(run)
    starts = si - run
    total = int(si[cap - 1])
    P = ((32 * n) // TILE + 1) * TILE
    j, o = search.expand_runs(starts, P)
    j = jnp.clip(j, 0, cap - 1)
    o = jnp.maximum(o, 0)

    # XLA reference path
    i = jnp.clip(j + 1 + o, 0, cap - 1)
    a_want = np.asarray(ids_arr)[np.asarray(i)]
    b_want = np.asarray(search.segmented_broadcast(starts, run, ids_arr, P))

    a, b = expand_gather(ids_arr, j, o, interpret=True)
    mask = np.arange(P) < total
    np.testing.assert_array_equal(np.asarray(a)[mask], a_want[mask])
    np.testing.assert_array_equal(np.asarray(b)[mask], b_want[mask])
