"""Fused merge-cancel-compact kernel vs the XLA reference formulation.

The kernel (ops/pallas_merge.py, interpret mode here) must reproduce the
bitonic_merge + adjacent-cancel + stable_compact pipeline bit for bit on
any (sorted tree, sorted churn) input obeying the column convention:
lexicographic u32 tuples, last column's LSB = tombstone tag, tombstone ==
victim tuple except that bit, pads all-ones.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from broadphase_tpu.ops.merge import bitonic_merge
from broadphase_tpu.ops.compact import stable_compact
from broadphase_tpu.ops.pallas_merge import merge_cancel_compact


def _reference(tree_cols, churn_cols, cap):
    """The XLA formulation (update.py's off-TPU path, generic columns)."""
    nc = len(tree_cols)
    merged = bitonic_merge(tree_cols, churn_cols, num_keys=nc)

    def _shift1(c):
        return jnp.concatenate([c[1:], c[:1]])
    eq = jnp.ones(merged[0].shape, bool)
    for a in merged[:-1]:
        eq = eq & (a == _shift1(a))
    eq = eq & ((merged[-1] >> 1) == (_shift1(merged[-1]) >> 1))
    nxt_tag = _shift1(merged[-1]) & 1
    dead = (eq & (nxt_tag == 1)) | ((merged[-1] & 1) == 1)
    out, cnt = stable_compact(~dead, merged,
                              tuple(jnp.uint32(0xFFFF_FFFF)) * nc
                              if False else
                              tuple(jnp.uint32(0xFFFF_FFFF)
                                    for _ in range(nc)))
    return tuple(np.asarray(c[:cap]) for c in out), int(cnt)


def _make_scene(rng, n_tree, n_tomb, n_ins, nc=3, id_bits=20):
    """Random sorted unique tree tuples + churn = tombstones of existing
    entries (tuple + low bit) and inserts of new unique tuples."""
    total = n_tree + n_ins + 8
    keys = rng.choice(1 << 31, size=total, replace=False).astype(np.uint64)
    metas = ((rng.integers(0, 1 << id_bits, size=total).astype(np.uint64)
              << 1))                                     # tag bit clear
    tree_k, ins_k = keys[:n_tree], keys[n_tree:n_tree + n_ins]
    tree_m, ins_m = metas[:n_tree], metas[n_tree:n_tree + n_ins]
    o = np.argsort(tree_k, kind="stable")
    tree_k, tree_m = tree_k[o], tree_m[o]
    # tombstones: random existing entries
    ti = rng.choice(n_tree, size=n_tomb, replace=False)
    tomb_k, tomb_m = tree_k[ti], tree_m[ti] | 1
    ck = np.concatenate([tomb_k, ins_k])
    cm = np.concatenate([tomb_m, ins_m])
    o = np.lexsort((cm, ck))
    ck, cm = ck[o], cm[o]

    def cols(k, m):
        hi = (k >> 16).astype(np.uint32)
        lo = ((k & 0xFFFF) << 8 | (m >> 24)).astype(np.uint32)
        return (hi, lo, (m & 0xFFFFFF).astype(np.uint32))[:nc - 1] + \
            ((m & 0xFFFFFFFF).astype(np.uint32),)

    # simple 2-col layout: (key32, meta32) or 3-col (hi, lo, meta)
    if nc == 2:
        tc = (tree_k.astype(np.uint32), tree_m.astype(np.uint32))
        cc = (ck.astype(np.uint32), cm.astype(np.uint32))
    else:
        tc = ((tree_k >> 16).astype(np.uint32),
              (tree_k & 0xFFFF).astype(np.uint32),
              tree_m.astype(np.uint32))
        cc = ((ck >> 16).astype(np.uint32),
              (ck & 0xFFFF).astype(np.uint32),
              cm.astype(np.uint32))
    return tc, cc


def _pad(cols, n):
    return tuple(np.concatenate(
        [c, np.full(n - len(c), 0xFFFF_FFFF, np.uint32)]) for c in cols)


@pytest.mark.parametrize("nc", [2, 3])
@pytest.mark.parametrize("n_tree,n_tomb,n_ins,seed", [
    (5000, 300, 250, 0),
    (9000, 0, 0, 1),          # no churn at all
    (3000, 500, 0, 2),        # deletes only
    (3000, 0, 700, 3),        # inserts only
    (300, 50, 50, 4),         # single tile
])
def test_kernel_matches_reference(nc, n_tree, n_tomb, n_ins, seed):
    rng = np.random.default_rng(seed)
    tc, cc = _make_scene(rng, n_tree, n_tomb, n_ins, nc=nc)
    cap = n_tree + n_ins + 64
    churn_buf = 2048
    tcj = tuple(jnp.asarray(c) for c in _pad(tc, cap))
    ccj = tuple(jnp.asarray(c) for c in _pad(cc, churn_buf))

    want_cols, want_cnt = _reference(tcj, ccj, cap)
    got_cols, got_cnt, w_ovf = merge_cancel_compact(
        tcj, ccj, jnp.int32(len(cc[0])), cap,
        tile_rows=8, window_rows=4, interpret=True)
    assert not bool(w_ovf)
    assert int(got_cnt) == want_cnt == n_tree + n_ins - n_tomb
    for g, w in zip(got_cols, want_cols):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_window_overflow_flagged():
    """Churn skewed into one tile beyond window_rows*128 must flag."""
    rng = np.random.default_rng(7)
    # tree keys spread; inserts all inside the FIRST tile's key range
    tree_k = np.sort(rng.choice(np.arange(1 << 20, 1 << 30), size=4096,
                                replace=False)).astype(np.uint64)
    tc = ((tree_k >> 16).astype(np.uint32),
          (tree_k & 0xFFFF).astype(np.uint32),
          np.zeros(4096, np.uint32))
    ins_k = np.sort(rng.choice(1 << 18, size=1500,
                               replace=False)).astype(np.uint64)
    cc = ((ins_k >> 16).astype(np.uint32),
          (ins_k & 0xFFFF).astype(np.uint32),
          (np.arange(1500, dtype=np.uint32) << 1))
    cap = 8192
    got_cols, got_cnt, w_ovf = merge_cancel_compact(
        tuple(jnp.asarray(c) for c in _pad(tc, cap)),
        tuple(jnp.asarray(c) for c in _pad(cc, 2048)),
        jnp.int32(1500), cap, tile_rows=8, window_rows=4, interpret=True)
    assert bool(w_ovf)
