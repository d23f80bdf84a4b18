"""Generic TestGeometry traversal: masked BFS over the implicit cell tree.

The elementwise query engine (``broadphase_tpu.query``) is exact only for
*monotone* geometries (child cell passes => parent passed) — the property
every reference-shipped geometry satisfies.  The reference's protocol is
broader: any user ``TestGeometry`` with ``subdivide`` / ``test_order`` /
``should_test`` (``src/geom.rs:327-348``), walked by the recursive
``test_impl`` (``src/layer.rs:167-239``), which PRUNES a whole subtree the
moment one cell fails — non-monotone predicates prune descendants that
would pass their own test.

This module reproduces that pruning semantics TPU-natively: a fixed-
capacity frontier of (cell key, element slice, user geometry state) tuples
advances one depth level per step.  Per level, one vectorized
``lower_bound`` over the sorted key array partitions every slice among the
2^dim children (the data-parallel form of the reference's
``binary_search_by`` trick, ``src/layer.rs:204-206``); elements sorting
before the first child are ancestors AT the cell and are reported
(``:214-217``); children failing ``should_test`` or with empty slices are
dropped; survivors are log-shift-compacted into the next frontier.
Reported slices accumulate in a +1/-1 difference buffer whose prefix sum
is the final report mask — no large scatters anywhere.

Deviations from the reference, by design (documented contract):

* ``test_order`` is not consulted: BFS visits every passing child of a
  level together, and the result set of ``test`` does not depend on visit
  order.  For ``pick`` the reference uses order + a shrinking ``nearest``
  purely as an early-out; the result equals the distance argmin over all
  candidates passing ``should_test(nearest=max_distance)`` whenever the
  narrow phase is *consistent* (an object's distance is never below its
  cell's entry distance) — the same assumption the reference's early-out
  relies on.  ``pick_generic`` therefore runs the test walk and reduces
  with argmin.
* The frontier is fixed capacity; exceeding it sets the result's overflow
  flag (never silent truncation).

User protocol (all callbacks traceable jnp code, shapes batched over the
frontier axis F):

* ``root_state``: pytree whose leaves have leading axis 1 — the geometry
  state at the whole-system cell.
* ``subdivide_fn(gstate) -> child_gstate``: leaves gain a leading
  ``2^dim`` axis, child order MATCHING ``SpatialIndex::subdivide``'s
  sorted order (same requirement as the reference, ``src/geom.rs:331-337``).
* ``should_test_fn(gstate) -> bool``: broadcast over whatever leading
  axes the leaves carry.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from . import index as bidx
from .index import IndexSpec
from .layer import PAD_ID, LayerState, TestResult, sort
from .ops.compact import stable_compact
from .ops.search import lower_bound_keys
from .query import PickResult, _argmin_pick, _unique_compact


def _pad_to(leaf: jnp.ndarray, F: int) -> jnp.ndarray:
    pad = [(0, F - leaf.shape[0])] + [(0, 0)] * (leaf.ndim - 1)
    return jnp.pad(leaf, pad)


def _traverse_mask(spec: IndexSpec, state: LayerState, root_state,
                   subdivide_fn: Callable, should_test_fn: Callable,
                   frontier_cap: int, max_depth: Optional[int]
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the BFS; returns (report mask over element slots, overflow)."""
    F = frontier_cap
    keys = state.keys
    cap = state.ids.shape[0]
    count = state.count

    fkeys = spec.zero_key((F,))
    flo = jnp.zeros((F,), jnp.int32)
    fhi = jnp.where(jnp.arange(F) == 0, count, 0).astype(jnp.int32)
    root_pass = jnp.asarray(should_test_fn(root_state), jnp.bool_).reshape(1)
    kept0 = jnp.where(root_pass[0], jnp.int32(1), jnp.int32(0))
    gstate = jax.tree_util.tree_map(lambda leaf: _pad_to(leaf, F),
                                    root_state)
    overflow = jnp.bool_(False)
    diff = jnp.zeros((cap + 1,), jnp.int32)

    levels = spec.axis_bits if max_depth is None \
        else min(max_depth, spec.axis_bits)
    fanout = spec.fanout
    g_leaves0, g_treedef = jax.tree_util.tree_flatten(gstate)

    def body(_level, carry):
        kcols, flo, fhi, kept, g_leaves, diff, overflow = carry
        fkeys = bidx.key_from_columns(spec, kcols)
        gstate = jax.tree_util.tree_unflatten(g_treedef, list(g_leaves))
        factive = jnp.arange(F, dtype=jnp.int32) < kept

        child_keys, _valid = bidx.subdivide(spec, fkeys)   # (fanout, F)
        child_g = subdivide_fn(gstate)                     # (fanout, F, ...)
        bounds = lower_bound_keys(spec, keys, child_keys)  # (fanout, F)
        bounds = jnp.clip(bounds, flo[None, :], fhi[None, :])

        # ancestors at this cell: [flo, bounds[0])
        a_lo = jnp.where(factive, flo, cap)
        a_hi = jnp.where(factive, bounds[0], cap)
        diff = diff.at[a_lo].add((a_lo < a_hi).astype(jnp.int32),
                                 mode="drop")
        diff = diff.at[a_hi].add(-(a_lo < a_hi).astype(jnp.int32),
                                 mode="drop")

        child_lo = bounds
        child_hi = jnp.concatenate([bounds[1:], fhi[None, :]], axis=0)
        should = jnp.asarray(should_test_fn(child_g), jnp.bool_)
        keep = (factive[None, :] & should
                & (child_lo < child_hi)).reshape(fanout * F)

        cols = tuple(c.reshape(fanout * F)
                     for c in bidx.sort_operands(spec, child_keys))
        flat_lo = child_lo.reshape(fanout * F)
        flat_hi = child_hi.reshape(fanout * F)
        child_leaves = jax.tree_util.tree_flatten(child_g)[0]
        flat_leaves = [leaf.reshape((fanout * F,) + leaf.shape[2:])
                       for leaf in child_leaves]
        arrays = cols + (flat_lo, flat_hi) + tuple(flat_leaves)
        fills = ((jnp.uint32(0),) * len(cols) + (jnp.int32(0), jnp.int32(0))
                 + tuple(jnp.zeros((), leaf.dtype) for leaf in flat_leaves))
        compacted, new_kept = stable_compact(keep, arrays, fills)
        overflow = overflow | (new_kept > F)

        compacted = tuple(c[:F] for c in compacted)
        return (compacted[:len(cols)],
                compacted[len(cols)], compacted[len(cols) + 1],
                jnp.minimum(new_kept, F),
                tuple(compacted[len(cols) + 2:]),
                diff, overflow)

    carry = (bidx.sort_operands(spec, fkeys), flo, fhi, kept0,
             tuple(g_leaves0), diff, overflow)
    if levels > 0:
        carry = jax.lax.fori_loop(0, levels, body, carry)
    _, flo, fhi, kept, _, diff, overflow = carry
    factive = jnp.arange(F, dtype=jnp.int32) < kept

    # depth limit / max_depth cutoff: report every surviving slice whole
    # (reference src/layer.rs:189-196)
    a_lo = jnp.where(factive, flo, cap)
    a_hi = jnp.where(factive, fhi, cap)
    diff = diff.at[a_lo].add((a_lo < a_hi).astype(jnp.int32), mode="drop")
    diff = diff.at[a_hi].add(-(a_lo < a_hi).astype(jnp.int32), mode="drop")

    mask = jnp.cumsum(diff[:cap]) > 0
    return mask, overflow


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def test_generic(spec: IndexSpec, state: LayerState, root_state,
                 subdivide_fn: Callable, should_test_fn: Callable,
                 result_cap: int = 256, frontier_cap: int = 1024,
                 max_depth: Optional[int] = None
                 ) -> Tuple[LayerState, TestResult]:
    """Arbitrary-geometry query with the reference's pruning semantics
    (``Layer::test`` with a user TestGeometry, ``src/layer.rs:252-280``):
    sorted, deduplicated ids of every element whose cell chain — root down
    to its own cell — passes ``should_test``."""
    state = sort(spec, state)
    mask, ovf = _traverse_mask(spec, state, root_state, subdivide_fn,
                               should_test_fn, frontier_cap, max_depth)
    res = _unique_compact(state.ids, mask, result_cap)
    return state, TestResult(res.ids, res.count, res.overflow | ovf)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 8, 9))
def pick_generic(spec: IndexSpec, state: LayerState, root_state,
                 subdivide_fn: Callable, should_test_fn: Callable,
                 get_dist: Callable, max_distance=jnp.inf,
                 get_dist_args=(), frontier_cap: int = 1024,
                 max_depth: Optional[int] = None
                 ) -> Tuple[LayerState, PickResult]:
    """Arbitrary-geometry nearest query (``Layer::pick``,
    ``src/layer.rs:364-404``): distance argmin of ``get_dist(ids, mask,
    *get_dist_args)`` over the candidates the pruning walk reports.
    Requires the consistency contract in the module docstring; ties break
    to the lowest id."""
    state = sort(spec, state)
    mask, _ovf = _traverse_mask(spec, state, root_state, subdivide_fn,
                                should_test_fn, frontier_cap, max_depth)
    md = jnp.float32(max_distance)
    d = jnp.asarray(get_dist(state.ids, mask, *get_dist_args), jnp.float32)
    d = jnp.where(jnp.isfinite(d) & mask, d, jnp.inf)
    return state, _argmin_pick(d, state.ids, md)


# ---------------------------------------------------------------------------
# Ready-made geometry states
# ---------------------------------------------------------------------------

def box_halving_state(spec: IndexSpec, system_min, system_max):
    """(root_state, subdivide_fn) replaying the reference's f32 midpoint
    cell halving (``src/geom.rs:379-455``): state = (cell_min, cell_max),
    leaves (..., dim).  Compose with any ``should_test_fn`` over them."""
    dim = spec.dim
    smin = jnp.asarray(system_min, jnp.float32).reshape(1, dim)
    smax = jnp.asarray(system_max, jnp.float32).reshape(1, dim)

    def subdivide_fn(gstate):
        cmin, cmax = gstate
        center = cmin + (cmax - cmin) * jnp.float32(0.5)
        mins, maxs = [], []
        for child in range(1 << dim):
            side = jnp.array([(child >> a) & 1 for a in range(dim)],
                             jnp.bool_)
            mins.append(jnp.where(side, center, cmin))
            maxs.append(jnp.where(side, cmax, center))
        return (jnp.stack(mins, axis=0), jnp.stack(maxs, axis=0))

    return (smin, smax), subdivide_fn
