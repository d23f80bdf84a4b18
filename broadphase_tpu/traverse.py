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

* ``test_order`` is not consulted by the BFS: it visits every passing
  child of a level together, and the result set of ``test`` does not
  depend on visit order.  For ``pick`` the reference uses order + a
  shrinking ``nearest`` purely as an early-out; the result equals the
  distance argmin over all candidates passing
  ``should_test(nearest=max_distance)`` whenever the narrow phase is
  *consistent* (an object's distance is never below its cell's entry
  distance) — the same assumption the reference's early-out relies on.
  ``pick_generic`` therefore runs the test walk and reduces with argmin.
  For narrow phases WITHOUT that guarantee, :func:`pick_ordered` (below)
  reproduces the reference's ordered DFS contract exactly — test_order,
  visit-time pruning, and the once-per-id ``processed`` set included.
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
    return state, TestResult(res.ids, res.count,
                             res.overflow | ovf | state.overflow)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 8, 9))
def pick_generic(spec: IndexSpec, state: LayerState, root_state,
                 subdivide_fn: Callable, should_test_fn: Callable,
                 get_dist: Callable, max_distance=jnp.inf,
                 get_dist_args=(), frontier_cap: int = 1024,
                 max_depth: Optional[int] = None
                 ) -> Tuple[LayerState, "OrderedPickResult"]:
    """Arbitrary-geometry nearest query (``Layer::pick``,
    ``src/layer.rs:364-404``): distance argmin of ``get_dist(ids, mask,
    *get_dist_args)`` over the candidates the pruning walk reports.
    Requires the consistency contract in the module docstring; ties break
    to the lowest id.  The result carries the frontier-overflow flag — an
    overflowed walk may have dropped candidates, so the pick is only
    trustworthy when ``overflow`` is False (never silent, per the
    fixed-capacity contract)."""
    state = sort(spec, state)
    mask, ovf = _traverse_mask(spec, state, root_state, subdivide_fn,
                               should_test_fn, frontier_cap, max_depth)
    md = jnp.float32(max_distance)
    d = jnp.asarray(get_dist(state.ids, mask, *get_dist_args), jnp.float32)
    d = jnp.where(jnp.isfinite(d) & mask, d, jnp.inf)
    res = _argmin_pick(d, state.ids, md)
    return state, OrderedPickResult(res.distance, res.obj_id, res.found,
                                    ovf | state.overflow)


# ---------------------------------------------------------------------------
# Ordered (reference-exact) pick: sequential DFS with early-out
# ---------------------------------------------------------------------------


# same shape as query.PickResult (which now carries overflow too); kept
# as a distinct name because here overflow ALSO covers the DFS stack /
# BFS frontier capacity, not just tree truncation
OrderedPickResult = PickResult


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 9, 10, 11))
def pick_ordered(spec: IndexSpec, state: LayerState, root_state,
                 subdivide_fn: Callable, should_test_fn: Callable,
                 test_order_fn: Callable, get_dist_fn: Callable,
                 max_distance=jnp.inf, get_dist_args=(),
                 max_depth: Optional[int] = None, stack_cap: int = 256,
                 id_bound: Optional[int] = None
                 ) -> Tuple[LayerState, OrderedPickResult]:
    """``Layer::pick`` with the reference's EXACT traversal contract
    (``src/layer.rs:364-404`` driving ``test_impl`` ``:167-239``): children
    are visited in ``test_order``, a shrinking ``nearest`` is threaded
    through the walk (so ``should_test`` prunes against the best distance
    *at visit time*), each object is charged exactly one ``get_dist``
    evaluation (the reference's ``processed`` set, keyed by object id), and
    the result is the last id whose distance strictly improved ``nearest``.

    Unlike :func:`pick_generic` (vectorized argmin — exact only for
    *consistent* narrow phases, see module docstring), this engine matches
    the reference for ARBITRARY, even inconsistent, ``get_dist`` — at the
    cost of a sequential ``lax.while_loop`` DFS.  Picks are latency-class
    single queries, so sequential is the right shape on TPU too.

    Protocol (a superset of the generic one — same ``root_state`` /
    ``subdivide_fn`` leaves-with-leading-axis layout):

    * ``should_test_fn(gstate, nearest) -> bool`` — NOW takes the current
      nearest distance (reference ``src/geom.rs:347``).
    * ``test_order_fn(gstate) -> (2**dim,) int32`` — child visit order of
      the PARENT cell's geometry (reference ``src/geom.rs:342``).
    * ``get_dist_fn(gstate, nearest, obj_id, *get_dist_args) -> f32`` —
      narrow-phase distance for one object, evaluated at the cell where
      the object is first reported (reference passes the sub-geometry the
      same way).  Masked to one evaluation per id; non-finite => no hit
      (``src/layer.rs:388-398``).

    Duplicate-id bookkeeping (the id -> processed-slot map) costs two
    extra ``lax.sort`` passes over the element capacity per call; pass
    ``id_bound`` (static; all live ids strictly below it — e.g. ``n``
    for the usual dense 0..n-1 ids) to index ``processed`` by id
    directly and skip both sorts.
    """
    state = sort(spec, state)
    keys = state.keys
    ids = state.ids
    cap = ids.shape[0]
    count = state.count
    S = stack_cap
    fanout = spec.fanout

    # id -> processed-slot map (the reference's `processed: HashSet<ID>`):
    # rep[p] is an index shared by every tree slot holding the same id.
    if id_bound is not None:
        rep = jnp.minimum(ids, jnp.uint32(id_bound - 1)).astype(jnp.int32)
        n_proc = id_bound
    else:
        pos = jnp.arange(cap, dtype=jnp.uint32)
        ids_s, pos_s = jax.lax.sort((ids, pos), num_keys=2)
        seg_start = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                     ids_s[1:] != ids_s[:-1]])
        gidx = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
        _, rep = jax.lax.sort((pos_s, gidx), num_keys=1)
        n_proc = cap

    limit = spec.axis_bits if max_depth is None \
        else min(max_depth, spec.axis_bits)
    g_leaves0, g_def = jax.tree_util.tree_flatten(root_state)

    kcols0 = tuple(jnp.zeros((S,), jnp.uint32)
                   for _ in bidx.sort_operands(spec, spec.zero_key((1,))))
    lo0_a = jnp.zeros((S,), jnp.int32)
    hi0_a = jnp.zeros((S,), jnp.int32).at[0].set(count)
    tag0_a = jnp.zeros((S,), jnp.int32)
    stl0 = tuple(jnp.zeros((S,) + l.shape[1:], l.dtype).at[0].set(l[0])
                 for l in g_leaves0)
    sp0 = jnp.where(count > 0, jnp.int32(1), jnp.int32(0))
    carry0 = (kcols0, lo0_a, hi0_a, tag0_a, stl0, sp0,
              jnp.float32(max_distance), jnp.uint32(PAD_ID),
              jnp.zeros((n_proc,), jnp.bool_), jnp.bool_(False))

    def cond(carry):
        return carry[5] > 0

    def body(carry):
        kcols, lo_a, hi_a, tag_a, stl, sp, nearest, best, processed, ovf = \
            carry
        top = sp - 1
        ek = tuple(c[top][None] for c in kcols)          # (1,) columns
        key1 = bidx.key_from_columns(spec, ek)
        lo0 = lo_a[top]
        hi0 = hi_a[top]
        g1 = jax.tree_util.tree_unflatten(g_def, [l[top][None] for l in stl])

        def fold_fn(carry):
            kcols, lo_a, hi_a, tag_a, stl, sp, nearest, best, processed, \
                ovf = carry
            oid = ids[lo0]
            rp = rep[lo0]
            already = processed[rp]
            d = jnp.asarray(get_dist_fn(g1, nearest, oid, *get_dist_args),
                            jnp.float32).reshape(())
            d = jnp.where(already | ~jnp.isfinite(d), jnp.inf, d)
            best = jnp.where(d < nearest, oid, best)
            nearest = jnp.minimum(nearest, d)
            processed = processed.at[rp].set(True)
            nlo = lo0 + 1
            lo_a = lo_a.at[top].set(nlo)
            sp = jnp.where(nlo < hi0, sp, sp - 1)
            return (kcols, lo_a, hi_a, tag_a, stl, sp, nearest, best,
                    processed, ovf)

        def cell_fn(carry):
            should = jnp.asarray(should_test_fn(g1, nearest),
                                 jnp.bool_).reshape(())
            depth = bidx.depth_of(spec, key1)[0]
            at_limit = depth >= jnp.uint32(limit)
            action = jnp.where(~should, 0, jnp.where(at_limit, 1, 2))

            def pop_fn(carry):
                return carry[:5] + (carry[5] - 1,) + carry[6:]

            def to_fold_fn(carry):
                # lo0 < hi0 is guaranteed: entries are only pushed for
                # non-empty slices (the reference's empty-tree early return
                # never fires on a pushed entry).
                tag_a = carry[3].at[top].set(1)
                return carry[:3] + (tag_a,) + carry[4:]

            def expand_fn(carry):
                kcols, lo_a, hi_a, tag_a, stl, sp, nearest, best, \
                    processed, ovf = carry
                child_keys, _valid = bidx.subdivide(spec, key1)  # (f, 1)
                ccols = bidx.sort_operands(spec, child_keys)
                bounds = lower_bound_keys(spec, keys, child_keys)[:, 0]
                bounds = jnp.clip(bounds, lo0, hi0)
                cuts = jnp.concatenate([bounds, hi0[None]])      # (f+1,)
                child_g = subdivide_fn(g1)                       # (f, 1, .)
                cleaves = jax.tree_util.tree_flatten(child_g)[0]
                order = jnp.asarray(test_order_fn(g1),
                                    jnp.int32).reshape(fanout)

                p = top                    # current entry is replaced
                # children pushed in REVERSE test_order => popped in order
                for j in range(fanout - 1, -1, -1):
                    i = order[j]
                    clo = cuts[i]
                    chi = cuts[i + 1]
                    keep = clo < chi
                    idx = jnp.where(keep, p, S)
                    kcols = tuple(a.at[idx].set(c[i, 0], mode="drop")
                                  for a, c in zip(kcols, ccols))
                    lo_a = lo_a.at[idx].set(clo, mode="drop")
                    hi_a = hi_a.at[idx].set(chi, mode="drop")
                    tag_a = tag_a.at[idx].set(0, mode="drop")
                    stl = tuple(a.at[idx].set(jnp.take(l, i, axis=0)[0],
                                              mode="drop")
                                for a, l in zip(stl, cleaves))
                    p = p + keep.astype(jnp.int32)
                # ancestors AT this cell fold FIRST (src/layer.rs:214-217):
                # pushed last = top of stack, with the parent's geometry.
                keep_a = lo0 < cuts[0]
                idx = jnp.where(keep_a, p, S)
                kcols = tuple(a.at[idx].set(e[0], mode="drop")
                              for a, e in zip(kcols, ek))
                lo_a = lo_a.at[idx].set(lo0, mode="drop")
                hi_a = hi_a.at[idx].set(cuts[0], mode="drop")
                tag_a = tag_a.at[idx].set(1, mode="drop")
                stl = tuple(a.at[idx].set(l[top], mode="drop")
                            for a, l in zip(stl, carry[4]))
                p = p + keep_a.astype(jnp.int32)
                ovf = ovf | (p > S)
                sp = jnp.minimum(p, S)
                return (kcols, lo_a, hi_a, tag_a, stl, sp, nearest, best,
                        processed, ovf)

            return jax.lax.switch(action, [pop_fn, to_fold_fn, expand_fn],
                                  carry)

        return jax.lax.cond(tag_a[top] == 1, fold_fn, cell_fn, carry)

    carry = jax.lax.while_loop(cond, body, carry0)
    _, _, _, _, _, _, nearest, best, _, ovf = carry
    found = best != jnp.uint32(PAD_ID)
    dist = jnp.where(found, nearest, jnp.inf)
    return state, OrderedPickResult(dist, best, found,
                                    ovf | state.overflow)


# -- ray geometry for the ordered pick ------------------------------------
#
# All three callbacks are MODULE-LEVEL and capture-free (the ray rides in
# the gstate pytree) so repeated picks with different rays hit one jit
# cache entry — closure-captured arrays would bake into the trace as
# constants and recompile per query.

def _ray_subdivide(gstate):
    """Reference ``RayTestGeometry::subdivide`` (``src/geom.rs:551-589`` /
    ``:617-659``), vectorized over the frontier axis: f32 midpoint
    halving, per-child slab range narrowing, axis-parallel kill."""
    cmin, cmax, crmin, crmax, ro, rd = gstate     # (F,d)x2 (F,)x2 (F,d)x2
    dim = cmin.shape[-1]
    center = cmin + (cmax - cmin) / jnp.float32(2)
    dist = (center - ro) / rd                     # (F, dim)
    fin = jnp.isfinite(dist)
    mins, maxs, rmins, rmaxs = [], [], [], []
    for child in range(1 << dim):
        lo_c, hi_c = crmin, crmax
        for axis in range(dim):
            side = bool((child >> axis) & 1)
            towards = (rd[:, axis] > 0) != side
            da = dist[:, axis]
            fa = fin[:, axis]
            hi_n = jnp.where(fa & towards, jnp.minimum(hi_c, da), hi_c)
            lo_n = jnp.where(fa & ~towards, jnp.maximum(lo_c, da), lo_c)
            # axis-parallel kill (src/geom.rs:565-575)
            kill = ~fa & ((ro[:, axis] > center[:, axis]) != side)
            lo_c = jnp.where(kill, jnp.inf, lo_n)
            hi_c = jnp.where(kill, -jnp.inf, hi_n)
        sidev = jnp.array([bool((child >> a) & 1) for a in range(dim)])
        mins.append(jnp.where(sidev[None, :], center, cmin))
        maxs.append(jnp.where(sidev[None, :], cmax, center))
        rmins.append(lo_c)
        rmaxs.append(hi_c)
    rep = lambda x: jnp.broadcast_to(x[None], (1 << dim,) + x.shape)
    return (jnp.stack(mins), jnp.stack(maxs), jnp.stack(rmins),
            jnp.stack(rmaxs), rep(ro), rep(rd))


def _ray_should_test(gstate, nearest):
    """``RayTestGeometry::should_test`` (``src/geom.rs:608-610``)."""
    _, _, crmin, crmax, _, _ = gstate
    return (crmin < crmax) & (crmin < nearest)


def _ray_test_order(gstate):
    """``RayTestGeometry::test_order`` (``src/geom.rs:591-606`` /
    ``:661-684``): axes sorted by |direction| ascending; on each axis the
    child on the ray's origin side is visited first."""
    rd = gstate[5][0]                              # (dim,) — per-query
    dim = rd.shape[0]
    a = jnp.abs(rd)
    if dim == 2:
        axes = jnp.where(a[0] <= a[1], jnp.array([0, 1]), jnp.array([1, 0]))
    else:
        c01, c02, c12 = a[0] <= a[1], a[0] <= a[2], a[1] <= a[2]
        axes = jnp.where(
            c01 & c02,
            jnp.where(c12, jnp.array([0, 1, 2]), jnp.array([0, 2, 1])),
            jnp.where(c12,
                      jnp.where(c02, jnp.array([1, 0, 2]),
                                jnp.array([1, 2, 0])),
                      jnp.where(c01, jnp.array([2, 0, 1]),
                                jnp.array([2, 1, 0]))))
    dirpos = rd >= 0
    order = []
    for cell_src in range(1 << dim):
        dst = jnp.int32(0)
        for k in range(dim):
            axk = axes[k]
            flip = jnp.bool_((cell_src >> k) & 1) == dirpos[axk]
            dst = dst + jnp.left_shift(flip.astype(jnp.int32), axk)
        order.append(dst)
    return jnp.stack(order)


def ray_pick_state(spec: IndexSpec, system_min, system_max, origin,
                   direction, range_min=0.0, range_max=jnp.inf):
    """(root_state, subdivide_fn, should_test_fn, test_order_fn) replaying
    the reference ``RayTestGeometry`` bit-for-bit (``src/geom.rs:459-689``)
    for :func:`pick_ordered`, including the ``with_system_bounds`` range
    clamp (``:515-544``).  gstate = (cell_min, cell_max, range_min,
    range_max, origin, direction); the callbacks are shared module-level
    functions, so varying the ray does not retrace."""
    dim = spec.dim
    smin = jnp.asarray(system_min, jnp.float32).reshape(1, dim)
    smax = jnp.asarray(system_max, jnp.float32).reshape(1, dim)
    ro = jnp.asarray(origin, jnp.float32).reshape(dim)
    rd = jnp.asarray(direction, jnp.float32).reshape(dim)
    rmin = jnp.float32(range_min)
    rmax = jnp.float32(range_max)

    d0 = (smin[0] - ro) / rd
    d1 = (smax[0] - ro) / rd
    fwd = rd > 0
    ent = jnp.where(fwd, d0, d1)
    lev = jnp.where(fwd, d1, d0)
    rmin = jnp.maximum(rmin,
                       jnp.max(jnp.where(jnp.isfinite(ent), ent, -jnp.inf)))
    rmax = jnp.minimum(rmax,
                       jnp.min(jnp.where(jnp.isfinite(lev), lev, jnp.inf)))
    root = (smin, smax, rmin[None], rmax[None], ro[None, :], rd[None, :])
    return root, _ray_subdivide, _ray_should_test, _ray_test_order


# -- box geometry for the ordered pick ------------------------------------

def _box_pick_subdivide(gstate):
    cmin, cmax, qmin, qmax = gstate
    dim = cmin.shape[-1]
    center = cmin + (cmax - cmin) / jnp.float32(2)
    mins, maxs = [], []
    for child in range(1 << dim):
        sidev = jnp.array([bool((child >> a) & 1) for a in range(dim)])
        mins.append(jnp.where(sidev[None, :], center, cmin))
        maxs.append(jnp.where(sidev[None, :], cmax, center))
    rep = lambda x: jnp.broadcast_to(x[None], (1 << dim,) + x.shape)
    return (jnp.stack(mins), jnp.stack(maxs), rep(qmin), rep(qmax))


def _box_pick_should_test(gstate, nearest):
    cmin, cmax, qmin, qmax = gstate
    return jnp.all((cmin <= qmax) & (cmax >= qmin), axis=-1)


def _box_pick_test_order(gstate):
    fanout = 1 << gstate[0].shape[-1]
    return jnp.arange(fanout, dtype=jnp.int32)


def box_pick_state(spec: IndexSpec, system_min, system_max,
                   test_min, test_max):
    """Ordered-pick state for ``BoxTestGeometry`` (``src/geom.rs:352-455``):
    identity test_order, overlap-only should_test (the reference's box
    geometry ignores ``nearest`` — no distance early-out, matching).
    gstate = (cell_min, cell_max, test_min, test_max)."""
    dim = spec.dim
    smin = jnp.asarray(system_min, jnp.float32).reshape(1, dim)
    smax = jnp.asarray(system_max, jnp.float32).reshape(1, dim)
    qmin = jnp.asarray(test_min, jnp.float32).reshape(1, dim)
    qmax = jnp.asarray(test_max, jnp.float32).reshape(1, dim)
    root = (smin, smax, qmin, qmax)
    return root, _box_pick_subdivide, _box_pick_should_test, \
        _box_pick_test_order


@functools.lru_cache(maxsize=64)
def _ray_gd_adapter(user_fn):
    """Stable (per user_fn) geometry-dropping adapter so repeated
    pick_ray_ordered calls reuse one jit cache entry."""
    return lambda gstate, nearest, oid, *args: user_fn(nearest, oid, *args)


def pick_ray_ordered(spec: IndexSpec, state: LayerState, system_min,
                     system_max, origin, direction, max_distance,
                     get_dist_fn: Callable, get_dist_args=(),
                     max_depth: Optional[int] = None, stack_cap: int = 256,
                     id_bound: Optional[int] = None
                     ) -> Tuple[LayerState, OrderedPickResult, jnp.ndarray]:
    """``Layer::pick_ray`` (``src/layer.rs:417-446``) with exact ordered
    semantics: range [0, max_distance] ray geometry, ``get_dist_fn(nearest,
    obj_id, *args)`` (the reference's closure never sees the cell
    geometry), hit point ``origin + direction * distance`` (NaN when not
    found)."""
    root, sub, st, to = ray_pick_state(spec, system_min, system_max,
                                       origin, direction, 0.0, max_distance)
    gd = _ray_gd_adapter(get_dist_fn)
    state, res = pick_ordered(spec, state, root, sub, st, to, gd,
                              max_distance=max_distance,
                              get_dist_args=get_dist_args,
                              max_depth=max_depth, stack_cap=stack_cap,
                              id_bound=id_bound)
    ro = jnp.asarray(origin, jnp.float32)
    rd = jnp.asarray(direction, jnp.float32)
    point = jnp.where(res.found, ro + rd * res.distance, jnp.nan)
    return state, res, point


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
