"""Sublinear single-query engine: tree-descent test_box / test_ray / pick_ray.

The elementwise engine in :mod:`broadphase_tpu.query` replays EVERY cell in
the tree per query — O(n * axis_bits) device work, the right shape for
batched queries but linear for the reference's actual interactive pattern
of one pick per frame (``/root/reference/examples/main.rs:423-456``).  The
reference's recursive ``test_impl`` touches only O(log n + k) slice
boundaries per query (``src/layer.rs:167-239``; binary-search partition
``:204-206``).  This module is the TPU-native equivalent: a handful of
batched binary searches produce a SMALL set of contiguous candidate ranges
in the sorted element array, the ranges are gathered into a fixed-capacity
candidate buffer, and the exact accept test runs on candidates only.

Two skeletons:

* **test_box** — closed form, no level loop.  Two per-axis midpoint-replay
  descents (following the leftmost / rightmost query-overlapping cell)
  yield, at the deepest depth ``d*`` where the query spans <= 2 cells per
  axis, <= 2^dim *covering cells*.  Every cell overlapping the query is
  then either a descendant-or-equal of a covering cell (one contiguous key
  range each, ``descendant_max``) or an ancestor of one (<= axis_bits * 2^dim
  exact-key runs) — the same covering-cell decomposition the build's grid
  walk uses for emission (``geom.emit_cells``), run in reverse.  All range
  boundaries come from one batched ``lower_bound``/``upper_bound`` pair.

* **test_ray / pick_ray** — a fixed-capacity frontier descends the cells
  that EXIST in the tree (child ranges from one batched ``lower_bound`` per
  level, exactly like :func:`traverse._traverse_mask`), accumulating the
  ray slab interval per cell with the *identical* f32 expressions as
  ``query.ray_intervals``; cells with empty intervals are pruned.  Elements
  AT each passing cell (the range prefix before the first child) are
  collected as (start, len) ranges instead of a full-array mask.  The
  descent EARLY-EXITS as soon as every element still under the frontier
  fits the candidate buffer (elements under a ray's frontier shrink ~4x
  per level, so this is a handful of levels on any tree) — the per-level
  binary searches are the dominant cost (~8·F·log2(n) random gathers),
  so stopping early is what makes single rays cheap at 1M scale.

Bit-exactness: candidate ranges are a *superset* of all passing cells, and
the final accept test replays the same f32 midpoint-halving state the
linear engine uses (``geom.cell_bounds_f32`` for boxes;
``query.ray_intervals_keys`` on the gathered keys for rays), so results —
ids, counts, pick winners including distance ties — are identical to
:mod:`broadphase_tpu.query` and therefore to the sequential oracle.
Differential tests: ``tests/test_singleq.py``.

Superset proof sketch (box): per axis the query-overlapping cells at depth
d form one contiguous run [a_lo(d), a_hi(d)] whose endpoints are exactly
the two replay descents, and run widths are monotone nondecreasing with
depth (width >= 3 at d implies >= 4 at d+1); at every depth <= d* the runs
have width <= 2, so each overlapping cell is a per-axis combination of
descent-path prefixes = an ancestor of a covering cell, and every deeper
overlapping cell's depth-d* ancestor overlaps, hence IS a covering cell,
putting the cell in that covering cell's descendant range.  Degenerate
queries (inverted/NaN boxes) only shrink the true set — the descents then
produce a superset with garbage tails that the exact accept test discards.

Variable-length guards: candidate-buffer and frontier overflow set the
result's ``overflow`` flag (results may be incomplete), never silent.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geom, index as bidx
from .index import IndexSpec, Key
from .layer import PAD_ID, LayerState, TestResult, sort
from .ops.compact import stable_compact
from .ops.search import (expand_runs, lower_bound_keys,
                         lower_bound_keys_bracketed, segmented_broadcast,
                         upper_bound_keys, upper_bound_keys_bracketed)
from .query import (PickResult, _argmin_pick_ranked, _flag_truncation,
                    _ray_visit_rank, _unique_compact, ray_intervals_keys)

# Defaults for the fixed-capacity buffers (static shapes; overflow flagged).
CANDIDATE_CAP = 4096
FRONTIER_CAP = 256


# ---------------------------------------------------------------------------
# Shared: gather disjoint element ranges into a fixed candidate buffer
# ---------------------------------------------------------------------------

def _gather_ranges(spec: IndexSpec, state: LayerState,
                   starts: jnp.ndarray, lens: jnp.ndarray,
                   candidate_cap: int):
    """Concatenate the elements of R disjoint ranges of the sorted array.

    starts/lens: (R,) int32 (empty ranges allowed; ranges must not overlap).
    Returns (ids, keys, src, valid, overflow): all (candidate_cap,) plus the
    buffer-overflow flag.  Routing reuses the scan's histogram+cumsum run
    expansion (``ops.search.expand_runs``) — no per-range loops; the only
    random access is the final candidate gather itself.
    """
    lens = jnp.maximum(lens, 0)
    cum = jnp.cumsum(lens) - lens                     # exclusive prefix
    total = jnp.sum(lens)
    _, o_of_t = expand_runs(cum, candidate_cap)
    base = segmented_broadcast(cum, lens, starts.astype(jnp.int32),
                               candidate_cap)
    src = base + o_of_t
    t = jnp.arange(candidate_cap, dtype=jnp.int32)
    valid = t < jnp.minimum(total, candidate_cap)
    src = jnp.clip(src, 0, state.ids.shape[0] - 1)
    ids = state.ids[src]
    keys = bidx.key_gather(spec, state.keys, src)
    return ids, keys, src, valid, total > candidate_cap


# ---------------------------------------------------------------------------
# test_box: covering-cell decomposition
# ---------------------------------------------------------------------------

def _box_cover_paths(spec: IndexSpec, system_min, system_max,
                     qmin: jnp.ndarray, qmax: jnp.ndarray, levels: int):
    """Replay the leftmost/rightmost query-overlapping descent per axis.

    Returns (Lc, Hc, d_star): Lc/Hc (levels+1, dim) u32 top-aligned cell
    coordinates of the two paths at each depth, and d_star, the deepest
    depth (<= levels) at which the query spans <= 2 cells on every axis.
    The midpoint sequence is the same f32 expression as
    ``geom.cell_bounds_f32``, so cell selection agrees bit-for-bit with the
    linear engine's replayed bounds.
    """
    dim = spec.dim
    smin = jnp.asarray(system_min, jnp.float32)
    smax = jnp.asarray(system_max, jnp.float32)
    lo_l, hi_l = smin, smax
    lo_h, hi_h = smin, smax
    lc = jnp.zeros((dim,), jnp.uint32)
    hc = jnp.zeros((dim,), jnp.uint32)
    lcs, hcs = [lc], [hc]
    d_star = jnp.int32(0)
    prefix_ok = jnp.bool_(True)
    for b in range(levels):
        bit = jnp.uint32((1 << (31 - b)) & 0xFFFF_FFFF)
        # leftmost overlapping child: left iff mid >= qmin (inclusive
        # overlap, geom.bounds_overlaps)
        mid_l = lo_l + (hi_l - lo_l) * jnp.float32(0.5)
        right_l = ~(mid_l >= qmin)
        lo_l = jnp.where(right_l, mid_l, lo_l)
        hi_l = jnp.where(right_l, hi_l, mid_l)
        lc = lc | jnp.where(right_l, bit, jnp.uint32(0))
        # rightmost overlapping child: right iff mid <= qmax
        mid_h = lo_h + (hi_h - lo_h) * jnp.float32(0.5)
        right_h = mid_h <= qmax
        lo_h = jnp.where(right_h, mid_h, lo_h)
        hi_h = jnp.where(right_h, hi_h, mid_h)
        hc = hc | jnp.where(right_h, bit, jnp.uint32(0))
        # adjacent-or-equal per axis at depth b+1 (unsigned: crossed paths
        # from degenerate queries wrap huge and fail, conservatively)
        ok = jnp.all((hc - lc) <= bit)
        prefix_ok = prefix_ok & ok
        d_star = jnp.where(prefix_ok, jnp.int32(b + 1), d_star)
        lcs.append(lc)
        hcs.append(hc)
    return jnp.stack(lcs), jnp.stack(hcs), d_star


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7))
def test_box(spec: IndexSpec, state: LayerState, system_min, system_max,
             query_bounds, result_cap: int,
             max_depth: Optional[int] = None,
             candidate_cap: int = CANDIDATE_CAP
             ) -> Tuple[LayerState, TestResult]:
    """Sublinear ``Layer::test_box`` (``src/layer.rs:294-313``): identical
    results to :func:`query.test_box`, O(2^dim * axis_bits) candidate
    ranges + one binary-search batch instead of a full-tree replay."""
    state = sort(spec, state)
    qmin = jnp.asarray(query_bounds[0], jnp.float32)
    qmax = jnp.asarray(query_bounds[1], jnp.float32)
    smin = jnp.asarray(system_min, jnp.float32)
    smax = jnp.asarray(system_max, jnp.float32)
    levels = spec.axis_bits if max_depth is None \
        else min(int(max_depth), spec.axis_bits)

    Lc, Hc, d_star = _box_cover_paths(spec, smin, smax, qmin, qmax, levels)
    root_olap = geom.bounds_overlaps(smin, smax, qmin, qmax)

    # Probe set: for every depth d in [0, levels] and combo c in [0, 2^dim):
    # the cell whose axis-k coordinate is Hc (combo bit k set) or Lc.  At
    # d == d_star these are the covering cells (descendant ranges); at
    # d < d_star their ancestors (exact-key runs); d > d_star is masked.
    L = levels + 1
    fan = spec.fanout
    combo = np.arange(fan, dtype=np.uint32)
    combo_bits = ((combo[:, None] >> np.arange(spec.dim)[None, :]) & 1
                  ).astype(bool)                                  # (fan, dim)
    take_hi = jnp.asarray(combo_bits)[None, :, :]                 # (1,fan,dim)
    coords = jnp.where(take_hi, Hc[:, None, :], Lc[:, None, :])   # (L,fan,dim)
    # drop duplicate combos where the hi path equals the lo path on an axis
    dup_ok = jnp.all(~take_hi | (Hc[:, None, :] != Lc[:, None, :]), axis=-1)
    d_arr = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None],
                             (L, fan))
    probe_valid = dup_ok & (d_arr <= d_star) & root_olap

    flat = (L * fan,)
    origin = [coords[:, :, k].reshape(flat) for k in range(spec.dim)]
    depth_p = d_arr.reshape(flat).astype(jnp.uint32)
    pkeys = bidx.make_key(spec, origin, depth_p)
    is_cover = (d_arr == d_star).reshape(flat)
    end_keys = bidx.key_where(spec, is_cover, bidx.descendant_max(spec, pkeys),
                              pkeys)
    starts = jnp.minimum(lower_bound_keys(spec, state.keys, pkeys),
                         state.count)
    ends = jnp.minimum(upper_bound_keys(spec, state.keys, end_keys),
                       state.count)
    lens = jnp.where(probe_valid.reshape(flat), ends - starts, 0)

    ids, keys, _, valid, c_ovf = _gather_ranges(spec, state, starts, lens,
                                                candidate_cap)
    g_origin = bidx.origin_of(spec, keys)
    g_depth = bidx.depth_of(spec, keys)
    cmin, cmax = geom.cell_bounds_f32(spec, g_origin, g_depth, smin, smax,
                                      replay_depth=max_depth)
    hit = geom.bounds_overlaps(cmin, cmax, qmin[None, :], qmax[None, :]) \
        & valid
    res = _unique_compact(ids, hit, result_cap)
    res = res._replace(overflow=res.overflow | c_ovf)
    return state, _flag_truncation(state, res)


# ---------------------------------------------------------------------------
# Ray frontier: descend existing cells, collect exact-cell element ranges
# ---------------------------------------------------------------------------

def _ray_frontier_ranges(spec: IndexSpec, state: LayerState,
                         system_min, system_max, ray_origin, ray_dir,
                         range_min, range_max, nearest_cap,
                         levels: int, frontier_cap: int,
                         stop_total: int = 0):
    """Descend the tree along the ray; return (starts, lens, ovf).

    starts/lens: ((levels+1)*F,) int32 ranges of elements whose OWN cell's
    accumulated slab interval passes (rmin < rmax, rmin < nearest_cap); the
    interval updates replicate ``query.ray_intervals`` bit for bit.  Level
    row ``levels`` holds the depth-cutoff remainders (whole surviving
    slices, reference ``src/layer.rs:189-196``).

    ``stop_total`` > 0 enables the EARLY EXIT that makes big-tree rays
    cheap: the descent stops as soon as (elements already collected +
    elements still under the frontier) fits in ``stop_total`` lanes and
    reports the surviving slices whole.  Each level's binary searches cost
    ~8·F·log2(n) random gathers (~10 ns each on TPU), so descending all
    ``axis_bits`` levels of a 1M tree costs tens of ms — while the
    elements under a ray's frontier shrink ~4x per level, so a few levels
    suffice to fit any reasonable candidate buffer.  The extra elements
    reported this way have NOT had their own cell's interval tested; the
    caller must re-test candidates exactly (``query.ray_intervals_keys``
    on the gathered keys), which it does anyway for bit-parity.
    """
    F = frontier_cap
    dim = spec.dim
    cap = state.ids.shape[0]
    smin = jnp.asarray(system_min, jnp.float32)
    smax = jnp.asarray(system_max, jnp.float32)
    ro = jnp.asarray(ray_origin, jnp.float32)
    rd = jnp.asarray(ray_dir, jnp.float32)

    # with_system_bounds clamp — same expressions as query.ray_intervals
    d0 = (smin - ro) / rd
    d1 = (smax - ro) / rd
    fwd = rd > 0
    lo_d = jnp.where(fwd, d0, d1)
    hi_d = jnp.where(fwd, d1, d0)
    rmin0 = jnp.asarray(range_min, jnp.float32)
    rmax0 = jnp.asarray(range_max, jnp.float32)
    for axis in range(dim):
        rmin0 = jnp.where(jnp.isfinite(lo_d[axis]),
                          jnp.maximum(rmin0, lo_d[axis]), rmin0)
        rmax0 = jnp.where(jnp.isfinite(hi_d[axis]),
                          jnp.minimum(rmax0, hi_d[axis]), rmax0)
    root_pass = (rmin0 < rmax0) & (rmin0 < jnp.asarray(nearest_cap,
                                                       jnp.float32))

    kcols0 = bidx.sort_operands(spec, spec.zero_key((F,)))
    flo0 = jnp.zeros((F,), jnp.int32)
    fhi0 = jnp.where(jnp.arange(F) == 0, state.count, 0).astype(jnp.int32)
    kept0 = jnp.where(root_pass, jnp.int32(1), jnp.int32(0))
    lo0 = jnp.broadcast_to(smin, (F, dim))
    hi0 = jnp.broadcast_to(smax, (F, dim))
    rmin_f0 = jnp.full((F,), rmin0, jnp.float32)
    rmax_f0 = jnp.full((F,), rmax0, jnp.float32)
    rstart0 = jnp.zeros((levels + 1, F), jnp.int32)
    rlen0 = jnp.zeros((levels + 1, F), jnp.int32)
    near = jnp.asarray(nearest_cap, jnp.float32)

    # static per-child side bits, matching subdivide's child order (child
    # index bit k = axis k's new origin bit)
    side_np = ((np.arange(spec.fanout, dtype=np.uint32)[:, None]
                >> np.arange(dim)[None, :]) & 1).astype(bool)     # (fan,dim)
    side_j = jnp.asarray(side_np)

    def body(level, carry):
        (kcols, flo, fhi, kept, lo, hi, rmn, rmx,
         rstart, rlen, ovf) = carry
        fkeys = bidx.key_from_columns(spec, kcols)
        factive = jnp.arange(F, dtype=jnp.int32) < kept

        child_keys, _valid = bidx.subdivide(spec, fkeys)   # (fan, F)
        ckcols = bidx.sort_operands(spec, child_keys)

        # elements AT this cell: [flo, s0) where s0 = the first child's
        # lower bound — ONE bracketed probe per frontier lane, searched
        # only inside the parent's own element range [flo, fhi] (their
        # interval is the frontier's: they passed when the cell entered)
        child0 = bidx.key_from_columns(spec, tuple(c[0] for c in ckcols))
        s0 = lower_bound_keys_bracketed(
            spec, state.keys, child0,
            jnp.where(factive, flo, 0), jnp.where(factive, fhi, 0))
        a_start = jnp.where(factive, flo, 0)
        a_len = jnp.where(factive, s0 - flo, 0)
        rstart = jax.lax.dynamic_update_index_in_dim(rstart, a_start,
                                                     level, 0)
        rlen = jax.lax.dynamic_update_index_in_dim(rlen, a_len, level, 0)

        # per-child slab update — query.ray_intervals' expressions verbatim
        center = lo + (hi - lo) * jnp.float32(0.5)         # (F, dim)
        dist = (center - ro[None, :]) / rd[None, :]
        finite = jnp.isfinite(dist)                        # (F, dim)
        side = side_j[:, None, :]                          # (fan, 1, dim)
        towards = (rd[None, None, :] > 0) != side          # (fan, 1, dim)
        upd_max = finite[None] & towards
        upd_min = finite[None] & ~towards
        new_rmax = jnp.min(jnp.where(upd_max, dist[None], jnp.inf), axis=-1)
        new_rmin = jnp.max(jnp.where(upd_min, dist[None], -jnp.inf), axis=-1)
        rmx_c = jnp.minimum(rmx[None, :], new_rmax)        # (fan, F)
        rmn_c = jnp.maximum(rmn[None, :], new_rmin)
        kill = (~finite[None]) & ((ro[None, None, :] > center[None]) != side)
        dead = jnp.any(kill, axis=-1)
        rmn_c = jnp.where(dead, jnp.inf, rmn_c)
        rmx_c = jnp.where(dead, -jnp.inf, rmx_c)
        lo_c = jnp.where(side, center[None], lo[None])     # (fan, F, dim)
        hi_c = jnp.where(side, hi[None], center[None])

        # prune by slab interval BEFORE any search (round 5): only
        # interval-passing children of nonempty parents reach the binary
        # searches, so a level costs ~3F bounded probes (one first-child
        # probe per parent + start/end per survivor) instead of 8F
        # full-depth ones.  A surviving child whose element range turns
        # out empty occupies a frontier slot for one level and is killed
        # here next level via the parent-nonempty mask.
        passes = (rmn_c < rmx_c) & (rmn_c < near)
        keep = (factive[None, :] & passes
                & (flo < fhi)[None, :]).reshape(spec.fanout * F)

        cols = tuple(c.reshape(spec.fanout * F) for c in ckcols)
        b_lo = jnp.broadcast_to(s0[None, :], (spec.fanout, F)).reshape(-1)
        b_hi = jnp.broadcast_to(fhi[None, :], (spec.fanout, F)).reshape(-1)
        flat = (b_lo, b_hi,
                lo_c.reshape(-1, dim), hi_c.reshape(-1, dim),
                rmn_c.reshape(-1), rmx_c.reshape(-1))
        arrays = cols + flat
        fills = ((jnp.uint32(0),) * len(cols)
                 + (jnp.int32(0), jnp.int32(0), jnp.float32(0),
                    jnp.float32(0), jnp.float32(0), jnp.float32(0)))
        compacted, new_kept = stable_compact(keep, arrays, fills)
        ovf = ovf | (new_kept > F)
        compacted = tuple(c[:F] for c in compacted)
        nk = len(cols)

        # bracketed element ranges for the surviving children only:
        # start = lb(child key), end = ub(descendant_max(child)) — the
        # range end equals the next sibling's lower bound (every key
        # between them would be a descendant), searched inside the
        # parent's bracket.  Inactive lanes have closed (0, 0) brackets
        # and cost no iterations.
        ckeys = bidx.key_from_columns(spec, compacted[:nk])
        cb_lo, cb_hi = compacted[nk], compacted[nk + 1]
        start = lower_bound_keys_bracketed(spec, state.keys, ckeys,
                                           cb_lo, cb_hi)
        end = upper_bound_keys_bracketed(
            spec, state.keys, bidx.descendant_max(spec, ckeys),
            start, cb_hi)
        return (compacted[:nk], start, end,
                jnp.minimum(new_kept, F),
                compacted[nk + 2], compacted[nk + 3],
                compacted[nk + 4], compacted[nk + 5],
                rstart, rlen, ovf)

    def cond(c):
        level = c[0]
        flo_c, fhi_c, kept_c, rlen_c = c[2], c[3], c[4], c[10]
        go = level < levels
        if stop_total > 0:
            act = jnp.arange(F, dtype=jnp.int32) < kept_c
            rem = jnp.sum(jnp.where(act, fhi_c - flo_c, 0))
            go = go & ((rem + jnp.sum(rlen_c)) > jnp.int32(stop_total))
        return go

    def wbody(c):
        return (c[0] + 1,) + body(c[0], c[1:])

    carry = (jnp.int32(0), kcols0, flo0, fhi0, kept0, lo0, hi0, rmin_f0,
             rmax_f0, rstart0, rlen0, jnp.bool_(False))
    if levels > 0:
        carry = jax.lax.while_loop(cond, wbody, carry)
    (_, _, flo, fhi, kept, _, _, _, _, rstart, rlen, ovf) = carry

    # depth cutoff: surviving slices report whole (truncated replay passed)
    factive = jnp.arange(F, dtype=jnp.int32) < kept
    rstart = rstart.at[levels].set(jnp.where(factive, flo, 0))
    rlen = rlen.at[levels].set(jnp.where(factive, fhi - flo, 0))
    return rstart.reshape(-1), rlen.reshape(-1), ovf


@functools.partial(jax.jit, static_argnums=(0, 8, 9, 10, 11))
def test_ray(spec: IndexSpec, state: LayerState, system_min, system_max,
             ray_origin, ray_dir, range_min, range_max, result_cap: int,
             max_depth: Optional[int] = None,
             candidate_cap: int = CANDIDATE_CAP,
             frontier_cap: int = FRONTIER_CAP
             ) -> Tuple[LayerState, TestResult]:
    """Sublinear ``Layer::test_ray`` (``src/layer.rs:327-352``): identical
    results to :func:`query.test_ray`; the frontier descends only until
    the candidates fit the buffer (early exit), then the gathered
    candidates get the exact per-element interval replay
    (``query.ray_intervals_keys``) — a superset filtered by the linear
    engine's own accept test, so results are bit-identical."""
    state = sort(spec, state)
    levels = spec.axis_bits if max_depth is None \
        else min(int(max_depth), spec.axis_bits)
    starts, lens, f_ovf = _ray_frontier_ranges(
        spec, state, system_min, system_max, ray_origin, ray_dir,
        range_min, range_max, jnp.inf, levels, frontier_cap,
        stop_total=candidate_cap)
    ids, keys, _, valid, c_ovf = _gather_ranges(spec, state, starts, lens,
                                                candidate_cap)
    rmn, rmx = ray_intervals_keys(spec, keys, system_min, system_max,
                                  ray_origin, ray_dir, range_min,
                                  range_max, max_depth)
    hit = (rmn < rmx) & valid
    res = _unique_compact(ids, hit, result_cap)
    res = res._replace(overflow=res.overflow | c_ovf | f_ovf)
    return state, _flag_truncation(state, res)


@functools.partial(jax.jit, static_argnums=(0, 7, 9, 10, 11))
def pick_ray(spec: IndexSpec, state: LayerState, system_min, system_max,
             ray_origin, ray_dir, max_distance,
             get_dist: Callable, get_dist_args=(),
             max_depth: Optional[int] = None,
             candidate_cap: int = CANDIDATE_CAP,
             frontier_cap: int = FRONTIER_CAP
             ) -> Tuple[LayerState, PickResult]:
    """Sublinear ``Layer::pick_ray`` (``src/layer.rs:418-446``): identical
    winner (including distance ties, resolved by the reference's DFS visit
    rank) to :func:`query.pick_ray`.  ``get_dist`` must be a pure
    vectorized function of the id array (the documented contract): it is
    evaluated on the gathered candidate ids instead of the full array."""
    state = sort(spec, state)
    md = jnp.float32(max_distance)
    levels = spec.axis_bits if max_depth is None \
        else min(int(max_depth), spec.axis_bits)
    starts, lens, f_ovf = _ray_frontier_ranges(
        spec, state, system_min, system_max, ray_origin, ray_dir,
        0.0, md, md, levels, frontier_cap, stop_total=candidate_cap)
    ids, keys, src, valid, c_ovf = _gather_ranges(spec, state, starts, lens,
                                                  candidate_cap)
    rmn, rmx = ray_intervals_keys(spec, keys, system_min, system_max,
                                  ray_origin, ray_dir, 0.0, md, max_depth)
    cand = (rmn < rmx) & (rmn < md) & valid
    d = jnp.asarray(get_dist(ids, cand, *get_dist_args), jnp.float32)
    d = jnp.where(jnp.isfinite(d) & cand, d, jnp.inf)
    g_origin = bidx.origin_of(spec, keys)
    g_depth = bidx.depth_of(spec, keys)
    if max_depth is not None:
        g_depth = jnp.minimum(g_depth, jnp.uint32(max_depth))
    rank = _ray_visit_rank(spec, g_origin, g_depth,
                           jnp.asarray(ray_dir, jnp.float32))
    res = _argmin_pick_ranked(d, rank, src.astype(jnp.uint32), ids, md)
    res = res._replace(overflow=res.overflow | c_ovf | f_ovf)
    return state, _flag_truncation(state, res)
