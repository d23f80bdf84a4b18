"""Sequential pure-Python/NumPy oracle for the TPU broadphase engine.

This module is the source of golden truth for every device kernel.  The
reference repo's binary test fixtures are Git-LFS pointers with no payload,
so — per SURVEY.md §4 — golden data is produced by this independent
re-implementation of the reference semantics:

* a *naive per-bit* Morton codec (deliberately not the magic-mask algorithm
  used on device, so the two validate each other),
* scalar ports of quantization / index generation
  (reference ``src/geom.rs:148-163``, ``:183-305``),
* the sequential stack sweep ``scan_impl`` (reference ``src/layer.rs:550-573``),
* the recursive query engine ``test_impl`` (reference ``src/layer.rs:167-239``),
* a brute-force O(n^2) AABB overlap oracle.

Everything here is host-side Python; it is O(n log n)–O(n^2) and meant for
test sizes (<= ~100k objects; use the C++ oracle for 1M).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

# specs are plain dataclasses with ints only — safe to share with the oracle
from ..index import IndexSpec, Index32_2D, Index64_2D, Index64_3D  # noqa: F401

U32 = 0xFFFF_FFFF

# ---------------------------------------------------------------------------
# Naive codec (python ints)
# ---------------------------------------------------------------------------


def encode_axis(spec: IndexSpec, origin: int) -> int:
    v = (origin & U32) >> (32 - spec.axis_bits)
    out = 0
    for i in range(spec.axis_bits):
        if (v >> i) & 1:
            out |= 1 << (spec.dim * i)
    return out


def decode_axis(spec: IndexSpec, spread: int) -> int:
    v = 0
    for i in range(spec.axis_bits):
        if (spread >> (spec.dim * i)) & 1:
            v |= 1 << i
    return (v << (32 - spec.axis_bits)) & U32


def make_key(spec: IndexSpec, origin: Sequence[int], depth: int) -> int:
    assert len(origin) == spec.dim
    morton = 0
    for axis in range(spec.dim):
        morton |= encode_axis(spec, origin[axis]) << axis
    return (morton << spec.origin_shift) | clamp_depth(spec, depth)


def clamp_depth(spec: IndexSpec, depth: int) -> int:
    return min(depth, spec.axis_bits)


def depth_of(spec: IndexSpec, key: int) -> int:
    return key & spec.depth_mask


def origin_of(spec: IndexSpec, key: int) -> Tuple[int, ...]:
    morton = (key & spec.origin_mask) >> spec.origin_shift
    return tuple(decode_axis(spec, morton >> axis) for axis in range(spec.dim))


def level_mask(spec: IndexSpec, depth: int) -> int:
    if depth <= 0:
        return 0
    return ((1 << (spec.dim * depth)) - 1) << (spec.key_bits - spec.dim * depth)


def same_cell_at_depth(spec: IndexSpec, a: int, b: int, depth: int) -> bool:
    return (a ^ b) & level_mask(spec, depth) == 0


def overlaps(spec: IndexSpec, a: int, b: int) -> bool:
    return same_cell_at_depth(spec, a, b, min(depth_of(spec, a), depth_of(spec, b)))


def subdivide(spec: IndexSpec, key: int) -> Optional[List[int]]:
    depth = depth_of(spec, key)
    if depth >= spec.axis_bits:
        return None
    shift = spec.key_bits - spec.dim * (depth + 1)
    out = []
    for child in range(spec.fanout):
        k = key | (child << shift)
        k = (k & ~spec.depth_mask) | (depth + 1)
        out.append(k)
    return out


def descendant_max(spec: IndexSpec, key: int) -> int:
    depth = depth_of(spec, key)
    below = spec.key_bits - spec.dim * depth
    return key | ((1 << below) - 1)


# ---------------------------------------------------------------------------
# Geometry: quantization + index generation (scalar reference semantics)
# ---------------------------------------------------------------------------

RANGE_MAX = np.float32(4294967040.0)  # 0xffff_ff00 as f32 (src/geom.rs:152-153)


def to_local(system_min: np.ndarray, system_max: np.ndarray,
             pt: np.ndarray) -> np.ndarray:
    """Quantize one global f32 point to u32 local coords
    (reference ``src/geom.rs:148-163``): ((g - min) / size * RANGE) as u32."""
    out = np.zeros(len(pt), dtype=np.uint64)
    for i in range(len(pt)):
        size = np.float32(system_max[i]) - np.float32(system_min[i])
        v = (np.float32(pt[i]) - np.float32(system_min[i])) / size * RANGE_MAX
        # Rust `as u32`: truncate toward zero, saturating
        v = float(v)
        if math.isnan(v) or v <= 0.0:
            out[i] = 0
        elif v >= 4294967295.0:
            out[i] = U32
        else:
            out[i] = int(v)
    return out.astype(np.uint32)


def to_global(system_min: np.ndarray, system_max: np.ndarray,
              pt: np.ndarray) -> np.ndarray:
    out = np.zeros(len(pt), dtype=np.float32)
    for i in range(len(pt)):
        size = np.float32(system_max[i]) - np.float32(system_min[i])
        out[i] = np.float32(system_min[i]) + np.float32(pt[i]) / RANGE_MAX * size
    return out


def scale_at_depth(depth: int) -> int:
    assert depth > 0
    return 1 << (32 - depth)


def truncate_to_depth(x: int, depth: int) -> int:
    if depth == 0:
        return x
    return x & ~(scale_at_depth(depth) - 1) & U32


def depth_for_bounds(spec: IndexSpec, lmin: Sequence[int], lmax: Sequence[int],
                     min_depth: int) -> int:
    """depth = leading_zeros(max_axis(sizei) - 1), floored by min_depth and
    clamped to axis_bits (reference ``src/geom.rs:189-199``)."""
    size_max = 0
    for i in range(spec.dim):
        sizei = (int(lmax[i]) - int(lmin[i]) + 1) & U32  # wrapping, u32
        size_max = max(size_max, sizei)
    v = (size_max - 1) & U32
    lz = 32 if v == 0 else 32 - v.bit_length()
    depth = max(lz, min_depth)
    return clamp_depth(spec, depth)


def cell_indices(spec: IndexSpec, lmin: Sequence[int], lmax: Sequence[int],
                 min_depth: int) -> List[int]:
    """All cell keys covering a local-coords AABB — the grid walk of
    reference ``src/geom.rs:202-238`` / ``:260-304``, x fastest."""
    depth = depth_for_bounds(spec, lmin, lmax, min_depth)
    return cell_indices_at_depth(spec, lmin, lmax, depth)


def cell_indices_at_depth(spec: IndexSpec, lmin, lmax, depth: int) -> List[int]:
    if depth == 0:
        return [0]
    tmin = [truncate_to_depth(int(lmin[i]), depth) for i in range(spec.dim)]
    tmax = [truncate_to_depth(int(lmax[i]), depth) for i in range(spec.dim)]
    step = scale_at_depth(depth)
    axes_positions = []
    for i in range(spec.dim):
        pos = []
        x = tmin[i]
        while True:
            pos.append(x)
            if x >= tmax[i]:
                break
            x += step
        axes_positions.append(pos)
    out = []
    if spec.dim == 2:
        for y in axes_positions[1]:
            for x in axes_positions[0]:
                out.append(make_key(spec, (x, y), depth))
    else:
        for z in axes_positions[2]:
            for y in axes_positions[1]:
                for x in axes_positions[0]:
                    out.append(make_key(spec, (x, y, z), depth))
    return out


# ---------------------------------------------------------------------------
# Layer oracle: extend / sort / scan (sequential reference semantics)
# ---------------------------------------------------------------------------


def extend(spec: IndexSpec,
           system_min: np.ndarray, system_max: np.ndarray,
           bounds_min: np.ndarray, bounds_max: np.ndarray,
           ids: np.ndarray, min_depth: int = 0
           ) -> Tuple[List[int], List[int], List[int]]:
    """Build the (key, id) tree for a batch of objects.

    Returns (keys, tree_ids, invalid_ids).  Objects not contained by the
    system bounds are dropped into invalid_ids (reference
    ``src/layer.rs:108-111``).
    """
    keys: List[int] = []
    tree_ids: List[int] = []
    invalid: List[int] = []
    n = len(ids)
    for k in range(n):
        contained = True
        for i in range(len(system_min)):
            if system_min[i] > bounds_min[k][i] or system_max[i] < bounds_max[k][i]:
                contained = False
                break
        if not contained:
            invalid.append(int(ids[k]))
            continue
        lmin = to_local(system_min, system_max, bounds_min[k])
        lmax = to_local(system_min, system_max, bounds_max[k])
        for key in cell_indices(spec, lmin, lmax, min_depth):
            keys.append(key)
            tree_ids.append(int(ids[k]))
    return keys, tree_ids, invalid


def sort_tree(keys: Sequence[int], ids: Sequence[int]) -> Tuple[List[int], List[int]]:
    """sort_unstable on (Index, ID) tuples — full lexicographic order."""
    pairs = sorted(zip(keys, ids))
    return [p[0] for p in pairs], [p[1] for p in pairs]


def scan(spec: IndexSpec, keys: Sequence[int], ids: Sequence[int],
         filter_fn: Optional[Callable[[int, int], bool]] = None
         ) -> List[Tuple[int, int]]:
    """Sequential stack sweep (reference ``src/layer.rs:550-573``) plus the
    sort+dedup post-pass (``:473-474``).  Input must be sorted."""
    stack: List[Tuple[int, int]] = []
    collisions: List[Tuple[int, int]] = []
    for key, oid in zip(keys, ids):
        while stack and not overlaps(spec, key, stack[-1][0]):
            stack.pop()
        if any(oid == sid for _, sid in stack):
            continue
        for _, sid in stack:
            if oid != sid and (filter_fn is None or filter_fn(oid, sid)):
                collisions.append((oid, sid))
        stack.append((key, oid))
    collisions.sort()
    out = []
    for c in collisions:
        if not out or out[-1] != c:
            out.append(c)
    return out


def brute_force_pairs(bounds_min: np.ndarray, bounds_max: np.ndarray,
                      ids: np.ndarray) -> set:
    """O(n^2) AABB overlap oracle (inclusive bounds), unordered id pairs."""
    n = len(ids)
    out = set()
    bmin = np.asarray(bounds_min)
    bmax = np.asarray(bounds_max)
    for i in range(n):
        hit = np.all(bmin[i] <= bmax[i + 1:], axis=1) & \
              np.all(bmax[i] >= bmin[i + 1:], axis=1)
        for j in np.nonzero(hit)[0]:
            a, b = int(ids[i]), int(ids[i + 1 + j])
            if a != b:
                out.add((min(a, b), max(a, b)))
    return out


# ---------------------------------------------------------------------------
# Query oracle: recursive test_impl (reference src/layer.rs:167-239)
# ---------------------------------------------------------------------------


class TestGeometry:
    """Oracle-side TestGeometry contract (reference ``src/geom.rs:327-348``)."""

    def subdivide(self) -> List["TestGeometry"]:
        raise NotImplementedError

    def test_order(self) -> List[int]:
        raise NotImplementedError

    def should_test(self, nearest: float) -> bool:
        raise NotImplementedError


class BoxTestGeometry(TestGeometry):
    """f32 cell-halving box overlap test (reference ``src/geom.rs:352-455``)."""

    def __init__(self, cell_min, cell_max, test_min, test_max):
        self.cell_min = np.asarray(cell_min, np.float32).copy()
        self.cell_max = np.asarray(cell_max, np.float32).copy()
        self.test_min = np.asarray(test_min, np.float32)
        self.test_max = np.asarray(test_max, np.float32)
        self.dim = len(self.cell_min)

    def _center(self):
        # cgmath midpoint: min + (max - min) / 2, f32 steps
        return self.cell_min + (self.cell_max - self.cell_min) / np.float32(2)

    def subdivide(self):
        center = self._center()
        out = []
        for cell in range(1 << self.dim):
            g = BoxTestGeometry(self.cell_min, self.cell_max,
                                self.test_min, self.test_max)
            for axis in range(self.dim):
                if cell & (1 << axis):
                    g.cell_min[axis] = center[axis]
                else:
                    g.cell_max[axis] = center[axis]
            out.append(g)
        return out

    def test_order(self):
        return list(range(1 << self.dim))

    def should_test(self, nearest: float) -> bool:
        return bool(np.all(self.cell_min <= self.test_max) and
                    np.all(self.cell_max >= self.test_min))


class RayTestGeometry(TestGeometry):
    """Slab-interval ray test (reference ``src/geom.rs:459-689``)."""

    def __init__(self, cell_min, cell_max, origin, direction,
                 range_min, range_max, *, _clamp=True):
        self.cell_min = np.asarray(cell_min, np.float32).copy()
        self.cell_max = np.asarray(cell_max, np.float32).copy()
        self.origin = np.asarray(origin, np.float32)
        self.direction = np.asarray(direction, np.float32)
        self.range_min = np.float32(range_min)
        self.range_max = np.float32(range_max)
        self.dim = len(self.cell_min)
        if _clamp:
            # with_system_bounds: clamp infinite range to system bounds
            # (reference src/geom.rs:515-544)
            with np.errstate(divide="ignore", invalid="ignore"):
                d0 = (self.cell_min - self.origin) / self.direction
                d1 = (self.cell_max - self.origin) / self.direction
            for axis in range(self.dim):
                fwd = self.direction[axis] > 0
                lo, hi = (d0[axis], d1[axis]) if fwd else (d1[axis], d0[axis])
                if np.isfinite(lo):
                    self.range_min = max(self.range_min, np.float32(lo))
                if np.isfinite(hi):
                    self.range_max = min(self.range_max, np.float32(hi))

    def _center(self):
        return self.cell_min + (self.cell_max - self.cell_min) / np.float32(2)

    def subdivide(self):
        center = self._center()
        with np.errstate(divide="ignore", invalid="ignore"):
            distance = (center - self.origin) / self.direction
        out = []
        for cell in range(1 << self.dim):
            g = RayTestGeometry(self.cell_min, self.cell_max, self.origin,
                                self.direction, self.range_min, self.range_max,
                                _clamp=False)
            for axis in range(self.dim):
                side = bool(cell & (1 << axis))
                if np.isfinite(distance[axis]):
                    towards = (self.direction[axis] > 0) != side
                    if towards:
                        g.range_max = min(g.range_max, np.float32(distance[axis]))
                    else:
                        g.range_min = max(g.range_min, np.float32(distance[axis]))
                elif (self.origin[axis] > center[axis]) != side:
                    g.range_min = np.float32(np.inf)
                    g.range_max = np.float32(-np.inf)
            for axis in range(self.dim):
                if cell & (1 << axis):
                    g.cell_min[axis] = center[axis]
                else:
                    g.cell_max[axis] = center[axis]
            out.append(g)
        return out

    def test_order(self):
        a = np.abs(self.direction)
        if self.dim == 2:
            axes = [0, 1] if a[0] <= a[1] else [1, 0]
        else:
            if a[0] <= a[1] and a[0] <= a[2]:
                axes = [0, 1, 2] if a[1] <= a[2] else [0, 2, 1]
            elif a[1] <= a[2]:
                axes = [1, 0, 2] if a[0] <= a[2] else [1, 2, 0]
            else:
                axes = [2, 0, 1] if a[0] <= a[1] else [2, 1, 0]
        order = []
        for cell_src in range(1 << self.dim):
            dst = 0
            for k in range(self.dim):
                flip = ((cell_src >> k) & 1 != 0) == (self.direction[axes[k]] >= 0)
                dst |= int(flip) << axes[k]
            order.append(dst)
        return order

    def should_test(self, nearest: float) -> bool:
        return bool(self.range_min < self.range_max and self.range_min < nearest)


def test_impl(spec: IndexSpec, keys: Sequence[int], ids: Sequence[int],
              cell: int, geom: TestGeometry, nearest: float,
              max_depth: Optional[int],
              callback: Callable[[TestGeometry, float, int], float]) -> float:
    """Recursive query engine; faithful port of reference semantics
    (``src/layer.rs:167-239``).  keys/ids is the (sorted) slice for `cell`."""
    if len(keys) == 0 or not geom.should_test(nearest):
        return nearest

    depth = depth_of(spec, cell)
    if max_depth is not None and depth >= max_depth:
        for oid in ids:
            nearest = min(nearest, callback(geom, nearest, oid))
        return nearest

    children = subdivide(spec, cell)
    if children is None:
        for oid in ids:
            nearest = min(nearest, callback(geom, nearest, oid))
        return nearest

    # partition: items before the first child are ancestors at this cell
    import bisect
    cuts = [bisect.bisect_left(keys, c) for c in children] + [len(keys)]
    for oid in ids[: cuts[0]]:
        nearest = min(nearest, callback(geom, nearest, oid))

    sub_geoms = geom.subdivide()
    for i in geom.test_order():
        lo, hi = cuts[i], cuts[i + 1]
        if lo < hi:
            nearest = test_impl(spec, keys[lo:hi], ids[lo:hi], children[i],
                                sub_geoms[i], nearest, max_depth, callback)
        else:
            # still honor should_test bookkeeping parity: no-op on empty slice
            pass
    return nearest


def run_test(spec: IndexSpec, keys, ids, geom: TestGeometry,
             max_depth: Optional[int] = None) -> List[int]:
    """Layer::test — collect ids, sort + dedup (src/layer.rs:252-280)."""
    results: List[int] = []

    def cb(_g, nearest, oid):
        results.append(oid)
        return nearest

    test_impl(spec, list(keys), list(ids), 0, geom, float("inf"), max_depth, cb)
    results.sort()
    out = []
    for r in results:
        if not out or out[-1] != r:
            out.append(r)
    return out


def run_pick(spec: IndexSpec, keys, ids, geom: TestGeometry, max_dist: float,
             get_dist: Callable[[TestGeometry, float, int], float],
             max_depth: Optional[int] = None) -> Optional[Tuple[float, int]]:
    """Layer::pick (src/layer.rs:364-404): nearest-first early-out search."""
    processed = set()
    result = [None]

    def cb(g, nearest, oid):
        if oid in processed:
            return float("inf")
        processed.add(oid)
        d = get_dist(g, nearest, oid)
        if math.isfinite(d):
            if d < nearest:
                result[0] = oid
            return d
        return float("inf")

    dist = test_impl(spec, list(keys), list(ids), 0, geom, max_dist,
                     max_depth, cb)
    if result[0] is None:
        return None
    return dist, result[0]
