"""Vectorized geometry: AABBs, coordinate quantization, cell emission.

TPU-native rebuild of the reference's ``src/geom.rs``: bounds are
structure-of-arrays ``(..., dim)`` float32 / uint32 tensors, and the
per-object scalar loops (quantize -> depth -> grid walk) become fixed-shape
masked array programs.

Key semantics preserved:

* quantization maps the system box onto ``[0, 0xffff_ff00]`` — the largest
  u32 exactly representable in f32 (reference ``src/geom.rs:152-155``);
* per-object cell depth = ``leading_zeros(max_axis(sizei) - 1)`` floored by
  ``min_depth`` and clamped to ``axis_bits`` (``src/geom.rs:189-199``);
* the grid walk emits cells x-fastest, then y, then z (``src/geom.rs:202-304``)
  — here as a fixed ``slots_per_axis ** dim`` block of masked slots per
  object, so the whole batch is one branch-free kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .index import IndexSpec, Key
from .ops.u64 import U64

# Largest u32 whose f32 representation is exact (24-bit mantissa):
# 0xffff_ff00 (reference src/geom.rs:152-153).
RANGE_MAX_U32 = 0xFFFF_FF00
RANGE_MAX_F32 = jnp.float32(4294967040.0)


# ---------------------------------------------------------------------------
# AABB helpers (SoA: min/max are (..., dim) arrays)
# ---------------------------------------------------------------------------

def bounds_overlaps(amin, amax, bmin, bmax) -> jnp.ndarray:
    """Inclusive AABB overlap test (reference ``src/geom.rs:112-119``)."""
    return jnp.all((amin <= bmax) & (amax >= bmin), axis=-1)


def bounds_contains(amin, amax, bmin, bmax) -> jnp.ndarray:
    """a fully contains b (reference ``src/geom.rs:121-128``)."""
    return jnp.all((amin <= bmin) & (amax >= bmax), axis=-1)


def bounds_center(bmin, bmax) -> jnp.ndarray:
    """cgmath midpoint: min + (max - min) / 2."""
    return bmin + (bmax - bmin) * jnp.float32(0.5)


# ---------------------------------------------------------------------------
# SystemBounds: f32 <-> u32 quantization
# ---------------------------------------------------------------------------

def to_local(system_min, system_max, pts) -> jnp.ndarray:
    """Quantize global f32 points (..., dim) to u32 local coordinates.

    ((g - min) / size * RANGE) truncated toward zero, saturating — matching
    the Rust `as u32` cast (reference ``src/geom.rs:148-163``).

    The optimization barriers pin the op sequence: XLA's simplifier may
    otherwise fold the divide-by-constant ``size`` into a reciprocal
    multiply (or reassociate with the RANGE multiply) depending on the
    surrounding fusion context, flipping last-ulp results — a fused
    build+scan step would then quantize a handful of boxes into different
    cells than a standalone build and break bit-parity with the oracle
    (observed at 1M: 35 phantom candidate pairs).
    """
    system_min = jnp.asarray(system_min, jnp.float32)
    system_max = jnp.asarray(system_max, jnp.float32)
    pts = jnp.asarray(pts, jnp.float32)
    size = jax.lax.optimization_barrier(system_max - system_min)
    ratio = jax.lax.optimization_barrier((pts - system_min) / size)
    v = ratio * RANGE_MAX_F32
    v = jnp.clip(v, 0.0, jnp.float32(4294967040.0))
    v = jnp.where(jnp.isnan(v), 0.0, v)
    return v.astype(jnp.uint32)


def to_global(system_min, system_max, pts_u32) -> jnp.ndarray:
    """Inverse mapping: min + local / RANGE * size (``src/geom.rs:165-180``)."""
    system_min = jnp.asarray(system_min, jnp.float32)
    system_max = jnp.asarray(system_max, jnp.float32)
    size = system_max - system_min
    local = jnp.asarray(pts_u32, jnp.uint32).astype(jnp.float32)
    return system_min + local / RANGE_MAX_F32 * size


# ---------------------------------------------------------------------------
# Depth / truncation math (u32 Morton grid)
# ---------------------------------------------------------------------------

def truncate_to_depth(x: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Mask off bits below the cell scale; depth 0 is the identity
    (reference ``src/geom.rs:55-61``)."""
    depth = jnp.asarray(depth, jnp.uint32)
    low_bits = jnp.uint32(32) - depth  # in [0, 32]
    one = jnp.uint32(1)
    mask = jnp.where(low_bits >= 32, jnp.uint32(0xFFFF_FFFF),
                     (one << jnp.minimum(low_bits, 31)) - one)
    return jnp.where(depth == 0, x, x & ~mask)


def depth_for_bounds(spec: IndexSpec, lmin: jnp.ndarray, lmax: jnp.ndarray,
                     min_depth) -> jnp.ndarray:
    """Per-object cell depth (reference ``src/geom.rs:189-199``).

    lmin/lmax: (..., dim) u32.  Returns (...) u32 depth.
    """
    sizei = lmax - lmin + jnp.uint32(1)          # wrapping u32
    size_max = jnp.max(sizei, axis=-1)
    v = size_max - jnp.uint32(1)                 # wrapping
    lz = jax.lax.clz(v.astype(jnp.int32)).astype(jnp.uint32)
    lz = jnp.where(v == 0, jnp.uint32(32), lz)
    depth = jnp.maximum(lz, jnp.asarray(min_depth, jnp.uint32))
    return jnp.minimum(depth, jnp.uint32(spec.axis_bits))


# ---------------------------------------------------------------------------
# Cell emission: the vectorized grid walk
# ---------------------------------------------------------------------------

def emit_cells(spec: IndexSpec, lmin: jnp.ndarray, lmax: jnp.ndarray,
               min_depth, slots_per_axis: int = 2
               ) -> Tuple[Key, jnp.ndarray, jnp.ndarray]:
    """Compute up to ``slots_per_axis ** dim`` covering cells per object.

    lmin/lmax: (N, dim) u32 local bounds.  Returns (keys, valid, overflow):
    keys (N, S) in x-fastest slot order matching the reference's grid walk,
    valid (N, S) bool, overflow (N,) bool — true where the object needed more
    than ``slots_per_axis`` cells on some axis (the reference heap-allocates
    and warns, ``src/geom.rs:233-235``; a fixed-shape TPU kernel flags it).

    With ``min_depth == 0`` an object never needs more than 2 cells per axis,
    so the default is exact.
    """
    A = int(slots_per_axis)
    dim = spec.dim
    n = lmin.shape[0]

    depth = depth_for_bounds(spec, lmin, lmax, min_depth)          # (N,)
    tmin = truncate_to_depth(lmin, depth[:, None])                 # (N, dim)
    tmax = truncate_to_depth(lmax, depth[:, None])

    # cells per axis: ((tmax - tmin) >> (32 - depth)) + 1, depth >= 1
    shift = jnp.minimum(jnp.uint32(32) - depth, jnp.uint32(31))    # (N,)
    span = (tmax - tmin) >> shift[:, None]
    naxis = jnp.where(depth[:, None] == 0, jnp.uint32(1),
                      span + jnp.uint32(1))                        # (N, dim)
    overflow = jnp.any(naxis > jnp.uint32(A), axis=-1)

    step = jnp.where(depth == 0, jnp.uint32(0),
                     jnp.uint32(1) << jnp.minimum(jnp.uint32(32) - depth,
                                                  jnp.uint32(31)))  # (N,)

    # slot s -> per-axis slot indices, x fastest (matches grid-walk order)
    S = A ** dim
    slot = jnp.arange(S, dtype=jnp.uint32)                         # (S,)
    axis_slot = jnp.stack(
        [(slot // (A ** k)) % A for k in range(dim)], axis=-1)     # (S, dim)

    valid = jnp.all(axis_slot[None, :, :] < naxis[:, None, :], axis=-1)

    # Morton-encode each axis's A candidate coordinates once ((N, A) lanes
    # per axis) and OR-combine per slot — the interleave of independent
    # per-axis spreads IS the Morton code, so this does dim*A*N spread
    # passes instead of dim*(A**dim)*N (4x fewer for 3D).
    from .index import encode_axis, key_where
    ops = spec.ops
    a_idx = jnp.arange(A, dtype=jnp.uint32)
    spread_ax = []
    for axis in range(dim):
        pvals = tmin[:, axis:axis + 1] + a_idx[None, :] * step[:, None]
        spread_ax.append(ops.shli(encode_axis(spec, pvals), axis))  # (N, A)

    def _slot_key(s: int) -> Key:
        morton = None
        for axis in range(dim):
            i = (s // (A ** axis)) % A
            sp = spread_ax[axis]
            col = sp[:, i] if spec.bits == 32 else U64(sp.hi[:, i],
                                                      sp.lo[:, i])
            morton = col if morton is None else ops.or_(morton, col)
        key = ops.shli(morton, spec.origin_shift)
        return ops.or_(key, ops.from_u32(jnp.minimum(depth,
                                                     jnp.uint32(spec.axis_bits))))

    slot_keys = [_slot_key(s) for s in range(S)]
    if spec.bits == 32:
        keys = jnp.stack(slot_keys, axis=1)                        # (N, S)
    else:
        keys = U64(jnp.stack([k.hi for k in slot_keys], axis=1),
                   jnp.stack([k.lo for k in slot_keys], axis=1))

    # depth 0 emits the single whole-system cell Index::default() == 0
    # (reference src/geom.rs:203-205)
    keys = key_where(spec, (depth[:, None] == 0),
                     spec.zero_key((n, S)), keys)
    return keys, valid, overflow


# ---------------------------------------------------------------------------
# Cell bounds in f32 via midpoint replay (for queries)
# ---------------------------------------------------------------------------

def cell_bounds_f32(spec: IndexSpec, origin_axes, depth,
                    system_min, system_max,
                    replay_depth=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 bounds of each element's cell, truncated to ``replay_depth``.

    The reference's query engine derives cell bounds by recursive midpoint
    halving of the system box (``src/geom.rs:383-402``), which is *not* the
    same f32 values as direct interpolation.  We replay the same halving
    sequence, driven by each cell's origin bits, so query results are
    bit-identical to the recursive oracle.

    origin_axes: tuple of dim (N,) u32 (top-aligned); depth: (N,) u32.
    Returns (cell_min, cell_max): (N, dim) f32.
    """
    if replay_depth is None:
        replay = jnp.asarray(depth, jnp.uint32)
    else:
        replay = jnp.minimum(jnp.asarray(depth, jnp.uint32),
                             jnp.asarray(replay_depth, jnp.uint32))
    n = origin_axes[0].shape[0]
    dim = spec.dim
    lo = jnp.broadcast_to(jnp.asarray(system_min, jnp.float32), (n, dim))
    hi = jnp.broadcast_to(jnp.asarray(system_max, jnp.float32), (n, dim))
    origin = jnp.stack(origin_axes, axis=-1)                      # (N, dim)
    for b in range(spec.axis_bits):
        active = (jnp.uint32(b) < replay)[:, None]                # (N, 1)
        center = lo + (hi - lo) * jnp.float32(0.5)
        side = (origin >> jnp.uint32(31 - b)) & jnp.uint32(1)
        lo = jnp.where(active & (side == 1), center, lo)
        hi = jnp.where(active & (side == 0), center, hi)
    return lo, hi
