"""Packed Morton spatial-index codecs, vectorized for TPU.

Re-implements the contract of the reference's ``SpatialIndex`` trait and its
three concrete types (reference: ``src/index.rs:38-63``, ``:293-295``):

* ``Index32_2D`` — 32-bit key: 4 depth bits + 2x14 Morton-interleaved axis bits
* ``Index64_2D`` — 64-bit key: 5 depth bits + 2x29 axis bits
* ``Index64_3D`` — 64-bit key: 5 depth bits + 3x19 axis bits

Bit layout (reference ``src/index.rs:72-78``): depth occupies the lowest
``depth_bits``; the Morton-coded origin sits directly above it, X lowest
significance, then Y, then Z.  Plain integer comparison of keys is therefore a
topological (ancestor-before-descendant) order.

TPU-first design: keys are *arrays* — ``uint32`` for the 32-bit type and
(hi, lo) ``uint32`` pairs (:class:`~broadphase_tpu.ops.u64.U64`) for the
64-bit types, because TPUs have no fast native u64.  Every operation below is
elementwise/branch-free and safe under ``jit``/``vmap``.  The Morton
spread/compress stages are derived programmatically (not transliterated) and
validated against a naive per-bit oracle in ``tests/test_index.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .ops import u64 as u64ops
from .ops.u64 import U64

Key = Union[jnp.ndarray, U64]  # uint32 array, or U64 pair of uint32 arrays


# ---------------------------------------------------------------------------
# Spread/compress stage derivation
# ---------------------------------------------------------------------------

def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _positions_mask(nbits: int, stride: int, granularity: int) -> int:
    """Bit positions of the nbits source bits when separated at `granularity`.

    At granularity g, source bit i sits at (i // g) * g * stride + (i % g).
    g >= nbits leaves bits packed (position i); g == 1 is the full spread
    (position i * stride).
    """
    mask = 0
    for i in range(nbits):
        mask |= 1 << ((i // granularity) * granularity * stride + (i % granularity))
    return mask


def _spread_stages(nbits: int, stride: int) -> List[Tuple[int, int]]:
    """(shift, mask) stages s.t. x = (x | (x << shift)) & mask spreads bits."""
    stages = []
    c = _next_pow2(nbits) >> 1
    while c >= 1:
        stages.append((c * (stride - 1), _positions_mask(nbits, stride, c)))
        c >>= 1
    return stages


def _compress_stages(nbits: int, stride: int) -> List[Tuple[int, int]]:
    """(shift, mask) stages s.t. x = (x | (x >> shift)) & mask compresses bits."""
    stages = []
    c = 1
    top = _next_pow2(nbits)
    while c < top:
        stages.append((c * (stride - 1), _positions_mask(nbits, stride, 2 * c)))
        c <<= 1
    return stages


# ---------------------------------------------------------------------------
# Integer-ops shim: identical API over uint32 arrays and U64 pairs
# ---------------------------------------------------------------------------

class _OpsU32:
    bits = 32

    @staticmethod
    def const(v: int, shape=()):
        return jnp.full(shape, v & 0xFFFF_FFFF, dtype=jnp.uint32)

    @staticmethod
    def from_u32(x):
        return jnp.asarray(x, dtype=jnp.uint32)

    @staticmethod
    def to_u32(x):
        return x

    @staticmethod
    def shli(x, n: int):
        return x << n if n else x

    @staticmethod
    def shri(x, n: int):
        return x >> n if n else x

    @staticmethod
    def shl(x, n):
        # dynamic shift, n in [0, 32]; shift-by-32 handled explicitly
        n = jnp.asarray(n, dtype=jnp.uint32)
        return jnp.where(n >= 32, jnp.zeros_like(x), x << jnp.minimum(n, 31))

    @staticmethod
    def and_(a, b):
        if isinstance(b, int):
            b = jnp.uint32(b & 0xFFFF_FFFF)
        return a & b

    @staticmethod
    def or_(a, b):
        if isinstance(b, int):
            b = jnp.uint32(b & 0xFFFF_FFFF)
        return a | b

    @staticmethod
    def xor(a, b):
        if isinstance(b, int):
            b = jnp.uint32(b & 0xFFFF_FFFF)
        return a ^ b

    @staticmethod
    def not_(a):
        return ~a

    @staticmethod
    def eq(a, b):
        if isinstance(b, int):
            b = jnp.uint32(b & 0xFFFF_FFFF)
        return a == b

    @staticmethod
    def lt(a, b):
        return a < b

    @staticmethod
    def le(a, b):
        return a <= b

    @staticmethod
    def is_zero(a):
        return a == 0

    @staticmethod
    def where(p, a, b):
        return jnp.where(p, a, b)

    @staticmethod
    def mask_below(s):
        """(1 << s) - 1 for traced s in [0, 32]."""
        s = jnp.asarray(s, dtype=jnp.uint32)
        one = jnp.uint32(1)
        return jnp.where(
            s >= 32,
            jnp.uint32(0xFFFF_FFFF),
            (one << jnp.minimum(s, 31)) - one,
        )


class _OpsU64:
    bits = 64

    @staticmethod
    def const(v: int, shape=()):
        return u64ops.from_int(v, shape)

    @staticmethod
    def from_u32(x):
        return u64ops.from_u32(x)

    @staticmethod
    def to_u32(x: U64):
        return x.lo

    shli = staticmethod(u64ops.shli)
    shri = staticmethod(u64ops.shri)
    and_ = staticmethod(u64ops.and_)
    or_ = staticmethod(u64ops.or_)
    xor = staticmethod(u64ops.xor)
    not_ = staticmethod(u64ops.not_)
    eq = staticmethod(u64ops.eq)
    lt = staticmethod(u64ops.lt)
    le = staticmethod(u64ops.le)
    is_zero = staticmethod(u64ops.is_zero)
    where = staticmethod(u64ops.where)

    @staticmethod
    def shl(x: U64, n):
        """Dynamic left shift, n traced in [0, 64]."""
        n = jnp.asarray(n, dtype=jnp.uint32)
        m = n & 31
        lo_hi_part = jnp.where(m == 0, jnp.zeros_like(x.lo), x.lo >> ((32 - m) & 31))
        small = U64((x.hi << m) | lo_hi_part, x.lo << m)
        big = U64(x.lo << m, jnp.zeros_like(x.lo))
        out = u64ops.where(n >= 32, big, small)
        return u64ops.where(n >= 64, u64ops.zeros(x.shape), out)

    @staticmethod
    def mask_below(s):
        """(1 << s) - 1 for traced s in [0, 64]."""
        s = jnp.asarray(s, dtype=jnp.uint32)
        lo = _OpsU32.mask_below(jnp.minimum(s, 32))
        hi = _OpsU32.mask_below(jnp.where(s >= 32, s - 32, 0))
        return U64(hi, lo)


# ---------------------------------------------------------------------------
# IndexSpec
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class IndexSpec:
    """Static description of one packed spatial-index type.

    Mirrors the constants generated by the reference's ``index_impl!`` macro
    (``src/index.rs:72-78``).
    """

    name: str
    dim: int
    bits: int
    depth_bits: int
    axis_bits: int

    @property
    def origin_bits(self) -> int:
        return self.dim * self.axis_bits

    @property
    def origin_shift(self) -> int:
        return self.depth_bits  # DEPTH_SHIFT = 0

    @property
    def key_bits(self) -> int:
        """Total significant bits: origin_bits + origin_shift (<= bits)."""
        return self.origin_bits + self.origin_shift

    @property
    def depth_mask(self) -> int:
        return (1 << self.depth_bits) - 1

    @property
    def origin_mask(self) -> int:
        return ((1 << self.origin_bits) - 1) << self.origin_shift

    @property
    def fanout(self) -> int:
        return 1 << self.dim

    @property
    def ops(self):
        return _OpsU32 if self.bits == 32 else _OpsU64

    @property
    def spread_stages(self) -> List[Tuple[int, int]]:
        return _spread_stages(self.axis_bits, self.dim)

    @property
    def compress_stages(self) -> List[Tuple[int, int]]:
        return _compress_stages(self.axis_bits, self.dim)

    # -- key constructors ---------------------------------------------------

    def zero_key(self, shape=()) -> Key:
        """`default()` — the whole-system cell: zero origin, zero depth."""
        return self.ops.const(0, shape)

    def pad_key(self, shape=()) -> Key:
        """All-ones key; sorts after every valid key (valid keys never set
        bits >= key_bits, and for Index32_2D max depth 14 < 15 keeps the max
        valid key below 0xFFFFFFFF)."""
        return self.ops.const((1 << self.bits) - 1, shape)


Index32_2D = IndexSpec("Index32_2D", dim=2, bits=32, depth_bits=4, axis_bits=14)
Index64_2D = IndexSpec("Index64_2D", dim=2, bits=64, depth_bits=5, axis_bits=29)
Index64_3D = IndexSpec("Index64_3D", dim=3, bits=64, depth_bits=5, axis_bits=19)

ALL_SPECS = (Index32_2D, Index64_2D, Index64_3D)


# ---------------------------------------------------------------------------
# Codec ops (all vectorized; `key` may be any shape)
# ---------------------------------------------------------------------------

def encode_axis(spec: IndexSpec, origin: jnp.ndarray) -> Key:
    """Spread the top `axis_bits` of a u32 axis coordinate to stride-`dim`
    bit positions (reference ``src/index.rs:155-172`` / ``:192-207``)."""
    ops = spec.ops
    x = ops.from_u32(jnp.asarray(origin, jnp.uint32) >> (32 - spec.axis_bits))
    for shift, mask in spec.spread_stages:
        x = ops.and_(ops.or_(x, ops.shli(x, shift)), mask)
    return x


def decode_axis(spec: IndexSpec, spread: Key) -> jnp.ndarray:
    """Inverse of :func:`encode_axis`; returns the u32 axis coordinate
    (top-aligned, low ``32 - axis_bits`` bits zero)."""
    ops = spec.ops
    x = ops.and_(spread, _positions_mask(spec.axis_bits, spec.dim, 1))
    for shift, mask in spec.compress_stages:
        x = ops.and_(ops.or_(x, ops.shri(x, shift)), mask)
    return ops.to_u32(x) << (32 - spec.axis_bits)


def make_key(spec: IndexSpec, origin: Sequence[jnp.ndarray], depth) -> Key:
    """Pack per-axis u32 coordinates + depth into a key.

    ``origin`` must already be truncated to ``depth`` (the reference keeps
    truncation the caller's responsibility too, ``src/index.rs:18-19``).
    """
    assert len(origin) == spec.dim
    ops = spec.ops
    morton = encode_axis(spec, origin[0])
    for axis in range(1, spec.dim):
        morton = ops.or_(morton, ops.shli(encode_axis(spec, origin[axis]), axis))
    key = ops.shli(morton, spec.origin_shift)
    depth = jnp.asarray(depth, jnp.uint32)
    return ops.or_(key, ops.from_u32(jnp.minimum(depth, spec.axis_bits)))


def depth_of(spec: IndexSpec, key: Key) -> jnp.ndarray:
    return spec.ops.to_u32(spec.ops.and_(key, spec.depth_mask))


def origin_of(spec: IndexSpec, key: Key) -> Tuple[jnp.ndarray, ...]:
    ops = spec.ops
    morton = ops.shri(ops.and_(key, spec.origin_mask), spec.origin_shift)
    return tuple(decode_axis(spec, ops.shri(morton, axis)) for axis in range(spec.dim))


def set_depth(spec: IndexSpec, key: Key, depth) -> Key:
    ops = spec.ops
    cleared = ops.and_(key, ~spec.depth_mask & ((1 << spec.bits) - 1))
    depth = jnp.minimum(jnp.asarray(depth, jnp.uint32), spec.axis_bits)
    return ops.or_(cleared, ops.from_u32(depth))


def clamp_depth(spec: IndexSpec, depth) -> jnp.ndarray:
    return jnp.minimum(jnp.asarray(depth, jnp.uint32), spec.axis_bits)


def level_mask(spec: IndexSpec, depth) -> Key:
    """Mask of the origin bits meaningful at `depth`
    (reference ``src/index.rs:82-87``): bits [key_bits - dim*depth, key_bits).
    depth == 0 gives an empty mask."""
    ops = spec.ops
    depth = jnp.asarray(depth, jnp.uint32)
    below = jnp.asarray(spec.key_bits, jnp.uint32) - jnp.uint32(spec.dim) * depth
    full = ops.const((1 << spec.key_bits) - 1, jnp.shape(depth))
    return ops.and_(full, ops.not_(ops.mask_below(below)))


def same_cell_at_depth(spec: IndexSpec, a: Key, b: Key, depth) -> jnp.ndarray:
    ops = spec.ops
    return ops.is_zero(ops.and_(ops.xor(a, b), level_mask(spec, depth)))


def overlaps(spec: IndexSpec, a: Key, b: Key) -> jnp.ndarray:
    """Two cells overlap iff one is an ancestor-or-equal of the other
    (reference ``src/index.rs:116-122``)."""
    d = jnp.minimum(depth_of(spec, a), depth_of(spec, b))
    return same_cell_at_depth(spec, a, b, d)


def descendant_max(spec: IndexSpec, key: Key) -> Key:
    """Largest possible key of any descendant-or-equal cell of `key`.

    In sorted order, every element overlapping `key` from the right lies in
    the contiguous run (key .. descendant_max(key)] — this is the invariant
    that turns the reference's sequential stack sweep (``src/layer.rs:550-573``)
    into a data-parallel range query.
    """
    ops = spec.ops
    depth = depth_of(spec, key)
    below = jnp.asarray(spec.key_bits, jnp.uint32) - jnp.uint32(spec.dim) * depth
    return ops.or_(key, ops.mask_below(below))


def subdivide(spec: IndexSpec, key: Key) -> Tuple[Key, jnp.ndarray]:
    """Children of each cell, in sorted order, plus a validity flag.

    Returns (children, valid) where children has a leading axis of 2**dim
    and valid is True where depth < axis_bits (reference
    ``src/index.rs:251-290`` returns None at the depth limit).
    """
    ops = spec.ops
    depth = depth_of(spec, key)
    valid = depth < spec.axis_bits
    shift = jnp.asarray(spec.key_bits, jnp.uint32) - jnp.uint32(spec.dim) * (depth + 1)
    children = []
    for child in range(spec.fanout):
        bits = ops.shl(ops.const(child, jnp.shape(shift)), shift)
        children.append(set_depth(spec, ops.or_(key, bits), depth + 1))
    if spec.bits == 32:
        stacked = jnp.stack(children, axis=0)
    else:
        stacked = U64(
            jnp.stack([c.hi for c in children], axis=0),
            jnp.stack([c.lo for c in children], axis=0),
        )
    return stacked, valid


# ---------------------------------------------------------------------------
# Key comparisons / utilities used by layer ops
# ---------------------------------------------------------------------------

def key_le(spec: IndexSpec, a: Key, b: Key) -> jnp.ndarray:
    return spec.ops.le(a, b)


def key_lt(spec: IndexSpec, a: Key, b: Key) -> jnp.ndarray:
    return spec.ops.lt(a, b)


def key_eq(spec: IndexSpec, a: Key, b: Key) -> jnp.ndarray:
    return spec.ops.eq(a, b)


def key_where(spec: IndexSpec, pred, a: Key, b: Key) -> Key:
    return spec.ops.where(pred, a, b)


def key_gather(spec: IndexSpec, key: Key, idx) -> Key:
    if spec.bits == 32:
        return key[idx]
    return U64(key.hi[idx], key.lo[idx])


def sort_operands(spec: IndexSpec, key: Key) -> Tuple[jnp.ndarray, ...]:
    """Key columns for lax.sort, most-significant first."""
    if spec.bits == 32:
        return (key,)
    return (key.hi, key.lo)


def key_from_columns(spec: IndexSpec, cols: Sequence[jnp.ndarray]) -> Key:
    if spec.bits == 32:
        return cols[0]
    return U64(cols[0], cols[1])


def keys_to_numpy(spec: IndexSpec, key: Key):
    """Host-side: keys as numpy uint32/uint64 (tests, serialization, debug)."""
    import numpy as np

    if spec.bits == 32:
        return np.asarray(key, dtype=np.uint32)
    return u64ops.to_py(key)


def _ctz32(x: jnp.ndarray) -> jnp.ndarray:
    """Trailing zeros of a uint32 array (32 where zero), as int32."""
    x = jnp.asarray(x, jnp.uint32)
    lsb = x & (jnp.uint32(0) - x)
    p = 31 - jax.lax.clz(lsb.astype(jnp.int32)).astype(jnp.int32)
    return jnp.where(x == 0, 32, p)


@functools.lru_cache(maxsize=None)
def _axis_interleave_mask(dim: int, axis_bits: int, axis: int) -> int:
    m = 0
    for j in range(axis_bits):
        m |= 1 << (j * dim + axis)
    return m


def tz_pack(spec: IndexSpec, key: Key) -> jnp.ndarray:
    """Per-axis trailing-zero counts of each cell's coordinate *in depth
    units*, clamped to 31 and packed in 5-bit fields (axis k at bits
    ``5*k``).  Input keys may be any shape; pad keys yield garbage (callers
    mask).  Feeds the scan's emit-once dedup rule: the coordinate of cell
    ``c`` at depth ``d`` is aligned to a depth-``s`` ancestor boundary on
    axis k iff ``tz_k >= s``."""
    ops = spec.ops
    d = depth_of(spec, key).astype(jnp.int32)
    morton = ops.shri(ops.and_(key, spec.origin_mask), spec.origin_shift)
    out = jnp.zeros(d.shape, jnp.uint32)
    for k in range(spec.dim):
        mask = _axis_interleave_mask(spec.dim, spec.axis_bits, k)
        m = ops.and_(morton, mask)
        if spec.bits == 32:
            p = _ctz32(m)
            nz = m != 0
        else:
            p = jnp.where(m.lo != 0, _ctz32(m.lo), 32 + _ctz32(m.hi))
            nz = (m.lo | m.hi) != 0
        j = (p - k) // spec.dim              # coordinate bit index, exact
        tz = j - (spec.axis_bits - d)        # depth-unit trailing zeros
        tz = jnp.where(nz, jnp.clip(tz, 0, 31), 31).astype(jnp.uint32)
        out = out | (tz << jnp.uint32(5 * k))
    return out


def keys_from_numpy(spec: IndexSpec, arr) -> Key:
    import numpy as np

    if spec.bits == 32:
        return jnp.asarray(np.asarray(arr, dtype=np.uint32))
    arr = np.asarray(arr, dtype=np.uint64)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    lo = (arr & np.uint64(0xFFFF_FFFF)).astype(np.uint32)
    return U64(jnp.asarray(hi), jnp.asarray(lo))


# ---------------------------------------------------------------------------
# Debug formatters (reference impl Debug, src/index.rs:297-335)
# ---------------------------------------------------------------------------

def format_key(spec: IndexSpec, key_value: int) -> str:
    """Human-readable dump of one packed key: per-axis origin in octal
    (radix matching the tree fan-out, like the reference's formatter) plus
    the depth — e.g. ``Index64_3D{origin: (0o0017..., 0o0044..., 0o0021...),
    depth: 5}``."""
    depth = key_value & spec.depth_mask
    morton = (key_value & spec.origin_mask) >> spec.origin_shift
    axes = []
    for axis in range(spec.dim):
        v = 0
        for i in range(spec.axis_bits):
            if (morton >> (spec.dim * i + axis)) & 1:
                v |= 1 << i
        v <<= 32 - spec.axis_bits
        axes.append(f"0o{v:011o}")
    return (f"{spec.name}{{origin: ({', '.join(axes)}), depth: {depth}}}")


def format_keys(spec: IndexSpec, keys) -> List[str]:
    """Vector version over numpy/device keys (debug / logging)."""
    arr = keys_to_numpy(spec, keys)
    return [format_key(spec, int(k)) for k in arr]
