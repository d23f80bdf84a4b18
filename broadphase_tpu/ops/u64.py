"""Emulated unsigned 64-bit integers as (hi, lo) uint32 pairs.

TPUs have no fast native 64-bit integer path, so 64-bit spatial keys
(reference: ``src/index.rs:294-295`` — Index64_2D / Index64_3D) are modeled
as a pair of uint32 lanes.  Every op here is elementwise over arrays of any
shape and jit/vmap-friendly.

Only the ops the spatial-index codec needs are provided: constant shifts,
bitwise logic with 64-bit constants, and comparisons.  There is deliberately
no add/mul — the broadphase key math never needs carries.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

U32_MAX = 0xFFFF_FFFF


class U64(NamedTuple):
    """An array of emulated u64 values, split into two uint32 lanes."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return jnp.shape(self.hi)


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def make(hi, lo) -> U64:
    return U64(_u32(hi), _u32(lo))


def from_int(value: int, shape=()) -> U64:
    """Broadcast a Python integer constant to a U64 of the given shape."""
    hi = (value >> 32) & U32_MAX
    lo = value & U32_MAX
    return U64(jnp.full(shape, hi, dtype=jnp.uint32), jnp.full(shape, lo, dtype=jnp.uint32))


def from_u32(lo) -> U64:
    lo = _u32(lo)
    return U64(jnp.zeros_like(lo), lo)


def zeros(shape=()) -> U64:
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return U64(z, z)


def to_py(x: U64):
    """Host-side: convert to numpy uint64-equivalent python ints (for tests/IO)."""
    import numpy as np

    hi = np.asarray(x.hi, dtype=np.uint64)
    lo = np.asarray(x.lo, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def shli(x: U64, n: int) -> U64:
    """Shift left by a static amount."""
    if n == 0:
        return x
    if n >= 64:
        return zeros(x.shape)
    n = int(n)
    if n >= 32:
        return U64(x.lo << (n - 32) if n > 32 else x.lo, jnp.zeros_like(x.lo))
    return U64((x.hi << n) | (x.lo >> (32 - n)), x.lo << n)


def shri(x: U64, n: int) -> U64:
    """Logical shift right by a static amount."""
    if n == 0:
        return x
    if n >= 64:
        return zeros(x.shape)
    n = int(n)
    if n >= 32:
        return U64(jnp.zeros_like(x.hi), x.hi >> (n - 32) if n > 32 else x.hi)
    return U64(x.hi >> n, (x.lo >> n) | (x.hi << (32 - n)))


def _coerce(other: Union[U64, int], shape) -> U64:
    if isinstance(other, U64):
        return other
    return from_int(other, ())


def and_(a: U64, b: Union[U64, int]) -> U64:
    b = _coerce(b, a.shape)
    return U64(a.hi & b.hi, a.lo & b.lo)


def or_(a: U64, b: Union[U64, int]) -> U64:
    b = _coerce(b, a.shape)
    return U64(a.hi | b.hi, a.lo | b.lo)


def xor(a: U64, b: Union[U64, int]) -> U64:
    b = _coerce(b, a.shape)
    return U64(a.hi ^ b.hi, a.lo ^ b.lo)


def not_(a: U64) -> U64:
    return U64(~a.hi, ~a.lo)


def eq(a: U64, b: Union[U64, int]) -> jnp.ndarray:
    b = _coerce(b, a.shape)
    return (a.hi == b.hi) & (a.lo == b.lo)


def ne(a: U64, b: Union[U64, int]) -> jnp.ndarray:
    return ~eq(a, b)


def lt(a: U64, b: Union[U64, int]) -> jnp.ndarray:
    b = _coerce(b, a.shape)
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def le(a: U64, b: Union[U64, int]) -> jnp.ndarray:
    b = _coerce(b, a.shape)
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo <= b.lo))


def gt(a: U64, b: Union[U64, int]) -> jnp.ndarray:
    return ~le(a, b)


def ge(a: U64, b: Union[U64, int]) -> jnp.ndarray:
    return ~lt(a, b)


def where(pred, a: U64, b: U64) -> U64:
    return U64(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def is_zero(a: U64) -> jnp.ndarray:
    return (a.hi == 0) & (a.lo == 0)
