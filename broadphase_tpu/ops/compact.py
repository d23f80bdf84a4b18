"""Stable stream compaction without sorts, scatters, or gathers.

``stable_compact`` moves the kept elements of fixed-capacity arrays to the
front (preserving order) using staged binary shifts — the TPU-friendly
replacement for the "stable sort on the drop flag" trick: a full
``lax.sort`` over P lanes costs O(P log P) compare-exchange passes, while
this costs exactly ``ceil(log2(P))`` shift+select passes of pure vector ops.

Algorithm ("ranked shift"): each kept element must move left by
``s_i = #dropped before i``.  Process one bit of ``s`` per stage, LSB
first: at stage ``b`` every lane ``k`` receives the element from lane
``k + 2^b`` iff that element's remaining shift has bit ``b`` set.

Correctness sketch (why simultaneous moves never collide or reorder):
``s`` is non-decreasing and for kept elements ``p_Y - p_X >= s_Y - s_X + 1``
(positions differ by at least the dropped count between them, plus one).
At stage ``b`` the current positions are ``p - (s mod 2^b)``; if Y moves
and X (before it) does not, bit ``b`` of ``s_Y`` is set and of ``s_X``
clear, so ``s_Y - s_X = (s_Y mod 2^b) - (s_X mod 2^b) + 2^b + 2^{b+1}k``
with ``k >= 0``, giving a current gap ``>= 2^b + 1`` — Y lands strictly
after X.  Stale copies left behind by a move are always overwritten before
any lane below the final count is read as output, because destinations are
unique and order-preserving; lanes at or beyond the count are overwritten
with the fill value at the end.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def stable_compact(keep: jnp.ndarray, arrays: Sequence[jnp.ndarray],
                   fills: Sequence) -> Tuple[Tuple[jnp.ndarray, ...],
                                             jnp.ndarray]:
    """Compact ``arrays`` to the front where ``keep`` is True.

    keep:    (P,) bool
    arrays:  arrays with leading axis P (trailing dims allowed), moved
             together along axis 0
    fills:   per-array fill value for lanes at or beyond the kept count

    Returns ((compacted arrays...), count:int32).
    """
    P = keep.shape[0]

    def _bc(mask, a):
        return mask.reshape(mask.shape + (1,) * (a.ndim - 1))

    drops_excl = jnp.cumsum((~keep).astype(jnp.int32)) \
        - (~keep).astype(jnp.int32)
    # dropped lanes never move (rem = 0): they are dead weight that kept
    # elements overwrite on arrival
    rem = jnp.where(keep, drops_excl, 0)
    arrs = list(arrays)
    b = 1
    while b < P:
        rem_in = jnp.concatenate([rem[b:], jnp.zeros((b,), rem.dtype)])
        recv = (rem_in & b) != 0
        arrs = [jnp.where(_bc(recv, a),
                          jnp.concatenate(
                              [a[b:],
                               jnp.zeros((b,) + a.shape[1:], a.dtype)]),
                          a)
                for a in arrs]
        rem = jnp.where(recv, rem_in - b, rem)
        b <<= 1
    count = jnp.sum(keep.astype(jnp.int32))
    live = jnp.arange(P, dtype=jnp.int32) < count
    out = tuple(jnp.where(_bc(live, a), a, jnp.asarray(f, dtype=a.dtype))
                for a, f in zip(arrs, fills))
    return out, count
