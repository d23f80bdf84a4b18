"""Pallas TPU kernel: descendant-run ends via a reversed-grid suffix scan.

Computes, for every element j of a sorted key array, the exclusive end of
its descendant-or-equal run (the reference stack-sweep invariant,
``src/layer.rs:550-573``):

    e[j] = 1 + min{ i >= j : lca[i] < depth[j] }

where ``lca[i]`` is the adjacent-pair LCA depth (``ops.search.
adjacent_lca_depth``), with the sentinel ``lca[n-1] = -1``.

The XLA formulation runs one reverse ``lax.cummin`` per depth level —
``axis_bits + 1`` cumulative ops over the whole array (~34 ms of a 1M-object
step).  This kernel does the same suffix-min per depth but walks the grid
BACKWARD, carrying one scalar per depth level in SMEM: each 1024-element
tile needs only a within-tile suffix min (10 staged element shifts) merged
with the carry.  TPU grid steps execute sequentially (``dimension_semantics
= ("arbitrary",)`` pins that), which is what makes the carry legal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 32                 # 4096 elements/grid step: sequential grid
TILE = TILE_ROWS * LANES       # (SMEM carries), so big tiles amortize
#                                per-step fixed costs

_INF = 0x7FFF_FFFF


def _shift_left_elems(x: jnp.ndarray, delta: int, fill) -> jnp.ndarray:
    """Row-major element shift: out[k] = x[k + delta] over a (R, C) tile,
    `fill` past the end.  delta must be a multiple of C or less than C."""
    R, C = x.shape
    if delta >= R * C:
        return jnp.full((R, C), fill, x.dtype)
    r, c = delta // C, delta % C
    y = x
    if r:
        y = jnp.concatenate([x[r:], jnp.full((r, C), fill, x.dtype)], axis=0)
    if c:
        nxt = jnp.concatenate([y[1:], jnp.full((1, C), fill, y.dtype)],
                              axis=0)
        y = jnp.concatenate([y[:, c:], nxt[:, :c]], axis=1)
    return y


def _suffix_min(x: jnp.ndarray, fill) -> jnp.ndarray:
    """out[k] = min(x[k:]) in row-major order over one tile."""
    m = x
    delta = 1
    while delta < x.shape[0] * x.shape[1]:
        m = jnp.minimum(m, _shift_left_elems(m, delta, fill))
        delta <<= 1
    return m


def _make_kernel(n_depths: int, n_tiles: int, tile_rows: int):
    TR = tile_rows
    TL = TR * LANES

    def kernel(mask_ref, lca_ref, d_ref, e_ref, carry_ref):
        g = pl.program_id(0)
        tile = n_tiles - 1 - g
        t0 = tile * TL

        @pl.when(g == 0)
        def _init():
            for dd in range(n_depths):
                carry_ref[dd] = _INF

        lca = lca_ref[:]
        d = d_ref[:]
        pos = (t0
               + jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0)
               * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 1))
        e_ref[:] = jnp.zeros((TR, LANES), jnp.int32)
        mask = mask_ref[0]
        for dd in range(n_depths):
            # skip depth levels no element has (runtime flag: scenes
            # cluster around a few sizes, so most of the axis_bits+1
            # levels are empty and their 12-stage suffix chains dead)
            @pl.when(((mask >> dd) & 1) == 1)
            def _level(dd=dd):
                qual = jnp.where(lca < dd, pos, _INF)
                nxt = jnp.minimum(_suffix_min(qual, _INF), carry_ref[dd])
                e_ref[:] = jnp.where(d == dd, nxt + 1, e_ref[:])
                carry_ref[dd] = jnp.minimum(jnp.min(qual), carry_ref[dd])

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_depths", "tile_rows", "interpret"))
def run_ends(lca: jnp.ndarray, depth: jnp.ndarray, n_depths: int,
             tile_rows: int = 0, interpret: bool = False) -> jnp.ndarray:
    """e[j] = 1 + first position i >= j with lca[i] < depth[j]; elements
    whose depth is outside [0, n_depths) (pads) get e = 0.

    lca/depth: int32 (cap,).  lca[cap-1] must be the -1 sentinel.  cap is
    padded internally to a tile multiple (pad lca qualifies at every
    depth but sits after the sentinel, so results are unchanged).
    """
    cap = lca.shape[0]
    if tile_rows == 0:
        # the suffix chains only grow by two stages at 4x the tile
        from .pallas_compact import auto_tile_rows
        tile_rows = auto_tile_rows(cap, small=TILE_ROWS)
    TL = tile_rows * LANES
    padded = -(-cap // TL) * TL
    # depth-presence bitmask (one cheap pass + OR-reduce): the kernel
    # skips the whole suffix-min chain of levels with no elements
    mask = jnp.bitwise_or.reduce(
        jnp.left_shift(jnp.int32(1),
                       jnp.clip(depth, 0, n_depths - 1))
        & jnp.where((depth >= 0) & (depth < n_depths), -1, 0))
    if padded != cap:
        lca = jnp.pad(lca, (0, padded - cap), constant_values=-1)
        depth = jnp.pad(depth, (0, padded - cap),
                        constant_values=n_depths)
    n_tiles = padded // TL

    e = pl.pallas_call(
        _make_kernel(n_depths, n_tiles, tile_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile_rows, LANES),
                             lambda g, m: (n_tiles - 1 - g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_rows, LANES),
                             lambda g, m: (n_tiles - 1 - g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_rows, LANES),
                                   lambda g, m: (n_tiles - 1 - g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((max(n_depths, 1),), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((padded // LANES, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(mask.reshape(1), lca.reshape(-1, LANES), depth.reshape(-1, LANES))
    return e.reshape(padded)[:cap]
