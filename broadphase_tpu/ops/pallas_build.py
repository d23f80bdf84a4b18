"""Pallas TPU kernel: fused cell emission + streaming compaction for build.

The reference's build hot loop (``src/layer.rs:94-121``: per object,
quantize -> depth -> grid walk -> push up to 2^dim cells) previously ran as
XLA ops that materialized ``n * 2^dim`` key/valid lanes in HBM before the
streaming compaction (~10 ms of the 1M build).  This kernel fuses the whole
emission: each grid step takes one tile of quantized objects, computes
depth / truncation / per-axis Morton spreads / slot keys *in VMEM*, ranked-
shift compacts the valid slots, and appends them to a staging buffer that
flushes aligned 4096-entry blocks to the output — the only HBM traffic is
the object inputs once and the compacted cells once.

Quantization (f32 -> u32) deliberately stays OUTSIDE in XLA: it is pinned
with optimization barriers against fusion-dependent reassociation
(``geom.to_local``), and keeping it there guarantees the fused build
quantizes bit-identically to the unfused ``extend`` path and the oracle.

Emission ORDER within a tile is slot-major (all slot-0 cells of the tile's
objects, then slot-1, ...), not the reference's object-major walk: build
sorts the tree immediately by the full (key, id) tuple, which is
duplicate-free, so any emission order yields the identical sorted tree.
``extend`` (whose append order IS observable) keeps the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import index as bidx
from ..index import IndexSpec
from .pallas_compact import _elem_roll, _tile_compact

LANES = 128
OBJ_ROWS = 8                        # 1024 objects per grid step
OBJ = OBJ_ROWS * LANES
OUT_ROWS = 32                       # flush block: 4096 entries
OUT_BLK = OUT_ROWS * LANES

PAD = 0xFFFF_FFFF


# Mosaic does not legalize arith.maxui/minui (unsigned max/min on u32
# vectors): unsigned compares go through the sign-bit flip + signed compare,
# and all small-range quantities (depth, shifts, slot counts) live in int32.

def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _ugt(a, b):
    """a > b as unsigned 32-bit."""
    flip = jnp.uint32(0x8000_0000)
    return _i32(a ^ flip) > _i32(b ^ flip)


def _umax(a, b):
    return jnp.where(_ugt(a, b), a, b)


def _clz32(x):
    """Exact branchless leading-zero count of a uint32 tile (x==0 -> 32).
    Returns int32.  Written out because Mosaic support for lax.clz is not
    guaranteed."""
    n = jnp.full(x.shape, 32, jnp.int32)
    for sh in (16, 8, 4, 2):
        y = x >> sh
        nz = y != 0
        n = jnp.where(nz, n - sh, n)
        x = jnp.where(nz, y, x)
    y = x >> 1
    return jnp.where(y != 0, n - 2, n - _i32(x))


def _truncate(x, depth_i):
    """geom.truncate_to_depth on uint32 tiles (depth as int32, >= 1 in the
    masked branch so the shift amount stays < 32)."""
    low_bits = (jnp.int32(32) - depth_i).astype(jnp.uint32) & jnp.uint32(31)
    one = jnp.uint32(1)
    mask = (one << low_bits) - one
    return jnp.where(depth_i == 0, x, x & ~mask)


def _encode_axis(spec, pval):
    """index.encode_axis on a uint32 tile (elementwise spread stages)."""
    ops = spec.ops
    x = ops.from_u32(pval >> (32 - spec.axis_bits))
    for shift, mask in spec.spread_stages:
        x = ops.and_(ops.or_(x, ops.shli(x, shift)), mask)
    return x


def _make_kernel(spec: IndexSpec, A: int, n_tiles: int, out_blocks: int,
                 stage_rows: int):
    dim = spec.dim
    S = A ** dim
    u64 = spec.bits == 64
    n_cols = (2 if u64 else 1) + 2      # [hi,] lo, id, aux
    cat_rows = S * OBJ_ROWS

    def kernel(md_ref, *refs):
        (lmin_refs, lmax_refs) = (refs[:dim], refs[dim:2 * dim])
        cont_ref = refs[2 * dim]
        ids_ref = refs[2 * dim + 1]
        out_refs = refs[2 * dim + 2:2 * dim + 2 + n_cols]
        cnt_ref = refs[2 * dim + 2 + n_cols]
        stage = refs[2 * dim + 3 + n_cols:2 * dim + 3 + n_cols + n_cols]
        pos_ref = refs[2 * dim + 3 + n_cols + n_cols]   # SMEM (4,)
        sems = refs[2 * dim + 4 + n_cols + n_cols]

        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            pos_ref[0] = 0          # entries in staging
            pos_ref[1] = 0          # blocks flushed
            pos_ref[2] = 0          # emitted total
            pos_ref[3] = 0          # cell overflow flag
            for s_ in stage:
                s_[:] = jnp.full((stage_rows, LANES), PAD, jnp.uint32)

        md_i = md_ref[0]
        contained = cont_ref[:] != 0
        lmins = [r[:] for r in lmin_refs]
        lmaxs = [r[:] for r in lmax_refs]

        # ---- depth (geom.depth_for_bounds); int32 domain
        size_max = None
        for lmn, lmx in zip(lmins, lmaxs):
            s_ = lmx - lmn + jnp.uint32(1)          # wrapping u32
            size_max = s_ if size_max is None else _umax(size_max, s_)
        v = size_max - jnp.uint32(1)
        depth_i = jnp.maximum(_clz32(v), md_i)
        depth_i = jnp.minimum(depth_i, spec.axis_bits)

        # ---- truncation, per-axis cell SPANS (naxis - 1), step
        shift = jnp.minimum(jnp.int32(32) - depth_i,
                            jnp.int32(31)).astype(jnp.uint32)
        step = jnp.where(depth_i == 0, jnp.uint32(0), jnp.uint32(1) << shift)
        tmins, spans = [], []
        for lmn, lmx in zip(lmins, lmaxs):
            tmn = _truncate(lmn, depth_i)
            tmx = _truncate(lmx, depth_i)
            # span = naxis - 1 as unsigned; 0 at depth 0 (single cell)
            span = jnp.where(depth_i == 0, jnp.uint32(0),
                             (tmx - tmn) >> shift)
            spans.append(span)
            tmins.append(tmn)
        cell_ovf = jnp.zeros(depth_i.shape, jnp.bool_)
        for sp in spans:
            cell_ovf = cell_ovf | _ugt(sp, jnp.full(sp.shape, A - 1,
                                                    jnp.uint32))
        cell_ovf = cell_ovf & contained

        # ---- per-axis Morton spreads of the A candidate coordinates
        ops = spec.ops
        spread = []                     # [axis][a] -> Key tile
        for axis in range(dim):
            per_a = []
            for a in range(A):
                pval = tmins[axis] + jnp.uint32(a) * step
                per_a.append(ops.shli(_encode_axis(spec, pval), axis))
            spread.append(per_a)

        # ---- slot keys + validity, gathered slot-major into (S*8, 128)
        ids_t = ids_ref[:]
        depth_u = depth_i.astype(jnp.uint32)
        hi_parts, lo_parts, id_parts, aux_parts, valid_parts = \
            [], [], [], [], []
        for s_ in range(S):
            morton = None
            vsl = contained
            eb = 0
            for axis in range(dim):
                i = (s_ // (A ** axis)) % A
                sp = spread[axis][i]
                morton = sp if morton is None else ops.or_(morton, sp)
                if i > 0:
                    eb |= 1 << axis
                    # slot i valid iff naxis > i iff span >= i (unsigned)
                    vsl = vsl & ~_ugt(
                        jnp.full(spans[axis].shape, i, jnp.uint32),
                        spans[axis])
            key = ops.shli(morton, spec.origin_shift)
            key = ops.or_(key, ops.from_u32(depth_u))
            # depth 0 emits the whole-system zero cell
            if u64:
                z = jnp.zeros_like(key.hi)
                hi_parts.append(jnp.where(depth_i == 0, z, key.hi))
                lo_parts.append(jnp.where(depth_i == 0, z, key.lo))
            else:
                lo_parts.append(jnp.where(depth_i == 0,
                                          jnp.zeros_like(key), key))
            id_parts.append(ids_t)
            # block-offset bools (emit-once dedup aux): slot s_'s per-axis
            # nonzero offsets are a compile-time constant; depth-0 objects
            # emit the single whole-system cell -> offset 0
            aux_parts.append(jnp.where(
                depth_i == 0, jnp.zeros_like(ids_t),
                jnp.full(ids_t.shape, eb, jnp.uint32)))
            valid_parts.append(vsl)

        valid_cat = jnp.concatenate(valid_parts, axis=0)
        cols_cat = []
        if u64:
            cols_cat.append(jnp.concatenate(hi_parts, axis=0))
        cols_cat.append(jnp.concatenate(lo_parts, axis=0))
        cols_cat.append(jnp.concatenate(id_parts, axis=0))
        cols_cat.append(jnp.concatenate(aux_parts, axis=0))

        compacted, k = _tile_compact(valid_cat, cols_cat)

        # ---- append to staging at the current fill offset
        staged = pos_ref[0]
        sidx = (jax.lax.broadcasted_iota(jnp.int32,
                                         (stage_rows, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32,
                                           (stage_rows, LANES), 1))
        put = (sidx >= staged) & (sidx < staged + k)
        for s_, c in zip(stage, compacted):
            pad_full = jnp.concatenate(
                [c, jnp.full((stage_rows - cat_rows, LANES), PAD,
                             jnp.uint32)], axis=0)
            rolled = _elem_roll(pad_full, staged)
            s_[:] = jnp.where(put, rolled, s_[:])
        staged = staged + k
        pos_ref[0] = staged
        pos_ref[2] = pos_ref[2] + k
        pos_ref[3] = pos_ref[3] | jnp.sum(cell_ovf.astype(jnp.int32))

        def flush():
            blk = pos_ref[1]

            @pl.when(blk < out_blocks)
            def _write():
                copies = [pltpu.make_async_copy(
                    s_.at[pl.ds(0, OUT_ROWS), :],
                    o.at[pl.ds(blk * OUT_ROWS, OUT_ROWS), :],
                    sems.at[i]) for i, (s_, o) in
                    enumerate(zip(stage, out_refs))]
                for c in copies:
                    c.start()
                for c in copies:
                    c.wait()
            for s_ in stage:
                shifted = pltpu.roll(s_[:], stage_rows - OUT_ROWS, axis=0)
                rowi = jax.lax.broadcasted_iota(
                    jnp.int32, (stage_rows, LANES), 0)
                s_[:] = jnp.where(rowi < stage_rows - OUT_ROWS, shifted,
                                  jnp.full((stage_rows, LANES), PAD,
                                           jnp.uint32))
            pos_ref[1] = blk + 1
            pos_ref[0] = pos_ref[0] - OUT_BLK

        # a tile appends at most S*OBJ entries; flush while a full block
        # is staged (bounded number of conditional flushes)
        for _ in range(-(-(S * OBJ) // OUT_BLK)):
            @pl.when(pos_ref[0] >= OUT_BLK)
            def _():
                flush()

        @pl.when(g == n_tiles - 1)
        def _final():
            blk = pos_ref[1]

            @pl.when(blk < out_blocks)
            def _write():
                copies = [pltpu.make_async_copy(
                    s_.at[pl.ds(0, OUT_ROWS), :],
                    o.at[pl.ds(blk * OUT_ROWS, OUT_ROWS), :],
                    sems.at[i]) for i, (s_, o) in
                    enumerate(zip(stage, out_refs))]
                for c in copies:
                    c.start()
                for c in copies:
                    c.wait()
            cnt_ref[0] = pos_ref[2]
            cnt_ref[1] = pos_ref[3]

    return kernel


@functools.partial(jax.jit, static_argnames=("spec", "out_capacity",
                                             "slots_per_axis", "interpret"))
def emit_build(spec: IndexSpec, lmin, lmax, contained, ids, min_depth,
               out_capacity: int, slots_per_axis: int = 2,
               interpret: bool = False):
    """Fused emission + compaction over quantized objects.

    lmin/lmax: (N, dim) uint32 local bounds; contained: (N,) bool;
    ids: (N,) uint32; min_depth: traced uint32 scalar.

    Returns (key, ids, aux, count, cell_overflow): key/ids of length
    ``out_capacity`` with PAD beyond ``min(count, out_capacity)`` (masked
    by the caller), aux = per-cell block-offset bools (0 beyond count),
    count = total valid cells emitted (may exceed out_capacity — caller
    flags overflow), cell_overflow = bool.
    """
    A = int(slots_per_axis)
    dim = spec.dim
    S = A ** dim
    n = ids.shape[0]
    u64 = spec.bits == 64
    n_cols = (2 if u64 else 1) + 2
    stage_rows = S * OBJ_ROWS + OUT_ROWS

    npad = -(-max(n, 1) // OBJ) * OBJ
    def _pad(x, fill=0):
        return jnp.pad(x, (0, npad - n), constant_values=fill)
    lmin_cols = [_pad(lmin[:, d]) for d in range(dim)]
    lmax_cols = [_pad(lmax[:, d]) for d in range(dim)]
    cont = _pad(contained.astype(jnp.int32))
    ids_p = _pad(ids)

    n_tiles = npad // OBJ
    out_blocks = -(-out_capacity // OUT_BLK)
    out_len = (out_blocks + 1) * OUT_BLK

    obj_spec = pl.BlockSpec((OBJ_ROWS, LANES), lambda g, md: (g, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[obj_spec] * (2 * dim + 2),
        out_specs=([pl.BlockSpec(memory_space=pl.ANY)] * n_cols
                   + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        scratch_shapes=([pltpu.VMEM((stage_rows, LANES), jnp.uint32)]
                        * n_cols
                        + [pltpu.SMEM((4,), jnp.int32),
                           pltpu.SemaphoreType.DMA((n_cols,))]),
    )
    outs = pl.pallas_call(
        _make_kernel(spec, A, n_tiles, out_blocks, stage_rows),
        grid_spec=grid_spec,
        out_shape=([jax.ShapeDtypeStruct((out_len // LANES, LANES),
                                         jnp.uint32)] * n_cols
                   + [jax.ShapeDtypeStruct((2,), jnp.int32)]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(min_depth, jnp.int32).reshape(1),
      *[c.reshape(-1, LANES) for c in lmin_cols],
      *[c.reshape(-1, LANES) for c in lmax_cols],
      cont.reshape(-1, LANES), ids_p.reshape(-1, LANES))

    count = outs[n_cols][0]
    cell_ovf = outs[n_cols][1] != 0
    lane = jnp.arange(out_capacity, dtype=jnp.int32)
    capped = jnp.minimum(count, out_capacity)
    flat = [jnp.where(lane < capped, o.reshape(out_len)[:out_capacity],
                      jnp.uint32(PAD)) for o in outs[:n_cols - 1]]
    aux = jnp.where(lane < capped,
                    outs[n_cols - 1].reshape(out_len)[:out_capacity],
                    jnp.uint32(0))
    if u64:
        from .u64 import U64
        key = U64(flat[0], flat[1])
    else:
        key = flat[0]
    return key, flat[-1], aux, count, cell_ovf
