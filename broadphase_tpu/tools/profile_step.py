"""Per-stage profile of the 1M full broadphase step on the real TPU.

Times jitted *prefixes* of the production scan pipeline and reports deltas
(per CLAUDE.md: isolated single-op micro-benchmarks through the TPU tunnel
report nonsense; prefix deltas sum exactly to the full-step time).

Run:  python -u -m broadphase_tpu.tools.profile_step [n]

Stages (cumulative prefixes of ``layer.scan_pairs``, fused-prep pipeline):
  build       — quantize + emit + the build sort (layer.build)
  run_ends    — pass 1: adjacent-LCA reverse-cummin run ends (kernel only)
  prep        — fused run/starts/compaction kernel (ops/pallas_prep.py)
  gather      — pass 2: expansion from prepped entries (ops/pallas_expand2)
  sort_pairs  — canonical sort: adaptive packed value sort of (a, b)
  full_stream — + dedup mask + streaming compaction (production path)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from .. import index as bidx
from .. import layer
from ..index import Index64_3D
from ..ops import search


def _scene(dim, n, seed=0, density=1.0 / 1000.0, size_range=(1.0, 10.0)):
    rng = np.random.default_rng(seed)
    extent = (n / density) ** (1.0 / dim)
    lo, hi = 0.0, float(extent)
    size = rng.uniform(*size_range, size=(n, dim)).astype(np.float32)
    bmin = (rng.uniform(lo, hi, size=(n, dim)).astype(np.float32)
            * ((hi - size_range[1]) / hi)).astype(np.float32)
    bmax = bmin + size
    return (np.full(dim, lo, np.float32), np.full(dim, hi, np.float32),
            bmin, bmax, np.arange(n, dtype=np.uint32))


def make_prefixes(spec, smin, smax, n, pair_cap, emit_cap):
    """Each entry: name -> jitted fn(bmin, bmax, ids) running the pipeline
    up to and including that stage (returns small reductions so nothing is
    dead-code-eliminated)."""
    from .. import bench_caps
    cap = bench_caps.tree_capacity(n)        # same shapes as bench.py

    def _build(bmin, bmax, ids):
        return layer.build(spec, jnp.asarray(smin), jnp.asarray(smax),
                           bmin, bmax, ids, out_capacity=cap)

    def p_build(bmin, bmax, ids):
        st = _build(bmin, bmax, ids)
        return st.count, st.ids[::4096].sum()

    interp = jax.default_backend() != "tpu"

    def _run_ends(st):
        return search.descendant_run_ends(spec, st.keys,
                                          bidx.depth_of(spec, st.keys))

    def p_run_ends(bmin, bmax, ids):
        st = _build(bmin, bmax, ids)
        e = _run_ends(st)
        return e[::4096].sum()

    def _meta(st, byte):
        # packed rule-byte id streams of the emit-once production path
        # (ids here are 0..n-1, always narrow)
        lane = jnp.arange(st.ids.shape[0], dtype=jnp.int32)
        return jnp.where(lane < st.count,
                         (st.ids << jnp.uint32(8)) | byte,
                         jnp.uint32(0xFFFF_FFFF))

    def _metas(st):
        dim = spec.dim
        dep = bidx.depth_of(spec, st.keys)
        bmeta = ((dep << jnp.uint32(dim))
                 | (st.aux & jnp.uint32((1 << dim) - 1))) & jnp.uint32(0xFF)
        ameta = layer._alpha_meta(spec, st.keys, dep, st.aux)
        return _meta(st, bmeta), _meta(st, ameta)

    def _prep(st):
        from ..ops.pallas_prep import prep_runs
        e = _run_ends(st)
        ids_b, _ = _metas(st)
        return prep_runs(e, ids_b, st.count, interpret=interp)

    def p_prep(bmin, bmax, ids):
        st = _build(bmin, bmax, ids)
        sv, ab, bid, m, total, wrapped = _prep(st)
        return total, sv[::4096].sum(), bid[::4096].astype(jnp.uint32).sum()

    def _gather(st, emit_cap):
        from ..ops.pallas_expand2 import expand_pairs_prepped
        sv, ab, bid, m, total, wrapped = _prep(st)
        _, ids_a = _metas(st)
        a, b = expand_pairs_prepped(ids_a, sv, ab, bid, total,
                                    emit_cap, rule=jnp.int32(1),
                                    dim=spec.dim, interpret=interp)
        return a, b, a != b

    def p_gather(bmin, bmax, ids):
        st = _build(bmin, bmax, ids)
        a, b, valid = _gather(st, emit_cap)
        return a[::4096].sum(), b[::4096].sum()

    def _compact(st):
        from ..ops.pallas_compact import stream_compact
        a, b, valid = _gather(st, emit_cap)
        (ca, cb), ccnt = stream_compact(valid, (a, b), interpret=interp)
        return ca[:pair_cap], cb[:pair_cap], ccnt

    def p_compact(bmin, bmax, ids):
        st = _build(bmin, bmax, ids)
        ca, cb, ccnt = _compact(st)
        return ccnt, ca[::4096].sum()

    def p_sort_pairs(bmin, bmax, ids):
        # the production adaptive sort (packed u32+u8 when ids fit 20 bits)
        st = _build(bmin, bmax, ids)
        ca, cb, ccnt = _compact(st)
        out_a, out_b, cnt = layer.canonical_pairs(ca, cb, ca != np.uint32(0xFFFF_FFFF),
                                                  "sort")
        return out_a[::4096].sum(), out_b[::4096].sum()

    def p_full_stream(bmin, bmax, ids):
        st = _build(bmin, bmax, ids)
        ca, cb, ccnt = _compact(st)
        out_a, out_b, cnt = layer.canonical_pairs(ca, cb, ca != np.uint32(0xFFFF_FFFF),
                                                  "stream")
        return cnt, out_a[::4096].sum()

    return [("build", p_build), ("run_ends", p_run_ends),
            ("prep", p_prep),
            ("gather", p_gather),
            ("compact", p_compact),
            ("sort_pairs", p_sort_pairs),
            ("full_stream", p_full_stream)]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spec = Index64_3D
    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    from .. import bench_caps
    emit_cap = bench_caps.emit_capacity(n)   # same shapes as bench.py
    pair_cap = bench_caps.pair_capacity(n)
    d_args = tuple(jax.device_put(x) for x in (bmin, bmax, ids))

    print(f"profiling n={n} pair_cap={pair_cap} emit_cap={emit_cap} on "
          f"{jax.devices()[0].platform}", file=sys.stderr)
    results = []
    for name, fn in make_prefixes(spec, smin, smax, n, pair_cap, emit_cap):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*d_args))
        compile_s = time.perf_counter() - t0
        # pipelined timing: one sync per batch of 8
        jax.block_until_ready(jfn(*d_args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [jfn(*d_args) for _ in range(8)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / 8 * 1e3)
        results.append((name, best))
        print(f"  {name:<11} cum {best:9.3f} ms   (compile {compile_s:.0f}s)",
              file=sys.stderr)

    print("\nstage deltas:", file=sys.stderr)
    prev = 0.0
    for name, cum in results:
        print(f"  {name:<11} {cum - prev:9.3f} ms", file=sys.stderr)
        prev = cum
    print(f"  TOTAL       {results[-1][1]:9.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
