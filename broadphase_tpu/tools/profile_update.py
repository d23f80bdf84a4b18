"""Per-stage profile of the temporal-coherence update() at bench scale.

Times jitted *prefixes* of the production ``update.update`` pipeline (the
``_stage`` early returns) and reports deltas — per CLAUDE.md, isolated
micro-benchmarks through the TPU tunnel report nonsense; prefix deltas sum
exactly to the full-update time.

Run:  python -u -m broadphase_tpu.tools.profile_update [n] [churn_frac]

Stages (cumulative prefixes of ``update.update``):
  emit_diff — emission table on the new bounds + per-object cell diff
  extract   — changed-object compaction + emission-row gathers + streams
  churn     — churn stream compaction + the small churn sort
  merge     — bitonic merge of the churn into the sorted tree
  full      — + tombstone cancel + final streaming compaction
The reference point is a from-scratch layer.build on the same bounds.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from .. import layer
from ..index import Index64_3D
from ..update import build_tracked, update


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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.03
    spec = Index64_3D
    from .. import bench_caps
    tree_cap = bench_caps.tree_capacity(n)
    churn_cap, obj_cap = bench_caps.update_caps(n, frac)

    smin, smax, bmin, bmax, ids = _scene(spec.dim, n)
    rng = np.random.default_rng(3)
    moving = rng.random(n) < frac
    jump = (rng.uniform(-5.0, 5.0, size=bmin.shape).astype(np.float32)
            * moving[:, None])
    drift = np.float32(1e-4)
    b2 = (jnp.asarray(bmin + jump + drift), jnp.asarray(bmax + jump + drift))

    tracked = build_tracked(spec, smin, smax, jnp.asarray(bmin),
                            jnp.asarray(bmax), ids, out_capacity=tree_cap)
    jax.block_until_ready(tracked)
    print(f"profiling update n={n} churn={frac:.1%} churn_cap={churn_cap} "
          f"obj_cap={obj_cap} tree_cap={tree_cap} on "
          f"{jax.devices()[0].platform}", file=sys.stderr)

    results = []
    for stage in ("emit_diff", "extract", "churn", "merge", "full"):
        fn = jax.jit(lambda lo, hi, st=stage: update(
            spec, tracked, smin, smax, lo, hi, churn_cap,
            obj_cap=obj_cap, _stage=st))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*b2))
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*b2) for _ in range(8)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / 8 * 1e3)
        results.append((stage, best))
        print(f"  {stage:<10} cum {best:9.3f} ms   (compile {compile_s:.0f}s)",
              file=sys.stderr)

    bld = jax.jit(lambda lo, hi: layer.build(
        spec, jnp.asarray(smin), jnp.asarray(smax), lo, hi,
        jnp.asarray(ids), out_capacity=tree_cap))
    jax.block_until_ready(bld(*b2))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [bld(*b2) for _ in range(8)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / 8 * 1e3)

    print("\nstage deltas:", file=sys.stderr)
    prev = 0.0
    for name, cum in results:
        print(f"  {name:<10} {cum - prev:9.3f} ms", file=sys.stderr)
        prev = cum
    print(f"  TOTAL      {results[-1][1]:9.3f} ms   "
          f"(build reference {best:9.3f} ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
