"""Tracing / profiling utilities.

The reference's observability is an ad-hoc per-frame ``elapsed`` printout
and a counting global allocator (``examples/main.rs:38-104``, ``:480-506``).
The TPU build's equivalents:

* :func:`timed` — p50/p90 wall-clock of a jitted step with proper
  ``block_until_ready`` fencing (the per-frame ``elapsed`` analog).
* :func:`trace` — context manager around ``jax.profiler`` emitting an XLA
  trace directory viewable in TensorBoard/Perfetto (the deep-dive tool).
* :func:`device_memory_stats` — live HBM allocation counters (the
  AllocLogger analog; on TPU allocations are compiler-planned buffers, so
  the interesting number is peak bytes, not call counts).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def timed(fn: Callable, *args, iters: int = 20, warmup: int = 3
          ) -> Dict[str, float]:
    """Wall-clock stats (ms) of ``fn(*args)`` with device fencing."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(times)
    return {
        "p50_ms": float(np.percentile(arr, 50)),
        "p90_ms": float(np.percentile(arr, 90)),
        "min_ms": float(arr.min()),
        "mean_ms": float(arr.mean()),
        "iters": iters,
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/bp_trace"): step(...)`` -> XLA profiler trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Bytes in use / peak / limit on the device, when the backend
    exposes them (TPU does; CPU returns None)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    if stats is None:
        return None
    s = stats()
    if not s:
        return None
    return {
        "bytes_in_use": int(s.get("bytes_in_use", 0)),
        "peak_bytes_in_use": int(s.get("peak_bytes_in_use", 0)),
        "bytes_limit": int(s.get("bytes_limit", 0)),
    }


def compiled_memory_analysis(jitted_fn, *args, **kwargs):
    """Compiler-planned buffer budget of one jitted call — the TPU analog
    of the reference's counting global allocator (``examples/main.rs:
    38-104``): on TPU every allocation is planned at compile time, so the
    regression-sensitive numbers are the XLA temp/output/argument byte
    sizes, not runtime call counts.  Returns None when the backend does
    not expose a memory analysis."""
    comp = jitted_fn.lower(*args, **kwargs).compile()
    ma = comp.memory_analysis()
    if ma is None:
        return None
    out = {}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        if hasattr(ma, k):
            out[k] = int(getattr(ma, k))
    return out or None
