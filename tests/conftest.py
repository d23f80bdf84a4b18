"""Test configuration: force a virtual 8-device CPU mesh.

This environment's ``sitecustomize`` (PYTHONPATH=/root/.axon_site) registers
and pins the remote-TPU "axon" backend at interpreter start, overriding
``JAX_PLATFORMS`` from the environment.  Setting env vars here is therefore
not enough — we must also force the platform through jax.config before any
backend initializes, and verify we actually got CPU devices (a silent
fallback to the single TPU would make every multi-device test degenerate to
one device and pass vacuously).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: recompiles across pytest runs become disk hits.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_devs = jax.devices()
assert _devs[0].platform == "cpu" and len(_devs) >= 8, (
    f"tests require >= 8 virtual CPU devices, got {_devs}; the axon "
    "sitecustomize likely pinned the TPU backend — run pytest with "
    "PYTHONPATH= to bypass it")


# XLA:CPU's in-process compiler segfaults after the whole suite's worth of
# compilations accumulate in one process (observed 3x, always at the same
# later-in-suite compile; any subset of modules passes).  Dropping live
# executables between modules keeps LLVM JIT state bounded; the persistent
# disk cache makes any re-compile a cheap reload.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_llvm_jit_state():
    yield
    jax.clear_caches()
