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

# ---------------------------------------------------------------------------
# Quick tier (`pytest -m quick`): a curated ~one-test-per-suite subset for
# the inner loop (VERDICT round 4 #7).  Full-suite cold time is ~44 min;
# the quick tier targets < 10 min cold.  Parameterized tests contribute
# only their Index64_3D case (the serialization/flagship spec).  The full
# suite remains the merge gate; quick is for fast regression smoke.
# ---------------------------------------------------------------------------

_QUICK_TESTS = {
    "test_build_equals_clear_extend_sort",      # build fast path == idiom
    "test_matches_numpy_compaction",            # stable_compact core
    "test_empty_scene_scan",                    # degenerate guard
    "test_exactly_once_grid_edge_clamp",        # emit-once rule
    "test_nested_same_id_skip_rule",            # id-on-stack skip parity
    "test_known_vectors_index64_3d",            # Morton codec vectors
    "test_round_trip_axis_chacha_style",        # codec round trip
    "test_extend_sort_scan_parity",             # THE golden trio
    "test_bitonic_merge_matches_sort",          # merge op
    "test_native_pipeline_matches_python_oracle",  # C++ oracle parity
    "test_generated_scene_3d",                  # Pallas build kernel
    "test_random",                              # Pallas stream compaction
    "test_expand_pairs_matches_xla_path",       # Pallas expansion kernel
    "test_prep_runs_matches_numpy",             # Pallas prep kernel
    "test_sharded_scan_matches_oracle",         # multi-chip scan
    "test_pick_ray_ordered_matches_oracle",     # ordered pick
    "test_test_box_matches_oracle",             # box query
    "test_pick_ray_matches_oracle",             # ray pick
    "test_chacha20_zero_key_keystream",         # scene gen RNG
    "test_scene_roundtrip",                     # BR_SCENE codec
    "test_run_ends_parity_random",              # run-ends kernel
    "test_box_tree_matches_linear",             # sublinear box engine
    "test_ray_tree_matches_linear",             # sublinear ray engine
    "test_generic_monotone_box_matches_test_box",  # generic traversal
    "test_update_matches_build",                # temporal-coherence path
    "test_sharded_layer_scan_matches_oracle",   # persistent sharded layer
    "test_sharded_update_matches_sharded_build",  # sharded update
    "test_sharded_merge_matches_single_chip",   # collective-free merge
    "test_gather_shard_layer_round_trip",       # checkpoint bridge
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = getattr(item, "originalname", None) or item.name.split("[")[0]
        if base not in _QUICK_TESTS:
            continue
        # parameterized over index specs: only the Index64_3D case is quick
        if "[" in item.name and "Index" in item.name \
                and "Index64_3D" not in item.name:
            continue
        item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True, scope="module")
def _bound_llvm_jit_state():
    yield
    jax.clear_caches()
