"""ctypes bindings for the native host library (native/broadphase_host.cpp).

Provides the C++ equivalents of the Python oracle at production scale:
Morton codec, extend, sequential stack-sweep scan (the golden reference for
1M+ objects), sweep-and-prune exact overlap oracle, and BR_SCENE IO.

The library is built on demand with ``make -C native`` (g++, no deps).
Falls back with ``NativeUnavailable`` if no compiler is present.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbroadphase_host.so")


class NativeUnavailable(RuntimeError):
    pass


_lib = None


def _load() -> ct.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NativeUnavailable(f"cannot build native library: {e}")
    lib = ct.CDLL(_LIB_PATH)

    u64p = ct.POINTER(ct.c_uint64)
    u32p = ct.POINTER(ct.c_uint32)
    u8p = ct.POINTER(ct.c_uint8)
    f32p = ct.POINTER(ct.c_float)

    lib.bp_encode_index64_3d.argtypes = [u32p, u32p, ct.c_uint64, u64p]
    lib.bp_decode_index64_3d.argtypes = [u64p, ct.c_uint64, u32p, u32p]
    lib.bp_extend_index64_3d.restype = ct.c_uint64
    lib.bp_extend_index64_3d.argtypes = [
        f32p, f32p, f32p, f32p, u32p, ct.c_uint64, ct.c_uint32,
        u64p, u32p, ct.c_uint64, u64p]
    lib.bp_sort_tree.argtypes = [u64p, u32p, ct.c_uint64]
    lib.bp_scan_seq.restype = ct.c_uint64
    lib.bp_scan_seq.argtypes = [u64p, u32p, ct.c_uint64, u64p, ct.c_uint64]
    lib.bp_brute_force_pairs.restype = ct.c_uint64
    lib.bp_brute_force_pairs.argtypes = [
        f32p, f32p, u32p, ct.c_uint64, ct.c_int, u64p, ct.c_uint64]

    lib.bp_scene_load.restype = ct.c_void_p
    lib.bp_scene_load.argtypes = [ct.c_char_p]
    lib.bp_scene_save.restype = ct.c_int
    lib.bp_scene_save.argtypes = [ct.c_void_p, ct.c_char_p]
    lib.bp_scene_new.restype = ct.c_void_p
    lib.bp_scene_new.argtypes = [f32p, f32p, f32p, f32p, u32p, ct.c_uint64]
    lib.bp_scene_set_layer.argtypes = [ct.c_void_p, ct.c_uint32, u64p, u32p,
                                       ct.c_uint64, ct.c_int]
    lib.bp_scene_set_collisions.argtypes = [ct.c_void_p, u64p, ct.c_uint64]
    for f in ("bp_scene_object_count", "bp_scene_tree_count",
              "bp_scene_collision_count"):
        getattr(lib, f).restype = ct.c_uint64
        getattr(lib, f).argtypes = [ct.c_void_p]
    lib.bp_scene_get.argtypes = [ct.c_void_p, f32p, f32p, f32p, f32p, u32p]
    lib.bp_scene_get_layer.argtypes = [ct.c_void_p, u32p, u64p, u32p, u8p]
    lib.bp_scene_get_collisions.argtypes = [ct.c_void_p, u64p]
    lib.bp_scene_free.argtypes = [ct.c_void_p]
    _lib = lib
    return lib


def _p(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ct.POINTER(ctype))


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


# ---------------------------------------------------------------------------
# Codec / oracle wrappers
# ---------------------------------------------------------------------------

def encode_index64_3d(xyz: np.ndarray, depth: np.ndarray) -> np.ndarray:
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.uint32)
    depth = np.ascontiguousarray(depth, np.uint32)
    n = len(depth)
    out = np.zeros(n, np.uint64)
    lib.bp_encode_index64_3d(_p(xyz, ct.c_uint32), _p(depth, ct.c_uint32),
                             n, _p(out, ct.c_uint64))
    return out


def decode_index64_3d(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    keys = np.ascontiguousarray(keys, np.uint64)
    n = len(keys)
    xyz = np.zeros((n, 3), np.uint32)
    depth = np.zeros(n, np.uint32)
    lib.bp_decode_index64_3d(_p(keys, ct.c_uint64), n,
                             _p(xyz, ct.c_uint32), _p(depth, ct.c_uint32))
    return xyz, depth


def extend(system_min, system_max, bounds_min, bounds_max, ids,
           min_depth: int = 0, slack: int = 8
           ) -> Tuple[np.ndarray, np.ndarray, int]:
    """(keys, ids, invalid_count) — unsorted tree, reference append order."""
    lib = _load()
    bounds_min = np.ascontiguousarray(bounds_min, np.float32)
    bounds_max = np.ascontiguousarray(bounds_max, np.float32)
    ids = np.ascontiguousarray(ids, np.uint32)
    smin = np.ascontiguousarray(system_min, np.float32)
    smax = np.ascontiguousarray(system_max, np.float32)
    n = len(ids)
    cap = max(slack * n, 64)
    keys = np.zeros(cap, np.uint64)
    out_ids = np.zeros(cap, np.uint32)
    inv = np.zeros(1, np.uint64)
    w = lib.bp_extend_index64_3d(
        _p(smin, ct.c_float), _p(smax, ct.c_float),
        _p(bounds_min, ct.c_float), _p(bounds_max, ct.c_float),
        _p(ids, ct.c_uint32), n, min_depth,
        _p(keys, ct.c_uint64), _p(out_ids, ct.c_uint32), cap,
        _p(inv, ct.c_uint64))
    if w > cap:
        raise ValueError(f"extend overflow: {w} > {cap}; raise slack")
    return keys[:w].copy(), out_ids[:w].copy(), int(inv[0])


def sort_tree(keys: np.ndarray, ids: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    keys = np.ascontiguousarray(keys, np.uint64).copy()
    ids = np.ascontiguousarray(ids, np.uint32).copy()
    lib.bp_sort_tree(_p(keys, ct.c_uint64), _p(ids, ct.c_uint32), len(ids))
    return keys, ids


def scan_seq(keys: np.ndarray, ids: np.ndarray, pair_slack: int = 32
             ) -> np.ndarray:
    """Sorted tree -> (n_pairs, 2) uint32 sorted+deduped (later, earlier)."""
    lib = _load()
    keys = np.ascontiguousarray(keys, np.uint64)
    ids = np.ascontiguousarray(ids, np.uint32)
    cap = max(pair_slack * max(len(ids), 1), 1024)
    out = np.zeros(cap, np.uint64)
    cnt = lib.bp_scan_seq(_p(keys, ct.c_uint64), _p(ids, ct.c_uint32),
                          len(ids), _p(out, ct.c_uint64), cap)
    if cnt > cap:
        raise ValueError(f"scan overflow: {cnt} > {cap}; raise pair_slack")
    packed = out[:cnt]
    return np.stack([(packed >> np.uint64(32)).astype(np.uint32),
                     (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
                    axis=1)


def brute_force_pairs(bounds_min, bounds_max, ids, pair_slack: int = 32
                      ) -> np.ndarray:
    """Exact overlap oracle: (n_pairs, 2) uint32, (min_id, max_id) sorted."""
    lib = _load()
    bounds_min = np.ascontiguousarray(bounds_min, np.float32)
    bounds_max = np.ascontiguousarray(bounds_max, np.float32)
    ids = np.ascontiguousarray(ids, np.uint32)
    n, dim = bounds_min.shape
    cap = max(pair_slack * max(n, 1), 1024)
    out = np.zeros(cap, np.uint64)
    cnt = lib.bp_brute_force_pairs(
        _p(bounds_min, ct.c_float), _p(bounds_max, ct.c_float),
        _p(ids, ct.c_uint32), n, dim, _p(out, ct.c_uint64), cap)
    if cnt > cap:
        raise ValueError(f"oracle overflow: {cnt} > {cap}")
    packed = out[:cnt]
    return np.stack([(packed >> np.uint64(32)).astype(np.uint32),
                     (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
                    axis=1)


# ---------------------------------------------------------------------------
# BR_SCENE IO through the native codec
# ---------------------------------------------------------------------------

def scene_save(path: str, system_min, system_max, bounds_min, bounds_max,
               ids, layer: Optional[dict] = None,
               collisions: Optional[np.ndarray] = None) -> None:
    lib = _load()
    smin = np.ascontiguousarray(system_min, np.float32)
    smax = np.ascontiguousarray(system_max, np.float32)
    bmin = np.ascontiguousarray(bounds_min, np.float32)
    bmax = np.ascontiguousarray(bounds_max, np.float32)
    ids = np.ascontiguousarray(ids, np.uint32)
    h = lib.bp_scene_new(_p(smin, ct.c_float), _p(smax, ct.c_float),
                         _p(bmin, ct.c_float), _p(bmax, ct.c_float),
                         _p(ids, ct.c_uint32), len(ids))
    try:
        if layer is not None:
            lk = np.ascontiguousarray(layer["keys"], np.uint64)
            li = np.ascontiguousarray(layer["ids"], np.uint32)
            lib.bp_scene_set_layer(h, layer.get("min_depth", 0),
                                   _p(lk, ct.c_uint64), _p(li, ct.c_uint32),
                                   len(li), 1 if layer.get("sorted", True)
                                   else 0)
        if collisions is not None and len(collisions):
            c = np.ascontiguousarray(collisions, np.uint32)
            packed = ((c[:, 0].astype(np.uint64) << np.uint64(32))
                      | c[:, 1].astype(np.uint64))
            packed = np.ascontiguousarray(packed)
            lib.bp_scene_set_collisions(h, _p(packed, ct.c_uint64),
                                        len(packed))
        if lib.bp_scene_save(h, path.encode()) != 0:
            raise IOError(f"failed to save {path}")
    finally:
        lib.bp_scene_free(h)


def scene_load(path: str) -> dict:
    lib = _load()
    h = lib.bp_scene_load(path.encode())
    if not h:
        raise IOError(f"failed to load {path}")
    try:
        n = lib.bp_scene_object_count(h)
        tn = lib.bp_scene_tree_count(h)
        cn = lib.bp_scene_collision_count(h)
        smin = np.zeros(3, np.float32)
        smax = np.zeros(3, np.float32)
        bmin = np.zeros((n, 3), np.float32)
        bmax = np.zeros((n, 3), np.float32)
        ids = np.zeros(n, np.uint32)
        lib.bp_scene_get(h, _p(smin, ct.c_float), _p(smax, ct.c_float),
                         _p(bmin, ct.c_float), _p(bmax, ct.c_float),
                         _p(ids, ct.c_uint32))
        md = np.zeros(1, np.uint32)
        lk = np.zeros(tn, np.uint64)
        li = np.zeros(tn, np.uint32)
        srt = np.zeros(1, np.uint8)
        lib.bp_scene_get_layer(h, _p(md, ct.c_uint32), _p(lk, ct.c_uint64),
                               _p(li, ct.c_uint32), _p(srt, ct.c_uint8))
        packed = np.zeros(cn, np.uint64)
        lib.bp_scene_get_collisions(h, _p(packed, ct.c_uint64))
        collisions = np.stack(
            [(packed >> np.uint64(32)).astype(np.uint32),
             (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32)], axis=1) \
            if cn else np.zeros((0, 2), np.uint32)
        return {
            "system_min": smin, "system_max": smax,
            "bounds_min": bmin, "bounds_max": bmax, "ids": ids,
            "layer": {"min_depth": int(md[0]), "keys": lk, "ids": li,
                      "sorted": bool(srt[0])},
            "collisions": collisions,
        }
    finally:
        lib.bp_scene_free(h)
