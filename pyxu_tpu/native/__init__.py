"""Native (C++/OpenMP) host-side plan kernels, loaded via ctypes.

The reference's NUFFT planning lives in FINUFFT's C++ (bin-sort +
ES-kernel tap evaluation; reference nufft.py:275-277).  Our device
transform is XLA, but plan construction is host work on the Python side —
this package compiles ``planner.cpp`` on first use (g++ is in the image;
the .so is cached under ``~/.cache/pyxu_tpu``) and exposes drop-in
replacements for the numpy planners.  Everything degrades gracefully: no
compiler / failed build / ``PYXU_TPU_NATIVE=0`` -> callers use numpy.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import warnings

import numpy as np

__all__ = ["available", "tap_weights", "slab_permutation", "gather_rows"]

_SRC = pathlib.Path(__file__).with_name("planner.cpp")
_LIB = None
_TRIED = False


def _build_and_load():
    """Compile planner.cpp (content-hashed cache) and dlopen it."""
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = pathlib.Path(
        os.environ.get("PYXU_TPU_CACHE",
                       pathlib.Path.home() / ".cache" / "pyxu_tpu"))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"_planner_{tag}.so"
    if not so.exists():
        # unique temp per process: concurrent first-use builds (parallel
        # pytest workers) must not clobber each other's half-written .so
        tmp = so.with_suffix(f".tmp.{os.getpid()}")
        cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
               str(_SRC), "-o", str(tmp)]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: last writer wins, all identical
    lib = ctypes.CDLL(str(so))
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    ll, ii, dd = ctypes.c_longlong, ctypes.c_int, ctypes.c_double
    lib.es_tap_weights.argtypes = [f64p, ll, ii, ii, dd, ll, ii, dd,
                                   i32p, f64p]
    lib.slab_permutation.argtypes = [i64p, ll, i64p, ll, ll, i32p, i32p]
    lib.gather_rows_f64.argtypes = [f64p, ll, ii, i32p, ll, ll, dd, f64p]
    lib.gather_rows_i32.argtypes = [i32p, ll, ii, i32p, ll, ll,
                                    ctypes.c_int32, i32p]
    return lib


def _get():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PYXU_TPU_NATIVE", "1") == "0":
        return None
    try:
        _LIB = _build_and_load()
    except Exception as e:  # noqa: BLE001 — numpy fallback by design
        warnings.warn(f"native planner unavailable ({e!r}); using numpy")
        _LIB = None
    return _LIB


def available() -> bool:
    return _get() is not None


def tap_weights(x_nd: np.ndarray, ax: int, h: float, n_f: int, w: int,
                beta: float):
    """(idx (M, w) int32, wt (M, w) float64) ES taps along one axis, or
    None when the native library is unavailable.  Matches
    ``_tap_weights_np`` (nufft.py:176-198); ``h`` is the grid spacing
    (2*pi/n_f for angle-domain taps, 1.0 for type-3 frequency taps)."""
    lib = _get()
    if lib is None:
        return None
    x_nd = np.ascontiguousarray(x_nd, np.float64)
    M, d = x_nd.shape
    idx = np.empty((M, w), np.int32)
    wt = np.empty((M, w), np.float64)
    lib.es_tap_weights(x_nd, M, d, int(ax), float(h), int(n_f), int(w),
                       float(beta), idx, wt)
    return idx, wt


def slab_permutation(slab: np.ndarray, counts: np.ndarray, Mp: int):
    """(perm (S, Mp) int32 padded with M, inv (M,) int32) — the stable
    counting-sort placement of ``_slab_partition_np`` (nufft.py:366-377),
    or None when unavailable."""
    lib = _get()
    if lib is None:
        return None
    slab = np.ascontiguousarray(slab, np.int64)
    counts = np.ascontiguousarray(counts, np.int64)
    M, S = slab.shape[0], counts.shape[0]
    perm = np.empty((S, int(Mp)), np.int32)
    inv = np.empty(M, np.int32)
    lib.slab_permutation(slab, M, counts, S, int(Mp), perm, inv)
    return perm, inv


def gather_rows(a: np.ndarray, perm: np.ndarray, fill):
    """out[s, m, :] = a[perm[s, m], :] with dummy ``fill`` rows where
    perm == len(a) — the ``padrow(a)[perm]`` gather of ``_slab_plan``
    (nufft.py:464-476).  None when unavailable."""
    lib = _get()
    if lib is None:
        return None
    perm = np.ascontiguousarray(perm, np.int32)
    S, Mp = perm.shape
    M, w = a.shape
    if a.dtype == np.float64:
        out = np.empty((S, Mp, w), np.float64)
        lib.gather_rows_f64(np.ascontiguousarray(a), M, w, perm, S, Mp,
                            float(fill), out)
    elif a.dtype == np.int32:
        out = np.empty((S, Mp, w), np.int32)
        lib.gather_rows_i32(np.ascontiguousarray(a), M, w, perm, S, Mp,
                            np.int32(fill), out)
    else:
        return None
    return out
