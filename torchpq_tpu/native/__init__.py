"""Native (C++) host-side data plane, loaded via ctypes.

Builds lazily with g++ on first use (the reference compiles its native
pieces at runtime too — via NVRTC; here it's one `g++ -O3 -shared` that is
cached next to the source). Falls back to pure-numpy implementations when a
compiler is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_native.so")
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.read_fvecs.restype = ctypes.c_int64
        lib.read_bvecs.restype = ctypes.c_int64
        lib.read_ivecs.restype = ctypes.c_int64
        lib.vecs_dim.restype = ctypes.c_int32
        lib.spill_assign.restype = None
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _read_vecs(path, fn_name, dtype, n_max=None):
    lib = _get_lib()
    path_b = os.fspath(path).encode()
    if lib is None:
        return _read_vecs_numpy(path, dtype, n_max)
    d = lib.vecs_dim(path_b)
    assert d > 0, f"cannot read {path}"
    if n_max is None:
        row_bytes = 4 + d * np.dtype(dtype).itemsize
        n_max = os.path.getsize(path) // row_bytes
    out = np.empty((n_max, d), dtype)
    fn = getattr(lib, fn_name)
    n = fn(path_b, ctypes.c_int64(n_max), ctypes.c_int32(d),
           out.ctypes.data_as(ctypes.c_void_p))
    assert n >= 0, f"malformed vecs file {path}"
    return out[:n]


def _read_vecs_numpy(path, dtype, n_max=None):
    raw = np.fromfile(path, dtype=np.uint8)
    d = int(np.frombuffer(raw[:4], np.int32)[0])
    itemsize = np.dtype(dtype).itemsize
    row = 4 + d * itemsize
    n = len(raw) // row
    if n_max is not None:
        n = min(n, n_max)
    body = raw[:n * row].reshape(n, row)[:, 4:]
    return body.view(dtype).reshape(n, d).copy()


def read_fvecs(path, n_max=None):
    """Read a texmex .fvecs file -> [n, d] float32 (SIFT1M/GIST1M format)."""
    return _read_vecs(path, "read_fvecs", np.float32, n_max)


def read_bvecs(path, n_max=None):
    return _read_vecs(path, "read_bvecs", np.uint8, n_max)


def read_ivecs(path, n_max=None):
    return _read_vecs(path, "read_ivecs", np.int32, n_max)


def spill_assign(top, counts, cap):
    """Greedy capacity-bounded assignment. top: [n, l] int32 best-first
    candidate cells; counts: [n_cells] int64 occupancy (MUTATED in place);
    cap: int. Returns [n] chosen cells."""
    top = np.ascontiguousarray(top, np.int32)
    counts = np.ascontiguousarray(counts, np.int64)
    n, l = top.shape
    out = np.empty(n, np.int64)
    lib = _get_lib()
    if lib is None:
        for i in range(n):
            row = top[i]
            for c in row:
                if counts[c] < cap:
                    break
            else:
                c = row[np.argmin(counts[row])]
            counts[c] += 1
            out[i] = c
        return out, counts
    lib.spill_assign(
        top.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(n),
        ctypes.c_int32(l), counts.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(cap), out.ctypes.data_as(ctypes.c_void_p))
    return out, counts
