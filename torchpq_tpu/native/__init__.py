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


def _read_vecs(path, fn_name, dtype, n_max=None, offset=0):
    lib = _get_lib()
    path_b = os.fspath(path).encode()
    if lib is None:
        return _read_vecs_numpy(path, dtype, n_max, offset)
    d = lib.vecs_dim(path_b)
    assert d > 0, f"cannot read {path}"
    row_bytes = 4 + d * np.dtype(dtype).itemsize
    n_file = os.path.getsize(path) // row_bytes
    if n_max is None:
        n_max = max(n_file - offset, 0)
    n_max = min(n_max, max(n_file - offset, 0))
    out = np.empty((n_max, d), dtype)
    fn = getattr(lib, fn_name)
    n = fn(path_b, ctypes.c_int64(n_max), ctypes.c_int32(d),
           out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(offset))
    assert n >= 0, f"malformed vecs file {path}"
    return out[:n]


def _read_vecs_numpy(path, dtype, n_max=None, offset=0):
    with open(path, "rb") as f:
        d = int(np.frombuffer(f.read(4), np.int32)[0])
        itemsize = np.dtype(dtype).itemsize
        row = 4 + d * itemsize
        n = os.path.getsize(path) // row - offset
        n = max(n, 0)
        if n_max is not None:
            n = min(n, n_max)
        f.seek(offset * row)
        raw = np.fromfile(f, dtype=np.uint8, count=n * row)
    body = raw.reshape(n, row)[:, 4:]
    return body.view(dtype).reshape(n, d).copy()


def read_fvecs(path, n_max=None, offset=0):
    """Read a texmex .fvecs file -> [n, d] float32 (SIFT1M/GIST1M format).
    `offset` skips that many rows first (rows are fixed-size), so files
    bigger than RAM stream in chunks — see stream_vecs."""
    return _read_vecs(path, "read_fvecs", np.float32, n_max, offset)


def read_bvecs(path, n_max=None, offset=0):
    return _read_vecs(path, "read_bvecs", np.uint8, n_max, offset)


def read_ivecs(path, n_max=None, offset=0):
    return _read_vecs(path, "read_ivecs", np.int32, n_max, offset)


def stream_vecs(path, chunk_rows=250_000, n_max=None, kind="fvecs"):
    """Yield [chunk_rows, d] blocks of a texmex file — out-of-core ingest
    for datasets bigger than host RAM (e.g. bigann bvecs)."""
    reader = {"fvecs": read_fvecs, "bvecs": read_bvecs,
              "ivecs": read_ivecs}[kind]
    off = 0
    while n_max is None or off < n_max:
        want = chunk_rows if n_max is None else min(chunk_rows, n_max - off)
        block = reader(path, n_max=want, offset=off)
        if not len(block):
            return
        yield block
        off += len(block)


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
