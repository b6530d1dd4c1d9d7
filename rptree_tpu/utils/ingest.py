"""Dataset ingest: fvecs / bvecs / ivecs (SIFT, GIST) and MNIST idx.

The chunk producers here feed :class:`rptree_tpu.streaming.ForestBuilder`
-- the role of the reference's conduit sources (``mnist-idx-conduit`` in
``bench/time/Main.hs:113-121``, ``dataSource`` in ``Conduit.hs:179-188``).

Parsing runs in the native reader (``native/ingest.cpp``, built to
``native/libingest.so`` and loaded via ctypes); if the shared object is
missing it is built on first use with ``make``, and if no toolchain is
available a numpy fallback with identical semantics takes over.  Tests
compare the two implementations byte-for-byte.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = [
    "read_fvecs", "read_bvecs", "read_ivecs", "read_idx",
    "fvecs_meta", "bvecs_meta", "ivecs_meta", "idx_meta",
    "fvecs_source", "bvecs_source", "idx_source", "native_available",
    "write_fvecs", "write_ivecs",
]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libingest.so"))
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native reader; None -> numpy fallback."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64, f32p, i32p, cp = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                           ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p)
    lib.xvecs_meta.argtypes = [cp, i64, ctypes.POINTER(i64), ctypes.POINTER(i64)]
    lib.fvecs_read.argtypes = [cp, i64, i64, i64, f32p]
    lib.bvecs_read.argtypes = [cp, i64, i64, i64, f32p]
    lib.ivecs_read.argtypes = [cp, i64, i64, i64, i32p]
    lib.idx_meta.argtypes = [cp, ctypes.POINTER(i64), ctypes.POINTER(i64)]
    lib.idx_read.argtypes = [cp, i64, i64, i64, ctypes.c_float, f32p]
    for fn in (lib.xvecs_meta, lib.fvecs_read, lib.bvecs_read,
               lib.ivecs_read, lib.idx_meta, lib.idx_read):
        fn.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    """True when the native reader is loaded (vs the numpy fallback)."""
    return _load() is not None


def _check(rc: int, path: str):
    if rc != 0:
        raise ValueError(f"ingest failed on {path!r} (error {rc}: "
                         f"{'open/format/bounds/io'.split('/')[-rc - 1]})")


# ---- metadata -------------------------------------------------------------

def _xvecs_meta(path: str, value_size: int) -> Tuple[int, int]:
    lib = _load()
    if lib is not None:
        rows, dim = ctypes.c_int64(), ctypes.c_int64()
        _check(lib.xvecs_meta(path.encode(), value_size,
                              ctypes.byref(rows), ctypes.byref(dim)), path)
        return rows.value, dim.value
    with open(path, "rb") as fh:
        d = int(np.fromfile(fh, np.int32, 1)[0])
    row_bytes = 4 + d * value_size
    size = os.path.getsize(path)
    if d <= 0 or size % row_bytes:
        raise ValueError(f"ingest failed on {path!r} (error -2: format)")
    return size // row_bytes, d


def fvecs_meta(path: str) -> Tuple[int, int]:
    """(rows, dim) of an .fvecs file."""
    return _xvecs_meta(path, 4)


def ivecs_meta(path: str) -> Tuple[int, int]:
    return _xvecs_meta(path, 4)


def bvecs_meta(path: str) -> Tuple[int, int]:
    return _xvecs_meta(path, 1)


def idx_meta(path: str) -> Tuple[int, int]:
    """(rows, flattened dim) of an MNIST idx file."""
    lib = _load()
    if lib is not None:
        rows, dim = ctypes.c_int64(), ctypes.c_int64()
        _check(lib.idx_meta(path.encode(), ctypes.byref(rows),
                            ctypes.byref(dim)), path)
        return rows.value, dim.value
    with open(path, "rb") as fh:
        hdr = fh.read(4)
        if len(hdr) != 4 or hdr[0] or hdr[1] or hdr[2] != 0x08:
            raise ValueError(f"ingest failed on {path!r} (error -2: format)")
        ndims = hdr[3]
        sizes = np.frombuffer(fh.read(4 * ndims), ">u4")
    return int(sizes[0]), int(np.prod(sizes[1:])) if ndims > 1 else 1


# ---- bulk / ranged reads --------------------------------------------------

def read_fvecs(path: str, start: int = 0, count: Optional[int] = None) -> np.ndarray:
    """``f32[count, dim]`` rows of an .fvecs file (SIFT/GIST base/query)."""
    rows, dim = fvecs_meta(path)
    count = rows - start if count is None else min(count, rows - start)
    lib = _load()
    out = np.empty((count, dim), np.float32)
    if lib is not None:
        _check(lib.fvecs_read(path.encode(), start, count, dim,
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))),
               path)
        return out
    raw = np.fromfile(path, np.int32, offset=start * (4 + dim * 4),
                      count=count * (1 + dim)).reshape(count, 1 + dim)
    if not (raw[:, 0] == dim).all():
        raise ValueError(f"ingest failed on {path!r} (error -2: format)")
    return raw[:, 1:].view(np.float32).copy()


def read_ivecs(path: str, start: int = 0, count: Optional[int] = None) -> np.ndarray:
    """``i32[count, dim]`` rows (e.g. ground-truth neighbour id files)."""
    rows, dim = ivecs_meta(path)
    count = rows - start if count is None else min(count, rows - start)
    lib = _load()
    out = np.empty((count, dim), np.int32)
    if lib is not None:
        _check(lib.ivecs_read(path.encode(), start, count, dim,
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))),
               path)
        return out
    raw = np.fromfile(path, np.int32, offset=start * (4 + dim * 4),
                      count=count * (1 + dim)).reshape(count, 1 + dim)
    if not (raw[:, 0] == dim).all():
        raise ValueError(f"ingest failed on {path!r} (error -2: format)")
    return raw[:, 1:].copy()


def read_bvecs(path: str, start: int = 0, count: Optional[int] = None) -> np.ndarray:
    """``f32[count, dim]`` rows of a .bvecs file (u8 widened to f32)."""
    rows, dim = bvecs_meta(path)
    count = rows - start if count is None else min(count, rows - start)
    lib = _load()
    out = np.empty((count, dim), np.float32)
    if lib is not None:
        _check(lib.bvecs_read(path.encode(), start, count, dim,
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))),
               path)
        return out
    row_bytes = 4 + dim
    raw = np.fromfile(path, np.uint8, offset=start * row_bytes,
                      count=count * row_bytes).reshape(count, row_bytes)
    return raw[:, 4:].astype(np.float32)


def read_idx(path: str, start: int = 0, count: Optional[int] = None,
             scale: float = 1.0) -> np.ndarray:
    """``f32[count, dim]`` rows of an MNIST idx u8 file, scaled."""
    rows, dim = idx_meta(path)
    count = rows - start if count is None else min(count, rows - start)
    lib = _load()
    out = np.empty((count, dim), np.float32)
    if lib is not None:
        _check(lib.idx_read(path.encode(), start, count, dim, scale,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))),
               path)
        return out
    with open(path, "rb") as fh:
        ndims = fh.read(4)[3]
        header = 4 + 4 * ndims
    raw = np.fromfile(path, np.uint8, offset=header + start * dim,
                      count=count * dim).reshape(count, dim)
    return raw.astype(np.float32) * scale


# ---- writers (dataset export; the inverse of the readers above) -----------

def write_fvecs(path: str, x: np.ndarray) -> None:
    """Write ``f32[n, dim]`` rows as an .fvecs file (the SIFT/GIST layout:
    each row is an int32 dim header followed by ``dim`` f32 values)."""
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    n, dim = x.shape
    out = np.empty((n, 1 + dim), np.int32)
    out[:, 0] = dim
    out[:, 1:] = x.view(np.int32)
    out.tofile(path)


def write_ivecs(path: str, ids: np.ndarray) -> None:
    """Write ``i32[n, k]`` rows as an .ivecs file (ground-truth layout)."""
    ids = np.ascontiguousarray(np.asarray(ids, np.int32))
    n, k = ids.shape
    out = np.empty((n, 1 + k), np.int32)
    out[:, 0] = k
    out[:, 1:] = ids
    out.tofile(path)


# ---- chunked sources (streaming-builder feeds) ----------------------------

def _chunks(meta, read, path: str, chunk_size: int,
            limit: Optional[int]) -> Iterator[np.ndarray]:
    rows, _ = meta(path)
    n = rows if limit is None else min(limit, rows)
    for s in range(0, n, chunk_size):
        yield read(path, s, min(chunk_size, n - s))


def fvecs_source(path: str, chunk_size: int = 10_000,
                 limit: Optional[int] = None) -> Iterator[np.ndarray]:
    """Chunked .fvecs stream for ``rptree_tpu.forest`` / ``tree``."""
    return _chunks(fvecs_meta, read_fvecs, path, chunk_size, limit)


def bvecs_source(path: str, chunk_size: int = 10_000,
                 limit: Optional[int] = None) -> Iterator[np.ndarray]:
    return _chunks(bvecs_meta, read_bvecs, path, chunk_size, limit)


def idx_source(path: str, chunk_size: int = 10_000,
               limit: Optional[int] = None,
               scale: float = 1.0) -> Iterator[np.ndarray]:
    """Chunked MNIST idx stream (the reference bench's data source,
    bench/time/Main.hs:113-121)."""
    rows, _ = idx_meta(path)
    n = rows if limit is None else min(limit, rows)
    for s in range(0, n, chunk_size):
        yield read_idx(path, s, min(chunk_size, n - s), scale=scale)
