"""ctypes bindings for the native IO runtime (``native/jvtpu_io.cpp``).

Loads ``libjvtpu_io.so`` (building it with make on first use if the
toolchain is available); every entry point has a numpy fallback so the
package works without a compiler.  This mirrors the reference's
``LibraryLoader`` + ``NativeSimdOps`` pattern (load-or-fallback,
``jvector-native/.../LibraryLoader.java``), except the native side here is
host IO, not distance kernels — those run on the TPU.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libjvtpu_io.so")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _load() -> "ctypes.CDLL | None":
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(
                    ["make", "-s", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.jvtpu_crc32.argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.jvtpu_crc32.restype = ctypes.c_int
            lib.jvtpu_fvecs_info.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.jvtpu_fvecs_info.restype = ctypes.c_int
            lib.jvtpu_fvecs_to_dense.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int,
            ]
            lib.jvtpu_fvecs_to_dense.restype = ctypes.c_int
            lib.jvtpu_pwrite_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p,
                ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            lib.jvtpu_pwrite_rows.restype = ctypes.c_int
            lib.jvtpu_prefetch_open.argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
            ]
            lib.jvtpu_prefetch_open.restype = ctypes.c_void_p
            lib.jvtpu_prefetch_next.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
            ]
            lib.jvtpu_prefetch_next.restype = ctypes.c_int64
            lib.jvtpu_prefetch_close.argtypes = [ctypes.c_void_p]
            lib.jvtpu_prefetch_close.restype = None
            lib.jvtpu_gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.jvtpu_gather_rows.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def crc32_file(path: str, offset: int, length: int, n_threads: int = 8) -> int:
    """Parallel CRC32 of a file range; falls back to zlib streaming."""
    lib = _load()
    if lib is not None:
        out = ctypes.c_uint32(0)
        rc = lib.jvtpu_crc32(
            path.encode(), offset, length, n_threads, ctypes.byref(out)
        )
        if rc == 0:
            return int(out.value)
    import zlib

    crc = 0
    with open(path, "rb") as f:
        f.seek(offset)
        left = length
        while left > 0:
            chunk = f.read(min(4 << 20, left))
            if not chunk:
                raise IOError(f"short read in {path}")
            crc = zlib.crc32(chunk, crc)
            left -= len(chunk)
    return crc & 0xFFFFFFFF


def read_fvecs_native(path: str, max_vectors: int | None = None) -> "np.ndarray | None":
    """Parallel fvecs load; returns None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    dim = ctypes.c_int32(0)
    count = ctypes.c_int64(0)
    rc = lib.jvtpu_fvecs_info(path.encode(), ctypes.byref(dim), ctypes.byref(count))
    if rc == -74:  # -EBADMSG
        raise ValueError(f"corrupt fvecs file {path}")
    if rc == -22:  # -EINVAL
        raise ValueError(f"bad fvecs dim in {path}")
    if rc != 0:
        return None
    n = int(count.value)
    if max_vectors is not None:
        n = min(n, max_vectors)
    d = int(dim.value)
    if n == 0:
        return np.zeros((0, 0), np.float32)
    out = np.empty((n, d), np.float32)
    rc = lib.jvtpu_fvecs_to_dense(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        os.cpu_count() or 4,
    )
    if rc == -74:
        raise ValueError(f"corrupt fvecs file {path}")
    if rc != 0:
        return None
    return out


def pwrite_rows(
    path: str, base_offset: int, data: np.ndarray, start_row: int, n_threads: int = 8
) -> bool:
    """Positional parallel row write into a reserved extent."""
    lib = _load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data)
    row_bytes = data.dtype.itemsize * int(np.prod(data.shape[1:]))
    rc = lib.jvtpu_pwrite_rows(
        path.encode(),
        base_offset,
        data.ctypes.data_as(ctypes.c_void_p),
        row_bytes,
        data.shape[0],
        start_row,
        n_threads,
    )
    return rc == 0


class PrefetchReader:
    """Background-threaded chunk reader for streaming builds.

    Iterates raw byte chunks of ``chunk_bytes`` (last one short); the read of
    chunk i+depth overlaps the caller's processing of chunk i.
    """

    def __init__(self, path: str, chunk_bytes: int = 8 << 20, depth: int = 2):
        self.path = path
        self.chunk_bytes = chunk_bytes
        self._lib = _load()
        self._h = None
        self._fallback = None
        if self._lib is not None:
            self._h = self._lib.jvtpu_prefetch_open(path.encode(), chunk_bytes, depth)
        if self._h is None:
            self._fallback = open(path, "rb")

    def __iter__(self):
        if self._h is not None:
            buf = np.empty(self.chunk_bytes, np.uint8)
            while True:
                got = self._lib.jvtpu_prefetch_next(
                    self._h, buf.ctypes.data_as(ctypes.c_void_p), self.chunk_bytes
                )
                if got < 0:
                    raise IOError(f"prefetch error {got} on {self.path}")
                if got == 0:
                    break
                yield bytes(buf[:got].tobytes())
        else:
            while True:
                chunk = self._fallback.read(self.chunk_bytes)
                if not chunk:
                    break
                yield chunk

    def close(self):
        if self._h is not None:
            self._lib.jvtpu_prefetch_close(self._h)
            self._h = None
        if self._fallback is not None:
            self._fallback.close()
            self._fallback = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def gather_rows(src: np.ndarray, idx: np.ndarray, n_threads: int = 8) -> np.ndarray:
    """Parallel ``src[idx]`` row gather into a fresh contiguous array.

    The host side of bounded-memory serving: one memcpy per streamed graph
    row, fanned across threads (numpy fancy indexing is single-threaded).
    Out-of-range / negative indices produce zero rows (the drop contract).
    Falls back to numpy when the native library is unavailable.
    """
    idx = np.ascontiguousarray(idx, np.int32)
    lib = _load()
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    if (
        lib is not None
        and src.flags.c_contiguous
        and row_bytes > 0
        and src.ndim >= 1
    ):
        out = np.empty((idx.shape[0],) + src.shape[1:], src.dtype)
        rc = lib.jvtpu_gather_rows(
            src.ctypes.data_as(ctypes.c_void_p),
            row_bytes,
            idx.ctypes.data_as(ctypes.c_void_p),
            idx.shape[0],
            src.shape[0],
            out.ctypes.data_as(ctypes.c_void_p),
            n_threads,
        )
        if rc == 0:
            return out
    safe = np.clip(idx, 0, src.shape[0] - 1)
    out = np.ascontiguousarray(src[safe])
    bad = (idx < 0) | (idx >= src.shape[0])
    if bad.any():
        out[bad] = 0
    return out
