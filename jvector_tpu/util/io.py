"""fvecs / ivecs / bvecs dataset IO.

Equivalent of the reference harness's dataset readers
(``jvector-examples/.../benchmarks/datasets/``).  The formats are the TEXMEX
standard: each vector is ``[int32 dim][dim * elem]`` little-endian.

A native C++ fast path (``native/jvtpu_io``) is used when built; numpy is the
fallback and the correctness reference.
"""

from __future__ import annotations

import os
import struct

import numpy as np


def read_fvecs(path: str | os.PathLike, max_vectors: int | None = None) -> np.ndarray:
    """Read a .fvecs file into a float32 ``[N, D]`` array.

    Uses the native parallel parser when available (``util.native``);
    the numpy path below is the fallback and the correctness reference.
    """
    from jvector_tpu.util import native

    out = native.read_fvecs_native(str(path), max_vectors)
    if out is not None:
        return out
    data = np.fromfile(path, dtype=np.int32)
    if data.size == 0:
        return np.zeros((0, 0), np.float32)
    d = int(data[0])
    if d <= 0:
        raise ValueError(f"bad fvecs dim {d} in {path}")
    row = d + 1
    n = data.size // row
    if data.size % row != 0:
        raise ValueError(f"corrupt fvecs file {path}: {data.size} int32s, dim {d}")
    if max_vectors is not None:
        n = min(n, max_vectors)
    mat = data[: n * row].reshape(n, row)
    if not (mat[:, 0] == d).all():
        raise ValueError(f"non-uniform dims in {path}")
    return mat[:, 1:].view(np.float32).copy()


def read_ivecs(path: str | os.PathLike, max_vectors: int | None = None) -> np.ndarray:
    """Read a .ivecs file into an int32 ``[N, D]`` array."""
    data = np.fromfile(path, dtype=np.int32)
    if data.size == 0:
        return np.zeros((0, 0), np.int32)
    d = int(data[0])
    row = d + 1
    n = data.size // row
    if max_vectors is not None:
        n = min(n, max_vectors)
    mat = data[: n * row].reshape(n, row)
    return mat[:, 1:].copy()


def read_bvecs(path: str | os.PathLike, max_vectors: int | None = None) -> np.ndarray:
    """Read a .bvecs file into a uint8 ``[N, D]`` array."""
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros((0, 0), np.uint8)
    d = int(struct.unpack("<i", raw[:4].tobytes())[0])
    row = 4 + d
    n = raw.size // row
    if max_vectors is not None:
        n = min(n, max_vectors)
    mat = raw[: n * row].reshape(n, row)
    return mat[:, 4:].copy()


def write_fvecs(path: str | os.PathLike, vectors: np.ndarray) -> None:
    v = np.asarray(vectors, np.float32)
    n, d = v.shape
    out = np.empty((n, d + 1), np.int32)
    out[:, 0] = d
    out[:, 1:] = v.view(np.int32)
    out.tofile(path)


def write_ivecs(path: str | os.PathLike, vectors: np.ndarray) -> None:
    v = np.asarray(vectors, np.int32)
    n, d = v.shape
    out = np.empty((n, d + 1), np.int32)
    out[:, 0] = d
    out[:, 1:] = v
    out.tofile(path)
