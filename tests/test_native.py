"""Native IO runtime vs numpy reference (the pattern of the reference's
``TestVectorizationProvider``: native output must equal the scalar path)."""

import os
import zlib

import numpy as np
import pytest

from jvector_tpu.util import native
from jvector_tpu.util.io import write_fvecs

RNG = np.random.default_rng(17)

needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@needs_native
def test_crc32_matches_zlib(tmp_path):
    p = tmp_path / "blob"
    data = RNG.bytes(3_000_000)
    p.write_bytes(data)
    want = zlib.crc32(data[100:2_000_100]) & 0xFFFFFFFF
    got = native.crc32_file(str(p), 100, 2_000_000, n_threads=4)
    assert got == want


@needs_native
def test_native_fvecs_matches_numpy(tmp_path):
    v = RNG.normal(size=(1000, 33)).astype(np.float32)
    p = tmp_path / "v.fvecs"
    write_fvecs(p, v)
    out = native.read_fvecs_native(str(p))
    np.testing.assert_array_equal(out, v)
    out4 = native.read_fvecs_native(str(p), max_vectors=4)
    np.testing.assert_array_equal(out4, v[:4])


@needs_native
def test_native_fvecs_corrupt(tmp_path):
    v = RNG.normal(size=(10, 8)).astype(np.float32)
    p = tmp_path / "v.fvecs"
    write_fvecs(p, v)
    raw = p.read_bytes()
    bad = tmp_path / "bad.fvecs"
    bad.write_bytes(raw[:-5])
    with pytest.raises(ValueError):
        native.read_fvecs_native(str(bad))


@needs_native
def test_pwrite_rows(tmp_path):
    p = tmp_path / "extent"
    n, d = 64, 16
    with open(p, "wb") as f:
        f.truncate(128 + n * d * 4)
    rows = RNG.normal(size=(n, d)).astype(np.float32)
    assert native.pwrite_rows(str(p), 128, rows, start_row=0, n_threads=4)
    got = np.fromfile(p, np.float32, offset=128).reshape(n, d)
    np.testing.assert_array_equal(got, rows)

    # partial positional write
    sub = RNG.normal(size=(8, d)).astype(np.float32)
    assert native.pwrite_rows(str(p), 128, sub, start_row=16)
    got = np.fromfile(p, np.float32, offset=128).reshape(n, d)
    np.testing.assert_array_equal(got[16:24], sub)


@needs_native
def test_prefetch_reader(tmp_path):
    p = tmp_path / "stream"
    data = RNG.bytes(10_000_000)
    p.write_bytes(data)
    chunks = []
    with native.PrefetchReader(str(p), chunk_bytes=1 << 20, depth=3) as r:
        for c in r:
            chunks.append(c)
    assert b"".join(chunks) == data
    assert len(chunks) == 10  # ceil(10MB / 1MB) with short tail inside chunk 10


def test_fvecs_public_api_uses_native_or_fallback(tmp_path):
    """Public read_fvecs gives identical results regardless of backend."""
    from jvector_tpu.util.io import read_fvecs

    v = RNG.normal(size=(50, 7)).astype(np.float32)
    p = tmp_path / "v.fvecs"
    write_fvecs(p, v)
    np.testing.assert_array_equal(read_fvecs(p), v)


def test_gather_rows_parallel_matches_numpy():
    from jvector_tpu.util.native import gather_rows

    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (500, 48), dtype=np.uint8)
    idx = np.asarray([0, 499, -1, 500, 77, 77], np.int32)
    got = gather_rows(src, idx, n_threads=4)
    expect = src[np.clip(idx, 0, 499)].copy()
    expect[(idx < 0) | (idx >= 500)] = 0
    np.testing.assert_array_equal(got, expect)

    srcf = rng.normal(size=(300, 7)).astype(np.float32)
    idx2 = rng.integers(0, 300, 1000).astype(np.int32)
    np.testing.assert_array_equal(gather_rows(srcf, idx2), srcf[idx2])
