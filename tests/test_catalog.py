"""Dataset catalog tests (reference DataSets/DataSetLoader YAML catalogs)."""

import numpy as np
import pytest

from jvector_tpu.ops.similarity import SimilarityFunction
from jvector_tpu.util.catalog import Catalog, discover
from jvector_tpu.util.io import write_fvecs, write_ivecs


@pytest.fixture()
def catalog_dir(tmp_path):
    rng = np.random.default_rng(0)
    write_fvecs(tmp_path / "toy_base.fvecs", rng.normal(size=(50, 8)).astype(np.float32))
    write_fvecs(tmp_path / "toy_query.fvecs", rng.normal(size=(5, 8)).astype(np.float32))
    write_ivecs(
        tmp_path / "toy_groundtruth.ivecs",
        rng.integers(0, 50, (5, 10)).astype(np.int32),
    )
    (tmp_path / "cat.yaml").write_text(
        f"""
datasets:
  toy:
    format: fvecs
    prefix: {tmp_path}/toy
    similarity: cosine
  tiny-synth:
    format: synthetic
    n: 300
    dim: 16
    n_queries: 8
    k: 5
"""
    )
    return tmp_path


def test_catalog_select_and_open(catalog_dir):
    c = Catalog.load(catalog_dir / "cat.yaml")
    assert c.names() == ["tiny-synth", "toy"]
    assert c.select("^toy$") == ["toy"]
    assert c.select("synth|toy") == ["tiny-synth", "toy"]
    ds = c.open("toy")
    assert ds.base.shape == (50, 8)
    assert ds.similarity == SimilarityFunction.COSINE
    ds2 = c.open("tiny-synth")
    assert ds2.base.shape == (300, 16)
    assert ds2.ground_truth.shape == (8, 5)
    with pytest.raises(KeyError):
        c.open("nope")


def test_discover_finds_fvecs_triples(catalog_dir):
    found = discover(catalog_dir)
    assert "toy" in found
    c = Catalog(entries=found)
    assert c.open("toy").queries.shape == (5, 8)


def test_catalog_auto_fetch_file_urls(tmp_path):
    """Auto-fetch of missing dataset files (reference DataSetLoader
    download path) via file:// URLs — the zero-egress-safe transport."""
    rng = np.random.default_rng(9)
    src = tmp_path / "remote"
    src.mkdir()
    base = rng.normal(size=(60, 8)).astype(np.float32)
    q = rng.normal(size=(6, 8)).astype(np.float32)
    gt = np.argsort(((q[:, None] - base[None]) ** 2).sum(-1), axis=1)[:, :5]
    write_fvecs(src / "ds_base.fvecs", base)
    write_fvecs(src / "ds_query.fvecs", q)
    write_ivecs(src / "ds_groundtruth.ivecs", gt.astype(np.int32))

    local = tmp_path / "cache" / "ds"
    cat = Catalog(entries={
        "ds": {
            "format": "fvecs",
            "prefix": str(local),
            "similarity": "euclidean",
            "urls": {
                "base": f"file://{src}/ds_base.fvecs",
                "query": f"file://{src}/ds_query.fvecs",
                "groundtruth": f"file://{src}/ds_groundtruth.ivecs",
            },
        }
    })
    ds = cat.open("ds")
    assert ds.base.shape == (60, 8)
    np.testing.assert_array_equal(np.asarray(ds.ground_truth)[:, :5], gt)
    # second open: files cached, no re-fetch (fetcher must not be called)
    def boom(url, tmp):
        raise AssertionError("re-fetched a cached file")
    ds2 = cat.open("ds", fetcher=boom)
    assert ds2.base.shape == (60, 8)


def test_catalog_fetch_injectable_and_url_rewrite(tmp_path):
    """s3://, gs:// rewrite to public HTTPS endpoints; an injected fetcher
    carries the transport (authenticated clients plug in the same way)."""
    from jvector_tpu.util.catalog import fetch, resolve_url

    assert (
        resolve_url("s3://my-bucket/dir/f.fvecs")
        == "https://my-bucket.s3.amazonaws.com/dir/f.fvecs"
    )
    assert (
        resolve_url("gs://b/k.hdf5") == "https://storage.googleapis.com/b/k.hdf5"
    )
    assert resolve_url("http://x/y") == "http://x/y"

    calls = []

    def fake(url, tmp):
        calls.append(url)
        with open(tmp, "wb") as f:
            f.write(b"payload")

    dest = tmp_path / "sub" / "f.bin"
    out = fetch("s3://bkt/f.bin", str(dest), fetcher=fake)
    assert out == str(dest) and dest.read_bytes() == b"payload"
    assert calls == ["https://bkt.s3.amazonaws.com/f.bin"]
    # idempotent: present file short-circuits
    fetch("s3://bkt/f.bin", str(dest), fetcher=fake)
    assert len(calls) == 1
    # failed fetch leaves no partial file behind
    def bad(url, tmp):
        with open(tmp, "wb") as f:
            f.write(b"half")
        raise OSError("network down")

    with pytest.raises(OSError):
        fetch("s3://bkt/g.bin", str(tmp_path / "g.bin"), fetcher=bad)
    assert not (tmp_path / "g.bin").exists()
