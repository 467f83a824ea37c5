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
