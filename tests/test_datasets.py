"""Dataset loader tests (HDF5 ann-benchmarks format + fvecs triples)."""

import numpy as np
import pytest

from jvector_tpu.ops.similarity import SimilarityFunction
from jvector_tpu.util.datasets import load_dataset, load_hdf5, synthetic_dataset
from jvector_tpu.util.io import write_fvecs, write_ivecs

RNG = np.random.default_rng(5)


def test_hdf5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    ds = synthetic_dataset(n=500, dim=16, n_queries=10, k=5, seed=2)
    p = tmp_path / "toy.hdf5"
    with h5py.File(p, "w") as f:
        f.create_dataset("train", data=ds.base)
        f.create_dataset("test", data=ds.queries)
        f.create_dataset("neighbors", data=ds.ground_truth)
        f.attrs["distance"] = "euclidean"
    out = load_hdf5(p)
    assert out.name == "toy"
    assert out.similarity == SimilarityFunction.EUCLIDEAN
    np.testing.assert_array_equal(out.base, ds.base)
    np.testing.assert_array_equal(out.ground_truth, ds.ground_truth)
    # angular maps to cosine
    with h5py.File(p, "a") as f:
        f.attrs["distance"] = "angular"
    assert load_hdf5(p).similarity == SimilarityFunction.COSINE
    # via the catalog entry point
    assert load_dataset(str(p)).dimension == 16


def test_fvecs_triple_loader(tmp_path):
    ds = synthetic_dataset(n=300, dim=8, n_queries=5, k=5, seed=3)
    prefix = str(tmp_path / "mini")
    write_fvecs(prefix + "_base.fvecs", ds.base)
    write_fvecs(prefix + "_query.fvecs", ds.queries)
    write_ivecs(prefix + "_groundtruth.ivecs", ds.ground_truth)
    out = load_dataset(prefix)
    assert out is not None and out.base.shape == (300, 8)
    np.testing.assert_array_equal(out.queries, ds.queries)
    assert load_dataset(str(tmp_path / "nope")) is None
