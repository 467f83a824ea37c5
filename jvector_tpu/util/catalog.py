"""Dataset catalogs: YAML-described named datasets + on-disk discovery.

Reference: ``benchmarks/datasets/DataSets``/``DataSetLoader`` — the bench
harness resolves regex-selected dataset names against YAML catalogs
(``yaml-configs/dataset-catalogs/*.yaml``), each entry naming format and
file locations (env vars expanded).  Download/cloud-fetch is omitted here
(zero-egress container); entries resolve against the local filesystem or
define synthetic corpora generated on device with exact ground truth.

Catalog schema (one YAML file, top-level ``datasets:`` map)::

    datasets:
      siftsmall:
        format: fvecs          # X_base.fvecs / X_query.fvecs / X_groundtruth.ivecs
        prefix: ${DATA}/siftsmall/siftsmall
        similarity: euclidean
      glove-100:
        format: hdf5
        path: ${DATA}/glove-100-angular.hdf5
        similarity: cosine
      synth-1m:
        format: synthetic
        n: 1000000
        dim: 128
        n_queries: 8192
        k: 100
        similarity: euclidean
        seed: 0
"""

from __future__ import annotations

import dataclasses
import os
import re

from jvector_tpu.ops.similarity import SimilarityFunction
from jvector_tpu.util.datasets import (
    DataSet,
    load_dataset,
    load_hdf5,
    synthetic_dataset,
)


@dataclasses.dataclass
class Catalog:
    """A parsed dataset catalog."""

    entries: dict[str, dict]

    @staticmethod
    def load(path: str | os.PathLike) -> "Catalog":
        import yaml

        with open(path) as f:
            y = yaml.safe_load(f) or {}
        return Catalog(entries=dict(y.get("datasets", {})))

    def names(self) -> list[str]:
        return sorted(self.entries)

    def select(self, pattern: str) -> list[str]:
        """Regex dataset selection (reference ``Bench`` -style regex args)."""
        rx = re.compile(pattern)
        return [n for n in self.names() if rx.search(n)]

    def open(self, name: str) -> DataSet:
        """Resolve one entry to a loaded :class:`DataSet`."""
        if name not in self.entries:
            raise KeyError(f"dataset {name!r} not in catalog ({self.names()})")
        e = dict(self.entries[name])
        fmt = e.get("format", "fvecs")
        sim = SimilarityFunction.parse(e.get("similarity", "euclidean"))
        if fmt == "synthetic":
            return synthetic_dataset(
                n=int(e["n"]),
                dim=int(e["dim"]),
                n_queries=int(e.get("n_queries", 1000)),
                k=int(e.get("k", 100)),
                n_clusters=int(e.get("n_clusters", max(64, int(e["n"]) // 500))),
                seed=int(e.get("seed", 0)),
                sim=sim,
                name=name,
            )
        if fmt == "hdf5":
            path = os.path.expandvars(e["path"])
            return load_hdf5(path, name=name)
        if fmt == "fvecs":
            prefix = os.path.expandvars(e["prefix"])
            ds = load_dataset(prefix)
            if ds is None:
                raise FileNotFoundError(f"dataset files missing for {prefix!r}")
            return dataclasses.replace(ds, similarity=sim)
        raise ValueError(f"unknown dataset format {fmt!r} for {name!r}")


def discover(directory: str | os.PathLike) -> dict[str, dict]:
    """Filesystem discovery: find loadable datasets under a directory.

    Recognizes TEXMEX fvecs triples and ann-benchmarks HDF5 files; returns
    catalog-shaped entries (the reference's MFD directory scan analog).
    """
    found: dict[str, dict] = {}
    for root, _, files in os.walk(directory):
        for f in files:
            if f.endswith(("_base.fvecs",)):
                prefix = os.path.join(root, f[: -len("_base.fvecs")])
                if os.path.exists(prefix + "_query.fvecs"):
                    found[os.path.basename(prefix)] = {
                        "format": "fvecs",
                        "prefix": prefix,
                        "similarity": "euclidean",
                    }
            elif f.endswith((".hdf5", ".h5")):
                found[os.path.splitext(f)[0]] = {
                    "format": "hdf5",
                    "path": os.path.join(root, f),
                    "similarity": "euclidean",
                }
    return found
