"""Dataset catalogs: YAML-described named datasets + on-disk discovery.

Reference: ``benchmarks/datasets/DataSets``/``DataSetLoader`` — the bench
harness resolves regex-selected dataset names against YAML catalogs
(``yaml-configs/dataset-catalogs/*.yaml``), each entry naming format and
file locations (env vars expanded), auto-downloading missing files (incl.
S3/GCS).  Entries here resolve against the local filesystem, define
synthetic corpora generated on device with exact ground truth, or carry
``url``/``urls`` for auto-fetch of missing files (``file://``, ``http(s)``,
and ``s3://``/``gs://`` via the buckets' public HTTPS endpoints).  The
build container is zero-egress, so network fetches are exercised through
``file://`` URLs and an injectable fetcher in tests.

Catalog schema (one YAML file, top-level ``datasets:`` map)::

    datasets:
      siftsmall:
        format: fvecs          # X_base.fvecs / X_query.fvecs / X_groundtruth.ivecs
        prefix: ${DATA}/siftsmall/siftsmall
        similarity: euclidean
        urls:                  # optional auto-fetch for missing files
          base: s3://my-bucket/siftsmall_base.fvecs
          query: file:///mnt/share/siftsmall_query.fvecs
      glove-100:
        format: hdf5
        path: ${DATA}/glove-100-angular.hdf5
        url: http://ann-benchmarks.com/glove-100-angular.hdf5
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


def resolve_url(url: str) -> str:
    """Rewrite cloud-scheme URLs to their public HTTPS endpoints.

    Reference ``DataSetLoader`` fetches from S3/GCS; anonymous reads go
    through the buckets' HTTPS endpoints so no SDK dependency is needed.
    """
    if url.startswith("s3://"):
        bucket, _, key = url[len("s3://") :].partition("/")
        return f"https://{bucket}.s3.amazonaws.com/{key}"
    if url.startswith("gs://"):
        bucket, _, key = url[len("gs://") :].partition("/")
        return f"https://storage.googleapis.com/{bucket}/{key}"
    return url


def fetch(url: str, dest: str, fetcher=None) -> str:
    """Download ``url`` to ``dest`` (atomic tmp+rename; no-op if present).

    ``fetcher(url, tmp_path)`` overrides the transport (tests inject one;
    deployments can plug authenticated clients).  Default transport:
    ``file://`` copies, anything else goes through urllib over HTTPS
    (``s3://``/``gs://`` rewritten by :func:`resolve_url`).
    """
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    url = resolve_url(url)
    if fetcher is not None:
        fetcher(url, tmp)
    elif url.startswith("file://"):
        import shutil

        shutil.copyfile(url[len("file://") :], tmp)
    else:
        import urllib.request

        urllib.request.urlretrieve(url, tmp)  # noqa: S310 (catalog-declared)
    os.replace(tmp, dest)
    return dest


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

    def open(self, name: str, fetcher=None) -> DataSet:
        """Resolve one entry to a loaded :class:`DataSet`.

        Entries with ``url`` (hdf5) / ``urls`` (fvecs: keys base/query/
        groundtruth) auto-fetch missing files first (reference
        ``DataSetLoader`` download path); ``fetcher`` overrides the
        transport (see :func:`fetch`).
        """
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
            if not os.path.exists(path) and e.get("url"):
                fetch(os.path.expandvars(e["url"]), path, fetcher)
            return load_hdf5(path, name=name)
        if fmt == "fvecs":
            prefix = os.path.expandvars(e["prefix"])
            suffixes = {
                "base": "_base.fvecs",
                "query": "_query.fvecs",
                "groundtruth": "_groundtruth.ivecs",
            }
            for key, url in (e.get("urls") or {}).items():
                if key not in suffixes:
                    raise ValueError(
                        f"{name!r}: unknown urls key {key!r} "
                        f"(expected {sorted(suffixes)})"
                    )
                fetch(os.path.expandvars(url), prefix + suffixes[key], fetcher)
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
