"""Dataset fixtures: bundled siftsmall pieces + synthetic corpora with exact GT.

The reference harness downloads fvecs/HDF5 datasets
(``jvector-examples/.../benchmarks/datasets/DataSetLoader``); this environment
has zero egress, so benchmarks use (a) any fvecs files found on disk and
(b) synthetic SIFT-like corpora with ground truth computed by exact
brute-force scan on device (one big matmul — the TPU equivalent of the
reference's precomputed ``*_groundtruth.ivecs``).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from jvector_tpu.ops.similarity import SimilarityFunction
from jvector_tpu.util.io import read_fvecs, read_ivecs

REFERENCE_SIFTSMALL_DIR = "/root/reference/siftsmall"


@dataclasses.dataclass
class DataSet:
    """Mirror of the reference's ``DataSet``: base + queries + ground truth."""

    name: str
    similarity: SimilarityFunction
    base: np.ndarray  # [N, D] float32
    queries: np.ndarray  # [Q, D] float32
    ground_truth: np.ndarray  # [Q, K] int32

    @property
    def dimension(self) -> int:
        return self.base.shape[1]


def exact_ground_truth(
    base: np.ndarray,
    queries: np.ndarray,
    k: int,
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN,
    block: int = 200_000,
) -> np.ndarray:
    """Brute-force top-k on device, blocked over the base to bound memory."""
    import jax
    import jax.numpy as jnp

    from jvector_tpu.ops.similarity import pairwise_scores

    sim = SimilarityFunction.parse(sim)
    q = jnp.asarray(queries, jnp.float32)
    best_scores = None
    best_ids = None
    topk = jax.jit(lambda s: jax.lax.top_k(s, k))
    for start in range(0, base.shape[0], block):
        blk = jnp.asarray(base[start : start + block], jnp.float32)
        scores = pairwise_scores(q, blk, sim)
        s, i = topk(scores)
        i = i + start
        if best_scores is None:
            best_scores, best_ids = s, i
        else:
            cs = jnp.concatenate([best_scores, s], axis=1)
            ci = jnp.concatenate([best_ids, i], axis=1)
            best_scores, sel = topk(cs)
            best_ids = jnp.take_along_axis(ci, sel, axis=1)
    return np.asarray(best_ids, np.int32)


def synthetic_dataset(
    name: str = "synth-sift",
    n: int = 10_000,
    dim: int = 128,
    n_queries: int = 100,
    k: int = 100,
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN,
    n_clusters: int = 64,
    seed: int = 0,
    latent_dim: int | None = None,
) -> DataSet:
    """Embedding-like clustered synthetic corpus with exact ground truth.

    A Gaussian mixture in a low-dimensional latent space projected up to
    ``dim`` with a small iid noise floor.  The low-rank spectrum mirrors real
    embeddings/SIFT (strongly correlated dims) — iid full-rank noise would be
    pathologically hard for PQ-style quantizers and unrepresentative.
    """
    rng = np.random.default_rng(seed)
    ld = latent_dim or max(8, min(dim // 4, 32))
    proj = rng.normal(size=(ld, dim)).astype(np.float32)
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    centers_z = rng.normal(0.0, 1.0, size=(n_clusters, ld)).astype(np.float32)

    def sample(count: int) -> np.ndarray:
        z = centers_z[rng.integers(0, n_clusters, size=count)] + rng.normal(
            0.0, 0.35, size=(count, ld)
        ).astype(np.float32)
        return (z @ proj + rng.normal(0.0, 0.03, size=(count, dim))).astype(np.float32)

    base = sample(n)
    queries = sample(n_queries)
    if sim != SimilarityFunction.EUCLIDEAN:
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    gt = exact_ground_truth(base, queries, k, sim)
    return DataSet(name=name, similarity=sim, base=base, queries=queries, ground_truth=gt)


def load_siftsmall(directory: str | None = None) -> DataSet | None:
    """Load the bundled siftsmall set if the base vectors exist on disk.

    The reference repo bundles only queries+GT (``SiftSmall.java:387``); the
    base file may be absent — return None then and let callers fall back to
    :func:`synthetic_dataset`.
    """
    directory = directory or REFERENCE_SIFTSMALL_DIR
    base_path = os.path.join(directory, "siftsmall_base.fvecs")
    if not os.path.exists(base_path):
        return None
    base = read_fvecs(base_path)
    queries = read_fvecs(os.path.join(directory, "siftsmall_query.fvecs"))
    gt = read_ivecs(os.path.join(directory, "siftsmall_groundtruth.ivecs"))
    return DataSet(
        name="siftsmall",
        similarity=SimilarityFunction.EUCLIDEAN,
        base=base,
        queries=queries,
        ground_truth=gt.astype(np.int32),
    )


def load_hdf5(path: str | os.PathLike, name: str | None = None) -> DataSet:
    """Load an ann-benchmarks-format HDF5 dataset.

    Reference: the harness's HDF5 loader (jhdf-based ``DataSetLoader``).
    Layout: datasets ``train`` [N, D], ``test`` [Q, D], ``neighbors`` [Q, K],
    attr ``distance`` in {euclidean, angular/cosine, dot}.
    """
    import h5py

    with h5py.File(path, "r") as f:
        base = np.asarray(f["train"], np.float32)
        queries = np.asarray(f["test"], np.float32)
        gt = np.asarray(f["neighbors"], np.int32)
        dist = str(f.attrs.get("distance", "euclidean")).lower()
    sim = {
        "euclidean": SimilarityFunction.EUCLIDEAN,
        "angular": SimilarityFunction.COSINE,
        "cosine": SimilarityFunction.COSINE,
        "dot": SimilarityFunction.DOT_PRODUCT,
        "ip": SimilarityFunction.DOT_PRODUCT,
    }.get(dist, SimilarityFunction.EUCLIDEAN)
    return DataSet(
        name=name or os.path.splitext(os.path.basename(str(path)))[0],
        similarity=sim,
        base=base,
        queries=queries,
        ground_truth=gt,
    )


def load_dataset(path_or_name: str) -> DataSet | None:
    """Catalog-ish loader: HDF5 file, fvecs triple prefix, or None.

    ``path_or_name`` may be an ``.hdf5`` file, or a prefix ``X`` such that
    ``X_base.fvecs`` / ``X_query.fvecs`` / ``X_groundtruth.ivecs`` exist
    (the TEXMEX convention the reference harness uses).
    """
    if str(path_or_name).endswith((".hdf5", ".h5")):
        if os.path.exists(path_or_name):
            return load_hdf5(path_or_name)
        return None
    base_p = f"{path_or_name}_base.fvecs"
    if os.path.exists(base_p):
        return DataSet(
            name=os.path.basename(str(path_or_name)),
            similarity=SimilarityFunction.EUCLIDEAN,
            base=read_fvecs(base_p),
            queries=read_fvecs(f"{path_or_name}_query.fvecs"),
            ground_truth=read_ivecs(f"{path_or_name}_groundtruth.ivecs").astype(
                np.int32
            ),
        )
    return None


def recall_at_k(result_ids: np.ndarray, ground_truth: np.ndarray, k: int) -> float:
    """Mean recall@k (reference: ``AccuracyMetrics`` recall)."""
    hits = 0
    for row, gt in zip(result_ids[:, :k], ground_truth[:, :k]):
        hits += len(set(int(x) for x in row if x >= 0) & set(int(x) for x in gt))
    return hits / (result_ids.shape[0] * k)
