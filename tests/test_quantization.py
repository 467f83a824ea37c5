"""Quantization tests (reference: ``TestProductQuantization``,
``TestCompressedVectors``, ``TestBinaryQuantization``, ``TestReconstructionError``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.ops.similarity import SimilarityFunction, pairwise_scores
from jvector_tpu.quantization import (
    BinaryQuantization,
    NVQuantization,
    ProductQuantization,
    kmeans,
)
from jvector_tpu.util.datasets import synthetic_dataset

RNG = np.random.default_rng(123)


def clustered(n=4000, d=32, clusters=16, spread=0.15, seed=1):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(clusters, d)).astype(np.float32)
    return centers[rng.integers(0, clusters, n)] + rng.normal(
        0, spread, size=(n, d)
    ).astype(np.float32)


def test_kmeans_recovers_clusters():
    import jax

    data = clustered(n=2000, d=8, clusters=8, spread=0.05)
    cents = np.asarray(kmeans(jnp.asarray(data), 8, jax.random.PRNGKey(0), iters=10))
    # every point should be within a small distance of some centroid
    d2 = ((data[:, None] - cents[None]) ** 2).sum(-1).min(1)
    assert np.mean(d2) < 0.1


def test_pq_roundtrip_and_reconstruction():
    data = clustered(n=3000, d=32)
    pq = ProductQuantization.compute(data, m=8, clusters=64)
    codes = pq.encode(data)
    assert codes.shape == (3000, 8) and codes.dtype == jnp.uint8
    err = pq.reconstruction_error(data)
    # anisotropy-free PQ with 64 clusters on clustered data: decent MSE
    var = float(np.sum(np.var(data, axis=0)))
    assert err < 0.5 * var, f"reconstruction MSE {err} vs variance {var}"

    # refine should not make reconstruction worse
    pq2 = pq.refine(data, iters=4)
    assert pq2.reconstruction_error(data) <= err * 1.05


def test_pq_uneven_dim_padding():
    data = clustered(n=500, d=30)  # 30 not divisible by 8
    pq = ProductQuantization.compute(data, m=8, clusters=32)
    assert pq.padded_dim == 32
    dec = np.asarray(pq.decode(pq.encode(data)))
    assert dec.shape == (500, 30)


def test_pq_adc_scores_correlate_with_exact():
    data = clustered(n=2000, d=32)
    queries = clustered(n=8, d=32, seed=9)
    pq = ProductQuantization.compute(data, m=16, clusters=64)
    prov = pq.provider(pq.encode(data), SimilarityFunction.EUCLIDEAN)
    luts = prov.prepare(jnp.asarray(queries))
    ids = jnp.broadcast_to(jnp.arange(2000)[None], (8, 2000))
    approx = np.asarray(prov.score(luts, ids))
    exact = np.asarray(
        pairwise_scores(jnp.asarray(queries), jnp.asarray(data), "euclidean")
    )
    # rank correlation of top region: approx top-10 should be mostly in exact top-50
    for q in range(8):
        atop = set(np.argsort(-approx[q])[:10].tolist())
        etop = set(np.argsort(-exact[q])[:50].tolist())
        assert len(atop & etop) >= 8, f"query {q}: ADC ranking diverged"


def test_anisotropic_pq_trains_and_encodes():
    data = clustered(n=1500, d=16)
    pq = ProductQuantization.compute(
        data, m=4, clusters=32, anisotropic_threshold=0.2
    )
    codes = pq.encode(data)
    assert codes.shape == (1500, 4)
    # still a sane quantizer
    var = float(np.sum(np.var(data, axis=0)))
    assert pq.reconstruction_error(data) < var


def test_anisotropic_coordinate_descent_lowers_cost():
    """The per-vector code optimization must lower the anisotropic cost
    relative to assignment-only encoding (encodeAnisotropic:269-347)."""
    from jvector_tpu.quantization.kmeans import compute_parallel_cost_multiplier
    from jvector_tpu.quantization.pq import _pad_to, encode_anisotropic

    rng = np.random.default_rng(11)
    data = rng.normal(size=(2000, 32)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    thr = 0.2
    pq = ProductQuantization.compute(
        data, m=8, clusters=16, globally_center=False, anisotropic_threshold=thr
    )
    eta = float(compute_parallel_cost_multiplier(thr, 32))
    x = _pad_to(jnp.asarray(data), pq.padded_dim)

    def aniso_cost(codes):
        dec = np.asarray(pq.decode(codes))
        r = dec - data  # residual
        par = np.sum(r * data, axis=1) ** 2 / np.sum(data * data, axis=1)
        perp = np.sum(r * r, axis=1) - par
        return float(np.mean(eta * par + perp))

    cd_codes = encode_anisotropic(x, pq.codebooks, eta)
    # assignment-only baseline: plain L2 argmin (the descent's init state)
    sub = x.reshape(-1, pq.m, pq.subspace_dim)
    d2 = (
        jnp.sum(sub * sub, axis=2)[:, :, None]
        + jnp.sum(pq.codebooks**2, axis=2)[None]
        - 2 * jnp.einsum("nms,mks->nmk", sub, pq.codebooks)
    )
    init_codes = jnp.argmin(d2, axis=2).astype(jnp.uint8)
    assert aniso_cost(cd_codes) <= aniso_cost(init_codes)
    # and it must actually move some codes
    assert (np.asarray(cd_codes) != np.asarray(init_codes)).any()


def test_anisotropic_beats_plain_pq_recall_on_dot_product():
    """The reference's reason for anisotropic PQ (SCANN): better recall on
    MIPS corpora at equal code size (BASELINE config 3 proof test)."""
    from jvector_tpu.util.datasets import recall_at_k

    rng = np.random.default_rng(12)
    n, d, nq, k = 6000, 32, 200, 10
    centers = rng.normal(size=(30, d)).astype(np.float32)
    base = centers[rng.integers(0, 30, n)] + 0.35 * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    queries = centers[rng.integers(0, 30, nq)] + 0.35 * rng.normal(
        size=(nq, d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    gt = np.asarray(
        jnp.argsort(-jnp.asarray(queries) @ jnp.asarray(base).T, axis=1)[:, :k]
    )

    def pq_recall(thr, m, clusters):
        pq = ProductQuantization.compute(
            base, m=m, clusters=clusters, globally_center=False,
            anisotropic_threshold=thr,
        )
        prov = pq.provider(pq.encode(base), "dot_product")
        luts = prov.prepare(jnp.asarray(queries))
        allids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (nq, n))
        sc = prov.score(luts, allids)
        ids = jnp.argsort(-sc, axis=1)[:, :k]
        return recall_at_k(np.asarray(ids), gt, k)

    # both the 8-bit (K=256) and LUT16 (K=16) code shapes must benefit
    for m, clusters in ((8, 256), (16, 16)):
        plain = pq_recall(-1.0, m, clusters)
        aniso = pq_recall(0.3, m, clusters)
        assert aniso > plain + 0.01, (
            f"m={m} K={clusters}: anisotropic {aniso} <= plain {plain}"
        )


def test_bq_roundtrip_and_provider():
    data = clustered(n=800, d=64)
    bq = BinaryQuantization.compute(data)
    codes = bq.encode(data)
    assert codes.shape == (800, 2)
    prov = bq.provider(codes)
    q = jnp.asarray(data[:4])
    scores = np.asarray(prov.score(prov.prepare(q), jnp.arange(800)[None].repeat(4, 0)))
    # self-similarity must be the max for its own row
    for i in range(4):
        assert scores[i, i] == scores[i].max()


def test_nvq_reconstruction_beats_uniform():
    # skewed data where the nonlinear warp helps
    rng = np.random.default_rng(5)
    data = (rng.gamma(1.5, 1.0, size=(600, 32)) * rng.choice([-1, 1], size=(600, 32))).astype(
        np.float32
    )
    nvq = NVQuantization.compute(data, num_subvectors=2)
    enc = nvq.encode(data)
    dec = np.asarray(enc.dequantize(jnp.arange(600)))
    err = np.mean((dec - data) ** 2)
    # uniform 8-bit per subvector baseline
    x = data - np.asarray(nvq.mean)
    xs = x.reshape(600, 2, 16)
    lo, hi = xs.min(2, keepdims=True), xs.max(2, keepdims=True)
    t = (xs - lo) / np.maximum(hi - lo, 1e-12)
    uq = np.round(t * 255) / 255
    udec = (lo + uq * np.maximum(hi - lo, 1e-12)).reshape(600, 32) + np.asarray(nvq.mean)
    uerr = np.mean((udec - data) ** 2)
    assert err <= uerr * 1.01, f"nvq {err} vs uniform {uerr}"


def test_nvq_rerank_in_two_pass_search():
    """BQ first pass + NVQ rerank (BASELINE config 4 shape) on a small set."""
    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.util.datasets import recall_at_k

    ds = synthetic_dataset(n=1200, dim=32, n_queries=25, k=10, seed=17)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, exact_prov = build_graph(ds.base, ds.similarity, cfg)

    bq = BinaryQuantization.compute(ds.base)
    bq_prov = bq.provider(bq.encode(ds.base))
    nvq = NVQuantization.compute(ds.base)
    nvq_prov = nvq.encode(ds.base).provider(ds.similarity)

    res = search(
        graph,
        bq_prov,
        jnp.asarray(ds.queries),
        top_k=10,
        beam_width=60,
        rerank_k=60,
        reranker=nvq_prov,
    )
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.85, f"BQ+NVQ recall {r}"
    assert (np.asarray(res.reranked_count) > 0).all()


def test_pq_two_pass_search_recall():
    """PQ first pass + exact rerank (BASELINE config 2 shape)."""
    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.util.datasets import recall_at_k

    ds = synthetic_dataset(n=2000, dim=64, n_queries=30, k=10, seed=23)
    cfg = GraphConfig(max_degree=16, ef_construction=48, wave_size=128)
    graph, exact_prov = build_graph(ds.base, ds.similarity, cfg)

    pq = ProductQuantization.compute(ds.base, m=8, clusters=64)
    pq_prov = pq.provider(pq.encode(ds.base), ds.similarity)

    res = search(
        graph,
        pq_prov,
        jnp.asarray(ds.queries),
        top_k=10,
        beam_width=48,
        rerank_k=48,
        reranker=exact_prov,
    )
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.95, f"PQ+rerank recall {r}"
