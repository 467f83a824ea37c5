"""LUT16 (4-bit PQ) kernel + provider tests.

Mirrors the reference's ``TestVectorizationProvider`` pattern: the Pallas
kernel (interpret mode on CPU) must match the jnp reference, which must
match the generic 8-bit ADC math on unpacked codes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jvector_tpu.ops.adc import adc_score, build_partial_sums
from jvector_tpu.ops.pallas.adc16_kernel import (
    adc16_pallas,
    adc16_ref,
    lut_pairs,
    pack_nibbles,
    unpack_nibbles,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(37, 24), dtype=np.uint8)
    packed = pack_nibbles(jnp.asarray(codes))
    assert packed.shape == (37, 12)
    out = unpack_nibbles(packed)
    np.testing.assert_array_equal(np.asarray(out), codes)


def test_adc16_ref_matches_generic_adc():
    rng = np.random.default_rng(1)
    q, c, m, k = 5, 9, 16, 16
    luts = jnp.asarray(rng.normal(size=(q, m, k)).astype(np.float32))
    codes = rng.integers(0, k, size=(q, c, m), dtype=np.uint8)
    expect = adc_score(luts, jnp.asarray(codes))  # [Q, C]

    packed = jax.vmap(pack_nibbles)(jnp.asarray(codes))  # [Q, C, MP]
    got = adc16_ref(lut_pairs(luts), packed.transpose(0, 2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_adc16_pallas_matches_ref():
    rng = np.random.default_rng(2)
    q, c, m, k = 12, 70, 32, 16
    luts = lut_pairs(jnp.asarray(rng.normal(size=(q, m, k)).astype(np.float32)))
    packed = jnp.asarray(
        rng.integers(0, 256, size=(q, m // 2, c), dtype=np.uint8)
    )
    expect = adc16_ref(luts, packed)
    got = adc16_pallas(luts, packed, query_block=8, cand_block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    n, d = 3000, 64
    centers = rng.normal(size=(20, d)).astype(np.float32) * 3
    base = (
        centers[rng.integers(0, 20, n)] + rng.normal(size=(n, d)).astype(np.float32)
    )
    queries = (
        centers[rng.integers(0, 20, 64)]
        + rng.normal(size=(64, d)).astype(np.float32)
    )
    return base, queries


def test_lut16_provider_end_to_end(corpus):
    """4-bit fused search + exact rerank reaches exact-search recall."""
    from jvector_tpu.graph import (
        ExactScoreProvider,
        GraphConfig,
        build_graph,
        search,
    )
    from jvector_tpu.graph.score import LUT16ScoreProvider, build_fused_codes_lut16
    from jvector_tpu.quantization import ProductQuantization
    from jvector_tpu.util.datasets import exact_ground_truth, recall_at_k

    base, queries = corpus
    gt = exact_ground_truth(base, queries, 10)
    graph, exact = build_graph(base, "euclidean", GraphConfig(max_degree=16))

    pq = ProductQuantization.compute(base, m=64, clusters=16)
    packed = pack_nibbles(pq.encode(base))
    pad = graph.capacity - packed.shape[0]
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((pad, packed.shape[1]), jnp.uint8)]
        )
    fused = build_fused_codes_lut16(graph.base.neighbors, packed)
    prov = LUT16ScoreProvider(
        codes_packed=packed,
        fused_packed=fused,
        codebooks=pq.codebooks,
        center=pq.center,
        sim="euclidean",
    )
    res = search(
        graph, prov, jnp.asarray(queries), top_k=10, beam_width=40, reranker=exact
    )
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    assert r >= 0.9, f"LUT16 fused recall {r}"

    # multi-expansion parity (E=4 uses the [Q, E] score_edges path)
    res4 = search(
        graph,
        prov,
        jnp.asarray(queries),
        top_k=10,
        beam_width=40,
        reranker=exact,
        expand_per_iter=4,
    )
    r4 = recall_at_k(np.asarray(res4.ids), gt, 10)
    assert r4 >= 0.9, f"LUT16 fused E=4 recall {r4}"


def test_lut16_provider_dot_and_cosine(corpus):
    """score() on arbitrary ids matches decode-based expectation closely."""
    from jvector_tpu.graph.score import LUT16ScoreProvider, build_fused_codes_lut16
    from jvector_tpu.ops.similarity import pairwise_scores
    from jvector_tpu.quantization import ProductQuantization

    base, queries = corpus
    base = base / np.linalg.norm(base, axis=1, keepdims=True)
    for sim in ("dot_product", "cosine"):
        pq = ProductQuantization.compute(base, m=32, clusters=16)
        packed = pack_nibbles(pq.encode(base))
        nbrs = jnp.broadcast_to(
            jnp.arange(16, dtype=jnp.int32)[None, :], (base.shape[0], 16)
        )
        fused = build_fused_codes_lut16(nbrs, packed)
        prov = LUT16ScoreProvider(
            codes_packed=packed,
            fused_packed=fused,
            codebooks=pq.codebooks,
            center=pq.center,
            sim=sim,
        )
        ids = jnp.asarray(
            np.random.default_rng(5).integers(0, base.shape[0], (8, 12)),
            jnp.int32,
        )
        qs = jnp.asarray(queries[:8])
        got = prov.score(prov.prepare(qs), ids)
        # the reference scores PQ dot/cosine in CENTERED space
        # (PQVectors.scoreFunctionFor:224-260): centered query vs centered
        # reconstruction, norms of the centered reconstruction
        dec_centered = jnp.asarray(
            pq.decode(pq.encode(base))
        ) - (pq.center if pq.center is not None else 0.0)
        q_centered = qs - (pq.center if pq.center is not None else 0.0)
        expect = jax.vmap(
            lambda q, i: pairwise_scores(q[None], dec_centered[i], sim)[0]
        )(q_centered, ids)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), rtol=2e-2, atol=2e-2
        )
        # score_edges agrees with score on the same ids
        edge = prov.score_edges(prov.prepare(qs), ids[:, 0])
        direct = prov.score(
            prov.prepare(qs), nbrs[jnp.maximum(ids[:, 0], 0)]
        )
        np.testing.assert_allclose(
            np.asarray(edge), np.asarray(direct), rtol=1e-5, atol=1e-6
        )
