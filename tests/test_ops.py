"""Kernel-vs-reference tests (the pattern of the reference's
``TestVectorizationProvider``: every optimized kernel is compared against a
plain scalar/numpy implementation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.ops import (
    SimilarityFunction,
    adc_score,
    bq_similarity,
    build_partial_sums,
    hamming_distance,
    l2_normalize,
    pack_bits,
    pairwise_raw,
    pairwise_scores,
)
from jvector_tpu.ops.adc import adc_score_shared, adc_score_onehot

RNG = np.random.default_rng(42)


def np_scores(q, b, sim):
    if sim == SimilarityFunction.DOT_PRODUCT:
        return (1.0 + q @ b.T) / 2.0
    if sim == SimilarityFunction.COSINE:
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        return (1.0 + qn @ bn.T) / 2.0
    d2 = ((q[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return 1.0 / (1.0 + d2)


@pytest.mark.parametrize("sim", list(SimilarityFunction))
def test_pairwise_scores_match_numpy(sim):
    q = RNG.normal(size=(7, 48)).astype(np.float32)
    b = RNG.normal(size=(13, 48)).astype(np.float32)
    got = np.asarray(pairwise_scores(jnp.asarray(q), jnp.asarray(b), sim))
    want = np_scores(q, b, sim)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_l2_normalize():
    v = RNG.normal(size=(5, 16)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("sim", [SimilarityFunction.EUCLIDEAN, SimilarityFunction.DOT_PRODUCT])
def test_adc_roundtrip_scores(sim):
    """LUT-gather ADC == direct measure computed on decoded vectors."""
    M, K, S = 4, 16, 8
    D = M * S
    codebooks = RNG.normal(size=(M, K, S)).astype(np.float32)
    codes = RNG.integers(0, K, size=(9, M)).astype(np.int32)  # 9 candidates
    queries = RNG.normal(size=(3, D)).astype(np.float32)

    decoded = np.concatenate(
        [codebooks[m, codes[:, m]] for m in range(M)], axis=1
    )  # [9, D]
    raw_want = np.asarray(pairwise_raw(jnp.asarray(queries), jnp.asarray(decoded), sim))

    luts = build_partial_sums(jnp.asarray(queries), jnp.asarray(codebooks), sim)
    assert luts.shape == (3, M, K)

    got_shared = np.asarray(adc_score_shared(luts, jnp.asarray(codes)))
    np.testing.assert_allclose(got_shared, raw_want, rtol=1e-4, atol=1e-4)

    per_query_codes = jnp.broadcast_to(jnp.asarray(codes)[None], (3, 9, M))
    got = np.asarray(adc_score(luts, per_query_codes))
    np.testing.assert_allclose(got, raw_want, rtol=1e-4, atol=1e-4)

    onehot = np.zeros((9, M, K), np.float32)
    for c in range(9):
        for m in range(M):
            onehot[c, m, codes[c, m]] = 1.0
    got_oh = np.asarray(adc_score_onehot(luts, jnp.asarray(onehot)))
    np.testing.assert_allclose(got_oh, raw_want, rtol=1e-4, atol=1e-4)


def test_pack_bits_and_hamming():
    v = RNG.normal(size=(6, 70)).astype(np.float32)  # deliberately not /32
    packed = np.asarray(pack_bits(jnp.asarray(v)))
    assert packed.shape == (6, 3)
    bits = (v > 0).astype(np.int32)
    for i in range(6):
        for j in range(6):
            want = int((bits[i] != bits[j]).sum())
            got = int(hamming_distance(jnp.asarray(packed[i]), jnp.asarray(packed[j])))
            assert got == want

    sims = np.asarray(bq_similarity(jnp.asarray(packed), jnp.asarray(packed), dim=70))
    np.testing.assert_allclose(np.diag(sims), 1.0)
    assert sims.shape == (6, 6)


def test_fvecs_roundtrip(tmp_path):
    from jvector_tpu.util.io import read_fvecs, read_ivecs, write_fvecs, write_ivecs

    v = RNG.normal(size=(11, 9)).astype(np.float32)
    p = tmp_path / "x.fvecs"
    write_fvecs(p, v)
    np.testing.assert_array_equal(read_fvecs(p), v)
    np.testing.assert_array_equal(read_fvecs(p, max_vectors=4), v[:4])

    iv = RNG.integers(0, 1000, size=(5, 10)).astype(np.int32)
    ip = tmp_path / "x.ivecs"
    write_ivecs(ip, iv)
    np.testing.assert_array_equal(read_ivecs(ip), iv)


def test_reference_siftsmall_queries_parse():
    """The repo bundles query fvecs + GT ivecs — validate our reader on them."""
    import os

    qp = "/root/reference/siftsmall/siftsmall_query.fvecs"
    if not os.path.exists(qp):
        pytest.skip("reference siftsmall not mounted")
    from jvector_tpu.util.io import read_fvecs, read_ivecs

    q = read_fvecs(qp)
    assert q.shape == (100, 128)
    gt = read_ivecs("/root/reference/siftsmall/siftsmall_groundtruth.ivecs")
    assert gt.shape == (100, 100)
    assert gt.min() >= 0 and gt.max() < 10_000
