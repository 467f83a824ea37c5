"""SQ4 (4-bit scalar quantization) tests: algebraic-ADC exactness vs decoded
vectors, end-to-end fused search recall, all three similarities."""

import jax.numpy as jnp
import numpy as np
import pytest

from jvector_tpu.quantization import ScalarQuantization4
from jvector_tpu.quantization.sq import pack_nibble_rows, unpack_nibble_rows


def test_pack_roundtrip_and_decode_error():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(500, 48)).astype(np.float32)
    sq = ScalarQuantization4.compute(data)
    codes = sq.encode(data)
    assert codes.shape == (500, 24)
    k = unpack_nibble_rows(codes)
    assert int(k.max()) <= 15
    np.testing.assert_array_equal(
        np.asarray(pack_nibble_rows(k.astype(jnp.uint8))), np.asarray(codes)
    )
    # 4-bit/dim keeps most of the variance
    var = float(np.sum(np.var(data, axis=0)))
    assert sq.reconstruction_error(data) < 0.02 * var


@pytest.mark.parametrize("sim", ["euclidean", "dot_product", "cosine"])
def test_sq4_scores_match_decoded_exact(sim):
    """The factored arithmetic ADC must equal exact scoring of the decoded
    vectors (the identity is algebraic, not approximate)."""
    from jvector_tpu.graph.score import ExactScoreProvider

    rng = np.random.default_rng(1)
    n, d, q, c = 400, 32, 6, 20
    data = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    sq = ScalarQuantization4.compute(data)
    codes = sq.encode(data)
    nbrs = jnp.asarray(
        np.argsort(rng.random((n, c)), axis=1), jnp.int32
    ) % n
    prov = sq.provider_for_graph(codes, nbrs, sim)

    ids = jnp.asarray(rng.integers(0, n, (q, c)), jnp.int32)
    got = prov.score(prov.prepare(jnp.asarray(queries)), ids)
    exact = ExactScoreProvider(vectors=sq.decode(codes), sim=sim)
    expect = exact.score(exact.prepare(jnp.asarray(queries)), ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-5
    )

    # fused edge path agrees with score() on the same neighbor ids
    node_ids = ids[:, 0]
    edge = prov.score_edges(prov.prepare(jnp.asarray(queries)), node_ids)
    direct = prov.score(
        prov.prepare(jnp.asarray(queries)), nbrs[node_ids]
    )
    np.testing.assert_allclose(
        np.asarray(edge), np.asarray(direct), rtol=1e-5, atol=1e-6
    )


def test_sq4_fused_search_recall():
    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.util.datasets import exact_ground_truth, recall_at_k

    rng = np.random.default_rng(3)
    n, d = 3000, 64
    centers = rng.normal(size=(20, d)).astype(np.float32) * 3
    base = centers[rng.integers(0, 20, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    queries = centers[rng.integers(0, 20, 64)] + rng.normal(
        size=(64, d)
    ).astype(np.float32)
    gt = exact_ground_truth(base, queries, 10)
    graph, exact = build_graph(base, "euclidean", GraphConfig(max_degree=16))

    sq = ScalarQuantization4.compute(base)
    codes = sq.encode(base)
    pad = graph.capacity - codes.shape[0]
    if pad:
        codes = jnp.concatenate([codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)])
    prov = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")
    for e in (1, 4):
        res = search(
            graph,
            prov,
            jnp.asarray(queries),
            top_k=10,
            beam_width=40,
            reranker=exact,
            expand_per_iter=e,
        )
        r = recall_at_k(np.asarray(res.ids), gt, 10)
        assert r >= 0.95, f"SQ4 fused E={e} recall {r}"


def test_sq4_accelerated_build_recall():
    """build_compression='sq4' (fused code searches + exact prune) must
    match the exact build's recall."""
    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.util.datasets import exact_ground_truth, recall_at_k

    rng = np.random.default_rng(9)
    n, d = 3000, 64
    centers = rng.normal(size=(20, d)).astype(np.float32) * 3
    base = centers[rng.integers(0, 20, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    queries = centers[rng.integers(0, 20, 64)] + rng.normal(
        size=(64, d)
    ).astype(np.float32)
    gt = exact_ground_truth(base, queries, 10)

    recalls = {}
    for mode in ("sq4", None):
        cfg = GraphConfig(max_degree=16, build_compression=mode)
        graph, exact = build_graph(base, "euclidean", cfg)
        res = search(graph, exact, jnp.asarray(queries), top_k=10, beam_width=40)
        recalls[mode] = recall_at_k(np.asarray(res.ids), gt, 10)
    assert recalls["sq4"] >= recalls[None] - 0.02, recalls


def test_sq4_odd_dimension():
    """Odd dims pad to even; padded dims must encode to 0, not NaN."""
    rng = np.random.default_rng(5)
    data = rng.normal(size=(300, 33)).astype(np.float32)
    sq = ScalarQuantization4.compute(data)
    codes = sq.encode(data)
    assert codes.shape == (300, 17)
    k = unpack_nibble_rows(codes)
    assert int(k[:, -1].max()) == 0  # padded dim encodes to level 0
    dec = np.asarray(sq.decode(codes))
    assert dec.shape == (300, 33)
    assert np.isfinite(dec).all()
    err = np.mean(np.sum((dec - data) ** 2, axis=1))
    assert err < 0.02 * np.sum(np.var(data, axis=0))


def test_sq4_refreshed_after_mutation():
    """Fused tables are adjacency snapshots — refreshed_for() restores edge
    scoring after graph mutation (stale fused rows would mis-score)."""
    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.graph.mutation import add_nodes
    from jvector_tpu.quantization import ScalarQuantization4
    from jvector_tpu.util.datasets import exact_ground_truth, recall_at_k

    rng = np.random.default_rng(15)
    base = rng.normal(size=(2000, 32)).astype(np.float32)
    extra = rng.normal(size=(200, 32)).astype(np.float32)
    full = np.concatenate([base, extra])
    graph, exact = build_graph(full, "euclidean", GraphConfig(max_degree=16))
    # simulate "built on 2000, then 200 inserted": here just verify that a
    # provider refreshed against the CURRENT adjacency scores identically
    # to one built from scratch against it
    sq = ScalarQuantization4.compute(full)
    codes = sq.encode(full)
    pad = graph.capacity - codes.shape[0]
    if pad:
        codes = jnp.concatenate([codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)])
    fresh = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")
    stale = fresh.refreshed_for(graph.base.neighbors)  # no-op refresh
    qs = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    a = fresh.score_edges(fresh.prepare(qs), jnp.arange(8, dtype=jnp.int32))
    b = stale.score_edges(stale.prepare(qs), jnp.arange(8, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_sq4_anisotropic_encoding_improves_mips():
    """Anisotropic SQ4 (SCANN coordinate descent over scalar levels, reusing
    pq.encode_anisotropic via level_codebooks) must improve dot-product
    ranking fidelity on a normalized MIPS corpus vs plain rounding
    (BASELINE config 3 path; reference anisotropic PQ analog)."""
    import numpy as np

    from jvector_tpu.quantization import ScalarQuantization4

    rng = np.random.default_rng(3)
    x = rng.normal(size=(8000, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.normal(size=(128, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sq = ScalarQuantization4.compute(x)

    def fidelity(codes):
        dec = np.asarray(sq.decode(codes))
        true = q @ x.T
        approx = q @ dec.T
        t10 = np.argsort(-true, axis=1)[:, :10]
        a20 = np.argsort(-approx, axis=1)[:, :20]
        return np.mean(
            [len(set(t10[i]) & set(a20[i])) / 10 for i in range(q.shape[0])]
        )

    plain = fidelity(sq.encode(x))
    aniso = fidelity(sq.encode_anisotropic(x, threshold=0.2))
    assert aniso >= plain - 1e-6, (plain, aniso)
    # codes remain valid packed nibbles usable by every SQ4 surface
    codes = sq.encode_anisotropic(x[:256], threshold=0.2)
    assert codes.shape == sq.encode(x[:256]).shape


def test_incremental_fused_tables_match_adjacency():
    """The slot-patch incremental fused tables must equal a from-scratch
    rebuild from the final adjacency after every wave (the slot-alignment
    invariant the build searches rely on)."""
    import dataclasses

    import jax

    from jvector_tpu.graph import GraphConfig
    from jvector_tpu.graph.builder import (
        GraphIndexBuilder,
        _fused_aligned_config,
        _shuffled_wave_starts,
        _wave_search,
        _wave_update_fused,
    )
    from jvector_tpu.graph.index import bucket_capacity, empty_graph
    from jvector_tpu.graph.score import ExactScoreProvider, build_fused_sq4
    from jvector_tpu.ops.similarity import SimilarityFunction

    rng = np.random.default_rng(7)
    n, d = 700, 128
    base = rng.normal(size=(n, d)).astype(np.float32)
    cfg = _fused_aligned_config(
        GraphConfig(max_degree=16, wave_size=128, ef_construction=32),
        (d + 1) // 2,
    )
    assert (cfg.row_cap * ((d + 1) // 2)) % 1024 == 0  # rank-3 path active
    n_cap = bucket_capacity(n)
    vectors = jnp.asarray(base)
    builder = GraphIndexBuilder(cfg)
    bp0 = builder._sq4_build_provider(vectors, n_cap, SimilarityFunction.EUCLIDEAN)
    exact = ExactScoreProvider(
        vectors=jnp.concatenate(
            [vectors, jnp.zeros((n_cap - n, d), jnp.float32)]
        ),
        sim=SimilarityFunction.EUCLIDEAN,
    )
    graph = empty_graph(n_cap, cfg)
    mp = bp0.codes_packed.shape[1]
    k_row = cfg.row_cap * mp
    fused_packed = jnp.zeros((n_cap, k_row // 128, 128), jnp.uint8)
    fused_w2 = jnp.zeros((n_cap, cfg.row_cap), jnp.float32)
    const = bp0.node_w2
    for start in _shuffled_wave_starts(n, cfg.wave_size):
        ids = np.arange(start, start + cfg.wave_size, dtype=np.int32)
        ids = np.where(ids < n, ids, -1)
        ids_dev = jnp.asarray(ids)
        wv = vectors[jnp.minimum(jnp.maximum(ids_dev, 0), n - 1)]
        bp = dataclasses.replace(
            bp0, fused_packed=fused_packed, fused_w2=fused_w2
        )
        beam_ids, beam_scores = _wave_search(
            graph.base.neighbors, bp, graph.entry_node, ids_dev, wv, cfg
        )
        graph, fused_packed, fused_w2 = _wave_update_fused(
            graph, fused_packed, fused_w2, exact, bp0.codes_packed, const,
            ids_dev, wv, beam_ids, beam_scores, cfg,
        )
    # ground truth: rebuild from the final adjacency (count-masked rows)
    nbrs = np.asarray(graph.base.neighbors)
    counts = np.asarray(graph.base.counts)
    masked = np.where(np.arange(cfg.row_cap)[None, :] < counts[:, None], nbrs, -1)
    want_p, want_w2 = build_fused_sq4(
        jnp.asarray(masked), bp0.codes_packed, const
    )
    got_p = np.asarray(fused_packed).reshape(n_cap, k_row)
    np.testing.assert_array_equal(got_p, np.asarray(want_p))
    np.testing.assert_allclose(
        np.asarray(fused_w2), np.asarray(want_w2), rtol=1e-6
    )
