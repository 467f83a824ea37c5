"""Selective acceptOrds (filtered search) tests.

Reference: ``TestVectorGraph.testSearchWithSelectiveAcceptOrds`` and
``jvector-tests/.../TestLowCardinalityFiltering.java`` — the search must
keep expanding until topK ACCEPTED results are found, so low-cardinality
filters (1-5% selectivity) still return a full, high-recall result set.
A post-hoc beam filter fails these: a beam of B holds ~selectivity*B
accepted nodes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def built():
    ds = synthetic_dataset(n=4000, dim=32, n_queries=32, k=10, seed=7)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    return ds, graph, provider


def _filtered_gt(base, queries, mask, k):
    """Brute-force top-k among accepted rows only (euclidean)."""
    sub = np.where(mask)[0]
    d = (
        np.sum(queries**2, axis=1)[:, None]
        - 2.0 * queries @ base[sub].T
        + np.sum(base[sub] ** 2, axis=1)[None, :]
    )
    order = np.argsort(d, axis=1)[:, :k]
    return sub[order]


@pytest.mark.parametrize("selectivity", [0.05, 0.01])
def test_low_cardinality_filtering(built, selectivity):
    ds, graph, provider = built
    n = ds.base.shape[0]
    rng = np.random.default_rng(13)
    mask = np.zeros(n, bool)
    mask[rng.choice(n, max(int(n * selectivity), 20), replace=False)] = True
    k = 10
    gt = _filtered_gt(
        np.asarray(ds.base, np.float32), np.asarray(ds.queries, np.float32), mask, k
    )
    # accept_brute_cutoff=0 forces the IN-LOOP graph path (the default
    # would brute-force these low-cardinality sets, see the skewed test)
    res = search(
        graph,
        provider,
        jnp.asarray(ds.queries),
        top_k=k,
        beam_width=40,
        accept=jnp.asarray(mask),
        accept_brute_cutoff=0,
    )
    ids = np.asarray(res.ids)
    # full result set: every query finds k accepted results (no -1 holes)
    assert (ids >= 0).all(), f"holes at selectivity {selectivity}: {ids}"
    assert mask[ids].all(), "returned a non-accepted node"
    r = recall_at_k(ids, gt, k)
    assert r >= 0.9, f"filtered recall {r} at selectivity {selectivity}"


def test_filtered_search_with_rerank(built):
    """Two-pass filtered search: compressed first pass + exact rerank."""
    from jvector_tpu.quantization import ScalarQuantization4

    ds, graph, provider = built
    n = ds.base.shape[0]
    rng = np.random.default_rng(29)
    mask = np.zeros(n, bool)
    mask[rng.choice(n, n // 20, replace=False)] = True
    k = 10
    gt = _filtered_gt(
        np.asarray(ds.base, np.float32), np.asarray(ds.queries, np.float32), mask, k
    )
    sq = ScalarQuantization4.compute(ds.base)
    codes = sq.encode(ds.base)
    pad = graph.capacity - codes.shape[0]
    codes = jnp.concatenate([codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)])
    sq4 = sq.provider_for_graph(codes, graph.base.neighbors, ds.similarity)
    res = search(
        graph,
        sq4,
        jnp.asarray(ds.queries),
        top_k=k,
        beam_width=40,
        rerank_k=40,
        reranker=provider,
        accept=jnp.asarray(mask),
        accept_brute_cutoff=0,  # force the in-loop graph path
    )
    ids = np.asarray(res.ids)
    assert (ids >= 0).all()
    assert mask[ids].all()
    r = recall_at_k(ids, gt, k)
    assert r >= 0.9, f"filtered+rerank recall {r}"

    # default cutoff: the same low-cardinality search brute-forces the
    # accepted set exactly — results must be at least as good
    res_b = search(
        graph, sq4, jnp.asarray(ds.queries), top_k=k, beam_width=40,
        rerank_k=40, reranker=provider, accept=jnp.asarray(mask),
    )
    rb = recall_at_k(np.asarray(res_b.ids), gt, k)
    assert rb >= r - 1e-9, f"brute path {rb} worse than graph path {r}"
    assert int(np.asarray(res_b.expanded_count).sum()) == 0  # no traversal


def test_accept_all_matches_unfiltered(built):
    """An all-true mask must not change results materially."""
    ds, graph, provider = built
    q = jnp.asarray(ds.queries)
    plain = search(graph, provider, q, top_k=10, beam_width=40)
    acc = search(
        graph,
        provider,
        q,
        top_k=10,
        beam_width=40,
        accept=jnp.ones(graph.capacity, bool),
    )
    r = recall_at_k(np.asarray(acc.ids), np.asarray(plain.ids), 10)
    assert r >= 0.95, f"accept-all diverged from unfiltered: {r}"


def test_deleted_nodes_excluded_in_filtered_results(built):
    ds, graph, provider = built
    from jvector_tpu.graph.mutation import mark_deleted

    q = jnp.asarray(ds.queries)
    base_res = search(graph, provider, q, top_k=5, beam_width=30)
    victims = np.unique(np.asarray(base_res.ids)[:, 0])
    g2 = mark_deleted(graph, jnp.asarray(victims, jnp.int32))
    mask = np.ones(graph.capacity, bool)
    res = search(g2, provider, q, top_k=5, beam_width=30, accept=jnp.asarray(mask))
    ids = np.asarray(res.ids)
    assert not np.isin(ids, victims).any()


def test_skewed_accept_ords():
    """Accept mask concentrated in ONE cluster (reference
    ``testSearchWithSkewedAcceptOrds``): the beam must traverse
    non-accepted regions to reach the accepted island."""
    rng = np.random.default_rng(41)
    n_clusters, per, d = 20, 200, 32
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 6
    base = np.concatenate(
        [c + rng.normal(size=(per, d)).astype(np.float32) for c in centers]
    )
    n = base.shape[0]
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, provider = build_graph(base, "euclidean", cfg)

    # accept ONLY cluster 7; query from every other cluster's direction
    mask = np.zeros(n, bool)
    mask[7 * per : 8 * per] = True
    queries = centers[[1, 4, 11, 15]] + rng.normal(size=(4, d)).astype(np.float32)
    k = 10
    gt = _filtered_gt(base, queries.astype(np.float32), mask, k)

    res = search(
        graph, provider, jnp.asarray(queries), top_k=k, beam_width=40,
        accept=jnp.asarray(mask),
    )
    ids = np.asarray(res.ids)
    assert (ids >= 0).all(), "skewed filter produced holes"
    assert mask[ids].all()
    r = recall_at_k(ids, gt, k)
    assert r >= 0.9, f"skewed-accept recall {r}"


def test_filtered_escalation_stops_when_results_cannot_improve(monkeypatch):
    """Legitimately missing results (here: a threshold that drops nearly
    everything) must NOT drive the beam-escalation loop to the cap on every
    call — widening only continues while it finds MORE results."""
    import jvector_tpu.graph.searcher as S

    ds = synthetic_dataset(n=2048, dim=16, n_queries=8, k=10, seed=11)
    cfg = GraphConfig(max_degree=16, ef_construction=32, wave_size=256)
    graph, provider = build_graph(np.asarray(ds.base), "euclidean", cfg)
    rng = np.random.default_rng(0)
    mask = np.zeros(2048, bool)
    # > the brute cutoff (max(4*beam, 512)) so the traversal path runs
    mask[rng.choice(2048, 700, replace=False)] = True

    calls: list[int] = []
    orig = S._search_jit

    def counting(*a, **k):
        calls.append(k.get("beam_width"))
        return orig(*a, **k)

    monkeypatch.setattr(S, "_search_jit", counting)
    res = S.search(
        graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=16,
        accept=jnp.asarray(mask), threshold=0.9999,
    )
    # everything threshold-dropped: one search + two no-better retries
    # (plateau-then-jump geometries get a second widening before the loop
    # gives up), not a doubling ladder up to the 1024 cap
    assert len(calls) == 3, f"escalation ladder ran {calls}"
    assert (np.asarray(res.ids) == -1).all()
