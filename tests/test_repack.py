"""Two-phase repacked wave search (``repack_after``): the lockstep beam
loop finishes its convergence tail in a quarter-width sub-wave.

Contract: whenever the number of lanes still active at the cut fits the
sub-wave width, the repacked search is BIT-IDENTICAL to the plain one
(the sub-wave lanes evolve independently and the phase boundary only
changes when other lanes stop).  Truncated lanes degrade like a
``max_iters`` cutoff — results stay valid and sorted.
"""

import numpy as np

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.quantization import ScalarQuantization4
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset

Q = 256  # sub-wave width = max(32, Q // 4) = 64


def _safe_cut(expanded_count: np.ndarray, w2: int) -> int:
    """Smallest iteration cut where the active tail fits the sub-wave."""
    for cut in range(1, int(expanded_count.max()) + 1):
        if int((expanded_count > cut).sum()) <= w2 - 4:
            return cut
    return int(expanded_count.max())


def test_repack_bit_identical_when_tail_fits():
    ds = synthetic_dataset(n=4000, dim=32, n_queries=Q, k=10, seed=7)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    q = jnp.asarray(ds.queries)

    base = search(graph, provider, q, top_k=10, beam_width=16)
    cut = _safe_cut(np.asarray(base.expanded_count), w2=64)
    rep = search(graph, provider, q, top_k=10, beam_width=16, repack_after=cut)

    np.testing.assert_array_equal(np.asarray(base.ids), np.asarray(rep.ids))
    np.testing.assert_array_equal(
        np.asarray(base.scores), np.asarray(rep.scores)
    )
    np.testing.assert_array_equal(
        np.asarray(base.expanded_count), np.asarray(rep.expanded_count)
    )
    np.testing.assert_array_equal(
        np.asarray(base.visited_count), np.asarray(rep.visited_count)
    )


def test_repack_with_rerank_matches_flagship_path():
    """SQ4 first pass + exact rerank (the headline serving configuration)."""
    ds = synthetic_dataset(n=4000, dim=32, n_queries=Q, k=10, seed=11)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    graph, exact = build_graph(ds.base, ds.similarity, cfg)
    base_v = exact.vectors
    sq = ScalarQuantization4.compute(base_v[: graph.num_nodes])
    prov = sq.provider_for_graph(
        sq.encode(base_v), graph.base.neighbors, ds.similarity
    )
    q = jnp.asarray(ds.queries)

    plain = search(
        graph, prov, q, top_k=10, beam_width=20, rerank_k=20, reranker=exact
    )
    cut = _safe_cut(np.asarray(plain.expanded_count), w2=64)
    rep = search(
        graph, prov, q, top_k=10, beam_width=20, rerank_k=20, reranker=exact,
        repack_after=cut,
    )
    np.testing.assert_array_equal(np.asarray(plain.ids), np.asarray(rep.ids))
    np.testing.assert_array_equal(
        np.asarray(plain.scores), np.asarray(rep.scores)
    )


def test_repack_truncation_degrades_like_max_iters():
    """A cut deep inside the active phase truncates the overflow lanes
    exactly like a ``max_iters`` cutoff at the cut: results stay valid and
    sorted, and recall is bounded below by the all-lanes-cut search (the
    sub-wave lanes only ever IMPROVE on that floor)."""
    ds = synthetic_dataset(n=4000, dim=32, n_queries=Q, k=10, seed=13)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    q = jnp.asarray(ds.queries)

    cut_all = search(graph, provider, q, top_k=10, beam_width=16, max_iters=2)
    rep = search(graph, provider, q, top_k=10, beam_width=16, repack_after=2)

    ids = np.asarray(rep.ids)
    scores = np.asarray(rep.scores)
    assert (ids[:, 0] >= 0).all()
    d = np.diff(scores, axis=1)
    assert (d[np.isfinite(d)] <= 1e-6).all()  # sorted desc (ignore -inf pad)
    r_floor = recall_at_k(np.asarray(cut_all.ids), ds.ground_truth, 10)
    r_rep = recall_at_k(ids, ds.ground_truth, 10)
    assert r_rep >= r_floor


def test_repack_through_multi_index_stacked():
    """repack_after threads through multi_search's single-program stacked
    path (the repack gather/scatter runs under vmap over segments)."""
    from jvector_tpu.graph.multi import IndexShard, multi_search

    ds = synthetic_dataset(n=3000, dim=24, n_queries=128, k=10, seed=23)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    shards = []
    for a, b in [(0, 1000), (1000, 2000), (2000, 3000)]:
        g, p = build_graph(ds.base[a:b], ds.similarity, cfg)
        shards.append(IndexShard(graph=g, provider=p, id_offset=a))
    q = jnp.asarray(ds.queries)

    plain = multi_search(shards, q, top_k=10, beam_width=24, stacked=True)
    rep = multi_search(
        shards, q, top_k=10, beam_width=24, stacked=True, repack_after=30
    )
    r_plain = recall_at_k(np.asarray(plain.ids), ds.ground_truth, 10)
    r_rep = recall_at_k(np.asarray(rep.ids), ds.ground_truth, 10)
    assert r_rep >= r_plain - 0.01
    s = np.asarray(rep.scores)
    d = np.diff(s, axis=1)
    assert (d[np.isfinite(d)] <= 1e-6).all()
    assert np.asarray(rep.ids).max() < 3000


def test_build_repack_identical_at_generous_cut():
    """build_repack_after engages the two-phase wave search during
    construction; with a cut past every wave's convergence it is a pure
    plumbing no-op and the built graph is identical."""
    ds = synthetic_dataset(n=4000, dim=32, n_queries=64, k=10, seed=29)
    base_cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    rep_cfg = GraphConfig(
        max_degree=16, ef_construction=40, wave_size=256,
        build_repack_after=120,
    )
    g0, _ = build_graph(ds.base, ds.similarity, base_cfg)
    g1, p1 = build_graph(ds.base, ds.similarity, rep_cfg)
    np.testing.assert_array_equal(
        np.asarray(g0.base.neighbors), np.asarray(g1.base.neighbors)
    )

    # a tight cut truncates some wave lanes like max_build_iters: the graph
    # differs but serves at comparable recall
    tight_cfg = GraphConfig(
        max_degree=16, ef_construction=40, wave_size=256,
        build_repack_after=25,
    )
    g2, p2 = build_graph(ds.base, ds.similarity, tight_cfg)
    q = jnp.asarray(ds.queries)
    r1 = recall_at_k(
        np.asarray(search(g1, p1, q, top_k=10, beam_width=24).ids),
        ds.ground_truth, 10,
    )
    r2 = recall_at_k(
        np.asarray(search(g2, p2, q, top_k=10, beam_width=24).ids),
        ds.ground_truth, 10,
    )
    assert r2 >= r1 - 0.03


def test_repack_ignored_for_small_waves_and_filters():
    """Guard rails: tiny waves and filtered searches run the plain path."""
    ds = synthetic_dataset(n=2000, dim=24, n_queries=32, k=10, seed=17)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    q = jnp.asarray(ds.queries)  # Q=32 < 64 -> repack disabled

    base = search(graph, provider, q, top_k=10, beam_width=16)
    rep = search(graph, provider, q, top_k=10, beam_width=16, repack_after=3)
    np.testing.assert_array_equal(np.asarray(base.ids), np.asarray(rep.ids))

    accept = np.zeros(2000, dtype=bool)
    accept[::3] = True
    fa = search(
        graph, provider, jnp.asarray(ds.queries[:8]), top_k=5, beam_width=16,
        accept=jnp.asarray(accept), repack_after=3,
    )
    assert np.asarray(fa.ids).shape == (8, 5)
