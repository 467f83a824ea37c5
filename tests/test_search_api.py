"""Searcher API parity tests: threshold, resume, exclude, refine, rescore
(reference: Test2DThreshold, testResume, rescore, improveConnections)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.graph.builder import refine_graph, rescore_graph
from jvector_tpu.graph.searcher import resume
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def built():
    ds = synthetic_dataset(n=1500, dim=24, n_queries=25, k=50, seed=101)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    return ds, cfg, graph, provider


def test_threshold_search(built):
    ds, cfg, graph, provider = built
    q = jnp.asarray(ds.queries)
    res_all = search(graph, provider, q, top_k=20, beam_width=60)
    thr = float(np.median(np.asarray(res_all.scores)))
    res_thr = search(graph, provider, q, top_k=20, beam_width=60, threshold=thr)
    ids = np.asarray(res_thr.ids)
    scores = np.asarray(res_thr.scores)
    assert (scores[ids >= 0] >= thr).all()
    # some results were filtered (the median cuts ~half)
    assert (ids < 0).sum() > 0


def test_resume_returns_fresh_results(built):
    ds, cfg, graph, provider = built
    q = jnp.asarray(ds.queries)
    first = search(graph, provider, q, top_k=10, beam_width=40)
    more = resume(graph, provider, q, first, top_k=10)
    a = np.asarray(first.ids)
    b = np.asarray(more.ids)
    for row_a, row_b in zip(a, b):
        assert not set(row_a.tolist()) & set(x for x in row_b.tolist() if x >= 0)
    # first + resumed ~ exact top-20
    combined = np.concatenate([a, b], axis=1)
    r = recall_at_k(combined, ds.ground_truth[:, :20], 20)
    assert r >= 0.9, f"resume combined recall {r}"


def test_true_resume_from_state(built):
    """State-carrying resume: no repeats, good combined recall, and the
    continuation costs less than the from-scratch wider re-search
    (reference ``GraphSearcher.resume():509-547`` evicted-state contract)."""
    ds, cfg, graph, provider = built
    q = jnp.asarray(ds.queries)
    first, state = search(
        graph, provider, q, top_k=10, beam_width=40, return_state=True
    )
    more = resume(graph, provider, q, first, top_k=10, state=state)
    a = np.asarray(first.ids)
    b = np.asarray(more.ids)
    for row_a, row_b in zip(a, b):
        assert not set(row_a.tolist()) & set(x for x in row_b.tolist() if x >= 0)
    combined = np.concatenate([a, b], axis=1)
    r = recall_at_k(combined, ds.ground_truth[:, :20], 20)
    assert r >= 0.9, f"true-resume combined recall {r}"
    # marginal cost: the continuation's extra expansions are fewer than a
    # fresh search at the resume beam width would pay
    fresh = search(graph, provider, q, top_k=10, beam_width=max(2 * 20, 100))
    marginal = np.asarray(more.expanded_count) - np.asarray(first.expanded_count)
    assert marginal.mean() < 0.5 * np.asarray(fresh.expanded_count).mean(), (
        marginal.mean(),
        np.asarray(fresh.expanded_count).mean(),
    )


def test_resume_pages_past_original_beam(built):
    """Paging beyond the original beam_width must re-open expansion: a
    quiescent state has every valid slot expanded, so without the frontier
    re-open the continuation terminates immediately and the widened slots
    stay -1/-inf (advisor round-2 finding)."""
    ds, cfg, graph, provider = built
    q = jnp.asarray(ds.queries)
    first, state = search(
        graph, provider, q, top_k=10, beam_width=12, return_state=True
    )
    # prev_k + top_k = 20 > the 12 valid beam slots: the old code returned
    # -1 ids here because no unexpanded capacity remained in the state.
    more = resume(graph, provider, q, first, top_k=10, state=state)
    b = np.asarray(more.ids)
    assert (b >= 0).all(), "continuation past the original beam returned holes"
    a = np.asarray(first.ids)
    for row_a, row_b in zip(a, b):
        assert not set(row_a.tolist()) & set(row_b.tolist())
    combined = np.concatenate([a, b], axis=1)
    r = recall_at_k(combined, ds.ground_truth[:, :20], 20)
    assert r >= 0.8, f"paged-past-beam combined recall {r}"


def test_refine_improves_or_holds_recall(built):
    ds, cfg, graph, provider = built
    q = jnp.asarray(ds.queries)
    base_r = recall_at_k(
        np.asarray(search(graph, provider, q, top_k=10, beam_width=20).ids),
        ds.ground_truth,
        10,
    )
    refined = refine_graph(graph, provider, jnp.asarray(ds.base), cfg, chunk=512)
    ref_r = recall_at_k(
        np.asarray(search(refined, provider, q, top_k=10, beam_width=20).ids),
        ds.ground_truth,
        10,
    )
    assert ref_r >= base_r - 0.01, f"refine hurt recall: {base_r} -> {ref_r}"
    counts = np.asarray(refined.base.counts)[:1500]
    assert counts.max() <= cfg.max_degree


def test_rescore_keeps_sets_resorts(built):
    ds, cfg, graph, provider = built
    rescored = rescore_graph(graph, provider, chunk=512)
    n = 1500
    old_n = np.asarray(graph.base.neighbors)[:n]
    new_n = np.asarray(rescored.base.neighbors)[:n]
    counts = np.asarray(graph.base.counts)[:n]
    for i in range(0, n, 97):
        c = counts[i]
        assert set(old_n[i][:c].tolist()) == set(new_n[i][:c].tolist())
    s = np.asarray(rescored.base.scores)[:n]
    for i in range(0, n, 97):
        c = counts[i]
        assert (np.diff(s[i][:c]) <= 1e-6).all()  # sorted desc


def test_expand_per_iter_recall_parity(built):
    ds, cfg, graph, provider = built
    q = jnp.asarray(ds.queries)
    r1 = recall_at_k(
        np.asarray(search(graph, provider, q, top_k=10, beam_width=40).ids),
        ds.ground_truth,
        10,
    )
    r4 = recall_at_k(
        np.asarray(
            search(graph, provider, q, top_k=10, beam_width=40, expand_per_iter=4).ids
        ),
        ds.ground_truth,
        10,
    )
    assert r4 >= r1 - 0.02, f"multi-expansion hurt recall: {r1} -> {r4}"


@pytest.mark.parametrize(
    "dim,sim,seed", [(24, "euclidean", 11), (48, "dot_product", 12)]
)
def test_threshold_patience_retention(dim, sim, seed):
    """Characterize the patience retirement (ScoreTracker analog) across
    corpora: with the default stop_patience, a threshold search must retain
    >=99% of the results an unlimited-patience search returns, while
    expanding measurably less."""
    from jvector_tpu.graph.searcher import search_layer

    ds = synthetic_dataset(n=2000, dim=dim, n_queries=40, k=20, sim=sim, seed=seed)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    q = jnp.asarray(ds.queries)
    base_res = search(graph, provider, q, top_k=20, beam_width=60)
    thr = float(np.quantile(np.asarray(base_res.scores), 0.5))

    qstate = provider.prepare(q)
    entries = jnp.broadcast_to(graph.entry_node[None], (40,)).astype(jnp.int32)

    def run(patience):
        return search_layer(
            graph.base.neighbors, provider, qstate, entries,
            beam_width=60, stop_threshold=thr, stop_patience=patience,
        )

    unlimited = run(10_000)
    default = run(32)

    def above(state):
        ids = np.asarray(state.ids)
        sc = np.asarray(state.scores)
        return [
            set(ids[i][(sc[i] >= thr) & (ids[i] >= 0)].tolist())
            for i in range(ids.shape[0])
        ]

    full, got = above(unlimited), above(default)
    total = sum(len(s) for s in full)
    kept = sum(len(f & g) for f, g in zip(full, got))
    retention = kept / max(total, 1)
    assert retention >= 0.99, f"retention {retention} at patience 32 ({sim}, d={dim})"
    saved = 1 - float(np.mean(np.asarray(default.expanded_count))) / float(
        np.mean(np.asarray(unlimited.expanded_count))
    )
    assert saved > 0.2, f"patience saved only {saved:.2%} expansions"


def test_entry_seeds_flat_graph(built):
    """Multi-seed flat serving (entry + strided ordinals) is recall-safe."""
    ds, cfg, graph, provider = built
    q = jnp.asarray(ds.queries)
    base = search(graph, provider, q, top_k=10, beam_width=40)
    multi = search(graph, provider, q, top_k=10, beam_width=40, entry_seeds=8)
    r0 = recall_at_k(np.asarray(base.ids), ds.ground_truth[:, :10], 10)
    r8 = recall_at_k(np.asarray(multi.ids), ds.ground_truth[:, :10], 10)
    assert r8 >= r0 - 0.02, (r8, r0)
    for row in np.asarray(multi.ids):
        live = [x for x in row.tolist() if x >= 0]
        assert len(live) == len(set(live))
