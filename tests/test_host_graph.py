"""Bounded-memory graph serving: adjacency + codes memmapped on host,
streamed per-iteration; recall parity with the in-HBM searcher and a
device-working-set bound far below the full graph footprint."""

import jax.numpy as jnp
import numpy as np
import pytest

from jvector_tpu.disk.host_graph import HostGraphIndex, write_sq4_index
from jvector_tpu.disk.host_tier import HostVectorStore
from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.quantization import ScalarQuantization4
from jvector_tpu.util.datasets import exact_ground_truth, recall_at_k


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    rng = np.random.default_rng(5)
    n, d = 4000, 64
    centers = rng.normal(size=(24, d)).astype(np.float32) * 3
    base = centers[rng.integers(0, 24, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    queries = centers[rng.integers(0, 24, 100)] + rng.normal(
        size=(100, d)
    ).astype(np.float32)
    gt = exact_ground_truth(base, queries, 10)
    graph, exact = build_graph(base, "euclidean", GraphConfig(max_degree=16))

    sq = ScalarQuantization4.compute(base)
    codes = sq.encode(base)
    pad = graph.capacity - codes.shape[0]
    codes = jnp.concatenate([codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)])
    prov = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")

    path = tmp_path_factory.mktemp("hg") / "host.jvtpu"
    write_sq4_index(
        path, graph, sq, codes, prov, "euclidean",
        inline_vectors={"vectors": base},
    )
    return path, base, queries, gt, graph, prov, exact


def test_host_graph_recall_parity(saved):
    path, base, queries, gt, graph, prov, exact = saved
    hg = HostGraphIndex.load(path)
    assert isinstance(hg.neighbors, np.memmap)  # big arrays NOT on device
    assert isinstance(hg.fused_packed, np.memmap)

    store = HostVectorStore(vectors=base, sim="euclidean")
    res = hg.search(jnp.asarray(queries), top_k=10, beam_width=40, expand=4,
                    rerank=store)
    r_host = recall_at_k(np.asarray(res.ids), gt, 10)

    res_dev = search(
        graph, prov, jnp.asarray(queries), top_k=10, beam_width=40,
        reranker=exact, expand_per_iter=4,
    )
    r_dev = recall_at_k(np.asarray(res_dev.ids), gt, 10)
    assert r_host >= r_dev - 0.02, f"host-tier {r_host} vs in-HBM {r_dev}"
    assert r_host >= 0.93


def test_host_graph_device_working_set_is_bounded(saved):
    path, base, queries, gt, graph, prov, exact = saved
    hg = HostGraphIndex.load(path)
    full = (
        hg.neighbors.size * 4
        + hg.fused_packed.size
        + hg.fused_w2.size * 4
    )
    budget = hg.hbm_bytes(n_queries=100, beam_width=40, expand=4)
    # the device working set must be a small fraction of the graph arrays
    assert budget < full / 4, (budget, full)


def test_host_graph_approx_only_and_counters(saved):
    path, base, queries, gt, graph, prov, exact = saved
    hg = HostGraphIndex.load(path)
    res = hg.search(jnp.asarray(queries[:16]), top_k=10, beam_width=32, expand=2)
    assert res.ids.shape == (16, 10)
    assert int(jnp.min(res.visited_count)) >= 1
    assert int(jnp.min(res.expanded_count)) >= 1
    # no duplicate results within a row
    for row in np.asarray(res.ids):
        live = [x for x in row.tolist() if x >= 0]
        assert len(live) == len(set(live))


def test_host_graph_default_two_pass_rerank(saved):
    """Inline vectors in the file wire a default HostVectorStore: serving is
    two-pass unless rerank=False (regression: single-pass SQ4 serving was
    silently recall-capped ~0.79 at 100k where two-pass hits 0.986)."""
    path, base, queries, gt, graph, prov, exact = saved
    hg = HostGraphIndex.load(path)
    assert hg.rerank_store is not None

    res = hg.search(jnp.asarray(queries), top_k=10, beam_width=40, expand=4)
    r_two = recall_at_k(np.asarray(res.ids), gt, 10)
    res1 = hg.search(
        jnp.asarray(queries), top_k=10, beam_width=40, expand=4, rerank=False
    )
    r_one = recall_at_k(np.asarray(res1.ids), gt, 10)
    assert r_two >= 0.93
    assert r_two >= r_one - 1e-9  # rerank never loses recall
    assert int(jnp.max(res.reranked_count)) > 0
    assert int(jnp.max(res1.reranked_count)) == 0


def _filtered_gt(base, queries, mask, k):
    sub = np.where(mask)[0]
    d = (
        np.sum(queries**2, axis=1)[:, None]
        - 2.0 * queries @ base[sub].T
        + np.sum(base[sub] ** 2, axis=1)[None, :]
    )
    return sub[np.argsort(d, axis=1)[:, :k]]


@pytest.mark.parametrize("selectivity", [0.05, 0.01])
def test_host_graph_low_cardinality_filtering(saved, selectivity):
    """Host-tier in-loop acceptOrds: a 1-5% filter still returns a FULL
    high-recall result set (reference TestLowCardinalityFiltering over the
    on-disk index)."""
    path, base, queries, gt, graph, prov, exact = saved
    n = base.shape[0]
    rng = np.random.default_rng(17)
    mask = np.zeros(n, bool)
    mask[rng.choice(n, max(int(n * selectivity), 20), replace=False)] = True
    k = 10
    fgt = _filtered_gt(base, queries, mask, k)

    hg = HostGraphIndex.load(path)
    # cutoff=0 forces the streamed in-loop graph path (default would
    # brute-force these small accepted sets — covered separately below)
    res = hg.search(
        jnp.asarray(queries), top_k=k, beam_width=40, expand=4,
        max_iters=400, accept=mask, accept_brute_cutoff=0,
    )
    ids = np.asarray(res.ids)
    assert (ids >= 0).all(), f"holes at selectivity {selectivity}"
    assert mask[ids].all(), "returned a non-accepted node"
    r = recall_at_k(ids, fgt, k)
    assert r >= 0.9, f"host-tier filtered recall {r} at {selectivity}"

    # default cutoff: same search brute-forces the accepted set exactly
    res_b = hg.search(
        jnp.asarray(queries), top_k=k, beam_width=40, expand=4, accept=mask,
    )
    rb = recall_at_k(np.asarray(res_b.ids), fgt, k)
    assert rb >= r - 1e-9
    assert int(np.asarray(res_b.expanded_count).sum()) == 0  # no traversal"


def test_host_graph_threshold_search(saved):
    """Threshold-search result contract on the host tier (reference:
    GraphSearcher.search with threshold — results below the similarity
    threshold are dropped)."""
    path, base, queries, gt, graph, prov, exact = saved
    hg = HostGraphIndex.load(path)
    store = HostVectorStore(vectors=base, sim="euclidean")
    free = hg.search(jnp.asarray(queries), top_k=10, beam_width=40, expand=4,
                     rerank=store)
    thr = float(np.median(np.asarray(free.scores)))
    res = hg.search(jnp.asarray(queries), top_k=10, beam_width=40, expand=4,
                    rerank=store, threshold=thr)
    ids, scores = np.asarray(res.ids), np.asarray(res.scores)
    assert (scores[ids >= 0] >= thr).all()
    assert (ids == -1).any()  # the median threshold must drop something
    # surviving results match the unthresholded ones
    fids = np.asarray(free.ids)
    keep = np.asarray(free.scores) >= thr
    np.testing.assert_array_equal(np.where(keep, fids, -1), ids)
