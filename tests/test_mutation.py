"""Deletes / splice / incremental insert / hierarchy tests
(reference: ``TestDeletions``, ``TestConcurrentReadWriteDeletes``,
``TestVectorGraph`` hierarchy parametrization)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.graph.mutation import add_nodes, mark_deleted, remove_deleted
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def ds():
    # GT depth 50 so that recall can be measured after deleting victims
    return synthetic_dataset(n=1500, dim=24, n_queries=30, k=50, seed=61)


def filtered_recall(ids: np.ndarray, gt: np.ndarray, victims, k: int = 10) -> float:
    """recall@k against ground truth with the deleted victims removed."""
    total, hits = 0, 0
    for q in range(gt.shape[0]):
        want = gt[q][~np.isin(gt[q], victims)][:k]
        hits += len(set(ids[q].tolist()) & set(want.tolist()))
        total += len(want)
    return hits / max(total, 1)


@pytest.fixture(scope="module")
def built(ds):
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    return graph, provider, cfg


def test_deleted_filtered_from_results(built, ds):
    graph, provider, cfg = built
    res0 = search(graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    victims = np.unique(np.asarray(res0.ids)[:, 0])  # delete every top-1
    g2 = mark_deleted(graph, victims)
    res1 = search(g2, provider, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    ids1 = np.asarray(res1.ids)
    assert not np.isin(ids1, victims).any()
    r = filtered_recall(ids1, ds.ground_truth, victims)
    assert r >= 0.9, f"post-delete recall {r}"


def test_remove_deleted_splice(built, ds):
    graph, provider, cfg = built
    rng = np.random.default_rng(0)
    victims = rng.choice(1500, 150, replace=False)
    g2 = mark_deleted(graph, victims)
    g3 = remove_deleted(g2, provider, cfg, chunk=512)

    nbrs = np.asarray(g3.base.neighbors)
    counts = np.asarray(g3.base.counts)
    # no edges into deleted nodes anywhere; deleted rows empty
    live_edges = nbrs[nbrs >= 0]
    assert not np.isin(live_edges, victims).any()
    assert (counts[victims] == 0).all()
    # tombstones remain as hole markers (ordinal remap happens at save time)
    assert bool(np.asarray(g3.deleted)[victims].all())
    # entry is live
    assert int(g3.entry_node) not in set(victims.tolist())

    # search quality on the survivors
    res = search(g3, provider, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    ids = np.asarray(res.ids)
    assert not np.isin(ids, victims).any()
    r = filtered_recall(ids, ds.ground_truth, victims)
    assert r >= 0.9, f"post-splice recall {r}"


def test_accept_mask(built, ds):
    graph, provider, _ = built
    accept = jnp.zeros((graph.capacity,), bool).at[: 750].set(True)
    res = search(
        graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=60,
        accept=accept,
    )
    ids = np.asarray(res.ids)
    assert (ids[ids >= 0] < 750).all()


def test_incremental_insert(ds):
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    # build on first 1000, insert remaining 500
    g, p = build_graph(ds.base[:1000], ds.similarity, cfg)
    g2, p2 = add_nodes(g, p, ds.base[1000:], cfg)
    assert int(g2.num_nodes) == 1500
    res = search(g2, p2, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.9, f"post-insert recall {r}"


def test_hierarchy_build_and_search(ds):
    cfg = GraphConfig(
        max_degree=16, ef_construction=40, wave_size=128, add_hierarchy=True
    )
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    assert graph.num_levels >= 2
    # level sizes decay roughly geometrically
    sizes = [l.neighbors.shape[0] for l in graph.layers]
    assert sizes[1] < sizes[0] // 4
    res = search(graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.95, f"hierarchy recall {r}"


def test_hierarchy_persistence_roundtrip(tmp_path, ds):
    from jvector_tpu.disk import FeatureId, load_index, write_index
    from jvector_tpu.graph.score import ExactScoreProvider

    cfg = GraphConfig(
        max_degree=16, ef_construction=40, wave_size=128, add_hierarchy=True
    )
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    p = tmp_path / "h.jvtpu"
    write_index(p, graph, features={FeatureId.INLINE_VECTORS: {"vectors": ds.base}})
    g2, feats = load_index(p).to_device()
    assert g2.num_levels == graph.num_levels
    p2 = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"], sim=ds.similarity
    )
    r1 = search(graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    r2 = search(g2, p2, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))
