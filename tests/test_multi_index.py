"""Multi-index scatter-gather tests (the Astra/Cassandra usage pattern the
reference supports via rerankFloor/resume, ``GraphSearcher.java:386-404``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph
from jvector_tpu.graph.multi import IndexShard, multi_search
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset(n=2000, dim=24, n_queries=30, k=10, seed=91)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    shards = []
    for a, b in [(0, 700), (700, 1400), (1400, 2000)]:
        g, p = build_graph(ds.base[a:b], ds.similarity, cfg)
        shards.append(IndexShard(graph=g, provider=p, id_offset=a))
    return ds, shards


def test_multi_search_recall(setup):
    ds, shards = setup
    res = multi_search(shards, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.95, f"multi-index recall {r}"
    # scores sorted desc, global ids valid
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    assert np.asarray(res.ids).max() < 2000


def test_rerank_floor_skips_work(setup):
    from jvector_tpu.graph.score import ExactScoreProvider
    from jvector_tpu.quantization import ProductQuantization

    ds, _ = setup
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    shards = []
    for a, b in [(0, 700), (700, 1400), (1400, 2000)]:
        g, p = build_graph(ds.base[a:b], ds.similarity, cfg)
        pq = ProductQuantization.compute(ds.base[a:b], m=6, clusters=64)
        pq_prov = pq.provider(pq.encode(ds.base[a:b]), ds.similarity)
        shards.append(
            IndexShard(graph=g, provider=pq_prov, reranker=p, id_offset=a)
        )
    with_floor = multi_search(
        shards, jnp.asarray(ds.queries), top_k=10, beam_width=40,
        use_rerank_floor=True,
    )
    without = multi_search(
        shards, jnp.asarray(ds.queries), top_k=10, beam_width=40,
        use_rerank_floor=False,
    )
    # the floor skips exact scoring without costing recall
    assert int(np.sum(np.asarray(with_floor.reranked_count))) <= int(
        np.sum(np.asarray(without.reranked_count))
    )
    r_f = recall_at_k(np.asarray(with_floor.ids), ds.ground_truth, 10)
    r_n = recall_at_k(np.asarray(without.ids), ds.ground_truth, 10)
    assert r_f >= r_n - 0.02
