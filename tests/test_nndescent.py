"""NN-descent bulk builder tests."""

import numpy as np

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, search
from jvector_tpu.graph.nndescent import nn_descent_build
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


def test_nn_descent_build_and_search():
    ds = synthetic_dataset(n=4000, dim=24, n_queries=40, k=10, seed=77)
    cfg = GraphConfig(max_degree=16, ef_construction=48)
    graph, provider = nn_descent_build(
        ds.base, ds.similarity, cfg, rounds=6, chunk=2048
    )
    assert int(graph.num_nodes) == 4000
    counts = np.asarray(graph.base.counts)[:4000]
    assert counts.max() <= cfg.max_degree
    assert (counts > 0).all()
    res = search(graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=48)
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.85, f"nn-descent recall {r}"


def test_nn_descent_rows_valid():
    ds = synthetic_dataset(n=1500, dim=16, n_queries=10, k=5, seed=78)
    cfg = GraphConfig(max_degree=12, ef_construction=32)
    graph, _ = nn_descent_build(ds.base, ds.similarity, cfg, rounds=5, chunk=1024)
    nbrs = np.asarray(graph.base.neighbors)[:1500]
    counts = np.asarray(graph.base.counts)[:1500]
    for i in range(0, 1500, 113):
        row = nbrs[i][: counts[i]]
        assert (row >= 0).all() and (row < 1500).all()
        assert i not in row
        assert len(set(row.tolist())) == len(row)  # cleanup deduped
