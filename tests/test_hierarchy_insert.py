"""Incremental insert into a hierarchical index refreshes the upper levels."""

import numpy as np

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.graph.mutation import add_nodes
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


def test_add_nodes_refreshes_hierarchy():
    ds = synthetic_dataset(n=3000, dim=16, n_queries=25, k=10, seed=141)
    cfg = GraphConfig(
        max_degree=12, ef_construction=32, wave_size=128, add_hierarchy=True
    )
    g, p = build_graph(ds.base[:2000], ds.similarity, cfg)
    assert g.num_levels > 1
    old_top = np.asarray(g.level_node_ids[-1])

    g2, p2 = add_nodes(g, p, ds.base[2000:], cfg)
    assert g2.num_levels > 1
    # the refreshed hierarchy samples from the full ordinal range
    new_l1 = np.asarray(g2.level_node_ids[0])
    assert new_l1.max() >= 2000, "hierarchy did not see the new nodes"
    assert int(g2.num_nodes) == 3000

    res = search(g2, p2, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.93, f"post-insert hierarchical recall {r}"
