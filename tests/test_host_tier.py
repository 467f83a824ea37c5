"""Host-memory rerank tier tests (LTM serving: HBM holds only codes+graph)."""

import numpy as np

import jax.numpy as jnp

from jvector_tpu.disk import FeatureId, load_index
from jvector_tpu.disk.host_tier import HostVectorStore, search_with_host_rerank
from jvector_tpu.disk.ltm import build_on_disk_ltm
from jvector_tpu.graph import GraphConfig
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


def test_host_rerank_matches_device_rerank(tmp_path):
    ds = synthetic_dataset(n=3000, dim=32, n_queries=25, k=10, seed=131)
    cfg = GraphConfig(max_degree=16, ef_construction=48, wave_size=256)
    path = str(tmp_path / "ltm.jvtpu")
    graph, pq_provider = build_on_disk_ltm(
        path, ds.base, n=3000, dim=32, config=cfg, pq_m=8
    )

    # host tier memmapped straight off the index file — vectors never uploaded
    odi = load_index(path)
    store = HostVectorStore.from_index_file(
        odi.reader, f"feature/{FeatureId.INLINE_VECTORS}/vectors", ds.similarity
    )
    assert isinstance(store.vectors, np.memmap)

    res = search_with_host_rerank(
        graph, pq_provider, store, jnp.asarray(ds.queries),
        top_k=10, beam_width=60,
    )
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.9, f"host-tier recall {r}"
    assert (np.asarray(res.reranked_count) > 0).all()

    # equivalence vs on-device rerank of the same approximate results
    from jvector_tpu.graph import ExactScoreProvider, search

    dev = ExactScoreProvider(
        vectors=jnp.asarray(np.asarray(store.vectors)), sim=ds.similarity
    )
    res_dev = search(
        graph, pq_provider, jnp.asarray(ds.queries),
        top_k=10, beam_width=60, rerank_k=60, reranker=dev,
    )
    np.testing.assert_array_equal(np.asarray(res.ids), np.asarray(res_dev.ids))
