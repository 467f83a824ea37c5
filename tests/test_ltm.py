"""Larger-than-memory build tests (reference tutorial 3: siftDiskAnnLTM)."""

import numpy as np

import jax.numpy as jnp

from jvector_tpu.disk import FeatureId, load_index
from jvector_tpu.disk.ltm import build_on_disk_ltm
from jvector_tpu.graph import GraphConfig, search
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


def test_ltm_build_streams_and_searches(tmp_path):
    ds = synthetic_dataset(n=3000, dim=32, n_queries=30, k=10, seed=71)
    cfg = GraphConfig(max_degree=16, ef_construction=48, wave_size=256)

    calls = []

    def loader(a, b):
        calls.append((a, b))
        return ds.base[a:b]

    path = str(tmp_path / "ltm.jvtpu")
    graph, pq_provider = build_on_disk_ltm(
        path, loader, n=3000, dim=32, config=cfg, pq_m=8
    )
    # streaming: loader called in bounded chunks, never the whole corpus
    assert max(b - a for a, b in calls) <= 262_144
    assert int(graph.num_nodes) == 3000

    # search with the in-memory PQ working set + disk-resident rerank vectors
    odi = load_index(path)
    assert odi.meta["ltm"] is True
    g2, feats = odi.to_device()
    rerank = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"], sim=ds.similarity
    )
    res = search(
        g2,
        pq_provider,
        jnp.asarray(ds.queries),
        top_k=10,
        beam_width=60,
        rerank_k=60,
        reranker=rerank,
    )
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.9, f"LTM recall {r}"

    # the inline vectors on disk equal the source (streamed correctly)
    v = np.asarray(feats[FeatureId.INLINE_VECTORS]["vectors"])
    np.testing.assert_allclose(v, ds.base, rtol=1e-6)


def test_ltm_sq4_end_to_end_host_serving(tmp_path):
    """SQ4 LTM: stream-build on 4-bit codes, then serve the saved index with
    bounded device memory (HostGraphIndex + host rerank) — the full
    larger-than-memory pipeline (BASELINE config 5 at test scale)."""
    import jax.numpy as jnp

    from jvector_tpu.disk.host_graph import HostGraphIndex
    from jvector_tpu.disk.host_tier import HostVectorStore
    from jvector_tpu.disk.ltm import build_on_disk_ltm
    from jvector_tpu.graph import GraphConfig, search
    from jvector_tpu.util.datasets import (
        exact_ground_truth,
        recall_at_k,
        synthetic_dataset,
    )

    ds = synthetic_dataset(n=3000, dim=32, n_queries=50, k=10, seed=21)
    gt = exact_ground_truth(ds.base, ds.queries, 10)
    path = tmp_path / "ltm_sq4.jvtpu"

    calls = []

    def loader(a, b):
        calls.append((a, b))
        return ds.base[a:b]

    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    graph, provider = build_on_disk_ltm(
        path, loader, n=3000, dim=32, config=cfg, compression="sq4"
    )
    assert provider.supports_fused  # final provider carries fused tables
    assert len(calls) > 2  # actually streamed

    # in-HBM serve with the returned provider
    q = jnp.asarray(ds.queries)
    res = search(graph, provider, q, top_k=10, beam_width=40)
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    assert r >= 0.85, f"sq4-ltm in-HBM recall {r}"

    # bounded-memory serve straight off the file
    hg = HostGraphIndex.load(path)
    assert isinstance(hg.fused_packed, np.memmap)
    store = HostVectorStore.from_index_file(
        hg_reader(path), f"feature/inline_vectors/vectors", "euclidean"
    )
    res2 = hg.search(q, top_k=10, beam_width=40, expand=4, rerank=store)
    r2 = recall_at_k(np.asarray(res2.ids), gt, 10)
    assert r2 >= 0.9, f"sq4-ltm host-served recall {r2}"


def hg_reader(path):
    from jvector_tpu.disk.format import load_index

    return load_index(path).reader
