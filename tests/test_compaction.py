"""Compaction tests (reference: ``TestOnDiskGraphIndexCompactor`` — recall of
the merged index vs a from-scratch build on the union)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.disk import CompactionSource, compact_indexes
from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.graph.mutation import mark_deleted
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset(n=2400, dim=24, n_queries=30, k=10, seed=83)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    # three segments (uneven split, like Fibonacci partitions in the ref bench)
    splits = [(0, 1000), (1000, 1800), (1800, 2400)]
    sources = []
    for a, b in splits:
        g, _ = build_graph(ds.base[a:b], ds.similarity, cfg)
        sources.append(CompactionSource(graph=g, vectors=jnp.asarray(ds.base[a:b])))
    return ds, cfg, sources, splits


def test_compaction_recall_vs_scratch(setup):
    ds, cfg, sources, splits = setup
    merged, provider, mappers = compact_indexes(sources, cfg, ds.similarity)
    assert int(merged.num_nodes) == 2400

    # mappers are offset maps over live ids
    for (a, b), m in zip(splits, mappers):
        assert m.shape[0] == b - a
        assert (np.sort(m[m >= 0]) == np.arange(len(m[m >= 0])) + m[m >= 0].min()).all()

    res = search(merged, provider, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    # remap GT: new id of old global id = mapper[src][local]
    new_of_old = np.full(2400, -1, np.int32)
    for (a, b), m in zip(splits, mappers):
        new_of_old[a:b] = m
    gt_new = new_of_old[ds.ground_truth[:, :10]]
    r = recall_at_k(np.asarray(res.ids), gt_new, 10)

    scratch, sp = build_graph(ds.base, ds.similarity, cfg)
    res_s = search(scratch, sp, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    r_scratch = recall_at_k(np.asarray(res_s.ids), ds.ground_truth, 10)

    # reference finding (docs/compaction.md): compacted recall is within a
    # few points of from-scratch, sometimes better
    assert r >= r_scratch - 0.05, f"compacted {r} vs scratch {r_scratch}"


def test_compaction_drops_deleted(setup):
    ds, cfg, sources, splits = setup
    # tombstone 100 nodes in source 0 before compaction
    victims_local = np.arange(0, 100, dtype=np.int32)
    s0 = sources[0]
    s0_del = CompactionSource(
        graph=mark_deleted(s0.graph, victims_local), vectors=s0.vectors
    )
    merged, provider, mappers = compact_indexes(
        [s0_del] + sources[1:], cfg, ds.similarity
    )
    assert int(merged.num_nodes) == 2400 - 100
    assert (mappers[0][:100] == -1).all()
    res = search(merged, provider, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    assert (np.asarray(res.ids) < 2300).all()


def test_pq_sidecar_compaction_bounded_memory(setup):
    """PQ-mode compaction: host numpy sources, retrained sidecar, all graph
    scoring on codes; recall (with exact rerank) within a few points of the
    exact-mode merge (reference sidecar strategy + PQRetrainer)."""
    from jvector_tpu.graph import ExactScoreProvider
    from jvector_tpu.graph.score import ADCScoreProvider
    from jvector_tpu.quantization import ProductQuantization

    ds, cfg, sources, splits = setup
    # sources hold HOST vectors (the bounded-memory contract)
    host_sources = [
        CompactionSource(graph=s.graph, vectors=np.asarray(s.vectors))
        for s in sources
    ]
    base_pq = ProductQuantization.compute(
        np.asarray(ds.base[: splits[0][1]]), m=12, clusters=32
    )
    merged, provider, mappers = compact_indexes(
        host_sources, cfg, ds.similarity, pq=base_pq, refine_merged=True
    )
    assert isinstance(provider, ADCScoreProvider)
    assert int(merged.num_nodes) == 2400

    # retrain actually produced different codebooks than the base
    assert not np.allclose(
        np.asarray(provider.codebooks), np.asarray(base_pq.codebooks)
    )

    new_of_old = np.full(2400, -1, np.int32)
    for (a, b), m in zip(splits, mappers):
        new_of_old[a:b] = m
    order = np.argsort(new_of_old)
    merged_vecs = ds.base[order]  # new-ordinal order
    exact = ExactScoreProvider(vectors=jnp.asarray(merged_vecs), sim=ds.similarity)

    res = search(
        merged, provider, jnp.asarray(ds.queries), top_k=10, beam_width=40,
        rerank_k=40, reranker=exact,
    )
    gt_new = new_of_old[ds.ground_truth[:, :10]]
    r = recall_at_k(np.asarray(res.ids), gt_new, 10)

    merged_e, prov_e, mappers_e = compact_indexes(sources, cfg, ds.similarity)
    res_e = search(merged_e, prov_e, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    r_exact = recall_at_k(np.asarray(res_e.ids), gt_new, 10)
    assert r >= r_exact - 0.05, f"pq-mode {r} vs exact-mode {r_exact}"
