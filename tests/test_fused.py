"""Fused-PQ tests (reference: TestFusedGraphIndex — fused vs non-fused
equivalence) + ordinal renumbering on save."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.graph import (
    FusedADCScoreProvider,
    GraphConfig,
    build_fused_codes,
    build_graph,
    search,
)
from jvector_tpu.quantization import ProductQuantization
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset(n=2000, dim=32, n_queries=30, k=10, seed=111)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, exact = build_graph(ds.base, ds.similarity, cfg)
    pq = ProductQuantization.compute(ds.base, m=8, clusters=64)
    codes = pq.encode(ds.base)
    # pad codes to graph capacity (bucketized)
    pad = graph.capacity - codes.shape[0]
    codes_cap = jnp.concatenate([codes, jnp.zeros((pad, 8), jnp.uint8)])
    fused = build_fused_codes(graph.base.neighbors, codes_cap)
    prov = FusedADCScoreProvider(
        codes=codes_cap, fused_codes=fused,
        codebooks=pq.codebooks, center=pq.center, sim=ds.similarity,
    )
    return ds, cfg, graph, exact, pq, codes_cap, prov


def test_fused_codes_alignment(setup):
    ds, cfg, graph, exact, pq, codes, prov = setup
    nbrs = np.asarray(graph.base.neighbors)
    fused = np.asarray(prov.fused_codes)
    c = np.asarray(codes)
    rng = np.random.default_rng(0)
    for i in rng.integers(0, 2000, size=30):
        for r in range(nbrs.shape[1]):
            if nbrs[i, r] >= 0:
                np.testing.assert_array_equal(fused[i, r], c[nbrs[i, r]])
            else:
                assert (fused[i, r] == 0).all()


def test_fused_vs_plain_equivalence(setup):
    """Fused search must return identical results to the plain ADC provider."""
    ds, cfg, graph, exact, pq, codes, prov = setup
    plain = pq.provider(codes, ds.similarity)
    q = jnp.asarray(ds.queries)
    r_plain = search(graph, plain, q, top_k=10, beam_width=40)
    r_fused = search(graph, prov, q, top_k=10, beam_width=40)
    np.testing.assert_array_equal(np.asarray(r_plain.ids), np.asarray(r_fused.ids))
    np.testing.assert_allclose(
        np.asarray(r_plain.scores), np.asarray(r_fused.scores), rtol=1e-5, atol=1e-5
    )


def test_fused_two_pass_recall(setup):
    ds, cfg, graph, exact, pq, codes, prov = setup
    q = jnp.asarray(ds.queries)
    res = search(graph, prov, q, top_k=10, beam_width=60, rerank_k=60, reranker=exact)
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.9, f"fused two-pass recall {r}"


def test_renumbered_save_load(tmp_path):
    from jvector_tpu.disk import FeatureId, load_index, write_index
    from jvector_tpu.graph import ExactScoreProvider
    from jvector_tpu.graph.mutation import mark_deleted, remove_deleted

    ds = synthetic_dataset(n=1200, dim=16, n_queries=20, k=30, seed=121)
    cfg = GraphConfig(max_degree=12, ef_construction=32, wave_size=128)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    victims = np.arange(0, 1200, 7, dtype=np.int32)  # delete every 7th
    g2 = remove_deleted(mark_deleted(graph, victims), provider, cfg, chunk=512)

    p = tmp_path / "renum.jvtpu"
    write_index(
        p, g2, features={FeatureId.INLINE_VECTORS: {"vectors": ds.base}},
    )
    odi = load_index(p)
    assert odi.meta["renumbered"] is True
    n_live = 1200 - len(victims)
    assert odi.meta["num_nodes"] == n_live
    mapper = np.asarray(odi.reader.read("ordinal_mapper"))
    assert (mapper[victims] == -1).all()

    g3, feats = odi.to_device()
    vecs = feats[FeatureId.INLINE_VECTORS]["vectors"]
    assert vecs.shape[0] == n_live  # per-node feature followed the remap
    p3 = ExactScoreProvider(vectors=vecs, sim=ds.similarity)
    res = search(g3, p3, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    ids_new = np.asarray(res.ids)
    # map results back to old ordinals, compare against victim-filtered GT
    old_of_new = np.full(n_live, -1, np.int32)
    old_of_new[mapper[mapper >= 0]] = np.where(mapper >= 0)[0]
    ids_old = np.where(ids_new >= 0, old_of_new[np.maximum(ids_new, 0)], -1)
    hits = total = 0
    for qi in range(20):
        want = ds.ground_truth[qi][~np.isin(ds.ground_truth[qi], victims)][:10]
        hits += len(set(ids_old[qi].tolist()) & set(want.tolist()))
        total += len(want)
    assert hits / total >= 0.9, f"renumbered recall {hits/total}"
