"""Standalone compressor serialization + NVQ on-disk feature round trip.

Reference: ``ProductQuantization.write/load`` (versioned codebooks
independent of any index, ``ProductQuantization.java:560-693``), the Grid
pqCacheDir compressor cache, and ``NVQ.java:36-110`` (NVQ_VECTORS feature
storing codes+params, reranker reconstructed from the loaded index).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.quantization import (
    BinaryQuantization,
    CompressorCache,
    NVQuantization,
    NVQVectors,
    ProductQuantization,
    ScalarQuantization4,
    load_compressor,
    save_compressor,
)
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def data():
    return synthetic_dataset(n=1200, dim=32, n_queries=20, k=10, seed=5)


def _roundtrip(comp, tmp_path, name):
    p = tmp_path / f"{name}.jvtpu"
    save_compressor(p, comp)
    return load_compressor(p)


def test_pq_round_trip(data, tmp_path):
    pq = ProductQuantization.compute(data.base, m=8, clusters=32)
    pq2 = _roundtrip(pq, tmp_path, "pq")
    assert np.allclose(np.asarray(pq.codebooks), np.asarray(pq2.codebooks))
    c1 = np.asarray(pq.encode(data.base[:64]))
    c2 = np.asarray(pq2.encode(data.base[:64]))
    assert (c1 == c2).all()
    assert pq2.anisotropic_threshold == pq.anisotropic_threshold


def test_sq4_round_trip(data, tmp_path):
    sq = ScalarQuantization4.compute(data.base)
    sq2 = _roundtrip(sq, tmp_path, "sq4")
    assert (
        np.asarray(sq.encode(data.base[:64])) == np.asarray(sq2.encode(data.base[:64]))
    ).all()
    assert sq2.original_dim == sq.original_dim


def test_bq_round_trip(data, tmp_path):
    bq = BinaryQuantization.compute(data.base)
    bq2 = _roundtrip(bq, tmp_path, "bq")
    assert (
        np.asarray(bq.encode(data.base[:64])) == np.asarray(bq2.encode(data.base[:64]))
    ).all()


def test_nvq_round_trip(data, tmp_path):
    nvq = NVQuantization.compute(data.base)
    nvq2 = _roundtrip(nvq, tmp_path, "nvq")
    v1 = nvq.encode(data.base[:64])
    v2 = nvq2.encode(data.base[:64])
    assert (np.asarray(v1.codes) == np.asarray(v2.codes)).all()
    assert np.allclose(np.asarray(v1.params), np.asarray(v2.params))


def test_not_a_compressor_file(tmp_path):
    from jvector_tpu.disk.format import IndexFileWriter

    p = tmp_path / "other.jvtpu"
    with IndexFileWriter(p) as w:
        w.add_array("x", np.zeros(4, np.float32))
        w.set_meta(foo=1)
    with pytest.raises(ValueError, match="not a compressor"):
        load_compressor(p)


def test_compressor_cache_trains_once(data, tmp_path):
    cache = CompressorCache(tmp_path / "cache")
    calls = []

    def train():
        calls.append(1)
        return ProductQuantization.compute(data.base, m=4, clusters=16)

    key = {"dataset": "synthetic", "type": "PQ", "m": 4, "k": 16}
    a = cache.get_or_train(key, train)
    b = cache.get_or_train(key, train)
    assert len(calls) == 1
    assert np.allclose(np.asarray(a.codebooks), np.asarray(b.codebooks))
    # a different key trains again
    cache.get_or_train({**key, "m": 8}, lambda: train())
    assert len(calls) == 2


def test_nvq_feature_round_trip(data, tmp_path):
    """Save an index with the NVQ_VECTORS feature, reload, and rerank from
    the reconstructed NVQ reranker at recall parity (BASELINE config 4
    from disk)."""
    from jvector_tpu.disk.format import FeatureId, load_index, write_index
    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.quantization.bq import BinaryQuantization

    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, exact = build_graph(data.base, data.similarity, cfg)
    bq = BinaryQuantization.compute(data.base)
    codes = bq.encode(data.base)
    pad = graph.capacity - codes.shape[0]
    codes = jnp.concatenate([codes, jnp.zeros((pad, codes.shape[1]), codes.dtype)])
    bq_prov = bq.provider(codes)
    nvqv = NVQuantization.compute(data.base).encode(data.base)

    p = tmp_path / "nvq_index.jvtpu"
    write_index(
        p,
        graph,
        features={
            FeatureId.NVQ_VECTORS: nvqv.feature_arrays(),
            FeatureId.BQ_CODES: {
                "codes": np.asarray(codes),
                "center": np.asarray(bq.center),
            },
        },
        similarity=str(data.similarity.value)
        if hasattr(data.similarity, "value")
        else str(data.similarity),
    )

    idx = load_index(p)
    g2, feats = idx.to_device()
    nvqv2 = NVQVectors.from_feature_arrays(feats[FeatureId.NVQ_VECTORS])
    rr2 = nvqv2.provider(data.similarity)

    q = jnp.asarray(data.queries)
    res_mem = search(
        graph, bq_prov, q, top_k=10, beam_width=60, rerank_k=60,
        reranker=nvqv.provider(data.similarity),
    )
    res_disk = search(
        g2, bq_prov, q, top_k=10, beam_width=60, rerank_k=60, reranker=rr2
    )
    r_mem = recall_at_k(np.asarray(res_mem.ids), data.ground_truth, 10)
    r_disk = recall_at_k(np.asarray(res_disk.ids), data.ground_truth, 10)
    assert abs(r_mem - r_disk) < 0.02, (r_mem, r_disk)
    assert r_disk >= 0.85, f"from-disk NVQ rerank recall {r_disk}"
