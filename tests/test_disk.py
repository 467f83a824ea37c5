"""Persistence round-trip tests (reference: ``TestOnDiskGraphIndex`` family)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.disk import (
    FeatureId,
    IndexFileReader,
    IndexFileWriter,
    load_index,
    write_index,
)
from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset

RNG = np.random.default_rng(77)


def test_container_roundtrip(tmp_path):
    p = tmp_path / "x.jvtpu"
    a = RNG.normal(size=(10, 4)).astype(np.float32)
    b = RNG.integers(0, 100, size=(7,)).astype(np.int32)
    with IndexFileWriter(p) as w:
        w.add_array("a", a)
        w.add_array("b", b)
        w.set_meta(hello="world", n=10)
    r = IndexFileReader(p)
    assert r.meta == {"hello": "world", "n": 10}
    np.testing.assert_array_equal(r.read("a", verify=True), a)
    np.testing.assert_array_equal(r.read("b"), b)
    # memmap read works
    np.testing.assert_array_equal(np.asarray(r.read("a", mmap=True)), a)


def test_container_reserved_rows(tmp_path):
    """The incremental LTM write path: reserve then fill out of order."""
    p = tmp_path / "x.jvtpu"
    with IndexFileWriter(p) as w:
        w.reserve_array("v", (6, 3), np.float32)
        w.write_rows("v", 4, np.ones((2, 3), np.float32) * 4)
        w.write_rows("v", 0, np.ones((2, 3), np.float32) * 1)
        w.add_array("after", np.arange(5, dtype=np.int32))
        w.write_rows("v", 2, np.ones((2, 3), np.float32) * 2)
    r = IndexFileReader(p)
    v = np.asarray(r.read("v"))
    assert (v[0] == 1).all() and (v[2] == 2).all() and (v[4] == 4).all()
    np.testing.assert_array_equal(r.read("after"), np.arange(5))


def test_corrupt_files(tmp_path):
    p = tmp_path / "y.jvtpu"
    with IndexFileWriter(p) as w:
        w.add_array("a", np.zeros((4,), np.float32))
    raw = p.read_bytes()
    # truncated
    (tmp_path / "t.jvtpu").write_bytes(raw[:-3])
    with pytest.raises(ValueError, match="footer"):
        IndexFileReader(tmp_path / "t.jvtpu")
    # bad magic
    (tmp_path / "m.jvtpu").write_bytes(b"XXXXXX" + raw[6:])
    with pytest.raises(ValueError, match="magic"):
        IndexFileReader(tmp_path / "m.jvtpu")
    # flipped payload byte -> CRC
    bad = bytearray(raw)
    bad[70] ^= 0xFF
    (tmp_path / "c.jvtpu").write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="CRC"):
        IndexFileReader(tmp_path / "c.jvtpu").read("a", verify=True)


@pytest.fixture(scope="module")
def built():
    ds = synthetic_dataset(n=1000, dim=16, n_queries=20, k=10, seed=41)
    cfg = GraphConfig(max_degree=12, ef_construction=32, wave_size=128)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    return ds, graph, provider


def test_graph_save_load_search_identical(tmp_path, built):
    ds, graph, provider = built
    p = tmp_path / "g.jvtpu"
    write_index(
        p,
        graph,
        features={FeatureId.INLINE_VECTORS: {"vectors": ds.base}},
        similarity=str(ds.similarity.value),
        dimension=ds.base.shape[1],
    )

    odi = load_index(p)
    assert odi.meta["dimension"] == 16
    assert FeatureId.INLINE_VECTORS in odi.features
    g2, feats = odi.to_device()
    assert int(g2.num_nodes) == int(graph.num_nodes)
    assert int(g2.entry_node) == int(graph.entry_node)
    np.testing.assert_array_equal(
        np.asarray(g2.base.neighbors), np.asarray(graph.base.neighbors)
    )

    p2 = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"], sim=ds.similarity
    )
    r_orig = search(graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=32)
    r_load = search(g2, p2, jnp.asarray(ds.queries), top_k=10, beam_width=32)
    np.testing.assert_array_equal(np.asarray(r_orig.ids), np.asarray(r_load.ids))
    assert recall_at_k(np.asarray(r_load.ids), ds.ground_truth, 10) >= 0.95


def test_pq_feature_roundtrip(tmp_path, built):
    from jvector_tpu.quantization import ProductQuantization

    ds, graph, provider = built
    pq = ProductQuantization.compute(ds.base, m=4, clusters=32)
    codes = pq.encode(ds.base)
    p = tmp_path / "pq.jvtpu"
    write_index(
        p,
        graph,
        features={
            FeatureId.PQ_CODES: {
                "codes": np.asarray(codes),
                "codebooks": np.asarray(pq.codebooks),
                "center": np.asarray(pq.center),
            },
            FeatureId.INLINE_VECTORS: {"vectors": ds.base},
        },
        pq_original_dim=pq.original_dim,
        similarity=str(ds.similarity.value),
    )
    odi = load_index(p)
    g2, feats = odi.to_device()
    from jvector_tpu.graph.score import ADCScoreProvider

    fp = feats[FeatureId.PQ_CODES]
    pq_prov = ADCScoreProvider(
        codes=fp["codes"], codebooks=fp["codebooks"], center=fp["center"],
        sim=ds.similarity,
    )
    exact = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"], sim=ds.similarity
    )
    res = search(
        g2, pq_prov, jnp.asarray(ds.queries), top_k=10, beam_width=40,
        rerank_k=40, reranker=exact,
    )
    assert recall_at_k(np.asarray(res.ids), ds.ground_truth, 10) >= 0.9


def test_v1_frozen_fixture_reads():
    """Format back-compat enforcement (reference TestOnDiskGraphIndex
    testV0Read): a byte-frozen v1 file committed to the repo must keep
    loading with identical contents in every future version."""
    import pathlib

    from jvector_tpu.disk.format import VERSION, load_index

    fix = pathlib.Path(__file__).parent / "fixtures"
    idx = load_index(fix / "v1_frozen.jvtpu")
    assert idx.meta["version"] == 1 if "version" in idx.meta else True
    assert VERSION >= 1
    expect = np.load(fix / "v1_frozen_expect.npz")
    graph, feats = idx.to_device()
    assert int(graph.entry_node) == 3
    assert int(graph.num_nodes) == 32
    np.testing.assert_array_equal(
        np.asarray(graph.base.neighbors), expect["neighbors"]
    )
    np.testing.assert_array_equal(
        np.asarray(feats["inline_vectors"]["vectors"]), expect["vectors"]
    )
    np.testing.assert_allclose(
        np.asarray(graph.base.scores), expect["scores"], rtol=1e-7
    )
