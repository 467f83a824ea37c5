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


def test_v2_frozen_fixture_reads():
    """v2 fixture (hierarchy node_ids arrays) frozen before the v3 bump must
    keep loading byte-identically (reference testV0Read pattern)."""
    import pathlib

    from jvector_tpu.disk.format import load_index

    fix = pathlib.Path(__file__).parent / "fixtures"
    idx = load_index(fix / "v2_frozen.jvtpu")
    assert idx.reader.version == 2
    expect = np.load(fix / "v2_frozen_expect.npz")
    graph, feats = idx.to_device()
    assert graph.num_levels == int(expect["num_levels"])
    assert int(graph.entry_node) == int(expect["entry"])
    np.testing.assert_array_equal(
        np.asarray(graph.base.neighbors), expect["neighbors"]
    )
    np.testing.assert_array_equal(
        np.asarray(graph.layers[1].neighbors), expect["l1_neighbors"]
    )
    np.testing.assert_array_equal(
        np.asarray(graph.level_node_ids[0]), expect["l1_node_ids"]
    )
    np.testing.assert_array_equal(
        np.asarray(feats["inline_vectors"]["vectors"]), expect["vectors"]
    )


def test_v3_paired_layout_round_trip(tmp_path):
    """The rehearsed BREAKING bump: v3 stores L0 in the paired device layout.

    - a v3 file round-trips to the same graph as the plain v2 write
    - it stamps version 3, and a v2-era reader (VERSION monkeypatched back)
      refuses it (reference CommonHeader version gate)
    - plain writes still stamp 2 (minimum version able to read them)
    """
    import pytest

    from jvector_tpu.disk import format as fmt
    from jvector_tpu.graph import GraphConfig, build_graph

    ds = synthetic_dataset(n=300, dim=16, n_queries=4, k=5, seed=77)
    cfg = GraphConfig(max_degree=8, ef_construction=24, wave_size=64)
    g, _ = build_graph(ds.base, ds.similarity, cfg)

    plain = str(tmp_path / "plain.jvtpu")
    paired = str(tmp_path / "paired.jvtpu")
    feats = {FeatureId.INLINE_VECTORS: {"vectors": np.asarray(ds.base)}}
    write_index(plain, g, features=feats, renumber=False)
    write_index(paired, g, features=feats, renumber=False,
                paired_adjacency=True)

    r_plain = fmt.IndexFileReader(plain)
    r_paired = fmt.IndexFileReader(paired)
    assert r_plain.version == 2
    assert r_paired.version == 3
    assert not r_paired.has_array("graph/L0/neighbors")
    assert r_paired.meta["l0_layout"] == "paired"

    g1, _ = load_index(plain).to_device()
    g2, _ = load_index(paired).to_device()
    np.testing.assert_array_equal(
        np.asarray(g1.base.neighbors), np.asarray(g2.base.neighbors)
    )
    np.testing.assert_array_equal(
        np.asarray(g1.base.counts), np.asarray(g2.base.counts)
    )

    # a v2-era reader refuses the v3 file instead of misparsing it
    old = fmt.VERSION
    try:
        fmt.VERSION = 2
        with pytest.raises(ValueError, match="unsupported version"):
            fmt.IndexFileReader(paired)
        fmt.IndexFileReader(plain)  # v2 files keep loading
    finally:
        fmt.VERSION = old


def test_v3_paired_feeds_device_tier(tmp_path):
    """DeviceTierIndex uploads the v3 paired blob verbatim (no host repack)
    and serves at parity with the plain layout."""
    from jvector_tpu.disk import DeviceTierIndex
    from jvector_tpu.disk.ltm import build_on_disk_ltm
    from jvector_tpu.graph import GraphConfig
    from jvector_tpu.util.datasets import exact_ground_truth, recall_at_k

    ds = synthetic_dataset(n=2000, dim=32, n_queries=30, k=10, seed=55)
    gt = exact_ground_truth(ds.base, ds.queries, 10)
    cfg = GraphConfig(max_degree=16, ef_construction=48, wave_size=256)
    plain = str(tmp_path / "p.jvtpu")
    build_on_disk_ltm(plain, ds.base, n=2000, dim=32, config=cfg,
                      compression="sq4")
    # rewrite the same index in the v3 paired layout
    from jvector_tpu.disk.format import IndexFileReader

    r = IndexFileReader(plain)
    odi = load_index(plain)
    g, feats = odi.to_device()
    paired = str(tmp_path / "p3.jvtpu")
    write_index(
        paired, g,
        features={k: {a: np.asarray(v) for a, v in d.items()}
                  for k, d in feats.items()},
        renumber=False, paired_adjacency=True,
        similarity=r.meta["similarity"],
    )
    idx3 = DeviceTierIndex.load(paired)
    res = idx3.search(jnp.asarray(ds.queries), top_k=10, beam_width=60,
                      entry_seeds=4)
    r3 = recall_at_k(np.asarray(res.ids), gt, 10)
    assert r3 >= 0.9, r3


def _rewrite_paired(plain, paired):
    """Rewrite a plain container into the v3 paired layout, same features."""
    from jvector_tpu.disk.format import IndexFileReader

    r = IndexFileReader(plain)
    g, feats = load_index(plain).to_device()
    write_index(
        paired, g,
        features={k: {a: np.asarray(v) for a, v in d.items()}
                  for k, d in feats.items()},
        renumber=False, paired_adjacency=True,
        similarity=r.meta["similarity"],
    )


def test_v3_paired_plain_layout_consumers(tmp_path):
    """v3 paired containers must feed the PLAIN-layout consumers through the
    dispatching read (regression: HostGraphIndex.load and compact_on_disk
    both raised KeyError('graph/L0/neighbors') on paired files despite the
    format.py version-history promise)."""
    from jvector_tpu.disk import compact_on_disk
    from jvector_tpu.disk.host_graph import HostGraphIndex
    from jvector_tpu.disk.ltm import build_on_disk_ltm
    from jvector_tpu.util.datasets import exact_ground_truth

    ds = synthetic_dataset(n=1600, dim=24, n_queries=20, k=10, seed=31)
    gt = exact_ground_truth(ds.base, ds.queries, 10)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    paths = []
    for i, (a, b) in enumerate([(0, 800), (800, 1600)]):
        plain = str(tmp_path / f"seg{i}.jvtpu")
        build_on_disk_ltm(plain, ds.base[a:b], n=b - a, dim=24, config=cfg,
                          compression="sq4")
        paired = str(tmp_path / f"seg{i}_v3.jvtpu")
        _rewrite_paired(plain, paired)
        paths.append(paired)

    # host tier serves the paired container (adjacency unpacked on load)
    hg = HostGraphIndex.load(paths[0])
    res = hg.search(jnp.asarray(ds.queries), top_k=10, beam_width=40,
                    expand=4)
    assert int(np.asarray(res.ids).max()) < 800

    # the streamed compactor merges paired sources
    out = str(tmp_path / "merged.jvtpu")
    mappers, stats = compact_on_disk(paths, out, cfg)
    assert stats["total"] == 1600
    g2, feats = load_index(out).to_device()
    rerank = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"],
        sim=ds.similarity,
    )
    res = search(g2, rerank, jnp.asarray(ds.queries), top_k=10,
                 beam_width=60)
    new_of_old = np.concatenate(mappers)
    remapped_gt = new_of_old[gt]
    rec = recall_at_k(np.asarray(res.ids), remapped_gt, 10)
    assert rec >= 0.85, rec


def test_v3_paired_with_holes_refuses(tmp_path):
    """paired_adjacency + save-time renumbering (deleted holes) must raise,
    not silently fall back to a plain v2 file."""
    from jvector_tpu.graph.mutation import mark_deleted

    ds = synthetic_dataset(n=300, dim=16, n_queries=4, k=5, seed=13)
    cfg = GraphConfig(max_degree=8, ef_construction=24, wave_size=64)
    g, _ = build_graph(ds.base, ds.similarity, cfg)
    g = mark_deleted(g, jnp.asarray([3, 5], jnp.int32))
    with pytest.raises(ValueError, match="paired_adjacency"):
        write_index(
            str(tmp_path / "h.jvtpu"), g,
            features={FeatureId.INLINE_VECTORS: {"vectors": np.asarray(ds.base)}},
            paired_adjacency=True,
        )
