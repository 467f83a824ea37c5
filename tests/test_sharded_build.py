"""ICI-sharded build + serve tests on the 8-device virtual mesh."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig
from jvector_tpu.parallel import make_mesh, sharded_build, sharded_graph_search
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def built():
    ds = synthetic_dataset(n=4000, dim=24, n_queries=40, k=10, seed=19)
    mesh = make_mesh(8, "shard")
    cfg = GraphConfig(max_degree=12, ef_construction=32, wave_size=128)
    idx = sharded_build(ds.base, mesh, cfg, ds.similarity)
    return ds, mesh, idx


def test_sharded_build_structure(built):
    ds, mesh, idx = built
    assert idx.n_shards == 8
    assert idx.n_local * 8 >= 4000
    counts = np.asarray(idx.graphs.layers[0].counts)  # [8, n_local]
    assert counts.shape[0] == 8
    # every shard actually built edges
    assert (counts.sum(axis=1) > 0).all()
    nbrs = np.asarray(idx.graphs.layers[0].neighbors)
    valid = nbrs[nbrs >= 0]
    assert valid.max() < idx.n_local  # local id space per shard


def test_sharded_search_recall(built):
    ds, mesh, idx = built
    gids, scores = sharded_graph_search(
        idx, jnp.asarray(ds.queries), mesh, top_k=10, beam_width=32
    )
    r = recall_at_k(np.asarray(gids), ds.ground_truth, 10)
    assert r >= 0.95, f"sharded recall {r}"
    # scores sorted desc and global ids in range
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    g = np.asarray(gids)
    assert g.max() < 4000 and (g[g >= 0] >= 0).all()


def test_sharded_sq4_two_pass_recall(built):
    """The default sharded build is the compressed flagship path: SQ4 fused
    first pass per shard + shard-local exact rerank gated by the cross-shard
    approximate floor (VERDICT r2 item 3)."""
    ds, mesh, idx = built
    assert idx.search_providers is not None, "sq4 build must attach providers"
    gids, scores = sharded_graph_search(
        idx, jnp.asarray(ds.queries), mesh, top_k=10, beam_width=32, rerank_k=32
    )
    r = recall_at_k(np.asarray(gids), ds.ground_truth, 10)
    assert r >= 0.95, f"sharded sq4 two-pass recall {r}"


def test_sharded_exact_build_still_works():
    ds = synthetic_dataset(n=2000, dim=16, n_queries=16, k=5, seed=23)
    mesh = make_mesh(8, "shard")
    cfg = GraphConfig(max_degree=8, ef_construction=24, wave_size=64)
    idx = sharded_build(ds.base, mesh, cfg, ds.similarity, build_compression=None)
    assert idx.search_providers is None
    gids, _ = sharded_graph_search(
        idx, jnp.asarray(ds.queries), mesh, top_k=5, beam_width=24
    )
    r = recall_at_k(np.asarray(gids), ds.ground_truth, 5)
    assert r >= 0.9


def test_sharded_save_load_round_trip(built, tmp_path_factory):
    """One container per shard + manifest -> reopened index serves at
    recall parity (reference: per-segment OnDiskGraphIndex lifecycle)."""
    from jvector_tpu.parallel import load_sharded, save_sharded

    ds, mesh, idx = built
    d = tmp_path_factory.mktemp("sharded_idx")
    save_sharded(idx, d)
    idx2 = load_sharded(d, mesh)
    assert idx2.n_shards == idx.n_shards
    assert idx2.n_total == idx.n_total
    assert idx2.search_providers is not None
    q = jnp.asarray(ds.queries)
    g1, s1 = sharded_graph_search(idx, q, mesh, top_k=10, beam_width=32)
    g2, s2 = sharded_graph_search(idx2, q, mesh, top_k=10, beam_width=32)
    assert (np.asarray(g1) == np.asarray(g2)).mean() > 0.99
    r = recall_at_k(np.asarray(g2), ds.ground_truth, 10)
    assert r >= 0.95, f"reloaded sharded recall {r}"
    # a single shard file is also directly loadable as an ordinary index
    from jvector_tpu.disk.format import load_index

    one = load_index(d / "shard0000.jvtpu")
    assert one.meta["shard"] == 0
    g, feats = one.to_device()
    assert "fused_sq4" in feats and "inline_vectors" in feats


def test_sharded_ragged_corpus():
    """Corpus size not divisible by the mesh: final shard is ragged."""
    ds = synthetic_dataset(n=1003, dim=16, n_queries=10, k=5, seed=29)
    mesh = make_mesh(8, "shard")
    cfg = GraphConfig(max_degree=8, ef_construction=24, wave_size=64)
    idx = sharded_build(ds.base, mesh, cfg, ds.similarity)
    gids, _ = sharded_graph_search(idx, jnp.asarray(ds.queries), mesh, top_k=5, beam_width=24)
    g = np.asarray(gids)
    assert g.max() < 1003  # padding rows never surface
    r = recall_at_k(g, ds.ground_truth, 5)
    assert r >= 0.9


def test_sharded_packed_build_recall_and_roundtrip(tmp_path_factory):
    """The packed-adjacency wave loop under shard_map (VERDICT r4 item 7):
    dim 32 / M=8 / wave 256 aligns the fused rows, so the sharded build
    selects the three-program packed regime (search / compute / in-place
    apply) per shard — the same programs the 10M LTM build runs."""
    from jvector_tpu.graph.builder import _fused_aligned_config, _packed_build_eligible
    from jvector_tpu.parallel import load_sharded, save_sharded

    ds = synthetic_dataset(n=4096, dim=32, n_queries=40, k=10, seed=41)
    mesh = make_mesh(8, "shard")
    cfg = GraphConfig(max_degree=8, ef_construction=32, wave_size=256)
    aligned = _fused_aligned_config(cfg, 16)
    assert _packed_build_eligible(aligned, 16, 512), "config must hit the packed regime"

    idx = sharded_build(ds.base, mesh, cfg, ds.similarity)
    assert idx.search_providers is not None
    # the packed regime's signature: w2 rides the packed int32 table
    assert idx.search_providers.fused_w2.dtype == jnp.int32
    assert idx.search_providers.fused_packed.ndim == 4  # stacked rank-3

    gids, scores = sharded_graph_search(
        idx, jnp.asarray(ds.queries), mesh, top_k=10, beam_width=48, rerank_k=48
    )
    r = recall_at_k(np.asarray(gids), ds.ground_truth, 10)
    assert r >= 0.93, f"sharded packed-build recall {r}"

    # shard files round-trip through the normalized 2-D fused layout
    d = tmp_path_factory.mktemp("packed_shards")
    save_sharded(idx, d)
    idx2 = load_sharded(d, mesh)
    g2, _ = sharded_graph_search(
        idx2, jnp.asarray(ds.queries), mesh, top_k=10, beam_width=48, rerank_k=48
    )
    r2 = recall_at_k(np.asarray(g2), ds.ground_truth, 10)
    assert r2 >= r - 0.02, (r, r2)
