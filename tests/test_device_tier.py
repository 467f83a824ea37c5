"""HBM-resident serving tier tests (device_tier.py).

Reference parity target: ``OnDiskGraphIndex``'s memory/disk split serving
10M-class indexes per box (``OnDiskGraphIndex.java:132-162``); here the
compact arrays live in HBM and searches never touch the host.
"""

import numpy as np
import jax.numpy as jnp

from jvector_tpu.disk import DeviceTierIndex, FeatureId, load_index
from jvector_tpu.disk.device_tier import (
    pack_adjacency_pairs_host,
    sq4_aug_rows_host,
)
from jvector_tpu.disk.ltm import build_on_disk_ltm
from jvector_tpu.graph import GraphConfig, search
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.util.datasets import (
    exact_ground_truth,
    recall_at_k,
    synthetic_dataset,
)


def test_pack_pairs_layout():
    rng = np.random.default_rng(3)
    nbrs = rng.integers(-1, 100, size=(10, 16)).astype(np.int32)
    pairs = pack_adjacency_pairs_host(nbrs, 64)
    assert pairs.shape == (5, 128)
    for i in range(10):
        half = pairs[i // 2, (i % 2) * 64 : (i % 2) * 64 + 64]
        np.testing.assert_array_equal(half[:16], nbrs[i])
        assert (half[16:] == -1).all()
    # odd N gets a phantom all--1 node
    pairs_odd = pack_adjacency_pairs_host(nbrs[:9], 64)
    assert pairs_odd.shape == (5, 128)
    assert (pairs_odd[4, 64:] == -1).all()


def test_sq4_aug_rows_host_matches_device():
    from jvector_tpu.graph.score import sq4_aug_rows

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 256, size=(32, 16)).astype(np.uint8)
    const = rng.normal(size=32).astype(np.float32)
    host = sq4_aug_rows_host(codes, const)
    dev = np.asarray(sq4_aug_rows(jnp.asarray(codes), jnp.asarray(const)))
    np.testing.assert_array_equal(host, dev)


def _ltm_container(tmp_path, hierarchy: bool):
    ds = synthetic_dataset(n=3000, dim=32, n_queries=50, k=10, seed=33)
    gt = exact_ground_truth(ds.base, ds.queries, 10)
    cfg = GraphConfig(
        max_degree=16, ef_construction=48, wave_size=256,
        add_hierarchy=hierarchy,
    )
    path = str(tmp_path / "dt.jvtpu")
    build_on_disk_ltm(
        path, ds.base, n=3000, dim=32, config=cfg, compression="sq4"
    )
    return ds, gt, path


def test_device_tier_serves_container(tmp_path):
    ds, gt, path = _ltm_container(tmp_path, hierarchy=True)
    idx = DeviceTierIndex.load(path)
    assert idx.hbm_bytes() > 0
    assert idx.capacity >= 3000
    res = idx.search(
        jnp.asarray(ds.queries), top_k=10, beam_width=60, entry_seeds=4
    )
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    assert r >= 0.9, f"device-tier recall {r}"
    # approx_scores ride the same permutation as ids (multi-index contract)
    assert res.approx_scores.shape == res.ids.shape
    assert int(jnp.sum(res.reranked_count)) > 0

    # flat (no hierarchy descent) serves the same container
    flat = DeviceTierIndex.load(path, use_hierarchy=False)
    assert flat.upper is None
    res_f = flat.search(
        jnp.asarray(ds.queries), top_k=10, beam_width=60, entry_seeds=4
    )
    r_f = recall_at_k(np.asarray(res_f.ids), gt, 10)
    assert r_f >= 0.9, f"flat device-tier recall {r_f}"


def test_device_tier_matches_standard_search(tmp_path):
    """Same container served by the standard path and the device tier must
    land within noise of each other (same graph, same SQ4 first pass)."""
    ds, gt, path = _ltm_container(tmp_path, hierarchy=False)

    odi = load_index(path)
    g2, feats = odi.to_device()
    from jvector_tpu.quantization import ScalarQuantization4

    sq = ScalarQuantization4(
        scale=feats[FeatureId.FUSED_SQ4]["scale"],
        offset=feats[FeatureId.FUSED_SQ4]["offset"],
        original_dim=32,
    )
    prov = sq.provider_for_graph(
        feats[FeatureId.FUSED_SQ4]["codes_packed"], g2.base.neighbors,
        ds.similarity,
    )
    rerank = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"], sim=ds.similarity
    )
    res_std = search(
        g2, prov, jnp.asarray(ds.queries), top_k=10, beam_width=60,
        rerank_k=60, reranker=rerank, entry_seeds=4,
    )
    r_std = recall_at_k(np.asarray(res_std.ids), gt, 10)

    # f32 rerank vectors: identical scoring math to the standard reranker
    idx = DeviceTierIndex.load(
        path, use_hierarchy=False, rerank_dtype=jnp.float32
    )
    res_dt = idx.search(
        jnp.asarray(ds.queries), top_k=10, beam_width=60, rerank_k=60,
        entry_seeds=4,
    )
    r_dt = recall_at_k(np.asarray(res_dt.ids), gt, 10)
    assert abs(r_std - r_dt) <= 0.03, (r_std, r_dt)

    # bfloat16 rerank loses at most a whisker
    idx_bf = DeviceTierIndex.load(path, use_hierarchy=False)
    res_bf = idx_bf.search(
        jnp.asarray(ds.queries), top_k=10, beam_width=60, rerank_k=60,
        entry_seeds=4,
    )
    r_bf = recall_at_k(np.asarray(res_bf.ids), gt, 10)
    assert r_bf >= r_dt - 0.02, (r_dt, r_bf)


def test_device_tier_rejects_non_sq4(tmp_path):
    ds = synthetic_dataset(n=500, dim=16, n_queries=5, k=5, seed=1)
    cfg = GraphConfig(max_degree=8, ef_construction=24, wave_size=128)
    path = str(tmp_path / "pq.jvtpu")
    build_on_disk_ltm(
        path, ds.base, n=500, dim=16, config=cfg, pq_m=4, compression="pq"
    )
    import pytest

    with pytest.raises(ValueError, match="fused_sq4"):
        DeviceTierIndex.load(path)
