"""Streamed on-disk compaction tests (reference:
``OnDiskGraphIndexCompactor.runBatchesWithBackpressure`` + ``CompactWriter``
— 10M x 2560d compacts under a 5 GB heap, ``659.feature.md``).

The contract under test: device memory stays bounded by {one source's
working set} + {merged codes} + wave transients; the merged GRAPH never
materializes on device — rows stream into reserved file extents.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.disk import (
    DeviceTierIndex,
    FeatureId,
    compact_on_disk,
    load_index,
)
from jvector_tpu.disk.ltm import build_on_disk_ltm
from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.util.datasets import (
    exact_ground_truth,
    recall_at_k,
    synthetic_dataset,
)


@pytest.fixture(scope="module")
def segments(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("segs")
    ds = synthetic_dataset(n=2400, dim=24, n_queries=30, k=10, seed=97)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    splits = [(0, 1000), (1000, 1800), (1800, 2400)]
    paths = []
    for i, (a, b) in enumerate(splits):
        p = str(tmp / f"seg{i}.jvtpu")
        build_on_disk_ltm(
            p, ds.base[a:b], n=b - a, dim=24, config=cfg, compression="sq4"
        )
        paths.append(p)
    return ds, cfg, paths, splits


def test_streamed_compaction_recall_and_budget(segments, tmp_path):
    ds, cfg, paths, splits = segments
    out = str(tmp_path / "merged.jvtpu")

    # The budget proves the merged graph never materializes on device:
    # merged neighbors+scores alone would be 2400 * row_cap * 8 bytes
    # (plus codes and vectors).  Grant less than that.
    merged_graph_bytes = 2400 * cfg.row_cap * 8
    budget = merged_graph_bytes - 1 + 600_000  # codes etc. are ~0.1 MB here
    mappers, stats = compact_on_disk(
        paths, out, cfg, device_budget_bytes=budget
    )
    assert stats["total"] == 2400
    assert stats["peak_device_bytes"] <= budget

    # mappers: offset maps over live ids
    new_of_old = np.full(2400, -1, np.int32)
    for (a, b), m in zip(splits, mappers):
        assert m.shape[0] == b - a
        new_of_old[a:b] = m

    # the output container round-trips and serves at compaction-grade recall
    odi = load_index(out)
    assert odi.meta["num_nodes"] == 2400
    assert odi.meta["compacted_from"] == paths
    g2, feats = odi.to_device()
    rerank = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"], sim=ds.similarity
    )
    from jvector_tpu.quantization import ScalarQuantization4

    sq = ScalarQuantization4(
        scale=feats[FeatureId.FUSED_SQ4]["scale"],
        offset=feats[FeatureId.FUSED_SQ4]["offset"],
        original_dim=24,
    )
    prov = sq.provider_for_graph(
        feats[FeatureId.FUSED_SQ4]["codes_packed"], g2.base.neighbors,
        ds.similarity,
    )
    res = search(
        g2, prov, jnp.asarray(ds.queries), top_k=10, beam_width=40,
        rerank_k=40, reranker=rerank,
    )
    gt_new = new_of_old[ds.ground_truth[:, :10]]
    r = recall_at_k(np.asarray(res.ids), gt_new, 10)

    scratch, sp = build_graph(ds.base, ds.similarity, cfg)
    res_s = search(scratch, sp, jnp.asarray(ds.queries), top_k=10, beam_width=40)
    r_scratch = recall_at_k(np.asarray(res_s.ids), ds.ground_truth, 10)
    assert r >= r_scratch - 0.06, f"streamed-compacted {r} vs scratch {r_scratch}"

    # the device tier serves the compacted output directly
    dt = DeviceTierIndex.load(out)
    res_dt = dt.search(jnp.asarray(ds.queries), top_k=10, beam_width=40,
                       entry_seeds=4)
    r_dt = recall_at_k(np.asarray(res_dt.ids), gt_new, 10)
    assert r_dt >= r - 0.05, (r, r_dt)


def test_streamed_compaction_budget_enforced(segments, tmp_path):
    ds, cfg, paths, _ = segments
    with pytest.raises(MemoryError, match="device budget"):
        compact_on_disk(
            paths, str(tmp_path / "toosmall.jvtpu"), cfg,
            device_budget_bytes=1000,
        )


def test_streamed_compaction_drops_deleted_and_hierarchy(segments, tmp_path):
    ds, cfg, paths, splits = segments
    out = str(tmp_path / "merged_del.jvtpu")
    live0 = np.ones(splits[0][1], bool)
    live0[:100] = False  # drop 100 nodes of source 0
    mappers, stats = compact_on_disk(
        paths, out, cfg, live=[live0, None, None], add_hierarchy=True,
    )
    assert stats["total"] == 2300
    assert (mappers[0][:100] == -1).all()
    odi = load_index(out)
    assert odi.meta["num_nodes"] == 2300

    # dropped nodes never appear in results
    g2, feats = odi.to_device()
    rerank = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"], sim=ds.similarity
    )
    res = search(
        g2, rerank, jnp.asarray(ds.queries), top_k=10, beam_width=40
    )
    ids = np.asarray(res.ids)
    assert ids.max() < 2300

    # recall vs ground truth restricted to surviving nodes
    survivors = np.ones(2400, bool)
    survivors[:100] = False
    gt_live = exact_ground_truth(
        ds.base[survivors], ds.queries, 10
    )
    r = recall_at_k(ids, gt_live, 10)
    assert r >= 0.85, r


def test_streamed_compaction_save_fused_serves_host_tier(segments, tmp_path):
    """save_fused=True writes the fused layout into reserved extents
    (host-side build, block re-reads of the just-written adjacency) so the
    output serves on the streaming HOST tier too."""
    ds, cfg, paths, splits = segments
    out = str(tmp_path / "merged_fused.jvtpu")
    mappers, _ = compact_on_disk(paths, out, cfg, save_fused=True)
    from jvector_tpu.disk.format import IndexFileReader

    r = IndexFileReader(out)
    assert r.has_array("feature/fused_sq4/fused_packed")
    assert r.has_array("feature/fused_sq4/fused_w2")

    from jvector_tpu.disk.host_graph import HostGraphIndex

    h = HostGraphIndex.load(out)
    res = h.search(jnp.asarray(ds.queries), top_k=10, beam_width=40)
    new_of_old = np.full(2400, -1, np.int32)
    for (a, b), m in zip(splits, mappers):
        new_of_old[a:b] = m
    gt_new = new_of_old[ds.ground_truth[:, :10]]
    r10 = recall_at_k(np.asarray(res.ids), gt_new, 10)
    assert r10 >= 0.85, r10
