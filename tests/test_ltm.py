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


def test_ltm_sq4_backlink_burst_adversarial_fanin(tmp_path):
    """LTM variant of the hub-burst probe (advisor r2): the SQ4 LTM build
    prunes on 4-bit codes (full-precision vectors are already on disk), so
    a wave of near-duplicates with IDENTICAL codes must still leave the
    hub region connected — the separate-quota candidate pool, not score
    order, decides which long-range edges survive."""
    import numpy as np
    import jax.numpy as jnp

    from jvector_tpu.disk.ltm import build_on_disk_ltm
    from jvector_tpu.graph import GraphConfig, search
    from jvector_tpu.util.datasets import exact_ground_truth, recall_at_k

    from jvector_tpu.disk.format import FeatureId, load_index
    from jvector_tpu.disk.host_tier import (
        HostVectorStore,
        search_with_host_rerank,
    )

    rng = np.random.default_rng(77)
    d = 16
    hub = np.zeros((1, d), np.float32)
    # burst tighter than the SQ4 quantization step: codes collide exactly
    burst = (rng.normal(size=(511, d)) * 1e-4).astype(np.float32)
    far = (rng.normal(size=(1536, d)) + 8.0).astype(np.float32)
    base = np.concatenate([hub, burst, far]).astype(np.float32)

    cfg = GraphConfig(max_degree=8, ef_construction=24, wave_size=512)
    path = str(tmp_path / "adv.jvtpu")
    graph, provider = build_on_disk_ltm(
        path, base, base.shape[0], d, config=cfg, compression="sq4"
    )

    counts = np.asarray(graph.base.counts)[: base.shape[0]]
    assert counts.max() <= cfg.max_degree

    # approximate pass alone must DISCOVER the burst (connectivity): with
    # identical codes it cannot rank WITHIN the burst, so recall is
    # asserted on the production two-pass (exact rerank from the index
    # file's inline vectors — the host-tier serve path)
    queries = (rng.normal(size=(32, d)) * 0.05).astype(np.float32)
    approx = search(graph, provider, jnp.asarray(queries), top_k=10, beam_width=40)
    assert (np.asarray(approx.ids) < 512).mean() >= 0.95, "burst not discovered"

    store = HostVectorStore.from_index_file(
        load_index(path).reader,
        f"feature/{FeatureId.INLINE_VECTORS}/vectors",
        "euclidean",
    )
    # Within the burst, GT-recall is information-theoretically unreachable
    # for ANY 4-bit code (all 511 members share one code word, so the
    # approximate pass can only hand the reranker an arbitrary beam-sized
    # subset — the reference's PQ-coded LTM build behaves identically).
    # The meaningful contracts: every result is a burst member, and the
    # two-pass returns them exactly-ordered within the candidate set.
    res = search_with_host_rerank(
        graph, provider, store, jnp.asarray(queries), top_k=10, beam_width=40
    )
    ids = np.asarray(res.ids)
    assert (ids < 512).all(), "two-pass returned non-burst results"
    assert (np.diff(np.asarray(res.scores), axis=1) <= 1e-6).all()

    fq = (rng.normal(size=(32, d)) + 8.0).astype(np.float32)
    gt2 = exact_ground_truth(base, fq, 10)
    res2 = search_with_host_rerank(
        graph, provider, store, jnp.asarray(fq), top_k=10, beam_width=40
    )
    r2 = recall_at_k(np.asarray(res2.ids), gt2, 10)
    assert r2 >= 0.85, f"LTM far-region recall {r2}"


def test_ltm_sq4_nonfused_working_set(tmp_path, monkeypatch):
    """The past-budget (100M-regime) path: plain augmented-row wave searches
    with NO separate codes array (aug-backed provider) — regression for the
    10M HBM-OOM where codes+aug duplicated the padded code table."""
    import numpy as np

    from jvector_tpu.disk import ltm as ltm_mod
    from jvector_tpu.disk.host_graph import HostGraphIndex
    from jvector_tpu.graph import GraphConfig
    from jvector_tpu.util.datasets import (
        exact_ground_truth,
        recall_at_k,
        synthetic_dataset,
    )

    monkeypatch.setattr(ltm_mod, "_FUSED_BUILD_BUDGET", 0)  # force non-fused
    ds = synthetic_dataset(n=4000, dim=64, n_queries=64, k=10, n_clusters=24, seed=9)
    base = np.asarray(ds.base)
    gt = exact_ground_truth(ds.base, ds.queries, 10)
    path = tmp_path / "nonfused.jvtpu"
    cfg = GraphConfig(max_degree=16, ef_construction=48, wave_size=256)
    graph, provider = ltm_mod.build_on_disk_ltm(
        str(path), lambda a, b: base[a:b], n=4000, dim=64,
        config=cfg, compression="sq4",
    )
    hg = HostGraphIndex.load(str(path))
    import jax.numpy as jnp

    res = hg.search(jnp.asarray(ds.queries), top_k=10, beam_width=40, expand=4)
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    assert r >= 0.9, r
