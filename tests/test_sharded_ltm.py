"""Sharded larger-than-memory pipeline: per-shard stream builds on disk +
merged bounded-memory host serving (the 100M / BASELINE config-5 shape).

Reference contract: one on-disk segment per partition + the multi-segment
search lifecycle (``GraphSearcher.java:386-404``, Grid/compaction reopening
segments independently).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.disk.host_graph import ShardedHostIndex
from jvector_tpu.graph import GraphConfig
from jvector_tpu.parallel import load_sharded, make_mesh, sharded_build_on_disk
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset

N, D, SHARDS = 4096, 32, 2


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(n=N, dim=D, n_queries=48, k=10, seed=23)


@pytest.fixture(scope="module")
def built(ds, tmp_path_factory):
    d = tmp_path_factory.mktemp("shltm")
    cfg = GraphConfig(max_degree=16, ef_construction=48, wave_size=256)
    man = sharded_build_on_disk(
        d, np.asarray(ds.base), n=N, dim=D, shards=SHARDS, config=cfg,
        sim=ds.similarity,
    )
    return d, man, cfg


def test_manifest_and_shard_files(built):
    d, man, _ = built
    assert man["n_shards"] == SHARDS and man["n_total"] == N and man["ltm"]
    for fname in man["shards"]:
        assert (d / fname).exists()


def test_merged_host_serving_recall(ds, built):
    d, _, _ = built
    sh = ShardedHostIndex.load(d)
    assert sh.n_total == N and len(sh.shards) == SHARDS
    res = sh.search(jnp.asarray(ds.queries), top_k=10, beam_width=48, expand=2)
    ids = np.asarray(res.ids)
    r = recall_at_k(ids, ds.ground_truth, 10)
    assert r >= 0.9, f"sharded host-tier recall {r}"
    # global id space + merged scores sorted desc
    assert ids.max() < N
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # both shards contribute (queries are spread over the whole corpus)
    n_local = -(-N // SHARDS)
    assert (ids[ids >= 0] < n_local).any() and (ids >= n_local).any()


def test_committed_shards_skipped_on_rerun(ds, built):
    """Re-running the sharded build must rebuild ONLY missing shards —
    shard-level restartability on top of the wave-level checkpoint."""
    d, man, cfg = built
    (d / man["shards"][1]).unlink()  # lose shard 1, keep shard 0

    touched = []

    def loader(a, b):
        touched.append((a, b))
        return np.asarray(ds.base)[a:b]

    sharded_build_on_disk(
        d, loader, n=N, dim=D, shards=SHARDS, config=cfg, sim=ds.similarity
    )
    n_local = -(-N // SHARDS)
    assert touched, "missing shard must be rebuilt"
    assert all(a >= n_local for a, _ in touched), (
        "committed shard 0's range must not be re-read"
    )
    res = ShardedHostIndex.load(d).search(
        jnp.asarray(ds.queries), top_k=10, beam_width=48, expand=2
    )
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    assert r >= 0.9


def test_sharded_host_filtered_search(ds, built):
    """Global acceptOrds mask over the sharded host tier: 2% selectivity
    must still return a full accepted-only result set (reference
    TestLowCardinalityFiltering over segments)."""
    d, _, _ = built
    base = np.asarray(ds.base, np.float32)
    rng = np.random.default_rng(31)
    mask = np.zeros(N, bool)
    mask[rng.choice(N, N // 50, replace=False)] = True
    sub = np.where(mask)[0]
    q = np.asarray(ds.queries, np.float32)
    dist = (
        np.sum(q**2, axis=1)[:, None]
        - 2.0 * q @ base[sub].T
        + np.sum(base[sub] ** 2, axis=1)[None, :]
    )
    fgt = sub[np.argsort(dist, axis=1)[:, :10]]

    sh = ShardedHostIndex.load(d)
    res = sh.search(
        jnp.asarray(ds.queries), top_k=10, beam_width=48, expand=2,
        max_iters=400, accept=mask,
    )
    ids = np.asarray(res.ids)
    assert (ids >= 0).all() and mask[ids].all()
    r = recall_at_k(ids, fgt, 10)
    assert r >= 0.9, f"sharded filtered recall {r}"


def test_shards_compact_to_one_index(ds, built):
    """Full segment lifecycle: sharded stream builds -> compaction into ONE
    container-servable graph (the reference's Cassandra story:
    per-memtable segments merged by OnDiskGraphIndexCompactor)."""
    from jvector_tpu.disk import CompactionSource, compact_indexes
    from jvector_tpu.graph import search

    d, man, cfg = built
    sources = [
        CompactionSource.from_index_file(d / fname) for fname in man["shards"]
    ]
    merged, provider, mappers = compact_indexes(sources, cfg, ds.similarity)
    assert int(merged.num_nodes) == N

    res = search(merged, provider, jnp.asarray(ds.queries), top_k=10, beam_width=48)
    n_local = -(-N // SHARDS)
    new_of_old = np.full(N, -1, np.int32)
    for s, m in enumerate(mappers):
        a = s * n_local
        new_of_old[a : a + m.shape[0]] = m
    gt_new = new_of_old[np.asarray(ds.ground_truth)[:, :10]]
    r = recall_at_k(np.asarray(res.ids), gt_new, 10)
    assert r >= 0.9, f"compacted-from-shards recall {r}"


def test_ltm_shards_load_onto_mesh(built):
    """The same shard containers restack onto a device mesh (load_sharded):
    one artifact serves both the host tier and the ICI-sharded tier."""
    d, _, _ = built
    mesh = make_mesh(2, "shard")
    idx = load_sharded(d, mesh)
    assert idx.n_shards == SHARDS and idx.n_total == N
    counts = np.asarray(idx.graphs.layers[0].counts)
    assert (counts.sum(axis=1) > 0).all()


def test_ragged_shard_filtered_search_no_phantoms(tmp_path_factory):
    """Shard containers are padded to a shared compile bucket, so a shard's
    array capacity exceeds its node count when the shard size is not a
    bucket size.  The global accept mask must be sliced by shard SIZE —
    slicing by capacity bled shard 1's accept bits onto shard 0's padding
    ordinals (phantom brute-path results + out-of-bounds rerank reads)."""
    N, D, SH = 1200, 16, 2
    ds = synthetic_dataset(n=N, dim=D, n_queries=16, k=10, seed=7)
    d = tmp_path_factory.mktemp("ragged")
    cfg = GraphConfig(max_degree=8, ef_construction=24, wave_size=256)
    sharded_build_on_disk(
        d, np.asarray(ds.base), n=N, dim=D, shards=SH, config=cfg,
        sim=ds.similarity,
    )
    sh = ShardedHostIndex.load(d)
    n_local = -(-N // SH)
    # the geometry under test: capacity strictly greater than shard size
    assert sh.shards[0].neighbors.shape[0] > n_local

    # accept ONLY the first 48 nodes of shard 1 — exactly the ids a
    # capacity-wide slice maps onto shard 0's padding rows
    mask = np.zeros(N, bool)
    mask[n_local : n_local + 48] = True
    res = sh.search(
        jnp.asarray(ds.queries), top_k=10, beam_width=24, expand=2,
        accept=mask,
    )
    ids = np.asarray(res.ids)
    assert (ids >= 0).all() and mask[ids].all()

    base = np.asarray(ds.base, np.float32)
    q = np.asarray(ds.queries, np.float32)
    sub = np.flatnonzero(mask)
    dist = (
        np.sum(q**2, axis=1)[:, None]
        - 2.0 * q @ base[sub].T
        + np.sum(base[sub] ** 2, axis=1)[None, :]
    )
    fgt = sub[np.argsort(dist, axis=1)[:, :10]]
    r = recall_at_k(ids, fgt, 10)
    assert r >= 0.99, f"ragged-shard filtered recall {r}"


def test_ltm_shards_mesh_search_with_per_shard_quantizers(tmp_path_factory):
    """sharded_build_on_disk trains an INDEPENDENT SQ4 quantizer per shard;
    load_sharded must not decode shard 0's codes with shard 1's affine.
    Shard ranges with different spreads make the affines measurably
    different, and the mesh search must still hit recall after the
    load-time re-encode."""
    import json

    from jvector_tpu.disk.format import FeatureId, load_index
    from jvector_tpu.parallel import sharded_graph_search

    N, D, SH = 4096, 16, 2
    rng = np.random.default_rng(3)
    half = N // SH
    lo = rng.normal(0.0, 1.0, size=(half, D)).astype(np.float32)
    hi = rng.normal(0.0, 2.5, size=(half, D)).astype(np.float32)
    base = np.concatenate([lo, hi])
    queries = np.concatenate(
        [lo[rng.integers(0, half, 8)], hi[rng.integers(0, half, 8)]]
    ) + rng.normal(0.0, 0.05, size=(16, D)).astype(np.float32)
    d2 = (
        np.sum(queries**2, axis=1)[:, None]
        - 2.0 * queries @ base.T
        + np.sum(base**2, axis=1)[None, :]
    )
    gt = np.argsort(d2, axis=1)[:, :10]

    d = tmp_path_factory.mktemp("perq")
    cfg = GraphConfig(max_degree=16, ef_construction=48, wave_size=256)
    man = sharded_build_on_disk(
        d, base, n=N, dim=D, shards=SH, config=cfg, sim="euclidean"
    )
    f4 = f"feature/{FeatureId.FUSED_SQ4}"
    s0 = np.asarray(load_index(d / man["shards"][0]).reader.read(f"{f4}/scale"))
    s1 = np.asarray(load_index(d / man["shards"][1]).reader.read(f"{f4}/scale"))
    assert not np.array_equal(s0, s1), "test needs differing per-shard affines"

    mesh = make_mesh(2, "shard")
    idx = load_sharded(d, mesh)
    gids, _ = sharded_graph_search(
        idx, jnp.asarray(queries), mesh, top_k=10, beam_width=48
    )
    r = recall_at_k(np.asarray(gids), gt, 10)
    assert r >= 0.9, f"per-shard-quantizer mesh recall {r}"
