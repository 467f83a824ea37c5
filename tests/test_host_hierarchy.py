"""Hierarchy through the bounded-memory serving tier (VERDICT r3 #5).

The reference's on-disk index is hierarchical: upper layers load into
memory and search descends before the L0 beam
(``OnDiskGraphIndex.java:132-162,183-226``).  Here: upper levels + their
SQ4 codes are HBM-resident, descent runs on device per query, and L0
streams rows from host memmaps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jvector_tpu.disk.host_graph import (
    HostGraphIndex,
    SQ4StreamScorer,
    write_sq4_index,
)
from jvector_tpu.disk.ltm import build_on_disk_ltm
from jvector_tpu.graph import GraphConfig, build_graph
from jvector_tpu.quantization import ScalarQuantization4
from jvector_tpu.util.datasets import exact_ground_truth, recall_at_k


@pytest.fixture(scope="module")
def hier_saved(tmp_path_factory):
    rng = np.random.default_rng(11)
    n, d = 6000, 48
    centers = rng.normal(size=(32, d)).astype(np.float32) * 3
    base = centers[rng.integers(0, 32, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    queries = centers[rng.integers(0, 32, 64)] + rng.normal(
        size=(64, d)
    ).astype(np.float32)
    gt = exact_ground_truth(base, queries, 10)
    graph, _ = build_graph(
        base, "euclidean", GraphConfig(max_degree=16, add_hierarchy=True)
    )
    assert graph.num_levels > 1  # the fixture must actually be hierarchical

    sq = ScalarQuantization4.compute(base)
    codes = sq.encode(base)
    pad = graph.capacity - codes.shape[0]
    codes = jnp.concatenate([codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)])
    prov = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")

    path = tmp_path_factory.mktemp("hh") / "hier.jvtpu"
    write_sq4_index(
        path, graph, sq, codes, prov, "euclidean",
        inline_vectors={"vectors": base},
    )
    return path, base, queries, gt, graph


def test_upper_levels_round_trip(hier_saved):
    path, base, queries, gt, graph = hier_saved
    hg = HostGraphIndex.load(path)
    assert len(hg.upper_node_ids) == graph.num_levels - 1
    for l, (nbrs, ids) in enumerate(
        zip(hg.upper_neighbors, hg.upper_node_ids)
    ):
        # layers are padded to their compile bucket; slots past len(ids)
        # are unreachable (no edges point at them)
        assert nbrs.shape[0] >= ids.shape[0]
        # level ids ascend (slots_for searchsorted contract)
        assert (np.diff(ids) > 0).all()
        np.testing.assert_array_equal(
            ids, np.asarray(graph.level_node_ids[l])
        )


def test_descent_yields_per_query_entries(hier_saved):
    path, base, queries, gt, graph = hier_saved
    hg = HostGraphIndex.load(path)
    scorer = SQ4StreamScorer(
        scale=jnp.asarray(hg.scale), offset=jnp.asarray(hg.offset), sim=hg.sim
    )
    entries = hg._descend(scorer, jnp.asarray(queries))
    assert entries.shape == (queries.shape[0],)
    assert (entries >= 0).all() and (entries < base.shape[0]).all()
    # descent differentiates queries (a flat graph would return one entry)
    assert len(np.unique(entries)) > 4
    # each entry should be CLOSE to its query relative to the global
    # entry point: compare mean distance
    d_ent = np.linalg.norm(base[entries] - queries, axis=1)
    d_glob = np.linalg.norm(base[hg.entry_node][None] - queries, axis=1)
    assert d_ent.mean() < d_glob.mean()


def test_hierarchical_host_serve_recall(hier_saved):
    path, base, queries, gt, graph = hier_saved
    hg = HostGraphIndex.load(path)
    res = hg.search(jnp.asarray(queries), top_k=10, beam_width=40, expand=4)
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    assert r >= 0.93, r
    # no duplicate results within a row
    for row in np.asarray(res.ids):
        live = [x for x in row.tolist() if x >= 0]
        assert len(live) == len(set(live))


def test_hierarchical_filtered_search(hier_saved):
    path, base, queries, gt, graph = hier_saved
    hg = HostGraphIndex.load(path)
    rng = np.random.default_rng(3)
    mask = rng.random(base.shape[0]) < 0.05
    sub = np.where(mask)[0]
    d = (
        np.sum(queries**2, axis=1)[:, None]
        - 2.0 * queries @ base[sub].T
        + np.sum(base[sub] ** 2, axis=1)[None, :]
    )
    fgt = sub[np.argsort(d, axis=1)[:, :10]]
    res = hg.search(
        jnp.asarray(queries), top_k=10, beam_width=40, expand=4,
        accept=mask, accept_brute_cutoff=0,  # force the in-loop path
    )
    ids = np.asarray(res.ids)
    assert mask[ids[ids >= 0]].all()  # only accepted results
    r = recall_at_k(ids, fgt, 10)
    assert r >= 0.9, r


def test_ltm_build_with_hierarchy(tmp_path):
    rng = np.random.default_rng(7)
    n, d = 4096, 32
    centers = rng.normal(size=(16, d)).astype(np.float32) * 3
    base = centers[rng.integers(0, 16, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    queries = centers[rng.integers(0, 16, 48)] + rng.normal(
        size=(48, d)
    ).astype(np.float32)
    gt = exact_ground_truth(base, queries, 10)

    path = tmp_path / "ltm_hier.jvtpu"
    cfg = GraphConfig(
        max_degree=16, ef_construction=64, wave_size=128, add_hierarchy=True
    )
    graph, _ = build_on_disk_ltm(
        path, base, n=n, dim=d, config=cfg, compression="sq4"
    )
    assert graph.num_levels > 1

    hg = HostGraphIndex.load(path)
    assert len(hg.upper_node_ids) == graph.num_levels - 1
    res = hg.search(jnp.asarray(queries), top_k=10, beam_width=40, expand=4)
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    assert r >= 0.9, r
