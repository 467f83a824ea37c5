"""Randomized mutation stress test.

Reference: ``TestConcurrentReadWriteDeletes`` (20k mixed insert/delete/search
ops validating snapshot isolation).  Here concurrency is waves, so the
equivalent invariant check is: after an arbitrary interleaving of insert
waves, tombstone deletes, splice cleanups, and searches, the index stays
consistent (no deleted results, no dangling edges, recall holds)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.graph.mutation import add_nodes, mark_deleted, remove_deleted
from jvector_tpu.util.datasets import exact_ground_truth, synthetic_dataset


def test_randomized_lifecycle():
    rng = np.random.default_rng(1234)
    ds = synthetic_dataset(n=3000, dim=16, n_queries=20, k=20, seed=51)
    cfg = GraphConfig(max_degree=12, ef_construction=32, wave_size=128)

    graph, provider = build_graph(ds.base[:1000], ds.similarity, cfg)
    inserted = 1000
    deleted: set[int] = set()

    for step in range(6):
        op = step % 3
        if op == 0 and inserted < 3000:  # insert a chunk
            k = int(rng.integers(200, 400))
            k = min(k, 3000 - inserted)
            graph, provider = add_nodes(
                graph, provider, ds.base[inserted : inserted + k], cfg
            )
            inserted += k
        elif op == 1:  # tombstone a random live set
            live = np.asarray(
                [i for i in range(inserted) if i not in deleted], np.int32
            )
            victims = rng.choice(live, size=min(80, len(live) // 10), replace=False)
            graph = mark_deleted(graph, victims)
            deleted.update(int(v) for v in victims)
        else:  # splice cleanup
            graph = remove_deleted(graph, provider, cfg, chunk=512)

        # invariant: search never returns deleted nodes, ids in range
        res = search(
            graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=32
        )
        ids = np.asarray(res.ids)
        assert ids.max() < inserted
        if deleted:
            assert not np.isin(ids, np.asarray(sorted(deleted))).any(), (
                f"step {step}: deleted node in results"
            )

    # final quality check against GT restricted to live survivors
    live_mask = np.zeros(3000, bool)
    live_mask[:inserted] = True
    live_mask[np.asarray(sorted(deleted), np.int64)] = False
    gt = exact_ground_truth(
        ds.base[live_mask], ds.queries, 10, ds.similarity
    )
    live_ids = np.where(live_mask)[0]
    gt_global = live_ids[gt]
    res = search(graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=48)
    ids = np.asarray(res.ids)
    hits = sum(
        len(set(ids[q].tolist()) & set(gt_global[q].tolist()))
        for q in range(ids.shape[0])
    )
    recall = hits / (ids.shape[0] * 10)
    assert recall >= 0.85, f"post-stress recall {recall}"
