"""Randomized mutation stress test.

Reference: ``TestConcurrentReadWriteDeletes`` (20k mixed insert/delete/search
ops validating snapshot isolation).  Here concurrency is waves, so the
equivalent invariant check is: after an arbitrary interleaving of insert
waves, tombstone deletes, splice cleanups, and searches, the index stays
consistent (no deleted results, no dangling edges, recall holds).

Scale matches the reference's 20k-op run: 32 randomized steps growing the
index to 20k+ nodes, with the invariants checked after EVERY step (the
reference interleaves searches the same way)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.graph.mutation import add_nodes, mark_deleted, remove_deleted
from jvector_tpu.util.datasets import exact_ground_truth, synthetic_dataset

N_TOTAL = 24_000
N_INITIAL = 6_000
N_STEPS = 32


def test_randomized_lifecycle():
    rng = np.random.default_rng(1234)
    ds = synthetic_dataset(n=N_TOTAL, dim=16, n_queries=20, k=20, seed=51)
    cfg = GraphConfig(max_degree=12, ef_construction=32, wave_size=256)

    graph, provider = build_graph(ds.base[:N_INITIAL], ds.similarity, cfg)
    inserted = N_INITIAL
    deleted: set[int] = set()
    counts = {"insert": 0, "delete": 0, "splice": 0}

    for step in range(N_STEPS):
        # Randomized interleaving (not round-robin): ordering bugs in the
        # insert/delete/cleanup state machine need runs like
        # insert-insert-delete-splice-delete-splice-insert to surface.
        op = rng.choice(["insert", "delete", "splice"], p=[0.45, 0.30, 0.25])
        if op == "insert" and inserted >= N_TOTAL:
            op = "delete"
        if op == "insert":
            k = int(rng.integers(600, 1400))
            k = min(k, N_TOTAL - inserted)
            graph, provider = add_nodes(
                graph, provider, ds.base[inserted : inserted + k], cfg
            )
            inserted += k
        elif op == "delete":
            live = np.asarray(
                [i for i in range(inserted) if i not in deleted], np.int32
            )
            victims = rng.choice(
                live, size=min(400, len(live) // 10), replace=False
            )
            graph = mark_deleted(graph, victims)
            deleted.update(int(v) for v in victims)
        else:  # splice cleanup
            graph = remove_deleted(graph, provider, cfg, chunk=2048)
        counts[op] += 1

        # invariants: search never returns deleted nodes, ids in range,
        # adjacency rows stay -1-padded unique with no self-loops
        res = search(
            graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=32
        )
        ids = np.asarray(res.ids)
        assert ids.max() < inserted
        if deleted:
            assert not np.isin(ids, np.asarray(sorted(deleted))).any(), (
                f"step {step} ({op}): deleted node in results"
            )
        if step % 8 == 7:  # row-structure audit (O(N*R) host pass)
            nbrs = np.asarray(graph.base.neighbors)[:inserted]
            cnts = np.asarray(graph.base.counts)[:inserted]
            assert (nbrs < inserted).all(), f"step {step}: edge to unborn node"
            rows_sorted = np.sort(np.where(nbrs < 0, 2**31 - 1, nbrs), axis=1)
            dup = (rows_sorted[:, 1:] == rows_sorted[:, :-1]) & (
                rows_sorted[:, 1:] < 2**31 - 1
            )
            assert not dup.any(), f"step {step}: duplicate neighbor ids"
            self_loop = nbrs == np.arange(inserted)[:, None]
            assert not self_loop.any(), f"step {step}: self-loop edge"
            valid = (nbrs >= 0).sum(axis=1)
            assert (valid == cnts).all(), f"step {step}: counts out of sync"

    # every op class must actually have run for the interleaving to count
    assert min(counts.values()) >= 3, counts
    assert inserted >= 20_000, f"stress never reached 20k nodes: {inserted}"

    # final quality check against GT restricted to live survivors
    live_mask = np.zeros(N_TOTAL, bool)
    live_mask[:inserted] = True
    live_mask[np.asarray(sorted(deleted), np.int64)] = False
    gt = exact_ground_truth(ds.base[live_mask], ds.queries, 10, ds.similarity)
    live_ids = np.where(live_mask)[0]
    gt_global = live_ids[gt]
    res = search(
        graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=48
    )
    ids = np.asarray(res.ids)
    hits = sum(
        len(set(ids[q].tolist()) & set(gt_global[q].tolist()))
        for q in range(ids.shape[0])
    )
    recall = hits / (ids.shape[0] * 10)
    assert recall >= 0.85, f"post-stress recall {recall}"
