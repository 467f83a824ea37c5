"""Tutorial: the TPU-native flagship serving stack (SQ4) at three tiers.

1. In-HBM: fused SQ4 first pass + exact f32 rerank (the bench flagship).
2. Host rerank tier: beam on codes in HBM, full-res vectors stay on host.
3. Bounded-memory: adjacency + fused codes ALSO stay on host, streamed per
   expansion (`HostGraphIndex`) — the 100M larger-than-memory serving mode.

Reference counterpart: tutorials 1-3 + `OnDiskGraphIndex` disk search.
Run: PYTHONPATH=. python examples/sq4_serving.py  (CPU-safe)
"""

import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.disk.host_graph import HostGraphIndex, write_sq4_index
from jvector_tpu.disk.host_tier import HostVectorStore, search_with_host_rerank
from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.quantization import ScalarQuantization4
from jvector_tpu.util.datasets import (
    exact_ground_truth,
    recall_at_k,
    synthetic_dataset,
)


def main(n=20_000, dim=64):
    ds = synthetic_dataset(n=n, dim=dim, n_queries=256, k=10,
                           n_clusters=max(64, n // 500), seed=3)
    gt = exact_ground_truth(ds.base, ds.queries, 10)
    q = jnp.asarray(ds.queries)

    print(f"building {n} x {dim} ...")
    graph, exact = build_graph(
        ds.base, "euclidean", GraphConfig(max_degree=32, ef_construction=100)
    )

    # SQ4: fit on a sample, encode, build the fused neighbor-code tables
    sq = ScalarQuantization4.compute(ds.base)
    codes = sq.encode(ds.base)
    pad = graph.capacity - codes.shape[0]
    if pad:
        codes = jnp.concatenate([codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)])
    prov = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")

    # --- tier 1: everything in HBM ---------------------------------------
    t0 = time.time()
    res = search(graph, prov, q, top_k=10, beam_width=40, rerank_k=40,
                 reranker=exact)
    res.ids.block_until_ready()
    r1 = recall_at_k(np.asarray(res.ids), gt, 10)
    print(f"tier 1 (in-HBM fused SQ4 + f32 rerank): recall {r1:.4f} "
          f"({256/(time.time()-t0):.0f} QPS cold)")

    # --- tier 2: full-res vectors on host --------------------------------
    store = HostVectorStore(vectors=np.asarray(ds.base), sim="euclidean")
    res2 = search_with_host_rerank(graph, prov, store, q, top_k=10,
                                   beam_width=40)
    r2 = recall_at_k(np.asarray(res2.ids), gt, 10)
    print(f"tier 2 (host rerank tier): recall {r2:.4f}")

    # --- tier 3: graph + codes on host too (bounded HBM) ------------------
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "index.jvtpu")
        write_sq4_index(path, graph, sq, codes, prov, "euclidean")
        hg = HostGraphIndex.load(path)
        budget = hg.hbm_bytes(n_queries=256, beam_width=40, expand=4)
        res3 = hg.search(q, top_k=10, beam_width=40, expand=4, rerank=store)
        r3 = recall_at_k(np.asarray(res3.ids), gt, 10)
        full = hg.fused_packed.size + hg.neighbors.size * 4
        print(f"tier 3 (bounded-memory streaming): recall {r3:.4f}, device "
              f"working set ~{budget/1e6:.0f} MB vs {full/1e6:.0f} MB of "
              f"graph arrays kept on host")


if __name__ == "__main__":
    main()
