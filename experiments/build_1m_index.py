"""Rebuild the 1M experiment index + PQ artifacts (wiped from /tmp).

Writes:
  /tmp/synth1mv2.jvtpu       graph + inline vectors
  /tmp/synth1m_queries.npy   8192 queries
  /tmp/synth1m_gt.npy        exact GT for first 512 queries (top-10)
  /tmp/synth1m_pq.npz        PQ codes [N,32] + codebooks + center
"""
import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph
from jvector_tpu.quantization import ProductQuantization
from jvector_tpu.util.datasets import exact_ground_truth, synthetic_dataset

N, DIM, NQ, K = 1_000_000, 128, 8192, 10
ds = synthetic_dataset(n=N, dim=DIM, n_queries=NQ, k=K, n_clusters=max(64, N // 500), seed=0)
base, queries = ds.base, ds.queries
gt = exact_ground_truth(base, queries[:512], K)
np.save("/tmp/synth1m_queries.npy", np.asarray(queries))
np.save("/tmp/synth1m_gt.npy", np.asarray(gt))
print(f"dataset+gt {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
cfg = GraphConfig(max_degree=32, ef_construction=100, wave_size=256)
graph, provider = build_graph(base, "euclidean", cfg)
jax.block_until_ready(graph.base.neighbors)
print(f"build {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
pq = ProductQuantization.compute(base, m=DIM // 4, clusters=256)
codes = pq.encode(base)
np.savez(
    "/tmp/synth1m_pq.npz",
    codes=np.asarray(codes),
    codebooks=np.asarray(pq.codebooks),
    center=np.asarray(pq.center) if pq.center is not None else np.zeros(0),
)
print(f"pq m={DIM//4} {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
from jvector_tpu.disk.format import FeatureId, write_index

write_index(
    "/tmp/synth1mv2.jvtpu",
    graph,
    features={FeatureId.INLINE_VECTORS: {"vectors": np.asarray(base)}},
)
print(f"save {time.time()-t0:.1f}s", flush=True)
print("DONE", flush=True)
