"""BASELINE configs 3/4 + hierarchy demonstration runs (single chip)."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from jvector_tpu.graph import (GraphConfig, build_graph, search,
                               FusedADCScoreProvider, build_fused_codes)
from jvector_tpu.quantization import BinaryQuantization, NVQuantization, ProductQuantization
from jvector_tpu.util.datasets import synthetic_dataset, exact_ground_truth, recall_at_k

def operating(run, qd, gt, k=10, beams=(20, 30, 40, 60, 80, 120)):
    best = None
    for b in beams:
        res = run(qd[:512], b)
        r = recall_at_k(np.asarray(res.ids), gt, k)
        best = (b, r)
        if r >= 0.95: break
    b, r = best
    run(qd[:1024], b).ids.block_until_ready()
    t0 = time.time()
    outs = [run(qd[i:i+1024], b).ids for i in range(0, 8192, 1024)]
    for o in outs: o.block_until_ready()
    qps = 8192/(time.time()-t0)
    return b, r, qps

# ---- config 3: deep1M-like (96d, normalized, dot product), anisotropic PQ fused ADC
N, D = 1_000_000, 96
ds = synthetic_dataset(n=N, dim=D, n_queries=8192, k=10, sim="dot_product",
                       n_clusters=max(64, N//500), seed=7)
base = np.asarray(ds.base); base /= np.linalg.norm(base, axis=1, keepdims=True)
qs = np.asarray(ds.queries); qs /= np.linalg.norm(qs, axis=1, keepdims=True)
qd = jnp.asarray(qs)
bj = jnp.asarray(base)
gt = np.asarray(jax.lax.top_k(qd[:512] @ bj.T, 10)[1])
t0 = time.time()
graph, exact = build_graph(base, "dot_product", GraphConfig(max_degree=32, ef_construction=100))
jax.block_until_ready(graph.base.neighbors)
build_s = time.time()-t0
t0 = time.time()
pq = ProductQuantization.compute(base, m=D//4, clusters=256, globally_center=False,
                                 anisotropic_threshold=0.2)
codes = pq.encode(base)
pad = graph.capacity - codes.shape[0]
codes = jnp.concatenate([codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)])
fused = build_fused_codes(graph.base.neighbors, codes)
prov = FusedADCScoreProvider(codes=codes, fused_codes=fused, codebooks=pq.codebooks,
                             center=pq.center, sim="dot_product")
quant_s = time.time()-t0
def run3(q, b):
    return search(graph, prov, q, top_k=10, beam_width=b, rerank_k=b, reranker=exact)
b, r, qps = operating(run3, qd, gt)
print(json.dumps({"config": "deep1M-like anisoPQ fused ADC + f32 rerank",
                  "n": N, "dim": D, "build_s": round(build_s,1),
                  "quant_s": round(quant_s,1), "beam": b,
                  "recall": round(float(r),4), "qps": round(qps,1)}), flush=True)
del prov, fused, codes

# ---- config 3 FLAGSHIP serve: anisotropic SQ4 (SCANN coordinate descent
# over scalar levels) on the fused arithmetic-ADC path + exact rerank.
# Table-gather ADC (the LUT row above) is VPU-bound on TPU; anisotropic
# SQ4 keeps the anisotropic-training benefit at flagship speed.
from jvector_tpu.quantization import ScalarQuantization4
t0 = time.time()
sq = ScalarQuantization4.compute(base)
acodes = sq.encode_anisotropic(base, threshold=0.2)
pad = graph.capacity - acodes.shape[0]
acodes = jnp.concatenate([acodes, jnp.zeros((pad, acodes.shape[1]), jnp.uint8)])
prov_a = sq.provider_for_graph(acodes, graph.base.neighbors, "dot_product")
jax.block_until_ready(prov_a.fused_packed)
quant_sa = time.time()-t0
def run3a(q, b):
    return search(graph, prov_a, q, top_k=10, beam_width=b, rerank_k=b, reranker=exact)
b, r, qps = operating(run3a, qd, gt)
print(json.dumps({"config": "deep1M-like anisoSQ4 fused + f32 rerank (flagship serve)",
                  "n": N, "dim": D, "build_s": round(build_s,1),
                  "quant_s": round(quant_sa,1), "beam": b,
                  "recall": round(float(r),4), "qps": round(qps,1)}), flush=True)
del graph, exact, prov_a, acodes, bj

# ---- config 4: ada-002-like (1536d), BQ first pass + NVQ rerank
N4, D4 = 200_000, 1536
ds4 = synthetic_dataset(n=N4, dim=D4, n_queries=8192, k=10, sim="cosine",
                        n_clusters=max(64, N4//500), seed=8)
b4 = np.asarray(ds4.base); b4 /= np.linalg.norm(b4, axis=1, keepdims=True)
q4 = np.asarray(ds4.queries); q4 /= np.linalg.norm(q4, axis=1, keepdims=True)
qd4 = jnp.asarray(q4)
bj4 = jnp.asarray(b4)
gt4 = np.asarray(jax.lax.top_k(qd4[:512] @ bj4.T, 10)[1])
t0 = time.time()
graph4, exact4 = build_graph(b4, "dot_product", GraphConfig(max_degree=32, ef_construction=100))
jax.block_until_ready(graph4.base.neighbors)
build4_s = time.time()-t0
t0 = time.time()
bq = BinaryQuantization.compute(b4)
bq_prov = bq.provider(bq.encode(b4))
nvq = NVQuantization.compute(b4)
nvq_prov = nvq.encode(b4).provider("dot_product")
quant4_s = time.time()-t0
def run4(q, b):
    return search(graph4, bq_prov, q, top_k=10, beam_width=b, rerank_k=b, reranker=nvq_prov)
b, r, qps = operating(run4, qd4, gt4)
print(json.dumps({"config": "ada002-like BQ first pass + NVQ rerank",
                  "n": N4, "dim": D4, "build_s": round(build4_s,1),
                  "quant_s": round(quant4_s,1), "beam": b,
                  "recall": round(float(r),4), "qps": round(qps,1)}), flush=True)
del graph4, exact4, bq_prov, nvq_prov, bj4

# ---- hierarchy data point: 1M euclidean, addHierarchy=True
N5, D5 = 1_000_000, 128
ds5 = synthetic_dataset(n=N5, dim=D5, n_queries=8192, k=10,
                        n_clusters=max(64, N5//500), seed=0)
gt5 = exact_ground_truth(ds5.base, ds5.queries[:512], 10)
qd5 = jnp.asarray(ds5.queries)
t0 = time.time()
graph5, exact5 = build_graph(ds5.base, "euclidean",
                             GraphConfig(max_degree=32, ef_construction=100, add_hierarchy=True))
jax.block_until_ready(graph5.base.neighbors)
build5_s = time.time()-t0
def run5(q, b):
    return search(graph5, exact5, q, top_k=10, beam_width=b)
b, r, qps = operating(run5, qd5, gt5)
print(json.dumps({"config": "1M euclidean exact with hierarchy (reference default addHierarchy)",
                  "levels": graph5.num_levels, "build_s": round(build5_s,1),
                  "beam": b, "recall": round(float(r),4), "qps": round(qps,1)}), flush=True)
