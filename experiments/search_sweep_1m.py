"""Search-path sweep on the saved 1M index: exact vs fused8 vs LUT16, E sweep.

Usage: python /tmp/exp_search.py [--modes lut16_64,lut16_128,exact,fused8]
"""
import argparse
import json
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--modes", default="exact,fused8,lut16_64,lut16_128")
p.add_argument("--wave", type=int, default=1024)
p.add_argument("--expand", default="1,2,4")
p.add_argument("--beams", default="20,30,40,60")
args = p.parse_args()

import jax
import jax.numpy as jnp

from jvector_tpu.disk.format import load_index
from jvector_tpu.graph import (
    ExactScoreProvider,
    FusedADCScoreProvider,
    LUT16ScoreProvider,
    build_fused_codes,
    build_fused_codes_lut16,
    search,
)
from jvector_tpu.ops.pallas.adc16_kernel import pack_nibbles
from jvector_tpu.quantization import ProductQuantization
from jvector_tpu.util.datasets import recall_at_k

t0 = time.time()
idx = load_index("/tmp/synth1mv2.jvtpu")
graph, feats = idx.to_device()
base = feats["inline_vectors"]["vectors"]
queries = jnp.asarray(np.load("/tmp/synth1m_queries.npy"))
gt = np.load("/tmp/synth1m_gt.npy")
print(f"load {time.time()-t0:.1f}s  graph cap={graph.capacity}", flush=True)

exact = ExactScoreProvider(vectors=base, sim="euclidean")
N = base.shape[0]


def pad_codes(c):
    padn = graph.capacity - c.shape[0]
    if padn:
        c = jnp.concatenate([c, jnp.zeros((padn, c.shape[1]), c.dtype)])
    return c


providers = {}
for mode in args.modes.split(","):
    t0 = time.time()
    if mode == "exact":
        providers[mode] = (exact, None)
    elif mode == "exact_bf16":
        providers[mode] = (
            ExactScoreProvider(vectors=base.astype(jnp.bfloat16), sim="euclidean"),
            exact,
        )
    elif mode == "fused8":
        z = np.load("/tmp/synth1m_pq.npz")
        codes = pad_codes(jnp.asarray(z["codes"]))
        fused = build_fused_codes(graph.base.neighbors, codes)
        providers[mode] = (
            FusedADCScoreProvider(
                codes=codes,
                fused_codes=fused,
                codebooks=jnp.asarray(z["codebooks"]),
                center=jnp.asarray(z["center"]) if z["center"].size else None,
                sim="euclidean",
            ),
            exact,
        )
    elif mode == "sq4":
        from jvector_tpu.quantization import ScalarQuantization4

        sq = ScalarQuantization4.compute(base)
        codes = pad_codes(sq.encode(base))
        providers[mode] = (
            sq.provider_for_graph(codes, graph.base.neighbors, "euclidean"),
            exact,
        )
    elif mode.startswith("lut16_"):
        m = int(mode.split("_")[1])
        pq = ProductQuantization.compute(base, m=m, clusters=16)
        packed = pad_codes(pack_nibbles(pq.encode(base)))
        fused = build_fused_codes_lut16(graph.base.neighbors, packed)
        providers[mode] = (
            LUT16ScoreProvider(
                codes_packed=packed,
                fused_packed=fused,
                codebooks=pq.codebooks,
                center=pq.center,
                sim="euclidean",
            ),
            exact,
        )
    jax.block_until_ready(jax.tree.leaves(providers[mode][0]))
    print(f"provider {mode} ready {time.time()-t0:.1f}s", flush=True)

w = args.wave
NQ = queries.shape[0]
waves = [queries[i : i + w] for i in range(0, NQ, w) if i + w <= NQ]

for mode, (prov, rr) in providers.items():
    for E in [int(x) for x in args.expand.split(",")]:
        for beam in [int(x) for x in args.beams.split(",")]:
            res = search(
                graph,
                prov,
                queries[:512],
                top_k=10,
                beam_width=beam,
                rerank_k=beam,
                reranker=rr,
                expand_per_iter=E,
            )
            r = recall_at_k(np.asarray(res.ids), gt, 10)
            # timed run
            def run(q):
                return search(
                    graph,
                    prov,
                    q,
                    top_k=10,
                    beam_width=beam,
                    rerank_k=beam,
                    reranker=rr,
                    expand_per_iter=E,
                ).ids

            run(waves[0]).block_until_ready()
            t0 = time.time()
            tot = 0
            for wv in waves:
                run(wv).block_until_ready()
                tot += wv.shape[0]
            qps = tot / (time.time() - t0)
            print(
                json.dumps(
                    dict(
                        mode=mode,
                        E=E,
                        beam=beam,
                        recall=round(float(r), 4),
                        qps=round(qps, 1),
                        visited=round(float(jnp.mean(res.visited_count)), 1),
                    )
                ),
                flush=True,
            )
