"""Serve-side entry_seeds A/B on the saved 1M index (SQ4 fused + rerank).

Multi-seed flat entries (searcher.search ``entry_seeds``) aim to cut the
sequential beam iterations spent walking the graph diameter from the single
global entry.  Measures recall + pipelined QPS at the bench operating point
(beam 20) for k in {1, 4, 8, 16}.
"""
import argparse
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--beams", default="20,25")
p.add_argument("--seeds", default="1,4,8,16")
p.add_argument("--wave", type=int, default=1024)
p.add_argument("--n-queries", type=int, default=8192)
args = p.parse_args()

import jax
import jax.numpy as jnp

from jvector_tpu.disk.format import load_index
from jvector_tpu.graph import ExactScoreProvider, search
from jvector_tpu.quantization import ScalarQuantization4
from jvector_tpu.util.datasets import recall_at_k

t0 = time.time()
idx = load_index("/tmp/synth1mv2.jvtpu")
graph, feats = idx.to_device()
base = feats["inline_vectors"]["vectors"]
queries = jnp.asarray(np.load("/tmp/synth1m_queries.npy"))[: args.n_queries]
gt = np.load("/tmp/synth1m_gt.npy")
exact = ExactScoreProvider(vectors=base, sim="euclidean")
sq = ScalarQuantization4.compute(base[: graph.num_nodes])
codes = sq.encode(base)
prov = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")
jax.block_until_ready(prov.fused_packed)
print(f"setup {time.time()-t0:.1f}s", flush=True)

w = args.wave
waves = [queries[i : i + w] for i in range(0, queries.shape[0] - w + 1, w)]
for beam in [int(b) for b in args.beams.split(",")]:
    for k in [int(s) for s in args.seeds.split(",")]:
        run = lambda q: search(
            graph, prov, q, top_k=10, beam_width=beam, rerank_k=beam,
            reranker=exact, entry_seeds=k,
        )
        res = run(queries[:512])
        r = recall_at_k(np.asarray(res.ids), gt[:512], 10)
        run(waves[0]).ids.block_until_ready()  # compile+warm
        t0 = time.time()
        outs = [run(wv).ids for wv in waves]
        for o in outs:
            o.block_until_ready()
        qps = sum(wv.shape[0] for wv in waves) / (time.time() - t0)
        print(
            f"beam={beam} entry_seeds={k}: recall@10={r:.4f} qps={qps:.0f}",
            flush=True,
        )
