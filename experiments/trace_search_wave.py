"""Trace one search wave and aggregate per-op durations from the XLA trace.

Usage: python /tmp/exp_trace.py --mode exact --beam 30 --expand 1
"""
import argparse
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--mode", default="exact")
p.add_argument("--beam", type=int, default=30)
p.add_argument("--expand", type=int, default=1)
p.add_argument("--wave", type=int, default=1024)
args = p.parse_args()

import jax
import jax.numpy as jnp

from jvector_tpu.disk.format import load_index
from jvector_tpu.graph import (
    ExactScoreProvider,
    LUT16ScoreProvider,
    build_fused_codes_lut16,
    search,
)
from jvector_tpu.ops.pallas.adc16_kernel import pack_nibbles
from jvector_tpu.quantization import ProductQuantization

idx = load_index("/tmp/synth1mv2.jvtpu")
graph, feats = idx.to_device()
base = feats["inline_vectors"]["vectors"]
queries = jnp.asarray(np.load("/tmp/synth1m_queries.npy"))
exact = ExactScoreProvider(vectors=base, sim="euclidean")

if args.mode == "exact":
    prov, rr = exact, None
elif args.mode == "sq4":
    from jvector_tpu.quantization import ScalarQuantization4
    sq = ScalarQuantization4.compute(base)
    codes = sq.encode(base)
    padn = graph.capacity - codes.shape[0]
    codes = jnp.concatenate([codes, jnp.zeros((padn, codes.shape[1]), jnp.uint8)])
    prov = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")
    rr = exact
elif args.mode.startswith("lut16_"):
    m = int(args.mode.split("_")[1])
    pq = ProductQuantization.compute(base, m=m, clusters=16)
    packed = pack_nibbles(pq.encode(base))
    padn = graph.capacity - packed.shape[0]
    packed = jnp.concatenate([packed, jnp.zeros((padn, packed.shape[1]), jnp.uint8)])
    fused = build_fused_codes_lut16(graph.base.neighbors, packed)
    prov = LUT16ScoreProvider(
        codes_packed=packed, fused_packed=fused, codebooks=pq.codebooks,
        center=pq.center, sim="euclidean",
    )
    rr = exact

q = queries[: args.wave]


def run():
    return search(
        graph, prov, q, top_k=10, beam_width=args.beam,
        rerank_k=args.beam, reranker=rr, expand_per_iter=args.expand,
    ).ids


run().block_until_ready()  # compile
t0 = time.time()
run().block_until_ready()
wall = time.time() - t0
print(f"wave wall: {wall*1000:.1f} ms  ({args.wave/wall:.0f} QPS)")

with jax.profiler.trace("/tmp/trace_out"):
    run().block_until_ready()

# aggregate
files = sorted(glob.glob("/tmp/trace_out/**/*.trace.json.gz", recursive=True))
ev_by_name = defaultdict(float)
cnt_by_name = defaultdict(int)
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)
for ev in data.get("traceEvents", []):
    if ev.get("ph") == "X" and "dur" in ev:
        name = ev.get("name", "?")
        pid = ev.get("pid", 0)
        ev_by_name[name] += ev["dur"]
        cnt_by_name[name] += 1
rows = sorted(ev_by_name.items(), key=lambda kv: -kv[1])[:40]
total = sum(ev_by_name.values())
for name, dur in rows:
    print(f"{dur/1000:9.2f} ms  x{cnt_by_name[name]:<6} {name[:110]}")
