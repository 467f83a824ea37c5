"""Single-query latency: wall (tunnel RTT included) vs on-chip device time.

VERDICT r3 #4 asks what ONE query costs.  On this rig every host<->device
round trip pays ~27 ms of remote-chip tunnel RTT, so wall-clock p50 at Q=1
measures the tunnel, not the engine.  This script reports both:

- wall p50/p999 per call (what THIS rig sees)
- device time per search program from a profiler trace (what the engine
  costs on-chip — the number a local-PCIe deployment would see, reference
  LatencyBenchmark semantics)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/single_query_latency.py
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--beam", type=int, default=25)
    p.add_argument("--iters", type=int, default=60)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.quantization import ScalarQuantization4
    from jvector_tpu.util.datasets import synthetic_dataset

    print(f"device={jax.devices()[0]}", flush=True)
    ds = synthetic_dataset(
        n=args.n, dim=args.dim, n_queries=512, k=10,
        n_clusters=max(64, args.n // 500), seed=0,
    )
    cfg = GraphConfig(max_degree=32, ef_construction=100)
    graph, exact = build_graph(ds.base, "euclidean", cfg)
    sq = ScalarQuantization4.compute(ds.base)
    codes = sq.encode(ds.base)
    pad = graph.capacity - codes.shape[0]
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)]
        )
    prov = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")
    qd = jnp.asarray(ds.queries)

    def run(qs):
        return search(graph, prov, qs, top_k=10, beam_width=args.beam,
                      rerank_k=args.beam, reranker=exact)

    out = {}
    for q in (1, 16, 64):
        qs = qd[:q]
        run(qs).ids.block_until_ready()  # compile
        lat = []
        for i in range(args.iters):
            t0 = time.time()
            run(qs).ids.block_until_ready()
            lat.append((time.time() - t0) * 1000)
        lat = np.asarray(lat)

        trace_dir = f"/tmp/sq_lat_trace_q{q}"
        with jax.profiler.trace(trace_dir):
            for i in range(10):
                run(qs).ids.block_until_ready()
        agg = defaultdict(float)
        for f in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
            with gzip.open(f, "rt") as fh:
                data = json.load(fh)
            for ev in data.get("traceEvents", []):
                if ev.get("ph") == "X" and "dur" in ev:
                    agg[ev.get("name", "?")] += ev["dur"] / 1e3
        # device program durations: ONLY top-level XLA module/executable
        # events (named "jit_<fn>"), never their child ops — trace X-events
        # nest, and summing both a module event and its children would
        # double-count device time
        dev_ms = sum(ms for name, ms in agg.items()
                     if name.startswith("jit_")) / 10.0
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:8]
        out[f"Q{q}"] = {
            "wall_p50_ms": round(float(np.quantile(lat, 0.5)), 2),
            "wall_p999_ms": round(float(np.quantile(lat, 0.999)), 2),
            "device_ms_per_call": round(dev_ms, 2),
        }
        print(f"Q={q}: wall p50 {out[f'Q{q}']['wall_p50_ms']} ms, "
              f"device {dev_ms:.2f} ms/call", flush=True)
        for name, ms in top:
            print(f"   {ms/10.0:8.2f} ms/call  {name[:90]}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
