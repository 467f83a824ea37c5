"""Trace the cleanup (enforce-degree) pass on the real chip.

The r4 warm 1M probe shows cleanup at 17.5s (244 chunks of 4096 rows =
~72 ms/chunk) — an order of magnitude above the accountable compute
(simmat gather ~4 ms + prune rounds ~2 ms + table copy-on-write ~3 ms).
This script builds a small graph, then profiles N cleanup chunks so the
per-op durations say where the time actually goes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/trace_cleanup.py
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
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--chunks", type=int, default=24)
    p.add_argument("--chunk-size", type=int, default=4096)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from jvector_tpu.graph import GraphConfig
    from jvector_tpu.graph.builder import GraphIndexBuilder, _enforce_chunk
    from jvector_tpu.util.datasets import synthetic_dataset

    print(f"device={jax.devices()[0]}", flush=True)
    ds = synthetic_dataset(
        n=args.n, dim=args.dim, n_queries=16, k=10,
        n_clusters=max(64, args.n // 500), seed=0,
    )
    cfg = GraphConfig(max_degree=32, ef_construction=100)
    builder = GraphIndexBuilder(cfg)
    graph, provider = builder.build(ds.base, "euclidean", cleanup=False)
    jax.block_until_ready(graph.base.neighbors)
    print("built (no cleanup)", flush=True)

    cs = args.chunk_size
    # warmup/compile
    g2 = _enforce_chunk(graph, provider, jnp.int32(0), builder.config, cs)
    jax.block_until_ready(g2.base.neighbors)

    t0 = time.time()
    g = graph
    for i in range(args.chunks):
        g = _enforce_chunk(g, provider, jnp.int32(i * cs), builder.config, cs)
    jax.block_until_ready(g.base.neighbors)
    wall = time.time() - t0
    print(f"{args.chunks} chunks: {wall*1000:.1f} ms "
          f"({wall*1000/args.chunks:.1f} ms/chunk)", flush=True)

    trace_dir = "/tmp/cleanup_trace"
    with jax.profiler.trace(trace_dir):
        g = graph
        for i in range(args.chunks):
            g = _enforce_chunk(g, provider, jnp.int32(i * cs), builder.config, cs)
        jax.block_until_ready(g.base.neighbors)

    # aggregate device-op durations from the trace
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                pid_name = ev.get("pid", 0)
                agg[name] += ev["dur"] / 1e3  # us -> ms
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, ms in top:
        print(f"{ms:10.1f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
