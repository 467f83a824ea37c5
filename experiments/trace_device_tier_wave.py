"""Trace one 10M device-tier wave and aggregate per-op durations.

Where do the ~104 ms per 512-query wave go?  The 1M wave-size knee did
NOT transfer (2048-query waves left QPS flat — experiments/README.md), so
the tier is scaling with per-query work; this attributes it (gathers vs
ADC compute vs sort/merge machinery) the same way trace_search_wave.py
attributed the 1M searcher.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/trace_device_tier_wave.py --beam 35 --expand 1
"""
import argparse
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--index", default="/tmp/ltm_10m_sq4.jvtpu")
p.add_argument("--queries", default="/tmp/synth10m_queries.npy")
p.add_argument("--beam", type=int, default=35)
p.add_argument("--expand", type=int, default=1)
p.add_argument("--seeds", type=int, default=1)
args = p.parse_args()

import jax
import jax.numpy as jnp

from jvector_tpu.disk import DeviceTierIndex

idx = DeviceTierIndex.load(args.index)
queries = jnp.asarray(np.load(args.queries).astype(np.float32))
print(f"device={jax.devices()[0]} wave={queries.shape[0]}", flush=True)


def run():
    return idx.search(
        queries, top_k=10, beam_width=args.beam,
        expand_per_iter=args.expand, entry_seeds=args.seeds,
    ).ids


run().block_until_ready()  # compile
t0 = time.time()
run().block_until_ready()
wall = time.time() - t0
print(f"wave wall: {wall*1000:.1f} ms  ({queries.shape[0]/wall:.0f} QPS)",
      flush=True)

with jax.profiler.trace("/tmp/trace_dt"):
    run().block_until_ready()

files = sorted(glob.glob("/tmp/trace_dt/**/*.trace.json.gz", recursive=True))
ev_by_name = defaultdict(float)
cnt_by_name = defaultdict(int)
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)
for ev in data.get("traceEvents", []):
    if ev.get("ph") == "X" and "dur" in ev:
        ev_by_name[ev.get("name", "?")] += ev["dur"]
        cnt_by_name[ev.get("name", "?")] += 1
rows = sorted(ev_by_name.items(), key=lambda kv: -kv[1])[:40]
for name, dur in rows:
    print(f"{dur/1000:9.2f} ms  x{cnt_by_name[name]:<6} {name[:110]}")
