"""Per-wave timing breakdown of the packed-adjacency fused-SQ4 build.

Builds most of the graph normally, then times the three wave programs
(read-only search / read+compute / write-only apply) separately in steady
state, optionally under jax.profiler.trace.  Mirrors the packed branch of
GraphIndexBuilder.build.
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--wave", type=int, default=512)
    p.add_argument("--expand", type=int, default=2)
    p.add_argument("--timed-waves", type=int, default=60)
    p.add_argument("--trace-dir", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from jvector_tpu.graph.builder import (
        GraphIndexBuilder,
        _EntrySeedSampler,
        _fused_aligned_config,
        _pack_adjacency,
        _packed_build_eligible,
        _wave_apply_packed,
        _wave_search,
        _wave_update_compute,
    )
    from jvector_tpu.graph.index import GraphConfig, bucket_capacity, empty_graph
    from jvector_tpu.graph.score import ExactScoreProvider
    from jvector_tpu.ops.similarity import SimilarityFunction
    from jvector_tpu.util.datasets import synthetic_dataset

    print(f"device={jax.devices()[0]}", flush=True)
    ds = synthetic_dataset(
        n=args.n, dim=args.dim, n_queries=8, k=10,
        n_clusters=max(64, args.n // 500), seed=0,
    )
    vectors = jnp.asarray(ds.base, jnp.float32)
    n, d = vectors.shape
    cfg = GraphConfig(
        max_degree=32, ef_construction=100,
        wave_size=args.wave, build_expand=args.expand,
    )
    cfg = _fused_aligned_config(cfg, (args.dim + 1) // 2)
    sim = SimilarityFunction.EUCLIDEAN
    n_cap = bucket_capacity(n)
    pv = jnp.concatenate([vectors, jnp.zeros((n_cap - n, d), jnp.float32)])
    provider = ExactScoreProvider(vectors=pv, sim=sim)
    builder = GraphIndexBuilder(cfg)
    bp0 = builder._sq4_build_provider(vectors, n_cap, sim)
    mp = bp0.codes_packed.shape[1]
    assert _packed_build_eligible(cfg, mp, n_cap), "packed path ineligible"
    k_row = cfg.row_cap * mp
    fused_packed = jnp.zeros((n_cap, k_row // 128, 128), jnp.uint8)
    g0 = empty_graph(n_cap, cfg)
    adj = _pack_adjacency(g0.base, cfg.row_cap)
    w2t = jnp.zeros((n_cap // 8, 8, 128), jnp.int32)
    counts = g0.base.counts
    entry = g0.entry_node
    num_nodes = g0.num_nodes
    const = bp0.node_w2
    codes_packed = bp0.codes_packed

    w = cfg.wave_size
    seeds = _EntrySeedSampler(n, w, cfg.build_entry_seeds)
    starts = list(range(0, n, w))
    warm = starts[: -args.timed_waves]
    timed = starts[-args.timed_waves :]

    state = dict(adj=adj, w2t=w2t, fused=fused_packed, counts=counts,
                 entry=entry, num=num_nodes)

    def one_wave(start, t_search=None, t_compute=None, t_apply=None, block=False):
        ids = np.arange(start, start + w, dtype=np.int32)
        ids = np.where(ids < n, ids, -1)
        ids_dev = jnp.asarray(ids)
        wv = jax.lax.dynamic_slice_in_dim(pv, start, w)  # mirrors build()
        bp = dataclasses.replace(
            bp0, fused_packed=state["fused"], fused_w2=state["w2t"]
        )
        t0 = time.time()
        beam_ids, beam_scores = _wave_search(
            state["adj"], bp, state["entry"], ids_dev, wv, cfg, seeds.sample()
        )
        seeds.record(ids)
        if block:
            jax.block_until_ready(beam_ids)
            t_search.append(time.time() - t0)
            t0 = time.time()
        counts, entry, num, adj_stream, fused_stream = _wave_update_compute(
            state["adj"], state["counts"], state["entry"], state["num"],
            provider, codes_packed, const, ids_dev, wv,
            beam_ids, beam_scores, cfg,
        )
        if block:
            jax.block_until_ready(counts)
            t_compute.append(time.time() - t0)
            t0 = time.time()
        adj2, w2t2, fused2 = _wave_apply_packed(
            state["adj"], state["w2t"], state["fused"],
            adj_stream, fused_stream, mp,
        )
        if block:
            jax.block_until_ready(adj2)
            t_apply.append(time.time() - t0)
        state.update(adj=adj2, w2t=w2t2, fused=fused2, counts=counts,
                     entry=entry, num=num)

    t0 = time.time()
    for i, start in enumerate(warm):
        one_wave(start)
        if i == 20:
            jax.block_until_ready(state["counts"])
            print(f"compiled+20 waves in {time.time()-t0:.1f}s", flush=True)
    jax.block_until_ready(state["counts"])
    warm_s = time.time() - t0
    print(
        f"warm {len(warm)} waves: {warm_s:.1f}s "
        f"({warm_s/max(len(warm),1)*1000:.1f} ms/wave incl compile)",
        flush=True,
    )

    ts, tc, ta = [], [], []
    ctx = (
        jax.profiler.trace(args.trace_dir)
        if args.trace_dir
        else __import__("contextlib").nullcontext()
    )
    with ctx:
        for start in timed:
            one_wave(start, ts, tc, ta, block=True)
    print(
        f"steady-state over {len(timed)} waves: "
        f"search {np.mean(ts)*1000:.1f} ms (p50 {np.median(ts)*1000:.1f})  "
        f"compute {np.mean(tc)*1000:.1f} ms (p50 {np.median(tc)*1000:.1f})  "
        f"apply {np.mean(ta)*1000:.1f} ms (p50 {np.median(ta)*1000:.1f})",
        flush=True,
    )
    total = (np.mean(ts) + np.mean(tc) + np.mean(ta)) * len(starts)
    print(f"=> projected full-build wave time {total:.1f}s for {len(starts)} waves", flush=True)

    if args.trace_dir:
        import glob
        import gzip
        import json
        from collections import defaultdict

        files = sorted(
            glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True)
        )
        ev = defaultdict(float)
        cnt = defaultdict(int)
        with gzip.open(files[-1], "rt") as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                ev[e.get("name", "?")] += e["dur"]
                cnt[e.get("name", "?")] += 1
        for name, dur in sorted(ev.items(), key=lambda kv: -kv[1])[:45]:
            print(f"{dur/1000:9.2f} ms  x{cnt[name]:<6} {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
