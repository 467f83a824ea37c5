"""Persistent microbenchmarks (reference: benchmarks-jmh, CompactorBenchmark).

Each benchmark times one hot primitive on the current backend and emits a
JSONL row with run provenance, so regressions are diffable across commits:

    python -m jvector_tpu.bench.micro --out /tmp/micro.jsonl [--n 200000]

Benchmarks: exact score block, SQ4 fused edge scoring, PQ LUT build + 8-bit
ADC, LUT16 ADC, beam-search wave, wave insert, PQ train/encode, SQ4 encode;
``--compact`` adds the streamed N:1 compaction rate (CompactorBenchmark
COMPACT-mode analog).
"""

from __future__ import annotations

import argparse
import json
import time


def _timeit(fn, *args, reps: int = 5, warmup: int = 2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps


def run_micro(n: int = 100_000, dim: int = 128, q: int = 1024, reps: int = 5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jvector_tpu.bench.diagnostics import run_metadata
    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.ops.adc import adc_score, build_partial_sums
    from jvector_tpu.quantization import ProductQuantization, ScalarQuantization4
    from jvector_tpu.util.datasets import synthetic_dataset

    rows = []
    meta = run_metadata({"n": n, "dim": dim, "q": q})

    def emit(name, seconds, work, unit):
        rows.append(
            {
                "benchmark": name,
                "seconds": round(seconds, 6),
                "value": round(work / seconds, 1),
                "unit": unit,
                **{k: meta[k] for k in ("git_sha", "device", "timestamp")},
            }
        )

    ds = synthetic_dataset(n=n, dim=dim, n_queries=q, k=10,
                           n_clusters=max(64, n // 500), seed=0)
    base = jnp.asarray(ds.base)
    queries = jnp.asarray(ds.queries)

    # exact block scoring (the VectorUtil dot/L2 surface, batched)
    from jvector_tpu.ops.similarity import pairwise_scores

    nq = min(q, 256)
    blk = base[:4096]
    t = _timeit(lambda: pairwise_scores(queries[:nq], blk, "euclidean"), reps=reps)
    emit("exact_block_score", t, nq * 4096, "pairs/s")

    # PQ train + encode + 8-bit ADC
    t0 = time.time()
    pq = ProductQuantization.compute(base, m=dim // 4, clusters=256)
    codes = pq.encode(base)
    jax.block_until_ready(codes)
    emit("pq_train_encode", time.time() - t0, n, "vectors/s")
    luts = build_partial_sums(
        pq.provider(codes, "euclidean")._pad(queries[:nq]) - pq.center,
        pq.codebooks, "euclidean",
    )
    cand = jnp.asarray(
        np.random.default_rng(0).integers(0, n, (nq, 64)), jnp.int32
    )
    t = _timeit(lambda: adc_score(luts, codes[cand]), reps=reps)
    emit("adc8_score", t, nq * 64, "candidates/s")

    # LUT16 (4-bit PQ) one-hot ADC via the Pallas kernel path
    from jvector_tpu.graph.score import LUT16ScoreProvider
    from jvector_tpu.ops.pallas.adc16_kernel import pack_nibbles

    pq16 = ProductQuantization.compute(base, m=dim // 2, clusters=16)
    packed16 = pack_nibbles(pq16.encode(base))
    prov16 = LUT16ScoreProvider(
        codes_packed=packed16, fused_packed=None,
        codebooks=pq16.codebooks, center=pq16.center, sim="euclidean",
    )
    luts16 = prov16.prepare(queries[:nq])
    t = _timeit(lambda: prov16.score(luts16, cand), reps=reps)
    emit("lut16_adc_score", t, nq * 64, "candidates/s")

    # SQ4 encode + fused edge scoring over a built graph
    t0 = time.time()
    sq = ScalarQuantization4.compute(base)
    sq_codes = sq.encode(base)
    jax.block_until_ready(sq_codes)
    emit("sq4_encode", time.time() - t0, n, "vectors/s")

    cfg = GraphConfig(max_degree=32, ef_construction=100, wave_size=256)
    t0 = time.time()
    graph, exact = build_graph(ds.base, "euclidean", cfg)
    jax.block_until_ready(graph.base.neighbors)
    emit("graph_build", time.time() - t0, n, "nodes/s")

    pad = graph.capacity - sq_codes.shape[0]
    if pad:
        sq_codes = jnp.concatenate(
            [sq_codes, jnp.zeros((pad, sq_codes.shape[1]), jnp.uint8)]
        )
    prov = sq.provider_for_graph(sq_codes, graph.base.neighbors, "euclidean")
    qs = prov.prepare(queries[:q])
    sel = jnp.asarray(
        np.random.default_rng(1).integers(0, n, (q, 4)), jnp.int32
    )
    t = _timeit(lambda: prov.score_edges(qs, sel), reps=reps)
    emit("sq4_fused_edge_score", t, q * 4 * graph.row_cap, "edges/s")

    # full two-pass search wave
    def wave():
        return search(graph, prov, queries[:q], top_k=10, beam_width=40,
                      rerank_k=40, reranker=exact).ids

    t = _timeit(wave, reps=reps)
    emit("search_wave_sq4_rerank", t, q, "queries/s")

    return rows


def run_compact_micro(n: int = 50_000, dim: int = 64, segments: int = 2):
    """Streamed N:1 compaction rate (reference: benchmarks-jmh
    CompactorBenchmark COMPACT mode, docs/compaction.md:120-199).

    Builds ``segments`` on-disk SQ4 segments then times ``compact_on_disk``
    end to end (merge searches + prune + streamed row writes + save),
    reporting merged nodes/s and the audited device peak.
    """
    import tempfile

    import jax

    from jvector_tpu.bench.diagnostics import run_metadata
    from jvector_tpu.disk import compact_on_disk
    from jvector_tpu.disk.ltm import build_on_disk_ltm
    from jvector_tpu.graph import GraphConfig
    from jvector_tpu.util.datasets import synthetic_dataset

    meta = run_metadata({"n": n, "dim": dim, "segments": segments})
    ds = synthetic_dataset(n=n, dim=dim, n_queries=8, k=10,
                           n_clusters=max(64, n // 500), seed=3)
    cfg = GraphConfig(max_degree=32, ef_construction=100, wave_size=256)
    per = n // segments
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(segments):
            p = f"{td}/seg{i}.jvtpu"
            build_on_disk_ltm(p, ds.base[i * per:(i + 1) * per], n=per,
                              dim=dim, config=cfg, compression="sq4")
            paths.append(p)
        t0 = time.time()
        _, stats = compact_on_disk(paths, f"{td}/merged.jvtpu", cfg)
        dt = time.time() - t0
    return [{
        "benchmark": f"compact_{segments}x{per}",
        "seconds": round(dt, 6),
        "value": round(stats["total"] / dt, 1),
        "unit": "merged nodes/s",
        "peak_device_mb": round(stats["peak_device_bytes"] / 1e6, 1),
        **{k: meta[k] for k in ("git_sha", "device", "timestamp")},
    }]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--q", type=int, default=1024)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--compact", action="store_true",
                   help="also run the streamed-compaction benchmark")
    args = p.parse_args()
    rows = run_micro(n=args.n, dim=args.dim, q=args.q, reps=args.reps)
    if args.compact:
        rows += run_compact_micro()
    out = "\n".join(json.dumps(r) for r in rows)
    print(out)
    if args.out:
        with open(args.out, "a") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
