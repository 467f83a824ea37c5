"""North-star benchmark: QPS at recall@10 >= 0.95 on SIFT-1M scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline denominator: the reference publishes no SIFT-1M QPS table, but its
own repo records one absolute multi-core CPU measurement
(``docs/release notes/4.0.0-RC.9/671.testing.md:37-49``):
cohere-english-v3-100k (1024-d), M=32/ef=100/NVQ, unspecified dev box —
44,155 QPS @ recall@10 0.92 (overquery 2) and 28,832 QPS @ 0.98 (overquery
5), i.e. ~35k QPS interpolated at the 0.95 floor, with 515→951 avg visited.
Scaling that measurement to SIFT-1M-class search (10x nodes: ~1.25x beam
path by ln(N) growth; 128-d f32 rows are ~8x smaller than 1024-d NVQ rows,
roughly offsetting per-visit cost differences — net ~x0.4-0.6) grounds
REFERENCE_QPS = 15_000 below.  No Java toolchain exists in this container,
so the figure cannot be re-measured here; it is an anchored estimate, not a
measurement, and is labeled as such in the JSON (``baseline_source``,
``baseline_kind``) with the raw anchor numbers so a reader can re-derive or
re-scale it.

Throughput methodology: waves are dispatched asynchronously and synced at
the end (the reference's ThroughputBenchmark likewise saturates a parallel
stream without per-query round-trips); serial per-wave latency is reported
separately as ``qps_serial``.

Zero-egress environment: the real SIFT-1M base vectors are not on disk, so
the corpus is a synthetic SIFT-like clustered set (128-d) with exact ground
truth computed on device.  Shapes/params match the reference bench defaults:
M=32, efConstruction=100, neighborOverflow=1.2, alpha=1.2, topK=10,
beam sweep for the recall>=0.95 operating point.

First-pass strategies compared (best one meeting the floor is reported):
- ``sq4``: fused 4-bit scalar-quantized scoring + exact f32 rerank — the
  TPU-native flagship (see jvector_tpu/quantization/sq.py)
- ``exact``: single-pass full-precision scoring
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

REFERENCE_QPS = 15_000.0  # anchored estimate, see module docstring
BASELINE_SOURCE = (
    "reference docs/release notes/4.0.0-RC.9/671.testing.md: measured "
    "44155 QPS @ recall@10 0.92 / 28832 QPS @ 0.98 on cohere-english-v3-100k "
    "(1024d, M=32, ef=100, NVQ, multi-core CPU box); ~35k QPS interpolated "
    "at 0.95, scaled x0.43 for 100k->1M search-path growth"
)
RECALL_FLOOR = 0.95


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--queries", type=int, default=8192)
    p.add_argument("--gt-queries", type=int, default=1024)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--wave", type=int, default=1024, help="query wave size")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.quantization import ScalarQuantization4
    from jvector_tpu.util.datasets import (
        exact_ground_truth,
        recall_at_k,
        synthetic_dataset,
    )

    dev = jax.devices()[0]

    # n/500 points per cluster calibrates graph-search difficulty to real
    # SIFT-1M behavior (HNSW-class recall ~0.97 at ef=50); coarser clustering
    # makes the corpus artificially hard (ultra-dense cluster cores).
    ds = synthetic_dataset(
        n=args.n,
        dim=args.dim,
        n_queries=args.queries,
        k=args.top_k,
        n_clusters=max(64, args.n // 500),
        seed=0,
    )
    base, queries = ds.base, ds.queries
    gt = exact_ground_truth(base, queries[: args.gt_queries], args.top_k)

    # ---- build ------------------------------------------------------------
    cfg = GraphConfig(max_degree=32, ef_construction=100)
    t0 = time.time()
    graph, exact_provider = build_graph(base, "euclidean", cfg)
    jax.block_until_ready(graph.base.neighbors)
    build_s = time.time() - t0

    # ---- SQ4 fused first pass + exact f32 rerank (TPU-native flagship) ----
    t0 = time.time()
    sq = ScalarQuantization4.compute(base)  # compute() random-samples
    codes = sq.encode(base)
    pad = graph.capacity - codes.shape[0]
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)]
        )
    sq4_provider = sq.provider_for_graph(codes, graph.base.neighbors, "euclidean")
    jax.block_until_ready(sq4_provider.fused_packed)
    encode_s = time.time() - t0

    def run_sq4(qs, beam, expand=1, entry_seeds=1):
        return search(
            graph,
            sq4_provider,
            qs,
            top_k=args.top_k,
            beam_width=beam,
            rerank_k=beam,
            reranker=exact_provider,
            expand_per_iter=expand,
            entry_seeds=entry_seeds,
        )

    def run_exact(qs, beam):
        return search(graph, exact_provider, qs, top_k=args.top_k, beam_width=beam)

    qd = jnp.asarray(queries)
    w = args.wave
    waves = [qd[i : i + w] for i in range(0, args.queries, w) if i + w <= args.queries]

    def operating_point(run):
        """Smallest beam hitting the recall floor, then measured QPS there.

        Throughput = async wave dispatch, one sync at the end; serial QPS
        (block per wave) also measured for the latency-oriented number.
        """
        chosen = None
        for beam in (20, 25, 30, 35, 40, 50, 60, 80, 100, 150, 200):
            if beam < args.top_k:
                continue
            res = run(qd[: args.gt_queries], beam)
            r = recall_at_k(np.asarray(res.ids), gt, args.top_k)
            chosen = (beam, r)
            if r >= RECALL_FLOOR:
                break
        beam, recall = chosen
        run(waves[0], beam).ids.block_until_ready()  # warmup/compile
        t0 = time.time()
        outs = [run(wv, beam).ids for wv in waves]
        for o in outs:
            o.block_until_ready()
        qps = sum(wv.shape[0] for wv in waves) / (time.time() - t0)
        lats = []
        for wv in waves:
            t0 = time.time()
            run(wv, beam).ids.block_until_ready()
            lats.append(time.time() - t0)
        qps_serial = sum(wv.shape[0] for wv in waves) / sum(lats)
        p999 = float(np.quantile(np.asarray(lats) * 1000, 0.999))
        return qps, qps_serial, recall, beam, p999

    exact_qps, exact_qps_serial, exact_recall, exact_beam, exact_p999 = (
        operating_point(run_exact)
    )
    sq4_qps, sq4_qps_serial, sq4_recall, sq4_beam, sq4_p999 = operating_point(
        run_sq4
    )
    # serve-side multi-expand: E=2 halves sequential beam iterations at ~5%
    # extra visits — re-measure at the chosen operating point and keep the
    # better (fused rows made the extra gathers nearly free)
    sq4e2 = operating_point(lambda qs, b: run_sq4(qs, b, expand=2))
    sq4_expand = 1
    if sq4e2[2] >= RECALL_FLOOR and sq4e2[0] > sq4_qps:
        sq4_qps, sq4_qps_serial, sq4_recall, sq4_beam, sq4_p999 = sq4e2
        sq4_expand = 2
    # serve-side multi-seed entries: extra start points cut the sequential
    # graph-diameter walk; keep if it beats the single-entry point
    sq4_seeds = 1
    sq4es = operating_point(
        lambda qs, b: run_sq4(qs, b, expand=sq4_expand, entry_seeds=8)
    )
    if sq4es[2] >= RECALL_FLOOR and sq4es[0] > sq4_qps:
        sq4_qps, sq4_qps_serial, sq4_recall, sq4_beam, sq4_p999 = sq4es
        sq4_seeds = 8

    candidates = [
        ("exact_f32", exact_qps, exact_qps_serial, exact_recall, exact_beam, exact_p999),
        ("sq4+f32_rerank", sq4_qps, sq4_qps_serial, sq4_recall, sq4_beam, sq4_p999),
    ]
    ok = [c for c in candidates if c[3] >= RECALL_FLOOR] or candidates
    mode, qps, qps_serial, recall, beam, p999 = max(ok, key=lambda c: c[1])

    print(
        json.dumps(
            {
                "metric": f"QPS at recall@{args.top_k}>={RECALL_FLOOR} (n={args.n}, d={args.dim})",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / REFERENCE_QPS, 3),
                "baseline_qps": REFERENCE_QPS,
                "baseline_kind": "anchored-estimate (no Java toolchain here)",
                "baseline_source": BASELINE_SOURCE,
                "recall": round(float(recall), 4),
                "beam_width": beam,
                "mode": mode,
                "qps_serial": round(qps_serial, 1),
                "latency_p999_ms": round(p999, 2),
                "serve_expand": sq4_expand if mode.startswith("sq4") else 1,
                "entry_seeds": sq4_seeds if mode.startswith("sq4") else 1,
                "build_seconds": round(build_s, 1),
                "sq4_encode_seconds": round(encode_s, 1),
                "exact_qps": round(exact_qps, 1),
                "exact_recall": round(float(exact_recall), 4),
                "sq4_qps": round(sq4_qps, 1),
                "sq4_recall": round(float(sq4_recall), 4),
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
