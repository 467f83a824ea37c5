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

Methodology:
- Throughput: waves dispatched asynchronously, one sync at the end (the
  reference's ThroughputBenchmark likewise saturates a parallel stream);
  serial per-wave latency is reported separately as ``qps_serial``.
- Build timing starts from DEVICE-RESIDENT vectors (one ``device_put``
  before the clock), matching the reference's convention of timing
  ``GraphIndexBuilder.build`` on an in-memory ``RandomAccessVectorValues``
  — not the file/tunnel transfer in front of it.  The transfer cost is
  reported separately (``corpus_upload_seconds``).
- The HEADLINE operating point must clear the floor with margin
  (recall >= 0.955): a 0.0017-thin margin on one synthetic corpus is an
  operating point chosen by the corpus, not by the engine.
- Robustness corpora (reference analog: multi-dataset bench grids under
  ``yaml-configs/dataset-catalogs/``): the SAME flagship serving config is
  re-run on (a) a cluster-ordered, dense-core adversarial corpus and (b) a
  96-d MIPS corpus (config-3 shape); each reports QPS at the smallest beam
  clearing 0.95 on THAT corpus.
- Small-batch latency (reference analog: LatencyBenchmark avg/p999,
  ``jvector-examples/.../benchmarks/LatencyBenchmark.java``): serial
  per-call p50/p999 at Q in {1, 16, 64, 256} on the flagship index.

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
HEADLINE_MARGIN = 0.005  # headline beam must clear floor + margin
BEAMS = (20, 21, 22, 23, 25, 30, 35, 40, 50, 60, 80, 100, 150, 200)
# Throughput points time a SUSTAINED stream of at least this many queries
# (repeating the query set): a short burst at 1M finishes in ~0.2 s, so a
# single ~27 ms host-dispatch RTT is 12% measurement noise — the
# reference's ThroughputBenchmark likewise measures a saturated parallel
# stream after warmup, not a burst (ThroughputBenchmark.java:131-200).
# The default wave of 4096 queries/dispatch is the measured throughput
# knee (experiments/headline_wave_sweep.py: 27.7k QPS at wave 1024 ->
# 63.0k at 4096 -> 60.5k at 8192; serial device time also drops 43 ->
# 23.6 ms per 1k queries as the while_loop's fixed per-iteration cost
# amortizes over more query lanes).
MIN_TIMED_QUERIES = 65_536


def clustered_adversarial(n: int, dim: int, n_queries: int, seed: int = 7):
    """Cluster-ORDERED corpus with dense cores — the builder's worst case.

    Round-3 adversarial probes showed cluster-ordered insertion builds
    disconnected islands without shuffled waves; dense cores also stress
    the prune's tie-break jitter.  Queries land near cores so recall is
    dominated by intra-cluster edges."""
    rng = np.random.default_rng(seed)
    ld = 24
    proj = rng.normal(size=(ld, dim)).astype(np.float32)
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    nc = max(32, n // 2000)  # 4x denser cores than the calibrated corpus
    centers = rng.normal(size=(nc, ld)).astype(np.float32)
    assign = np.sort(rng.integers(0, nc, size=n))  # cluster-ordered
    z = centers[assign] + rng.normal(0.0, 0.18, size=(n, ld)).astype(np.float32)
    base = (z @ proj + rng.normal(0.0, 0.02, size=(n, dim))).astype(np.float32)
    qa = rng.integers(0, nc, size=n_queries)
    zq = centers[qa] + rng.normal(0.0, 0.18, size=(n_queries, ld)).astype(
        np.float32
    )
    queries = (zq @ proj + rng.normal(0.0, 0.02, size=(n_queries, dim))).astype(
        np.float32
    )
    return base, queries


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--queries", type=int, default=8192)
    p.add_argument("--gt-queries", type=int, default=1024)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--wave", type=int, default=4096, help="query wave size")
    p.add_argument(
        "--skip-robustness", action="store_true",
        help="headline corpus only (faster smoke runs)",
    )
    p.add_argument(
        "--no-repack", action="store_true",
        help="disable the two-phase repacked wave (A/B the plain loop)",
    )
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
    top_k = args.top_k
    gtq = args.gt_queries
    cfg = GraphConfig(max_degree=32, ef_construction=100)

    def build_flagship(base_np, sim):
        """Device-put + build + SQ4 encode.  Returns providers + timings."""
        t0 = time.time()
        base_dev = jax.device_put(np.ascontiguousarray(base_np))
        jax.block_until_ready(base_dev)
        upload_s = time.time() - t0
        t0 = time.time()
        graph, exact_provider = build_graph(base_dev, sim, cfg)
        jax.block_until_ready(graph.base.neighbors)
        build_s = time.time() - t0
        t0 = time.time()
        sq = ScalarQuantization4.compute(base_dev)
        codes = sq.encode(base_dev)
        pad = graph.capacity - codes.shape[0]
        if pad:
            codes = jnp.concatenate(
                [codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)]
            )
        sq4_provider = sq.provider_for_graph(codes, graph.base.neighbors, sim)
        jax.block_until_ready(sq4_provider.fused_packed)
        encode_s = time.time() - t0
        return graph, exact_provider, sq4_provider, upload_s, build_s, encode_s

    def measure(run, qd, gt, waves, floor):
        """Smallest beam hitting ``floor``, then measured QPS there."""
        chosen = None
        for beam in BEAMS:
            if beam < top_k:
                continue
            res = run(qd[:gtq], beam)
            r = recall_at_k(np.asarray(res.ids), gt, top_k)
            chosen = (beam, r)
            if r >= floor:
                break
        beam, recall = chosen
        run(waves[0], beam).ids.block_until_ready()  # warmup/compile
        nq_once = sum(wv.shape[0] for wv in waves)
        reps = max(1, -(-MIN_TIMED_QUERIES // nq_once))
        timed = waves * reps
        t0 = time.time()
        outs = [run(wv, beam).ids for wv in timed]
        for o in outs:
            o.block_until_ready()
        qps = sum(wv.shape[0] for wv in timed) / (time.time() - t0)
        lats = []
        for wv in waves:
            t0 = time.time()
            run(wv, beam).ids.block_until_ready()
            lats.append(time.time() - t0)
        qps_serial = sum(wv.shape[0] for wv in waves) / sum(lats)
        p999 = float(np.quantile(np.asarray(lats) * 1000, 0.999))
        return qps, qps_serial, recall, beam, p999

    # ---- headline corpus ---------------------------------------------------
    # n/500 points per cluster calibrates graph-search difficulty to real
    # SIFT-1M behavior (HNSW-class recall ~0.97 at ef=50); coarser clustering
    # makes the corpus artificially hard (ultra-dense cluster cores).
    ds = synthetic_dataset(
        n=args.n, dim=args.dim, n_queries=args.queries, k=top_k,
        n_clusters=max(64, args.n // 500), seed=0,
    )
    base, queries = ds.base, ds.queries
    graph, exact_provider, sq4_provider, upload_s, build_s, encode_s = (
        build_flagship(base, "euclidean")
    )
    gt = exact_ground_truth(base, queries[:gtq], top_k)

    def repack_cut(beam, expand=1):
        """Two-phase wave cut: ~1.6x the beam width (measured knee — the
        active-lane tail fits the quarter-width sub-wave there; see
        tests/test_repack.py and graph/searcher.py ``repack_after``).
        measure() probes recall WITH the cut, so any truncation loss is
        absorbed by its beam selection."""
        return 0 if args.no_repack else max(8, int(1.6 * beam / expand))

    def run_sq4(qs, beam, expand=1, entry_seeds=1):
        return search(
            graph, sq4_provider, qs, top_k=top_k, beam_width=beam,
            rerank_k=beam, reranker=exact_provider,
            expand_per_iter=expand, entry_seeds=entry_seeds,
            repack_after=repack_cut(beam, expand),
        )

    def run_exact(qs, beam):
        return search(
            graph, exact_provider, qs, top_k=top_k, beam_width=beam,
            repack_after=repack_cut(beam),
        )

    qd = jnp.asarray(queries)
    # clamp the wave to the query count so --queries below the default wave
    # still times full waves instead of building an empty list
    w = min(args.wave, args.queries)
    waves = [qd[i : i + w] for i in range(0, args.queries, w) if i + w <= args.queries]
    headline_floor = RECALL_FLOOR + HEADLINE_MARGIN

    exact_pt = measure(run_exact, qd, gt, waves, headline_floor)
    sq4_pt = measure(run_sq4, qd, gt, waves, headline_floor)
    sq4_qps, sq4_qps_serial, sq4_recall, sq4_beam, sq4_p999 = sq4_pt
    # serve-side multi-expand: E=2 halves sequential beam iterations at ~5%
    # extra visits — re-measure at the chosen operating point and keep the
    # better (fused rows made the extra gathers nearly free)
    sq4e2 = measure(
        lambda qs, b: run_sq4(qs, b, expand=2), qd, gt, waves, headline_floor
    )
    sq4_expand = 1
    if sq4e2[2] >= headline_floor and sq4e2[0] > sq4_qps:
        sq4_qps, sq4_qps_serial, sq4_recall, sq4_beam, sq4_p999 = sq4e2
        sq4_expand = 2
    # serve-side multi-seed entries: extra start points cut the sequential
    # graph-diameter walk; keep if it beats the single-entry point
    sq4_seeds = 1
    sq4es = measure(
        lambda qs, b: run_sq4(qs, b, expand=sq4_expand, entry_seeds=8),
        qd, gt, waves, headline_floor,
    )
    if sq4es[2] >= headline_floor and sq4es[0] > sq4_qps:
        sq4_qps, sq4_qps_serial, sq4_recall, sq4_beam, sq4_p999 = sq4es
        sq4_seeds = 8

    exact_qps, exact_qps_serial, exact_recall, exact_beam, exact_p999 = exact_pt
    candidates = [
        ("exact_f32", *exact_pt),
        ("sq4+f32_rerank", sq4_qps, sq4_qps_serial, sq4_recall, sq4_beam, sq4_p999),
    ]
    ok = [c for c in candidates if c[3] >= headline_floor] or candidates
    mode, qps, qps_serial, recall, beam, p999 = max(ok, key=lambda c: c[1])

    # ---- small-batch / single-query latency (flagship operating point) ----
    def flagship_run(qs, b=None):
        return run_sq4(
            qs, b if b is not None else sq4_beam,
            expand=sq4_expand, entry_seeds=sq4_seeds,
        )

    small_batch = {}
    for q in (1, 16, 64, 256):
        qs = qd[:q]
        flagship_run(qs).ids.block_until_ready()  # compile
        iters = 200 if q <= 16 else 50
        lat = []
        for _ in range(iters):
            t0 = time.time()
            flagship_run(qs).ids.block_until_ready()
            lat.append((time.time() - t0) * 1000)
        lat = np.asarray(lat)
        small_batch[f"Q{q}"] = {
            "p50_ms": round(float(np.quantile(lat, 0.5)), 2),
            "p999_ms": round(float(np.quantile(lat, 0.999)), 2),
        }

    # ---- robustness corpora (same serving config, per-corpus honest beam) --
    corpora = {
        "synth-sift-1m": {
            "qps": round(sq4_qps, 1),
            "qps_serial": round(sq4_qps_serial, 1),
            "recall": round(float(sq4_recall), 4),
            "beam_width": sq4_beam,
            "build_seconds": round(build_s, 1),
        }
    }
    # Free the headline index BEFORE the robustness builds: each robustness
    # corpus builds its own full 1M flagship (~7 GB fused table + graph +
    # vectors + build transients); two resident 1M indexes exceed the 16 GB
    # chip (BENCH_r04 RESOURCE_EXHAUSTED).  Every closure and direct
    # reference to the headline device arrays must die here.
    import gc

    del graph, exact_provider, sq4_provider, run_sq4, run_exact, flagship_run
    del qd, waves
    gc.collect()
    if not args.skip_robustness:
        rq = min(args.queries, 4096)
        rq = max(w, (rq // w) * w)  # whole waves

        def robustness_row(name, base_np, queries_np, sim):
            g2, ex2, sp2, _, b2_s, _ = build_flagship(base_np, sim)
            gt2 = exact_ground_truth(base_np, queries_np[:gtq], top_k)
            q2 = jnp.asarray(queries_np[:rq])
            nq2 = q2.shape[0]
            waves2 = [
                q2[i : i + w] for i in range(0, nq2, w) if i + w <= nq2
            ]

            def run2(qs, beam):
                return search(
                    g2, sp2, qs, top_k=top_k, beam_width=beam, rerank_k=beam,
                    reranker=ex2, expand_per_iter=sq4_expand,
                    entry_seeds=sq4_seeds,
                    repack_after=repack_cut(beam, sq4_expand),
                )

            r_qps, r_qps_ser, r_rec, r_beam, _ = measure(
                run2, q2, gt2, waves2, RECALL_FLOOR
            )
            corpora[name] = {
                "qps": round(r_qps, 1),
                "qps_serial": round(r_qps_ser, 1),
                "recall": round(float(r_rec), 4),
                "beam_width": r_beam,
                "build_seconds": round(b2_s, 1),
            }

        adv_base, adv_queries = clustered_adversarial(
            args.n, args.dim, max(rq, gtq)
        )
        robustness_row("clustered-adversarial", adv_base, adv_queries, "euclidean")

        mips = synthetic_dataset(
            n=args.n, dim=96, n_queries=max(rq, gtq), k=top_k,
            sim="dot_product", n_clusters=max(64, args.n // 500), seed=4,
        )
        robustness_row("mips-96d", np.asarray(mips.base),
                       np.asarray(mips.queries), "dot_product")

    print(
        json.dumps(
            {
                "metric": f"QPS at recall@{top_k}>={RECALL_FLOOR}+{HEADLINE_MARGIN} margin (n={args.n}, d={args.dim})",
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
                "corpus_upload_seconds": round(upload_s, 1),
                "sq4_encode_seconds": round(encode_s, 1),
                "exact_qps": round(exact_qps, 1),
                "exact_recall": round(float(exact_recall), 4),
                "sq4_qps": round(sq4_qps, 1),
                "sq4_recall": round(float(sq4_recall), 4),
                "small_batch_latency": small_batch,
                "corpora": corpora,
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
