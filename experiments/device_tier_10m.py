"""HBM-resident 10M serving demo (VERDICT r4 item 2).

Loads the 10M SQ4-LTM container's COMPACT arrays into HBM (paired-row
adjacency 2.56 GB + SQ4 aug codes 1.3 GB + bf16 rerank vectors 2.4 GB +
hierarchy ~0.2 GB ~= 6.5 GB) and serves query waves entirely on-device —
no host streaming in the search path.

Sweeps beam width x expand x hierarchy/flat, reports QPS (pipelined waves,
one sync) + recall@10 vs the exact ground truth, then emits ONE JSON line
for bench_results/.

Run (chip, ~10 min warm):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/device_tier_10m.py > /tmp/device_tier_10m.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", default="/tmp/ltm_10m_sq4.jvtpu")
    p.add_argument("--queries", default="/tmp/synth10m_queries.npy")
    p.add_argument("--gt", default="/tmp/synth10m_gt.npy")
    p.add_argument("--wave", type=int, default=512)
    p.add_argument("--waves", type=int, default=8, help="timed waves per point")
    p.add_argument(
        "--timed-wave", type=int, default=0,
        help="throughput-wave size (0 = use --wave); recall still comes "
        "from the GT wave.  The 1M headline sweep measured the dispatch "
        "knee at 2048-4096 queries/wave (experiments/headline_wave_sweep"
        ".py); throughput waves are sampled from the corpus (base rows + "
        "noise) since only 512 GT queries exist at 10M.",
    )
    p.add_argument("--base", default="/tmp/synth10m_base.npy")
    p.add_argument("--out", default=None, help="write the JSON line here too")
    p.add_argument(
        "--repack-sweep", action="store_true",
        help="focused run: the committed operating points with a "
        "repack_after sweep (two-phase wave tail) instead of the full "
        "beam x expand grid",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from jvector_tpu.disk import DeviceTierIndex
    from jvector_tpu.util.datasets import recall_at_k

    dev = jax.devices()[0]
    print(f"device={dev}", flush=True)

    queries = np.load(args.queries).astype(np.float32)
    gt = np.load(args.gt)
    n_q = queries.shape[0]
    w = min(args.wave, n_q)
    print(f"queries={n_q} wave={w}", flush=True)

    t0 = time.time()
    idx = DeviceTierIndex.load(args.index, log_progress=True)
    jax.block_until_ready(idx.adj_pairs)
    load_s = time.time() - t0
    hbm_gb = idx.hbm_bytes() / 2**30
    print(f"load: {load_s:.1f}s  HBM resident {hbm_gb:.2f} GB", flush=True)

    flat = DeviceTierIndex(
        adj_pairs=idx.adj_pairs, provider=idx.provider, reranker=idx.reranker,
        upper=None, entry_node=idx.entry_node, num_nodes=idx.num_nodes,
        deleted=idx.deleted, row_cap=idx.row_cap, sim=idx.sim,
    )

    qd = jnp.asarray(queries)
    waves = [qd[i : i + w] for i in range(0, n_q - w + 1, w)]
    tw = args.timed_wave or w
    if tw > w:
        # distribution-faithful throughput queries: corpus rows + noise
        rng = np.random.default_rng(11)
        base_mm = np.load(args.base, mmap_mode="r")
        picks = np.sort(rng.integers(0, base_mm.shape[0], size=2 * tw))
        tq_np = base_mm[picks].astype(np.float32)
        tq_np += rng.normal(0.0, 0.05, size=tq_np.shape).astype(np.float32)
        tqd = jnp.asarray(tq_np)
        timed_waves = [tqd[:tw], tqd[tw:]]
    else:
        timed_waves = waves
    rows = []

    def point(name, index, beam, expand, seeds, repack=0):
        run = lambda qs: index.search(
            qs, top_k=10, beam_width=beam, rerank_k=beam,
            expand_per_iter=expand, entry_seeds=seeds, repack_after=repack,
        )
        t0 = time.time()
        res0 = run(waves[0])
        res0.ids.block_until_ready()
        compile_s = time.time() - t0
        rec = recall_at_k(np.asarray(res0.ids), gt[:w], 10)
        # pipelined timing: dispatch all waves, sync once
        if timed_waves is not waves:
            run(timed_waves[0]).ids.block_until_ready()  # timed-shape compile
        timed = (timed_waves * args.waves)[: max(args.waves, len(timed_waves))]
        t0 = time.time()
        outs = [run(wv).ids for wv in timed]
        for o in outs:
            o.block_until_ready()
        dt = time.time() - t0
        qps = sum(wv.shape[0] for wv in timed) / dt
        # serial latency (of a throughput-sized wave)
        t0 = time.time()
        run(timed_waves[0]).ids.block_until_ready()
        ser_ms = (time.time() - t0) * 1000
        row = {
            "config": name, "beam": beam, "expand": expand, "seeds": seeds,
            "repack_after": repack,
            "qps": round(qps, 1), "recall_at_10": round(float(rec), 4),
            "wave_ms_serial": round(ser_ms, 1),
            "visited_mean": round(float(jnp.mean(res0.visited_count)), 1),
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        return rec, qps

    if args.repack_sweep:
        # focused: the committed operating point (hier-E1 beam 35,
        # bench_results/device_tier_10m_r5.json) with the two-phase wave
        # tail engaged at a few cuts, plus a flat control
        point("hier-E1", idx, 35, expand=1, seeds=1, repack=0)
        for ra in (55, 70, 90):
            point("hier-E1", idx, 35, expand=1, seeds=1, repack=ra)
        point("hier-E1", idx, 50, expand=1, seeds=1, repack=85)
        point("flat", flat, 50, expand=2, seeds=8, repack=85)
    else:
        # hierarchy descent entries vs flat multi-seed, beam sweep
        for beam in (25, 35, 50, 75, 100):
            point("hier", idx, beam, expand=2, seeds=1)
        for beam in (25, 35, 50, 75, 100):
            point("flat", flat, beam, expand=2, seeds=8)
        # expand sensitivity at the sweet spot
        best = max(
            (r for r in rows if r["recall_at_10"] >= 0.95),
            key=lambda r: r["qps"],
            default=None,
        )
        if best is not None:
            for e in (1, 4):
                point(
                    best["config"] + f"-E{e}",
                    idx if best["config"].startswith("hier") else flat,
                    best["beam"], expand=e, seeds=best["seeds"],
                )

    ok = [r for r in rows if r["recall_at_10"] >= 0.95]
    head = max(ok, key=lambda r: r["qps"]) if ok else max(rows, key=lambda r: r["qps"])
    out = {
        "metric": "10M x 128d HBM-resident serving (device tier)",
        "n": 10_000_000,
        "dim": 128,
        "value": head["qps"],
        "unit": "queries/s",
        "recall": head["recall_at_10"],
        "operating_point": head,
        "hbm_resident_gb": round(hbm_gb, 2),
        "load_seconds": round(load_s, 1),
        "index_file_gb": 52.0,
        "rows": rows,
        "device": str(dev),
    }
    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
