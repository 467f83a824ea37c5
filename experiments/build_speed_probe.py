"""Probe build wall-clock at a given scale on the real chip.

Usage: python experiments/build_speed_probe.py [--n 400000] [--wave 256]
Prints per-phase timings + a recall check so build-speed work can't silently
trade away graph quality.
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

logging.basicConfig(level=logging.INFO)  # per-phase build timings
# sitecustomize may have configured the root logger already (basicConfig
# no-ops then) — force the level so the builder's phase logs appear
logging.getLogger().setLevel(logging.INFO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--wave", type=int, default=256)
    p.add_argument("--expand", type=int, default=1)
    p.add_argument("--ef", type=int, default=100)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--mode", default="sq4", choices=["sq4", "exact"])
    p.add_argument("--seeds", type=int, default=4)
    p.add_argument("--prune-algo", default="fixpoint", choices=["fixpoint", "greedy"])
    p.add_argument("--no-cleanup", action="store_true")
    p.add_argument(
        "--repack", type=int, default=0,
        help="build_repack_after: two-phase wave searches (0 = off)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from jvector_tpu.graph import GraphConfig, search
    from jvector_tpu.graph.builder import GraphIndexBuilder
    from jvector_tpu.util.datasets import (
        exact_ground_truth,
        recall_at_k,
        synthetic_dataset,
    )

    print(f"device={jax.devices()[0]}", flush=True)
    ds = synthetic_dataset(
        n=args.n,
        dim=args.dim,
        n_queries=args.queries,
        k=10,
        n_clusters=max(64, args.n // 500),
        seed=0,
    )
    gt = exact_ground_truth(ds.base, ds.queries, 10)

    cfg = GraphConfig(
        max_degree=32,
        ef_construction=args.ef,
        wave_size=args.wave,
        build_expand=args.expand,
        build_compression=None if args.mode == "exact" else "sq4",
        prune_algo=args.prune_algo,
        build_entry_seeds=args.seeds,
        build_repack_after=args.repack,
    )
    builder = GraphIndexBuilder(cfg)
    t0 = time.time()
    graph, provider = builder.build(
        ds.base, "euclidean", cleanup=not args.no_cleanup
    )
    jax.block_until_ready(graph.base.neighbors)
    build_s = time.time() - t0
    print(f"build_seconds={build_s:.1f} wave={args.wave} expand={args.expand}", flush=True)

    q = jnp.asarray(ds.queries)
    res = search(graph, provider, q, top_k=10, beam_width=50)
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    print(f"recall@10(beam=50, exact serve)={r:.4f}", flush=True)
    res = search(graph, provider, q, top_k=10, beam_width=25)
    r25 = recall_at_k(np.asarray(res.ids), gt, 10)
    print(f"recall@10(beam=25, exact serve)={r25:.4f}", flush=True)


if __name__ == "__main__":
    main()
