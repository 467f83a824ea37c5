"""Sweep (wave_size, build_expand) for the fused-SQ4 build at one scale.

One process, shared dataset; each config builds fresh and reports wall + recall.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--configs", default="256:1,512:1,512:2,1024:2,1024:4")
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
        n=args.n, dim=args.dim, n_queries=1024, k=10,
        n_clusters=max(64, args.n // 500), seed=0,
    )
    gt = exact_ground_truth(ds.base, ds.queries, 10)
    q = jnp.asarray(ds.queries)

    for cfgstr in args.configs.split(","):
        wave, expand = (int(x) for x in cfgstr.split(":"))
        cfg = GraphConfig(
            max_degree=32, ef_construction=100, wave_size=wave, build_expand=expand
        )
        t0 = time.time()
        graph, provider = GraphIndexBuilder(cfg).build(ds.base, "euclidean")
        jax.block_until_ready(graph.base.neighbors)
        bs = time.time() - t0
        res = search(graph, provider, q, top_k=10, beam_width=50)
        r = recall_at_k(np.asarray(res.ids), gt, 10)
        print(f"wave={wave} expand={expand}: build={bs:.1f}s recall@50={r:.4f}", flush=True)
        del graph, provider


if __name__ == "__main__":
    main()
