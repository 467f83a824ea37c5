"""Sharded-vs-global quality measurement (CPU 8-device mesh).

Decision record for the sharded-build design (SURVEY.md §2.9): disjoint
per-shard subgraphs vs one global graph, compared at EQUAL total expansion
budget per query — a sharded search with per-shard beam ``b`` over S shards
expands roughly the same number of candidates as a global search with beam
``S*b``, so those are the fair pairs.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/sharded_vs_global.py
Results land in README.md's "Sharded build quality" table.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import time

import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _xb

    _xb.clear_backends()
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.parallel import make_mesh, sharded_build, sharded_graph_search
from jvector_tpu.util.datasets import exact_ground_truth, synthetic_dataset, recall_at_k


def main(n=32_768, dim=64, nq=256, k=10):
    n_dev = len(jax.devices())
    ds = synthetic_dataset(n=n, dim=dim, n_queries=nq, k=k,
                           n_clusters=max(64, n // 500), seed=0)
    gt = exact_ground_truth(ds.base, ds.queries, k)
    cfg = GraphConfig(max_degree=16, ef_construction=60, wave_size=256)
    q = jnp.asarray(ds.queries)

    t0 = time.time()
    graph, prov = build_graph(ds.base, "euclidean", cfg)
    t_global = time.time() - t0

    mesh = make_mesh(n_dev, "shard")
    t0 = time.time()
    idx = sharded_build(ds.base, mesh, cfg, "euclidean")
    jax.block_until_ready(idx.graphs.layers[0].neighbors)
    t_shard = time.time() - t0

    print(f"devices={n_dev} n={n} d={dim}")
    print(f"build: global {t_global:.1f}s  sharded {t_shard:.1f}s")
    print(f"{'budget':>8} {'global beam':>12} {'r_global':>9} "
          f"{'shard beam':>11} {'r_sharded':>10}")
    for b in (2, 4, 8, 16):
        gbeam = b * n_dev
        res_g = search(graph, prov, q, top_k=k, beam_width=gbeam)
        r_g = recall_at_k(np.asarray(res_g.ids), gt, k)
        gids, _ = sharded_graph_search(idx, q, mesh, top_k=k, beam_width=max(b, k))
        r_s = recall_at_k(np.asarray(gids), gt, k)
        print(f"{gbeam:>8} {gbeam:>12} {r_g:>9.4f} {max(b, k):>11} {r_s:>10.4f}")


if __name__ == "__main__":
    main()
