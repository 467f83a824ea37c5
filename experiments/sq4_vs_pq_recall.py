"""SQ4 vs PQ first-pass recall boundary (VERDICT r3 next-round #7).

Decides the fused-PQ (LUT16 / Quicker-ADC) path's fate with data: on each
corpus, the SAME graph is served two-pass (approx first pass + exact f32
rerank at equal beam) with (a) fused SQ4 and (b) PQ ADC at the SAME byte
budget (M = D/2 subspaces x 256 centroids = D/2 bytes = SQ4's packed
nibbles).  If PQ never gains >= 0.01 recall at the operating point, the
arithmetic-ADC SQ4 path is strictly better on TPU (r3 measured 34.8k QPS
anisotropic-SQ4 vs 2.5k QPS table-gather LUT on config 3) and LUT16 is
formally retired.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/sq4_vs_pq_recall.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def correlated_corpus(n, d, ld, n_queries, seed):
    """Low-rank + strongly cross-dim-correlated corpus (SQ4's worst case:
    per-dim affine codes can't exploit cross-dim structure; PQ subspace
    codebooks can)."""
    rng = np.random.default_rng(seed)
    proj = rng.normal(size=(ld, d)).astype(np.float32)
    # correlated mixing: each output dim is a dense mix of the latent dims
    z = rng.normal(size=(n + n_queries, ld)).astype(np.float32)
    x = (z @ proj).astype(np.float32)
    x += rng.normal(0.0, 0.01, size=x.shape).astype(np.float32)
    return x[:n], x[n:]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--queries", type=int, default=512)
    p.add_argument("--beams", type=int, nargs="+", default=[25, 50])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from jvector_tpu.graph import GraphConfig, build_graph, search
    from jvector_tpu.graph.score import ADCScoreProvider
    from jvector_tpu.quantization import ProductQuantization, ScalarQuantization4
    from jvector_tpu.util.datasets import (
        exact_ground_truth,
        recall_at_k,
        synthetic_dataset,
    )

    print(f"device={jax.devices()[0]}", flush=True)
    n, nq = args.n, args.queries

    corpora = []
    ds = synthetic_dataset(n=n, dim=128, n_queries=nq, k=10,
                           n_clusters=max(64, n // 500), seed=0)
    corpora.append(("sift-128d-euclidean", np.asarray(ds.base),
                    np.asarray(ds.queries), "euclidean"))
    mips = synthetic_dataset(n=n, dim=96, n_queries=nq, k=10,
                             sim="dot_product",
                             n_clusters=max(64, n // 500), seed=4)
    corpora.append(("mips-96d-dot", np.asarray(mips.base),
                    np.asarray(mips.queries), "dot_product"))
    cb, cq = correlated_corpus(n, 256, 16, nq, seed=9)
    corpora.append(("correlated-256d-euclidean", cb, cq, "euclidean"))
    hb, hq = correlated_corpus(n, 1024, 48, nq, seed=11)
    corpora.append(("lowrank-1024d-euclidean", hb, hq, "euclidean"))

    rows = []
    for name, base, queries, sim in corpora:
        d = base.shape[1]
        gt = exact_ground_truth(base, queries, 10, sim)
        cfg = GraphConfig(max_degree=32, ef_construction=100)
        t0 = time.time()
        graph, exact = build_graph(jnp.asarray(base), sim, cfg)
        jax.block_until_ready(graph.base.neighbors)
        print(f"{name}: built in {time.time()-t0:.1f}s", flush=True)

        sq = ScalarQuantization4.compute(jnp.asarray(base))
        codes = sq.encode(jnp.asarray(base))
        pad = graph.capacity - codes.shape[0]
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), jnp.uint8)]
        )
        sq4p = sq.provider_for_graph(codes, graph.base.neighbors, sim)

        m = d // 2  # equal byte budget: D/2 bytes/vector both ways
        pq = ProductQuantization.compute(jnp.asarray(base), m=m)
        pq_codes = pq.encode(jnp.asarray(base))
        pq_codes = jnp.concatenate(
            [pq_codes, jnp.zeros((pad, m), jnp.uint8)]
        )
        adcp = ADCScoreProvider(
            codes=pq_codes, codebooks=pq.codebooks, center=pq.center, sim=sim
        )

        qd = jnp.asarray(queries)
        row = {"corpus": name, "dim": d, "sim": sim}
        for beam in args.beams:
            r_sq = recall_at_k(np.asarray(search(
                graph, sq4p, qd, top_k=10, beam_width=beam, rerank_k=beam,
                reranker=exact,
            ).ids), gt, 10)
            r_pq = recall_at_k(np.asarray(search(
                graph, adcp, qd, top_k=10, beam_width=beam, rerank_k=beam,
                reranker=exact,
            ).ids), gt, 10)
            row[f"sq4@{beam}"] = round(float(r_sq), 4)
            row[f"pq@{beam}"] = round(float(r_pq), 4)
            print(f"{name} beam={beam}: sq4={r_sq:.4f} pq={r_pq:.4f} "
                  f"delta={r_pq - r_sq:+.4f}", flush=True)
        rows.append(row)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
