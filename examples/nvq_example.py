"""Tutorial 4 — BQ first pass + NVQ rerank (reference: tutorial/NvqExample,
BASELINE config 4: high-dim embeddings with binary first pass)."""

import numpy as np
import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.quantization import BinaryQuantization, NVQuantization
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


def main():
    ds = synthetic_dataset(n=20_000, dim=256, n_queries=100, k=100)
    graph, exact = build_graph(ds.base, ds.similarity, GraphConfig())

    bq = BinaryQuantization.compute(ds.base)
    bq_provider = bq.provider(bq.encode(ds.base))
    print(f"BQ: {bq.compressed_size} bytes/vector "
          f"(vs {ds.dimension * 4} fp32)")

    nvq = NVQuantization.compute(ds.base, num_subvectors=2)
    nvq_vectors = nvq.encode(ds.base)
    print(f"NVQ: {nvq_vectors.compressed_size} bytes/vector")
    nvq_reranker = nvq_vectors.provider(ds.similarity)

    res = search(
        graph, bq_provider, jnp.asarray(ds.queries), top_k=10,
        beam_width=200, rerank_k=200, reranker=nvq_reranker,
    )
    print("BQ->NVQ recall@10 =", recall_at_k(np.asarray(res.ids), ds.ground_truth, 10))


if __name__ == "__main__":
    main()
