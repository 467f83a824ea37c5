"""Tutorial 2 — persist, reload, two-pass search (reference: tutorial/DiskIntro).

PQ-compress the corpus, save graph + features to one index file, reload it
and run the compressed-first-pass / exact-rerank search.
"""

import numpy as np
import jax.numpy as jnp

from jvector_tpu.disk import FeatureId, load_index, write_index
from jvector_tpu.graph import ExactScoreProvider, GraphConfig, build_graph, search
from jvector_tpu.graph.score import ADCScoreProvider
from jvector_tpu.quantization import ProductQuantization
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


def main(path="/tmp/disk_intro.jvtpu"):
    ds = synthetic_dataset(n=20_000, dim=128, n_queries=100, k=100)
    graph, _ = build_graph(ds.base, ds.similarity, GraphConfig())

    pq = ProductQuantization.compute(ds.base, m=16, clusters=256)
    codes = pq.encode(ds.base)
    write_index(
        path,
        graph,
        features={
            FeatureId.INLINE_VECTORS: {"vectors": ds.base},
            FeatureId.PQ_CODES: {
                "codes": np.asarray(codes),
                "codebooks": np.asarray(pq.codebooks),
                "center": np.asarray(pq.center),
            },
        },
        similarity=str(ds.similarity.value),
        dimension=ds.dimension,
    )

    odi = load_index(path)
    print("features on disk:", odi.features)
    g2, feats = odi.to_device()
    pq_prov = ADCScoreProvider(
        codes=feats[FeatureId.PQ_CODES]["codes"],
        codebooks=feats[FeatureId.PQ_CODES]["codebooks"],
        center=feats[FeatureId.PQ_CODES]["center"],
        sim=ds.similarity,
    )
    reranker = ExactScoreProvider(
        vectors=feats[FeatureId.INLINE_VECTORS]["vectors"], sim=ds.similarity
    )
    res = search(
        g2, pq_prov, jnp.asarray(ds.queries), top_k=10,
        beam_width=100, rerank_k=100, reranker=reranker,
    )
    print("two-pass recall@10 =", recall_at_k(np.asarray(res.ids), ds.ground_truth, 10))


if __name__ == "__main__":
    main()
