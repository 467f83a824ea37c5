"""Tutorial 1 — in-memory build + search (reference: tutorial/VectorIntro).

Build a Vamana graph over an in-memory corpus, run a query wave, measure
recall against exact ground truth.
"""

import numpy as np
import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.util.datasets import load_siftsmall, recall_at_k, synthetic_dataset


def main():
    # bundled siftsmall when its base vectors exist; synthetic otherwise
    ds = load_siftsmall() or synthetic_dataset(n=10_000, dim=128, n_queries=100, k=100)
    print(f"dataset {ds.name}: {ds.base.shape[0]} x {ds.dimension}")

    config = GraphConfig(
        max_degree=32,  # reference outDegree
        ef_construction=100,  # reference efConstruction
        neighbor_overflow=1.2,
        alpha=1.2,
        add_hierarchy=True,
    )
    graph, provider = build_graph(ds.base, ds.similarity, config)
    print(f"built {int(graph.num_nodes)} nodes, {graph.num_levels} levels, "
          f"avg degree {graph.average_degree():.1f}")

    res = search(graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=100)
    r = recall_at_k(np.asarray(res.ids), ds.ground_truth, 10)
    print(f"recall@10 = {r:.4f}  "
          f"(mean visited {float(np.mean(np.asarray(res.visited_count))):.0f})")


if __name__ == "__main__":
    main()
