"""HelloVectorWorld: the smallest end-to-end usage (reference analog).

Build an index over a few vectors, search it, print neighbors.
Run: PYTHONPATH=. python examples/hello_vector_world.py
"""

import numpy as np

from jvector_tpu import GraphConfig, build_graph, search


def main():
    rng = np.random.default_rng(0)
    vectors = rng.normal(size=(1000, 16)).astype(np.float32)
    graph, provider = build_graph(vectors, "euclidean", GraphConfig(max_degree=8))

    query = vectors[42:43] + 0.01
    result = search(graph, provider, query, top_k=3)
    print("nearest to a noisy copy of vector 42:", np.asarray(result.ids)[0])
    print("scores:", np.round(np.asarray(result.scores)[0], 4))


if __name__ == "__main__":
    main()
