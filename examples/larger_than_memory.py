"""Tutorial 3 — larger-than-memory build (reference: tutorial/LargerThanMemory).

The PQ codes are the only full-corpus working set; full-resolution vectors
stream to the output file wave by wave while the graph is built with
PQ-approximate scores.
"""

import numpy as np
import jax.numpy as jnp

from jvector_tpu.disk import FeatureId, load_index
from jvector_tpu.disk.ltm import build_on_disk_ltm
from jvector_tpu.graph import GraphConfig
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


def main(path="/tmp/ltm_intro.jvtpu"):
    ds = synthetic_dataset(n=50_000, dim=128, n_queries=100, k=100)

    def loader(a, b):  # in production: read a chunk from object storage
        return ds.base[a:b]

    graph, pq_provider = build_on_disk_ltm(
        path, loader, n=ds.base.shape[0], dim=ds.dimension,
        config=GraphConfig(), pq_m=16,
    )
    print(f"LTM build complete: {int(graph.num_nodes)} nodes on disk at {path}")

    # serve: PQ working set in HBM; full vectors STAY ON HOST, memmapped
    # straight off the index file — HBM never holds the big payload
    from jvector_tpu.disk.host_tier import HostVectorStore, search_with_host_rerank

    odi = load_index(path)
    store = HostVectorStore.from_index_file(
        odi.reader, f"feature/{FeatureId.INLINE_VECTORS}/vectors", ds.similarity
    )
    res = search_with_host_rerank(
        graph, pq_provider, store, jnp.asarray(ds.queries),
        top_k=10, beam_width=150,
    )
    print("host-tier recall@10 =", recall_at_k(np.asarray(res.ids), ds.ground_truth, 10))


if __name__ == "__main__":
    main()
