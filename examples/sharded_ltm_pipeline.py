"""The 100M pipeline at toy scale: sharded stream builds + merged serving.

Reference analog: one on-disk segment per partition plus the multi-segment
search lifecycle (``GraphSearcher.java:386-404``; Grid / the compactor
reopen segments independently).  Here every shard is a self-contained
larger-than-memory build (SQ4 working set on device, full-res vectors
streamed to the shard file) and serving never holds more than
O(wave x beam) graph data in HBM.

Production mapping: one shard per TPU host (builds are fully independent —
disjoint ranges, zero cross-shard traffic), `checkpoint_every` makes each
multi-hour shard build crash-resumable, and a re-run of the whole driver
skips shards already committed.
"""

import shutil

import numpy as np
import jax.numpy as jnp

from jvector_tpu.disk.host_graph import ShardedHostIndex
from jvector_tpu.graph import GraphConfig
from jvector_tpu.parallel import sharded_build_on_disk
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


def main(directory="/tmp/sharded_ltm_intro"):
    shutil.rmtree(directory, ignore_errors=True)
    ds = synthetic_dataset(n=40_000, dim=64, n_queries=100, k=10)

    def loader(a, b):  # in production: read a chunk from object storage
        return np.asarray(ds.base[a:b])

    man = sharded_build_on_disk(
        directory, loader, n=ds.base.shape[0], dim=ds.dimension, shards=4,
        config=GraphConfig(), sim=ds.similarity,
        checkpoint_every=32,  # each shard build survives process loss
    )
    print(f"built {man['n_shards']} shard containers in {directory}")

    # merged serving: every shard searched with bounded device memory
    # (adjacency + fused codes stay host memmaps), ids globalized by shard
    # offset, per-shard EXACT rerank, one top-k merge
    sharded = ShardedHostIndex.load(directory)
    res = sharded.search(jnp.asarray(ds.queries), top_k=10, beam_width=48, expand=2)
    r = recall_at_k(np.asarray(res.ids), np.asarray(ds.ground_truth), 10)
    print(f"merged recall@10 over {man['n_shards']} shards: {r:.4f}")


if __name__ == "__main__":
    main()
