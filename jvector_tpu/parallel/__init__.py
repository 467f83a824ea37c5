"""Mesh sharding: multi-chip query waves and node-sharded scoring.

The reference is single-process (SURVEY.md §2.9) — its scale-out hooks are
``resume()``/``rerankFloor`` for caller-side multi-index scatter-gather.
Here scale-out is first-class: data-parallel query waves over a
``jax.sharding.Mesh`` and node-sharded scoring with top-k merge collectives
over ICI.
"""

from jvector_tpu.parallel.sharding import (
    make_mesh,
    shard_queries,
    replicate,
    sharded_search,
    sharded_brute_force,
)
from jvector_tpu.parallel.build import (
    ShardedIndex,
    sharded_build,
    sharded_graph_search,
    sharded_build_on_disk,
    save_sharded,
    load_sharded,
)

__all__ = [
    "make_mesh",
    "shard_queries",
    "replicate",
    "sharded_search",
    "sharded_brute_force",
    "ShardedIndex",
    "sharded_build",
    "sharded_graph_search",
    "sharded_build_on_disk",
    "save_sharded",
    "load_sharded",
]
