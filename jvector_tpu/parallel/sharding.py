"""Device-mesh sharding for search and build.

Two axes of parallelism (the TPU substitute for the reference's thread pools
and the Astra-style multi-index scatter-gather, ``GraphSearcher.java:386-404``):

- ``dp`` (query data-parallel): a query wave is split across chips; the graph
  and vectors are replicated.  No collectives in the hot loop — each chip
  runs its own beam search, XLA just partitions the wave.
- ``nodes`` (index-sharded): the base vectors / codes are sharded by node
  ordinal; brute-force or rerank scoring runs shard-local and the per-shard
  top-k are merged with an all-gather + final top-k — the same contract as
  the reference's multi-index ``rerankFloor`` merge, but on ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jvector_tpu.graph.searcher import SearchResult, search
from jvector_tpu.ops.similarity import SimilarityFunction, pairwise_scores


def make_mesh(
    n_devices: int | None = None, axis_name: str = "dp"
) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis_name,))


def shard_queries(queries: jax.Array, mesh: Mesh, axis_name: str = "dp") -> jax.Array:
    return jax.device_put(queries, NamedSharding(mesh, P(axis_name, None)))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_search(
    graph,
    provider,
    queries: jax.Array,
    mesh: Mesh,
    top_k: int,
    beam_width: int | None = None,
    rerank_k: int | None = None,
    reranker=None,
    axis_name: str = "dp",
) -> SearchResult:
    """Data-parallel wave search: queries split over the mesh, graph replicated.

    The query count must be divisible by the mesh size.
    """
    graph = replicate(graph, mesh)
    provider = replicate(provider, mesh)
    if reranker is not None:
        reranker = replicate(reranker, mesh)
    queries = shard_queries(queries, mesh, axis_name)
    return search(
        graph,
        provider,
        queries,
        top_k=top_k,
        beam_width=beam_width,
        rerank_k=rerank_k,
        reranker=reranker,
    )


@partial(jax.jit, static_argnames=("k", "sim", "axis_name", "n_total"))
def _bf_shard_map_impl(queries, base_shard, k, sim, axis_name, n_total):
    scores = pairwise_scores(queries, base_shard, sim)  # [Q, N/n]
    # mask pad rows by GLOBAL id before the per-shard top_k: pad rows are
    # zeros, whose score is arbitrary (for DOT_PRODUCT a huge pad value would
    # even score best), so magnitude games cannot be trusted to bury them
    shard = jax.lax.axis_index(axis_name)
    n_local = base_shard.shape[0]
    gids = shard * n_local + jnp.arange(n_local, dtype=jnp.int32)
    scores = jnp.where(gids[None, :] < n_total, scores, -jnp.inf)
    s, i = jax.lax.top_k(scores, k)
    i = i + shard * n_local
    # all-gather per-shard top-k, merge
    s_all = jax.lax.all_gather(s, axis_name, axis=1)  # [Q, n, k]
    i_all = jax.lax.all_gather(i, axis_name, axis=1)
    Q = queries.shape[0]
    s_flat = s_all.reshape(Q, -1)
    i_flat = i_all.reshape(Q, -1)
    sm, sel = jax.lax.top_k(s_flat, k)
    return sm, jnp.take_along_axis(i_flat, sel, axis=1)


def sharded_brute_force(
    queries: jax.Array,
    base: jax.Array,
    mesh: Mesh,
    k: int,
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
    axis_name: str = "nodes",
):
    """Node-sharded exact top-k: base sharded by ordinal, all-gather merge.

    Used for exact ground truth at scale and as the node-sharded scoring
    pattern (shard-local score -> ICI all-gather -> merge) that the sharded
    build reuses.
    """
    sim = SimilarityFunction.parse(sim)
    n = base.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if pad:
        base = jnp.concatenate(
            [base, jnp.zeros((pad, base.shape[1]), base.dtype)], axis=0
        )

    fn = jax.shard_map(
        partial(_bf_shard_map_impl, k=k, sim=sim, axis_name=axis_name, n_total=n),
        mesh=mesh,
        in_specs=(P(), P(axis_name, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    scores, ids = fn(queries, base)
    # pad rows were masked to -inf inside the shard body; only k > n can
    # surface them, and those slots report -1
    return scores, jnp.where(ids < n, ids, -1)
