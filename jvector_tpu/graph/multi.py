"""Multi-index search: the scatter-gather contract.

Reference: ``GraphSearcher.java:386-404`` — Astra/Cassandra searches one
index per sstable and merges, using ``rerankFloor`` (skip exact rerank of
candidates worse than the current global topK floor), ``resume()`` (pull
more results from an index), and ``SearchResult.worstApproximateScoreInTopK``.

TPU version: indexes are searched as whole query waves; the merge is a
top-k over the concatenated id/score channels with per-index ordinal
offsets.  ``rerank_floor`` is honored inside :func:`search` (candidates
below the floor are masked out of the exact-rerank gather).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.searcher import SearchResult, search


@dataclasses.dataclass
class IndexShard:
    """One searchable segment: graph + first-pass provider (+ reranker)."""

    graph: object
    provider: object
    reranker: object = None
    id_offset: int = 0  # added to local ids in the merged result


def multi_search(
    shards: list[IndexShard],
    queries: jax.Array,
    top_k: int,
    beam_width: int | None = None,
    rerank_k: int | None = None,
    use_rerank_floor: bool = True,
    floor_slack: float = 0.02,
) -> SearchResult:
    """Search every shard, merging topK with the rerank-floor optimization.

    Shards are searched in sequence; each later shard's exact rerank skips
    candidates that cannot enter the current global topK (the reference's
    ``rerankFloor`` contract).
    """
    q = queries.shape[0]
    best_ids = jnp.full((q, top_k), -1, jnp.int32)
    best_scores = jnp.full((q, top_k), -jnp.inf, jnp.float32)
    best_approx = jnp.full((q, top_k), -jnp.inf, jnp.float32)
    visited = jnp.zeros((q,), jnp.int32)
    expanded = jnp.zeros((q,), jnp.int32)
    reranked = jnp.zeros((q,), jnp.int32)

    for shard in shards:
        # The floor lives in APPROXIMATE score space: a candidate is skipped
        # only if even its first-pass score is below the worst approximate
        # score of the current global topK (worstApproximateScoreInTopK).
        # floor_slack guards against cross-shard approximate-score bias:
        # each shard's first pass uses its own codebooks, so scores are only
        # approximately comparable (same caveat as the reference contract).
        floor = (
            jnp.min(best_approx, axis=1) - floor_slack
            if use_rerank_floor
            else jnp.full((q,), -jnp.inf)
        )
        res = search(
            shard.graph,
            shard.provider,
            queries,
            top_k=top_k,
            beam_width=beam_width,
            rerank_k=rerank_k,
            reranker=shard.reranker,
            rerank_floor=floor,
        )
        ids = jnp.where(res.ids >= 0, res.ids + shard.id_offset, -1)
        cat_ids = jnp.concatenate([best_ids, ids], axis=1)
        cat_scores = jnp.concatenate([best_scores, res.scores], axis=1)
        cat_approx = jnp.concatenate([best_approx, res.approx_scores], axis=1)
        best_scores, sel = jax.lax.top_k(cat_scores, top_k)
        best_ids = jnp.take_along_axis(cat_ids, sel, axis=1)
        best_approx = jnp.take_along_axis(cat_approx, sel, axis=1)
        visited = visited + res.visited_count
        expanded = expanded + res.expanded_count
        reranked = reranked + res.reranked_count

    return SearchResult(
        ids=best_ids,
        scores=best_scores,
        visited_count=visited,
        expanded_count=expanded,
        reranked_count=reranked,
        approx_scores=best_approx,
    )
