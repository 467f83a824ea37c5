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
from functools import partial

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


def _can_stack(shards: list[IndexShard]) -> bool:
    """Stackable iff every shard's graph/provider/reranker pytrees share
    structure AND leaf shapes (bucket_capacity aligns same-size segments)."""
    if len(shards) < 2:
        return False

    def sig(shard):
        return tuple(
            (jax.tree.structure(t), tuple(x.shape for x in jax.tree.leaves(t)))
            for t in (shard.graph, shard.provider, shard.reranker)
        )

    first = sig(shards[0])
    return all(sig(s) == first for s in shards[1:])


def _multi_search_stacked(
    shards: list[IndexShard],
    queries: jax.Array,
    top_k: int,
    beam_width: int | None,
    rerank_k: int | None,
    repack_after: int = 0,
) -> SearchResult:
    """All segments in ONE compiled program: shard pytrees stacked on a
    leading axis, the per-segment search vmapped (segments advance in
    lockstep inside one while_loop), one global top-k merge.

    The sequential rerankFloor gating is deliberately dropped here: with
    all segments searched simultaneously there is no "current global topK"
    to gate on, and on TPU the batched rerank costs the same masked or
    unmasked (see ``parallel.build.sharded_graph_search``).
    """
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    graphs = stack([s.graph for s in shards])
    providers = stack([s.provider for s in shards])
    rerankers = (
        stack([s.reranker for s in shards])
        if shards[0].reranker is not None
        else None
    )
    offsets = jnp.asarray([s.id_offset for s in shards], jnp.int32)
    return _stacked_impl(
        graphs, providers, rerankers, offsets, queries,
        top_k=top_k, beam_width=beam_width, rerank_k=rerank_k,
        repack_after=repack_after,
    )


@partial(
    jax.jit,
    static_argnames=("top_k", "beam_width", "rerank_k", "repack_after"),
)
def _stacked_impl(
    graphs, providers, rerankers, offsets, queries, *, top_k, beam_width,
    rerank_k, repack_after=0,
):
    from jvector_tpu.graph.searcher import _search_jit

    def one(graph, provider, reranker, offset):
        res = _search_jit(
            graph,
            provider,
            queries,
            top_k=top_k,
            beam_width=beam_width,
            rerank_k=rerank_k,
            reranker=reranker,
            repack_after=repack_after,
        )
        ids = jnp.where(res.ids >= 0, res.ids + offset, -1)
        return res._replace(ids=ids)

    axes = (0, 0, 0 if rerankers is not None else None, 0)
    per = jax.vmap(one, in_axes=axes)(graphs, providers, rerankers, offsets)
    # merge: [S, Q, K] -> global top_k
    s, q, k = per.ids.shape
    cat = lambda x: jnp.moveaxis(x, 0, 1).reshape(q, s * k)
    scores_all = cat(per.scores)
    best_scores, sel = jax.lax.top_k(scores_all, top_k)
    take = lambda x: jnp.take_along_axis(cat(x), sel, axis=1)
    return SearchResult(
        ids=take(per.ids),
        scores=best_scores,
        visited_count=jnp.sum(per.visited_count, axis=0),
        expanded_count=jnp.sum(per.expanded_count, axis=0),
        reranked_count=jnp.sum(per.reranked_count, axis=0),
        approx_scores=take(per.approx_scores),
    )


def multi_search(
    shards: list[IndexShard],
    queries: jax.Array,
    top_k: int,
    beam_width: int | None = None,
    rerank_k: int | None = None,
    use_rerank_floor: bool = True,
    floor_slack: float = 0.02,
    stacked: bool | None = None,
    repack_after: int = 0,
) -> SearchResult:
    """Search every shard and merge the global topK.

    When all segments share shapes (``bucket_capacity`` aligns equal-size
    segments), the whole multi-index search runs as ONE compiled program
    (``stacked``; vmapped over a stacked shard axis) — pass
    ``stacked=False`` to force the sequential path.  Heterogeneous
    segments fall back to the sequential loop, where each later shard's
    exact rerank skips candidates that cannot enter the current global
    topK (the reference's ``rerankFloor`` contract).
    """
    if stacked is None:
        stacked = _can_stack(shards)
    if stacked:
        return _multi_search_stacked(
            shards, queries, top_k, beam_width, rerank_k, repack_after
        )
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
            repack_after=repack_after,
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
