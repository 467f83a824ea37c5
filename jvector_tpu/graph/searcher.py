"""Query-wave batched beam search.

TPU-native redesign of ``jv/graph/GraphSearcher.java``.  The reference's hot
loop (``searchOneLayer:406-457``) pops one candidate off a heap, expands its
neighbors through the visited set, and pushes scored neighbors back.  Here a
whole *wave* of Q queries advances in lock-step inside one jitted
``lax.while_loop``:

- the candidate heap + result heap pair becomes one fixed-width beam of
  ``ef`` (score-sorted ids + an ``expanded`` flag per slot);
- the visited ``IntHashSet`` becomes a packed bitset ``uint32[Q, N/32]``;
  bits are set with scatter-add, exact because ids within one expansion are
  unique (graph row invariant);
- the stop rule "best remaining candidate is worse than the worst result"
  becomes "no unexpanded slot survives in the beam", per query, with
  finished queries masked out while the wave drains;
- reranking (``GraphSearcher.reranking:471-507``) reruns exact scores over
  the top ``rerank_k`` beam slots in one batched gather+matmul.

Counters mirror ``SearchResult``: visited/expanded/reranked counts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jvector_tpu.graph.index import NEG_INF, GraphIndex

_WORD_BITS = 32


class SearchResult(NamedTuple):
    """Per-wave result: ``[Q, k]`` ids/scores + counters (reference ``SearchResult``)."""

    ids: jax.Array  # int32 [Q, k]
    scores: jax.Array  # float32 [Q, k]
    visited_count: jax.Array  # int32 [Q]
    expanded_count: jax.Array  # int32 [Q]
    reranked_count: jax.Array  # int32 [Q]
    # approximate (first-pass) scores of the returned topK — the multi-index
    # rerank-floor contract (reference worstApproximateScoreInTopK)
    approx_scores: jax.Array = None  # float32 [Q, k] or None


class _BeamState(NamedTuple):
    ids: jax.Array  # int32 [Q, L]
    scores: jax.Array  # float32 [Q, L]
    expanded: jax.Array  # bool [Q, L]
    visited: jax.Array  # uint32 [Q, W] packed HASHED bitset
    visited_count: jax.Array  # int32 [Q]
    expanded_count: jax.Array  # int32 [Q]
    iters: jax.Array  # int32 scalar
    # consecutive iterations whose best new candidate stayed below the
    # caller's threshold (ScoreTracker early-termination state)
    stale: jax.Array = None  # int32 [Q] or None


# The visited set is a per-query HASHED bitset of 2^hash_bits slots, not an
# exact N-bit set.  Rationale (from profiling at N=1M, Q=1024): an exact
# bitset is a 128 MB while_loop carry, and XLA's scatter re-materializes +
# layout-copies it every iteration (~2.6 ms/iter, 75% of loop cost).  The
# hashed set is N-independent (32 KB/query at the default 18 bits), which
# also makes 100M-node searches feasible.  Hash collisions make a fresh node
# look visited (it gets skipped) — the same accepted trade as GPU ANN hash
# tables; with ~4k visited and 2^18 slots the false-positive rate is ~1.6%.
DEFAULT_HASH_BITS = 18
_HASH_MULT = jnp.uint32(0x9E3779B1)  # Knuth multiplicative hash


def _hash_slots(ids: jax.Array, hash_bits: int) -> jax.Array:
    """Node id -> hashed bit slot in [0, 2^hash_bits)."""
    h = ids.astype(jnp.uint32) * _HASH_MULT
    return (h >> (32 - hash_bits)).astype(jnp.int32)


def _gather_bits(visited: jax.Array, slots: jax.Array) -> jax.Array:
    """visited ``[Q, W]``, slots ``[Q, R]`` -> {0,1} int32 ``[Q, R]``."""
    word = slots >> 5
    bit = slots & (_WORD_BITS - 1)
    w = jnp.take_along_axis(visited, word, axis=1)
    return ((w >> bit.astype(jnp.uint32)) & 1).astype(jnp.int32)


def _set_bits(visited: jax.Array, slots: jax.Array, mask: jax.Array) -> jax.Array:
    """Set bit ``slots`` where ``mask``; exact via scatter-add because the
    caller guarantees slots are unique within a row where mask is set."""
    word = slots >> 5
    add = jnp.where(
        mask, jnp.uint32(1) << (slots & (_WORD_BITS - 1)).astype(jnp.uint32), 0
    )
    q = jnp.broadcast_to(jnp.arange(visited.shape[0])[:, None], slots.shape)
    return visited.at[q, word].add(add.astype(visited.dtype), mode="drop")


def _merge_beam(
    beam_ids, beam_scores, beam_expanded, new_ids, new_scores
):
    """Merge new scored candidates into the beam, keep top-L by score."""
    L = beam_ids.shape[1]
    ids = jnp.concatenate([beam_ids, new_ids], axis=1)
    scores = jnp.concatenate([beam_scores, new_scores], axis=1)
    expanded = jnp.concatenate(
        [beam_expanded, jnp.zeros_like(new_ids, bool)], axis=1
    )
    # Sort desc by score; lax.sort is ascending so negate. Single fused sort
    # carrying all three channels.
    neg, ids_s, exp_s = jax.lax.sort(
        (-scores, ids, expanded.astype(jnp.int32)), dimension=1, num_keys=1
    )
    return ids_s[:, :L], -neg[:, :L], exp_s[:, :L].astype(bool)


@partial(
    jax.jit,
    static_argnames=(
        "beam_width",
        "max_iters",
        "expand_per_iter",
        "hash_bits",
        "unroll",
        "stop_threshold",
        "stop_patience",
    ),
)
def search_layer(
    graph_neighbors: jax.Array,  # int32 [N, R]
    provider,
    qstate,
    entry_ids: jax.Array,  # int32 [Q] or [Q, E] initial candidates
    beam_width: int,
    max_iters: int = 1000,
    expand_per_iter: int = 1,
    visited_init: jax.Array | None = None,
    hash_bits: int = DEFAULT_HASH_BITS,
    unroll: int = 1,
    stop_threshold: float = 0.0,
    stop_patience: int = 24,
) -> _BeamState:
    """Run beam search to quiescence on one adjacency layer.

    Returns the final beam (sorted desc); callers slice top-k / rerank.

    ``stop_threshold > 0`` enables threshold-search early termination
    (reference ``ScoreTracker``/VBase relaxed monotonicity,
    ``ScoreTracker.java:27-90``): a query whose best freshly-scored
    candidate has stayed below the threshold for ``stop_patience``
    consecutive iterations is retired (its beam is frozen) — past the
    query's neighborhood, scores only keep falling.
    """
    N, R = graph_neighbors.shape
    if entry_ids.ndim == 1:
        entry_ids = entry_ids[:, None]
    Q, E0 = entry_ids.shape
    L = beam_width
    words = (1 << hash_bits) // _WORD_BITS
    n_slots = jnp.int32(1 << hash_bits)

    # --- init: score entry points, seed the beam -------------------------
    safe_entries = jnp.maximum(entry_ids, 0)
    entry_scores = jnp.where(
        entry_ids >= 0, provider.score(qstate, safe_entries), NEG_INF
    )
    pad = L - E0
    beam_ids = jnp.concatenate(
        [entry_ids, jnp.full((Q, pad), -1, jnp.int32)], axis=1
    )
    beam_scores = jnp.concatenate(
        [entry_scores, jnp.full((Q, pad), NEG_INF)], axis=1
    )
    order = jnp.argsort(-beam_scores, axis=1)
    beam_ids = jnp.take_along_axis(beam_ids, order, axis=1)
    beam_scores = jnp.take_along_axis(beam_scores, order, axis=1)
    beam_expanded = jnp.zeros((Q, L), bool)

    visited = (
        visited_init
        if visited_init is not None
        else jnp.zeros((Q, words), jnp.uint32)
    )
    # entry slots are distinct per query only if E0==1; dedup via sort is
    # overkill here — entries come from distinct nodes whose hash collisions
    # at init merely mark an extra slot (safe: add of equal bits only when
    # slots equal, so mask the later duplicates).
    entry_slots = _hash_slots(safe_entries, hash_bits)
    if E0 > 1:
        srt = jnp.sort(jnp.where(entry_ids >= 0, entry_slots, n_slots), axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((Q, 1), bool), srt[:, 1:] == srt[:, :-1]], axis=1
        )
        visited = _set_bits(
            visited, jnp.minimum(srt, n_slots - 1), (srt < n_slots) & ~dup
        )
    else:
        visited = _set_bits(visited, entry_slots, entry_ids >= 0)

    state = _BeamState(
        ids=beam_ids,
        scores=beam_scores,
        expanded=beam_expanded,
        visited=visited,
        visited_count=jnp.sum(entry_ids >= 0, axis=1).astype(jnp.int32),
        expanded_count=jnp.zeros((Q,), jnp.int32),
        iters=jnp.int32(0),
        stale=jnp.zeros((Q,), jnp.int32) if stop_threshold > 0 else None,
    )

    def cond(s: _BeamState):
        has_unexpanded = jnp.any(~s.expanded & (s.scores > NEG_INF))
        return has_unexpanded & (s.iters < max_iters)

    E = expand_per_iter
    # fused edge-scoring: one contiguous codes row per expanded node
    # (reference processNeighbors -> enableSimilarityToNeighbors fast path)
    use_fused = E == 1 and getattr(provider, "supports_fused", False)

    def body(s: _BeamState) -> _BeamState:
        # pop the E best unexpanded slots per query (the heap pops)
        sel_scores = jnp.where(~s.expanded, s.scores, NEG_INF)
        top_scores, sel_idx = jax.lax.top_k(sel_scores, E)  # [Q, E]
        active = top_scores > NEG_INF  # [Q, E]
        sel_ids = jnp.take_along_axis(s.ids, sel_idx, axis=1)  # [Q, E]
        safe_sel = jnp.where(active, sel_ids, 0)

        # mark expanded (top_k indices are distinct per row)
        qrows = jnp.broadcast_to(
            jnp.arange(sel_idx.shape[0])[:, None], sel_idx.shape
        )
        expanded = s.expanded.at[qrows, sel_idx].set(True)

        # expand neighbors of all E pops at once
        nbrs = graph_neighbors[safe_sel].reshape(s.ids.shape[0], -1)  # [Q, E*R]
        valid = ((nbrs >= 0) & active[:, :, None].repeat(R, axis=2).reshape(
            s.ids.shape[0], -1
        ))
        if use_fused:
            edge_scores = provider.score_edges(qstate, safe_sel[:, 0])  # [Q, R]
        else:
            edge_scores = jnp.zeros(nbrs.shape, jnp.float32)

        # sort by hashed slot + dedup: keeps the bitset scatter-add exact
        # under hash collisions AND dedups shared neighbors across E pops.
        slots = _hash_slots(nbrs, hash_bits)
        key = jnp.where(valid, slots, n_slots)
        key_sorted, nbrs_sorted, edge_sorted = jax.lax.sort(
            (key, nbrs, edge_scores), dimension=1, num_keys=1
        )
        dup = jnp.concatenate(
            [
                jnp.zeros((key.shape[0], 1), bool),
                key_sorted[:, 1:] == key_sorted[:, :-1],
            ],
            axis=1,
        )
        valid = (key_sorted < n_slots) & ~dup
        nbrs = jnp.where(valid, nbrs_sorted, -1)
        slots_sorted = jnp.minimum(key_sorted, n_slots - 1)

        seen = _gather_bits(s.visited, slots_sorted)
        fresh = valid & (seen == 0)
        visited2 = _set_bits(s.visited, slots_sorted, fresh)

        safe_nbrs = jnp.where(fresh, nbrs, 0)
        if use_fused:
            new_scores = jnp.where(fresh, edge_sorted, NEG_INF)
        else:
            new_scores = jnp.where(
                fresh, provider.score(qstate, safe_nbrs), NEG_INF
            )
        new_ids = jnp.where(fresh, nbrs, -1)

        ids3, scores3, expanded3 = _merge_beam(
            s.ids, s.scores, expanded, new_ids, new_scores
        )
        stale2 = s.stale
        if stop_threshold > 0:
            best_new = jnp.max(new_scores, axis=1)
            stale2 = jnp.where(best_new >= stop_threshold, 0, s.stale + 1)
            # retire queries stuck below the threshold: freeze their beams
            retire = stale2 >= stop_patience
            expanded3 = expanded3 | retire[:, None]
        return _BeamState(
            ids=ids3,
            scores=scores3,
            expanded=expanded3,
            visited=visited2,
            visited_count=s.visited_count + jnp.sum(fresh, axis=1).astype(jnp.int32),
            expanded_count=s.expanded_count
            + jnp.sum(active, axis=1).astype(jnp.int32),
            iters=s.iters + 1,
            stale=stale2,
        )

    if unroll > 1:
        # several pops per loop step: surplus steps after quiescence are
        # harmless no-ops (nothing unexpanded -> active all False)
        inner = body

        def body(s: _BeamState) -> _BeamState:  # noqa: F811
            for _ in range(unroll):
                s = inner(s)
            return s

    return jax.lax.while_loop(cond, body, state)


def _descend_hierarchy(
    graph: GraphIndex, provider, qstate, n_queries: int, hierarchy_beam: int
) -> jax.Array:
    """Upper-layer descent: returns per-query layer-0 entry ids ``[Q]``.

    Seeds by scoring ALL top-level nodes in one batched gather, then runs a
    narrow beam per middle level (reference descends with beam 1,
    ``GraphSearcher.internalSearch:263-282``).
    """
    from jvector_tpu.graph.hierarchy import LevelProvider, slots_for

    top_ids = graph.level_node_ids[-1]
    n_top = top_ids.shape[0]
    scores = provider.score(
        qstate, jnp.broadcast_to(top_ids[None, :], (n_queries, n_top))
    )
    scores = jnp.where(graph.deleted[top_ids][None, :], NEG_INF, scores)
    best = top_ids[jnp.argmax(scores, axis=1)]  # [Q] base ordinals
    # if every top node is a hole, fall back to the (live) entry point
    best = jnp.where(jnp.max(scores, axis=1) > NEG_INF, best, graph.entry_node)

    for l in range(graph.num_levels - 2, 0, -1):
        ids_l = graph.level_node_ids[l - 1]
        lp = LevelProvider(inner=provider, node_ids=ids_l)
        entry_slots = slots_for(ids_l, best)
        beam = search_layer(
            graph.layers[l].neighbors,
            lp,
            qstate,
            entry_slots,
            beam_width=hierarchy_beam,
            max_iters=64,
        )
        top_slot = jnp.clip(beam.ids[:, 0], 0, ids_l.shape[0] - 1)
        best = ids_l[top_slot]
    return best


@partial(
    jax.jit,
    static_argnames=(
        "top_k",
        "rerank_k",
        "beam_width",
        "max_iters",
        "hierarchy_beam",
        "expand_per_iter",
        "threshold",
        "hash_bits",
    ),
)
def search(
    graph: GraphIndex,
    provider,
    queries: jax.Array,  # [Q, D]
    top_k: int,
    beam_width: int | None = None,
    rerank_k: int | None = None,
    reranker=None,
    max_iters: int = 1000,
    hierarchy_beam: int = 1,
    accept: jax.Array | None = None,  # bool [N] acceptOrds mask
    rerank_floor: jax.Array | None = None,  # f32 [Q]: skip rerank below this
    expand_per_iter: int = 1,
    threshold: float = 0.0,  # drop results scoring below this similarity
    exclude_ids: jax.Array | None = None,  # int32 [Q, P] drop from results
    hash_bits: int = DEFAULT_HASH_BITS,
) -> SearchResult:
    """Two-pass wave search (reference ``GraphSearcher.search:222-243``).

    First pass descends the hierarchy (if any) then runs the layer-0 beam
    with ``provider`` (exact or compressed); if ``reranker`` is given, the
    top ``rerank_k`` beam entries get exact scores and the final top-k comes
    from those (``reranking:471-507``).
    """
    if beam_width is None:
        beam_width = max(top_k, 100)
    if rerank_k is None:
        rerank_k = beam_width if reranker is not None else top_k

    qstate = provider.prepare(queries)
    Q = queries.shape[0]
    if graph.num_levels > 1:
        entries = _descend_hierarchy(graph, provider, qstate, Q, hierarchy_beam)
    else:
        entries = jnp.broadcast_to(graph.entry_node[None], (Q,)).astype(jnp.int32)

    final = search_layer(
        graph.base.neighbors,
        provider,
        qstate,
        entries,
        beam_width=beam_width,
        max_iters=max_iters,
        expand_per_iter=expand_per_iter,
        hash_bits=hash_bits,
        stop_threshold=threshold,
    )

    def filter_allowed(ids, scores):
        """Drop tombstoned / not-accepted / explicitly-excluded nodes.

        Deleted nodes stay traversable until cleanup (the reference keeps
        them in the graph, filtering only results via ``Bits`` acceptOrds).
        """
        ok = ids >= 0
        safe = jnp.maximum(ids, 0)
        ok &= ~graph.deleted[safe]
        if accept is not None:
            ok &= accept[safe]
        if exclude_ids is not None:
            ok &= ~jnp.any(ids[:, :, None] == exclude_ids[:, None, :], axis=2)
        return jnp.where(ok, ids, -1), jnp.where(ok, scores, NEG_INF)

    if threshold > 0.0:
        # threshold search (reference: GraphSearcher.search with threshold +
        # ScoreTracker): results below the similarity threshold are dropped.
        final = final._replace(
            ids=jnp.where(final.scores >= threshold, final.ids, -1),
            scores=jnp.where(final.scores >= threshold, final.scores, NEG_INF),
        )

    if reranker is None:
        ids, scores = filter_allowed(final.ids, final.scores)
        order = jnp.argsort(-scores, axis=1)
        ids = jnp.take_along_axis(ids, order, axis=1)[:, :top_k]
        scores = jnp.take_along_axis(scores, order, axis=1)[:, :top_k]
        return SearchResult(
            ids=ids,
            scores=scores,
            visited_count=final.visited_count,
            expanded_count=final.expanded_count,
            reranked_count=jnp.zeros((Q,), jnp.int32),
            approx_scores=scores,
        )

    # exact rerank of the approximate top rerank_k
    cand_ids, cand_scores = filter_allowed(
        final.ids[:, :rerank_k], final.scores[:, :rerank_k]
    )
    cand_valid = cand_ids >= 0
    if rerank_floor is not None:
        # multi-index contract: skip exact scoring of candidates whose
        # approximate score cannot reach the caller's current topK floor
        cand_valid &= cand_scores >= rerank_floor[:, None]
        cand_ids = jnp.where(cand_valid, cand_ids, -1)
    safe = jnp.maximum(cand_ids, 0)
    exact_scores = jnp.where(
        cand_valid, reranker.score(reranker.prepare(queries), safe), NEG_INF
    )
    order = jnp.argsort(-exact_scores, axis=1)
    ids = jnp.take_along_axis(cand_ids, order, axis=1)[:, :top_k]
    scores = jnp.take_along_axis(exact_scores, order, axis=1)[:, :top_k]
    approx = jnp.take_along_axis(cand_scores, order, axis=1)[:, :top_k]
    return SearchResult(
        ids=ids,
        scores=scores,
        visited_count=final.visited_count,
        expanded_count=final.expanded_count,
        reranked_count=jnp.sum(cand_valid, axis=1).astype(jnp.int32),
        approx_scores=approx,
    )


def resume(
    graph: GraphIndex,
    provider,
    queries: jax.Array,
    previous: SearchResult,
    top_k: int,
    beam_width: int | None = None,
    reranker=None,
    **kwargs,
) -> SearchResult:
    """Pull the NEXT ``top_k`` results after ``previous``.

    Reference: ``GraphSearcher.resume():509-547`` continues from evicted
    candidate state; here the wave equivalent re-searches with a wider beam
    and excludes the already-returned ids from the result set (the caller
    contract — more results, none repeated — is identical).
    """
    prev_k = previous.ids.shape[1]
    if beam_width is None:
        beam_width = max(2 * (top_k + prev_k), 100)
    return search(
        graph,
        provider,
        queries,
        top_k=top_k,
        beam_width=beam_width,
        reranker=reranker,
        exclude_ids=previous.ids,
        **kwargs,
    )
