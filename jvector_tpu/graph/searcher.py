"""Query-wave batched beam search.

TPU-native redesign of ``jv/graph/GraphSearcher.java``.  The reference's hot
loop (``searchOneLayer:406-457``) pops one candidate off a heap, expands its
neighbors through the visited set, and pushes scored neighbors back.  Here a
whole *wave* of Q queries advances in lock-step inside one jitted
``lax.while_loop``:

- the candidate heap + result heap pair becomes one fixed-width beam of
  ``beam_width`` slots (score-sorted ids + an ``expanded`` flag per slot);
- the visited ``IntHashSet`` becomes **exact compare-based dedup**: a new
  candidate is fresh iff it matches nothing in the current beam, nothing in
  the expansion history ring (ids popped so far), and no earlier candidate
  of the same step.  All three are dense VPU equality reductions — no
  gather, no scatter, no hashing (an earlier revision used a hashed bitset;
  the scatter + slot-sort it required cost more per iteration than these
  compares and produced ~1.6% false-positive skips);
- ``expand_per_iter`` (E) pops the E best unexpanded slots per step —
  fewer, fatter sequential steps for the same visit budget;
- the stop rule "best remaining candidate is worse than the worst result"
  becomes "no unexpanded slot survives in the beam", per query, with
  finished queries masked out while the wave drains;
- reranking (``GraphSearcher.reranking:471-507``) reruns exact scores over
  the top ``rerank_k`` beam slots in one batched gather+matmul.

The final :class:`BeamState` is returned to callers and can seed a
continuation (`resume`), matching ``GraphSearcher.resume():509-547``'s
evicted-state semantics: the beam + history carry over, so pulling the next
page costs only the extra expansions.

Counters mirror ``SearchResult``: visited/expanded/reranked counts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.index import NEG_INF, GraphIndex


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


class BeamState(NamedTuple):
    """Loop state; also the resumable continuation (reference evicted state)."""

    ids: jax.Array  # int32 [Q, L]
    scores: jax.Array  # float32 [Q, L]
    expanded: jax.Array  # bool [Q, L]
    history: jax.Array  # int32 [Q, T] ring of expanded ids (-1 padded)
    visited_count: jax.Array  # int32 [Q]
    expanded_count: jax.Array  # int32 [Q]
    iters: jax.Array  # int32 scalar
    # consecutive iterations whose best new candidate stayed below the
    # caller's threshold (ScoreTracker early-termination state)
    stale: jax.Array = None  # int32 [Q] or None
    # filtered-search (acceptOrds) result channel: top-K ACCEPTED nodes
    # found so far, maintained inside the loop (reference resultsQueue)
    res_ids: jax.Array = None  # int32 [Q, K] or None
    res_scores: jax.Array = None  # float32 [Q, K] or None


def _history_len(
    expand_per_iter: int, max_iters: int, beam_width: int, requested: int | None
) -> int:
    """Ring size: lane-aligned, multiple of E.

    Default 2x the beam width: a query rarely expands more than ~2L nodes
    before quiescence, the dedup compare cost scales with T, and the ring
    overwrite merely forgets the OLDEST expansions — a forgotten node can
    only re-enter if it also beats the current beam floor, which decays
    monotonically, so duplicates past 2L expansions are vanishingly rare.
    """
    if requested is not None:
        t = requested
    else:
        t = min(expand_per_iter * max_iters, max(128, 2 * beam_width))
    step = 128
    while step % expand_per_iter:  # keep T a multiple of E so ring writes
        step += 128  # never straddle the wrap point
    return max(((t + step - 1) // step) * step, step)


def _dedup_new(new_ids: jax.Array, beam_ids: jax.Array, history: jax.Array):
    """Fresh mask for ``new_ids [Q, C]`` vs beam ``[Q, L]``, history ``[Q, T]``
    and earlier same-step candidates.  Pure dense equality reductions."""
    dup_beam = jnp.any(
        new_ids[:, :, None] == beam_ids[:, None, :], axis=2
    )  # [Q, C]
    dup_hist = jnp.any(new_ids[:, :, None] == history[:, None, :], axis=2)
    c = new_ids.shape[1]
    eq = new_ids[:, :, None] == new_ids[:, None, :]  # [Q, C, C]
    earlier = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    )[None]
    dup_self = jnp.any(eq & earlier, axis=2)
    return ~(dup_beam | dup_hist | dup_self)


def _merge_beam(beam_ids, beam_scores, beam_expanded, new_ids, new_scores):
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
        "history_len",
        "unroll",
        "stop_threshold",
        "stop_patience",
        "reopen_quiescent",
        "result_k",
        "packed_rows",
        "packed_pairs",
    ),
)
def search_layer(
    graph_neighbors: jax.Array,  # int32 [N, R] (or packed [N/8, 8, 128])
    provider,
    qstate,
    entry_ids: jax.Array,  # int32 [Q] or [Q, E0] initial candidates
    beam_width: int,
    max_iters: int = 1000,
    expand_per_iter: int = 1,
    history_len: int | None = None,
    unroll: int = 1,
    stop_threshold: float = 0.0,
    stop_patience: int = 32,
    init_state: BeamState | None = None,
    reopen_quiescent: bool = True,  # False: pure continuation (repacked
    # tail waves) — quiescent lanes stay quiescent instead of re-mining
    # their beam floor as resume() does
    accept: jax.Array | None = None,  # bool [N]: filtered search when given
    result_k: int | None = None,  # result-channel width in filtered mode
    packed_rows: int | None = None,  # builder packed-adjacency mode: the
    # graph is ``[N/8, 8, 128]`` int32 (ids in lanes [0:packed_rows], f32
    # score bits in [64:64+R]); the body gathers one 512-byte physical row
    # per expansion — same row-count-bound gather cost as a [N, R] table
    packed_pairs: int | None = None,  # serving paired-row mode: the graph
    # is ``[N/2, 2*R]`` int32, node ``i``'s ids in lanes
    # ``[(i&1)*R : (i&1)*R + R]`` of physical row ``i >> 1``.  A plain
    # ``[N, R]`` i32 table with R <= 64 lane-pads 2x on TPU (tile minor
    # 128); pairing two nodes per physical row halves the HBM footprint
    # (2.56 GB vs 5.1 GB at 10M x R=64) at the same row-count-bound
    # gather cost.  Value = R (ids per node).
) -> BeamState:
    """Run beam search to quiescence on one adjacency layer.

    Returns the final beam (sorted desc); callers slice top-k / rerank, or
    feed the state back via ``init_state`` to continue (resume).

    ``stop_threshold > 0`` enables threshold-search early termination
    (reference ``ScoreTracker``/VBase relaxed monotonicity,
    ``ScoreTracker.java:27-90``): a query whose best freshly-scored
    candidate has stayed below the threshold for ``stop_patience``
    consecutive iterations is retired (its beam is frozen) — past the
    query's neighborhood, scores only keep falling.  The default of 32 is
    characterized across euclidean/dot/cosine corpora (d=24-64): it is the
    smallest value with 100% retention of above-threshold results, saving
    34-38% of expansions; 24 retains 97.8-100%, 16 saves ~62% at 97.8-100%
    (see tests/test_search_api.py::test_threshold_patience_retention).
    """
    if packed_rows is not None:
        R = packed_rows
    elif packed_pairs is not None:
        R = packed_pairs
    else:
        _, R = graph_neighbors.shape
    L = beam_width
    E = expand_per_iter
    filtered = accept is not None
    K = (result_k or L) if filtered else None
    # filtered searches expand far past quiescence (they keep going until
    # topK ACCEPTED results can no longer improve), so the dedup ring gets
    # twice the default depth
    T = _history_len(E, max_iters, (2 * L) if filtered else L, history_len)

    if init_state is not None:
        state = init_state
        Q = state.ids.shape[0]
        if state.ids.shape[1] < L:  # widen the beam for a continuation
            pad = L - state.ids.shape[1]
            state = state._replace(
                ids=jnp.concatenate(
                    [state.ids, jnp.full((Q, pad), -1, jnp.int32)], axis=1
                ),
                scores=jnp.concatenate(
                    [state.scores, jnp.full((Q, pad), NEG_INF)], axis=1
                ),
                expanded=jnp.concatenate(
                    [state.expanded, jnp.zeros((Q, pad), bool)], axis=1
                ),
            )
        T = state.history.shape[1]
        if stop_threshold > 0 and state.stale is None:
            state = state._replace(stale=jnp.zeros((Q,), jnp.int32))
        # Re-open quiescent frontiers: a finished search has every valid
        # beam slot expanded, so a continuation would terminate on the first
        # cond() check and a widened beam could never fill its new slots
        # (paging past the original beam_width returned -1s).  Re-open the
        # BOTTOM-k valid slots: their neighbors score near the old beam
        # floor — exactly the evicted-candidate pool the reference's
        # ``resume():509-547`` mines — so they re-enter as fresh unexpanded
        # candidates and expansion cascades only into genuinely new work
        # (re-opening the TOP slots is useless — their neighbors are already
        # in the beam/history — and re-opening everything costs a full
        # re-search).  History dedup keeps the re-pops cheap.
        if reopen_quiescent:
            L_old = init_state.ids.shape[1]
            k_reopen = max(E, -(-(L - L_old) // R))
            valid = state.scores > NEG_INF
            quiescent = ~jnp.any(~state.expanded & valid, axis=1, keepdims=True)
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            vc = jnp.sum(valid, axis=1, keepdims=True)
            reopen = quiescent & (pos >= vc - k_reopen) & (pos < vc)
            state = state._replace(expanded=state.expanded & ~reopen)
    else:
        if entry_ids.ndim == 1:
            entry_ids = entry_ids[:, None]
        Q, E0 = entry_ids.shape

        # --- init: dedup + score entry points, seed the beam --------------
        if E0 > 1:
            eq = entry_ids[:, :, None] == entry_ids[:, None, :]
            earlier = (
                jax.lax.broadcasted_iota(jnp.int32, (E0, E0), 1)
                < jax.lax.broadcasted_iota(jnp.int32, (E0, E0), 0)
            )[None]
            entry_ids = jnp.where(jnp.any(eq & earlier, axis=2), -1, entry_ids)
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

        state = BeamState(
            ids=beam_ids,
            scores=beam_scores,
            expanded=jnp.zeros((Q, L), bool),
            history=jnp.full((Q, T), -1, jnp.int32),
            visited_count=jnp.sum(entry_ids >= 0, axis=1).astype(jnp.int32),
            expanded_count=jnp.zeros((Q,), jnp.int32),
            iters=jnp.int32(0),
            stale=jnp.zeros((Q,), jnp.int32) if stop_threshold > 0 else None,
        )

    if filtered and state.res_ids is None:
        # seed the result channel with any ACCEPTED entry points
        Q = state.ids.shape[0]
        acc_e = (state.ids >= 0) & accept[jnp.maximum(state.ids, 0)]
        rids = jnp.concatenate(
            [jnp.where(acc_e, state.ids, -1), jnp.full((Q, K), -1, jnp.int32)],
            axis=1,
        )
        rsc = jnp.concatenate(
            [jnp.where(acc_e, state.scores, NEG_INF), jnp.full((Q, K), NEG_INF)],
            axis=1,
        )
        neg, rids_s = jax.lax.sort((-rsc, rids), dimension=1, num_keys=1)
        state = state._replace(res_ids=rids_s[:, :K], res_scores=-neg[:, :K])

    def cond(s: BeamState):
        if filtered:
            # keep going while ANY frontier candidate could still beat the
            # worst accepted result (reference GraphSearcher stop rule:
            # best candidate < worst of topK accepted -> stop)
            floor = s.res_scores[:, -1]
            live = ~s.expanded & (s.scores > floor[:, None])
            return jnp.any(live) & (s.iters < max_iters)
        has_unexpanded = jnp.any(~s.expanded & (s.scores > NEG_INF))
        return has_unexpanded & (s.iters < max_iters)

    # fused edge-scoring: one contiguous codes row per expanded node
    # (reference processNeighbors -> enableSimilarityToNeighbors fast path)
    use_fused = getattr(provider, "supports_fused", False)

    def body(s: BeamState) -> BeamState:
        Lc = s.ids.shape[1]
        # pop the E best unexpanded slots per query (the heap pops)
        sel_scores = jnp.where(~s.expanded, s.scores, NEG_INF)
        top_scores, sel_idx = jax.lax.top_k(sel_scores, E)  # [Q, E]
        active = top_scores > NEG_INF  # [Q, E]
        if filtered:
            # don't pop candidates that can no longer improve the accepted
            # topK (per-query retirement in filtered mode)
            active &= top_scores > s.res_scores[:, -1:]
        sel_ids = jnp.take_along_axis(s.ids, sel_idx, axis=1)  # [Q, E]
        safe_sel = jnp.where(active, sel_ids, 0)

        # mark expanded via one-hot compare (top_k indices distinct per row)
        hit = jnp.any(
            (jnp.arange(Lc, dtype=jnp.int32)[None, :, None] == sel_idx[:, None, :])
            & active[:, None, :],
            axis=2,
        )
        expanded = s.expanded | hit

        # record pops in the history ring (pad with -1 where inactive)
        pos = (s.iters * E) % s.history.shape[1]
        history = jax.lax.dynamic_update_slice(
            s.history, jnp.where(active, sel_ids, -1), (jnp.int32(0), pos)
        )

        # expand neighbors of all E pops at once
        if packed_rows is not None:
            prows = graph_neighbors[safe_sel >> 3, safe_sel & 7]  # [Q, E, 128]
            nbrs = prows[..., :R].reshape(s.ids.shape[0], -1)  # [Q, E*R]
        elif packed_pairs is not None:
            prows = graph_neighbors[safe_sel >> 1]  # [Q, E, 2R]
            hi = ((safe_sel & 1) == 1)[..., None]
            nbrs = jnp.where(hi, prows[..., R:], prows[..., :R]).reshape(
                s.ids.shape[0], -1
            )  # [Q, E*R]
        else:
            nbrs = graph_neighbors[safe_sel].reshape(s.ids.shape[0], -1)
        valid = (nbrs >= 0) & jnp.repeat(active, R, axis=1)
        nbrs = jnp.where(valid, nbrs, -1)

        fresh = valid & _dedup_new(nbrs, s.ids, history)
        safe_nbrs = jnp.where(fresh, nbrs, 0)
        if use_fused:
            edge_scores = provider.score_edges(qstate, safe_sel)  # [Q, E*R]
            new_scores = jnp.where(fresh, edge_scores, NEG_INF)
        else:
            new_scores = jnp.where(
                fresh, provider.score(qstate, safe_nbrs), NEG_INF
            )
        new_ids = jnp.where(fresh, nbrs, -1)

        if filtered:
            # merge accepted discoveries into the result channel, and PURGE
            # popped slots from the beam: in filtered mode the beam is a
            # pure frontier (the reference's candidate queue pops destroy),
            # so deep searches don't stall on expanded slots crowding the
            # beam.  History dedup covers revisits of purged nodes.
            acc_new = fresh & accept[safe_nbrs]
            rids = jnp.concatenate(
                [s.res_ids, jnp.where(acc_new, nbrs, -1)], axis=1
            )
            rsc = jnp.concatenate(
                [s.res_scores, jnp.where(acc_new, new_scores, NEG_INF)], axis=1
            )
            neg, rids_s = jax.lax.sort((-rsc, rids), dimension=1, num_keys=1)
            res_ids, res_scores = rids_s[:, :K], -neg[:, :K]
            beam_ids_in = jnp.where(hit, -1, s.ids)
            beam_scores_in = jnp.where(hit, NEG_INF, s.scores)
        else:
            res_ids, res_scores = s.res_ids, s.res_scores
            beam_ids_in, beam_scores_in = s.ids, s.scores

        ids3, scores3, expanded3 = _merge_beam(
            beam_ids_in, beam_scores_in, expanded, new_ids, new_scores
        )
        stale2 = s.stale
        if stop_threshold > 0:
            best_new = jnp.max(new_scores, axis=1)
            stale2 = jnp.where(best_new >= stop_threshold, 0, s.stale + 1)
            # retire queries stuck below the threshold: freeze their beams
            retire = stale2 >= stop_patience
            expanded3 = expanded3 | retire[:, None]
        return BeamState(
            ids=ids3,
            scores=scores3,
            expanded=expanded3,
            history=history,
            visited_count=s.visited_count + jnp.sum(fresh, axis=1).astype(jnp.int32),
            expanded_count=s.expanded_count
            + jnp.sum(active, axis=1).astype(jnp.int32),
            iters=s.iters + 1,
            stale=stale2,
            res_ids=res_ids,
            res_scores=res_scores,
        )

    if unroll > 1:
        # several pops per loop step: surplus steps after quiescence are
        # harmless no-ops (nothing unexpanded -> active all False)
        inner = body

        def body(s: BeamState) -> BeamState:  # noqa: F811
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


def _repack_tail(
    graph_neighbors: jax.Array,
    provider,
    qstate,
    final: BeamState,
    beam_width: int,
    max_iters: int,
    expand_per_iter: int,
    packed_pairs: int | None = None,
    packed_rows: int | None = None,
) -> BeamState:
    """Finish a cut-short wave's convergence tail at quarter width.

    Gathers the still-active lanes of ``final`` (plus converged filler if
    fewer than the sub-wave width), continues them to quiescence in a
    second ``search_layer`` (``reopen_quiescent=False``: a pure
    continuation), and scatters the finished lanes back.  Active lanes
    beyond the sub-wave width stay frozen — the ``max_iters``-cutoff
    semantics.  Trace-time only (call under jit).
    """
    Q = final.ids.shape[0]
    active = jnp.any(~final.expanded & (final.scores > NEG_INF), axis=1)
    w2 = max(32, (Q // 4) // 8 * 8)
    _, lanes = jax.lax.top_k(active.astype(jnp.int32), w2)
    take = lambda a: None if a is None else a[lanes]  # noqa: E731
    sub = BeamState(
        ids=take(final.ids),
        scores=take(final.scores),
        expanded=take(final.expanded),
        history=take(final.history),
        visited_count=take(final.visited_count),
        expanded_count=take(final.expanded_count),
        iters=final.iters,
    )
    sub_fin = search_layer(
        graph_neighbors,
        provider,
        jax.tree.map(lambda a: a[lanes], qstate),
        jnp.zeros((w2, 1), jnp.int32),
        beam_width=beam_width,
        max_iters=max_iters,
        expand_per_iter=expand_per_iter,
        init_state=sub,
        reopen_quiescent=False,
        packed_pairs=packed_pairs,
        packed_rows=packed_rows,
    )
    put = lambda full, sb: full.at[lanes].set(sb)  # noqa: E731
    return final._replace(
        ids=put(final.ids, sub_fin.ids),
        scores=put(final.scores, sub_fin.scores),
        expanded=put(final.expanded, sub_fin.expanded),
        history=put(final.history, sub_fin.history),
        visited_count=put(final.visited_count, sub_fin.visited_count),
        expanded_count=put(final.expanded_count, sub_fin.expanded_count),
        iters=sub_fin.iters,
    )


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
        "return_state",
        "entry_seeds",
        "repack_after",
    ),
)
def _search_jit(
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
    return_state: bool = False,
    init_state: BeamState | None = None,
    entry_seeds: int = 1,  # flat-graph beam seeds: entry + k-1 strided ids
    repack_after: int = 0,  # two-phase wave: after this many beam
    # iterations, compact the still-active minority into a quarter-width
    # sub-wave and finish there.  The beam loop is LOCKSTEP — the wave
    # pays max-iters over all lanes, but the per-query convergence tail
    # is long (1M flagship, beam 21: median 30 iters, max 60, only 16%
    # active past 35) — so finishing the tail at 1/4 width cuts ~20% of
    # device time.  Bit-identical to the plain search whenever the
    # active-lane count at the cut fits the sub-wave (lanes beyond it are
    # frozen as if max_iters hit).  0 disables; ~1.7x beam_width is a
    # good cut.  Plain searches only (no accept/threshold/init_state).
) -> SearchResult:
    """One jitted two-pass wave search (see :func:`search` for the API)."""
    if beam_width is None:
        beam_width = max(top_k, 100)
    if rerank_k is None:
        rerank_k = beam_width if reranker is not None else top_k

    qstate = provider.prepare(queries)
    Q = queries.shape[0]
    if init_state is None:
        if graph.num_levels > 1:
            entries = _descend_hierarchy(graph, provider, qstate, Q, hierarchy_beam)
        else:
            entries = jnp.broadcast_to(graph.entry_node[None], (Q,)).astype(
                jnp.int32
            )
            if entry_seeds > 1:
                # multi-seed flat start: k-1 ordinal-strided extra entries
                # (shuffled builds make ordinal stride a uniform sample).
                # Multiple start points cut the graph-diameter walk that
                # dominates sequential beam iterations; data-independent so
                # no host sync and one compile per k.  Clamped to the beam
                # (search_layer seeds must fit) and computed stride-first
                # so s * num_nodes can't overflow int32 at 100M scale.
                entry_seeds = min(entry_seeds, beam_width)
                s = jnp.arange(1, entry_seeds, dtype=jnp.int32)
                strided = s * (graph.num_nodes // jnp.int32(entry_seeds))
                entries = jnp.concatenate(
                    [
                        entries[:, None],
                        jnp.broadcast_to(
                            strided[None], (Q, entry_seeds - 1)
                        ),
                    ],
                    axis=1,
                )
    else:
        entries = None

    # Filtered search (selective acceptOrds) runs IN-LOOP: accepted results
    # accumulate in a dedicated channel while the beam traverses accepted
    # and non-accepted nodes alike, and the search keeps expanding until no
    # candidate can beat the worst accepted result (reference
    # ``GraphSearcher.java:406-457``; exercised by low-cardinality filters
    # where a post-hoc beam filter collapses to ~selectivity*beam results).
    if accept is not None and accept.shape[0] < graph.capacity:
        # corpus-sized masks are padded False over the capacity slack
        accept = jnp.concatenate(
            [accept, jnp.zeros(graph.capacity - accept.shape[0], bool)]
        )
    in_loop_accept = accept is not None and init_state is None
    accept_mask = None
    if in_loop_accept:
        accept_mask = accept & ~graph.deleted

    repack = (
        repack_after > 0
        and repack_after < max_iters
        and init_state is None
        and accept_mask is None
        and threshold == 0.0
        and Q >= 64
    )
    final = search_layer(
        graph.base.neighbors,
        provider,
        qstate,
        entries if entries is not None else jnp.zeros((Q, 1), jnp.int32),
        beam_width=beam_width,
        max_iters=repack_after if repack else max_iters,
        expand_per_iter=expand_per_iter,
        stop_threshold=threshold,
        init_state=init_state,
        accept=accept_mask,
        result_k=max(rerank_k, top_k) if in_loop_accept else None,
    )
    if repack:
        final = _repack_tail(
            graph.base.neighbors,
            provider,
            qstate,
            final,
            beam_width=beam_width,
            max_iters=max_iters,
            expand_per_iter=expand_per_iter,
        )
    if in_loop_accept:
        # results come from the accepted channel; dedup guards the rare
        # case of a history-ring overflow re-admitting a node
        final = final._replace(
            ids=final.res_ids, scores=final.res_scores
        )
        from jvector_tpu.graph.diversity import dedup_sorted_desc

        d_ids, d_scores = dedup_sorted_desc(final.ids, final.scores)
        final = final._replace(ids=d_ids, scores=d_scores)

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
        result = SearchResult(
            ids=ids,
            scores=scores,
            visited_count=final.visited_count,
            expanded_count=final.expanded_count,
            reranked_count=jnp.zeros((Q,), jnp.int32),
            approx_scores=scores,
        )
        return (result, final) if return_state else result

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
    result = SearchResult(
        ids=ids,
        scores=scores,
        visited_count=final.visited_count,
        expanded_count=final.expanded_count,
        reranked_count=jnp.sum(cand_valid, axis=1).astype(jnp.int32),
        approx_scores=approx,
    )
    return (result, final) if return_state else result


@partial(jax.jit, static_argnames=("top_k", "rerank_k", "threshold"))
def _filtered_brute_jit(
    graph: GraphIndex,
    provider,
    queries: jax.Array,
    cand_ids: jax.Array,  # int32 [A], -1 padded accepted ordinals
    top_k: int,
    rerank_k: int,
    reranker,
    threshold: float,
    exclude_ids: jax.Array | None,
) -> SearchResult:
    """Exact evaluation over a small accepted set (no graph traversal)."""
    qstate = provider.prepare(queries)
    Q = queries.shape[0]
    A = cand_ids.shape[0]
    safe = jnp.maximum(cand_ids, 0)
    ok = (cand_ids >= 0) & ~graph.deleted[safe]
    ids_b = jnp.broadcast_to(cand_ids[None], (Q, A))
    sc = provider.score(qstate, jnp.broadcast_to(safe[None], (Q, A)))
    sc = jnp.where(ok[None], sc, NEG_INF)
    if exclude_ids is not None:
        sc = jnp.where(
            jnp.any(ids_b[:, :, None] == exclude_ids[:, None, :], axis=2),
            NEG_INF,
            sc,
        )
    k1 = min(rerank_k, A)
    approx, idx = jax.lax.top_k(sc, k1)
    pick = jnp.take_along_axis(ids_b, idx, axis=1)
    if reranker is not None:
        ex = reranker.score(reranker.prepare(queries), jnp.maximum(pick, 0))
        ex = jnp.where(approx > NEG_INF, ex, NEG_INF)
        order = jnp.argsort(-ex, axis=1)[:, :top_k]
        out_ids = jnp.take_along_axis(pick, order, axis=1)
        out_sc = jnp.take_along_axis(ex, order, axis=1)
        out_approx = jnp.take_along_axis(approx, order, axis=1)
        reranked = jnp.full((Q,), k1, jnp.int32)
    else:
        out_ids, out_sc = pick[:, :top_k], approx[:, :top_k]
        out_approx = out_sc
        reranked = jnp.zeros((Q,), jnp.int32)
    out_ids = jnp.where(out_sc > NEG_INF, out_ids, -1)
    if threshold > 0.0:
        keep = out_sc >= threshold
        out_ids = jnp.where(keep, out_ids, -1)
        out_sc = jnp.where(keep, out_sc, NEG_INF)
    return SearchResult(
        ids=out_ids,
        scores=out_sc,
        visited_count=jnp.broadcast_to(
            jnp.sum(ok).astype(jnp.int32)[None], (Q,)
        ),
        expanded_count=jnp.zeros((Q,), jnp.int32),
        reranked_count=reranked,
        approx_scores=out_approx,
    )


def search(
    graph: GraphIndex,
    provider,
    queries: jax.Array,  # [Q, D]
    top_k: int,
    beam_width: int | None = None,
    **kwargs,
) -> SearchResult:
    """Two-pass wave search (reference ``GraphSearcher.search:222-243``).

    First pass descends the hierarchy (if any) then runs the layer-0 beam
    with ``provider`` (exact or compressed); if ``reranker`` is given, the
    top ``rerank_k`` beam entries get exact scores and the final top-k
    comes from those (``reranking:471-507``).

    With ``return_state=True`` returns ``(SearchResult, BeamState)``; the
    state can be passed back as ``init_state`` (see :func:`resume`) to pull
    further results at marginal cost.

    With ``accept`` (the acceptOrds mask), results come from the IN-LOOP
    accepted channel and the search expands until topK accepted results
    can no longer improve.  The wave beam is a bounded frontier (the
    reference's candidate heap is unbounded), so if a low-cardinality
    filter starves the frontier before the accepted topK fills, the search
    retries at double the beam width — up to a cap, stopping early after
    two consecutive widenings that find no additional results — one host
    round-trip per escalation, and only for the pathological selectivities
    that need it.  This call therefore BLOCKS when ``accept`` is given; all
    other paths stay fully asynchronous dispatches.
    """
    accept = kwargs.pop("accept", None)
    brute_cutoff = kwargs.pop("accept_brute_cutoff", None)
    if accept is None or kwargs.get("init_state") is not None:
        return _search_jit(
            graph, provider, queries, top_k, beam_width=beam_width,
            accept=accept, **kwargs,
        )
    L = beam_width or max(top_k, 100)
    # Low-cardinality cutoff: when few ordinals pass the filter, exact
    # evaluation of the whole accepted set beats graph traversal AND avoids
    # the one geometry the bounded wave frontier explores poorly (a small
    # accepted island far from the entry, whose low-scoring boundary is
    # starved out of the beam by high-scoring non-accepted candidates — the
    # reference's UNBOUNDED candidate heap never drops those).  Cassandra
    # SAI makes the same call for low-cardinality predicates.
    if brute_cutoff is None:
        brute_cutoff = max(4 * L, 512)
    if not kwargs.get("return_state") and kwargs.get("rerank_floor") is None:
        acc_ids = np.flatnonzero(np.asarray(accept))
        if acc_ids.size <= brute_cutoff:
            A = 1 << max(4, int(max(acc_ids.size, top_k) - 1).bit_length())
            ids = np.full(A, -1, np.int32)
            ids[: acc_ids.size] = acc_ids
            reranker = kwargs.get("reranker")
            rerank_k = kwargs.get("rerank_k") or (
                L if reranker is not None else top_k
            )
            return _filtered_brute_jit(
                graph,
                provider,
                jnp.asarray(queries),
                jnp.asarray(ids),
                top_k=top_k,
                rerank_k=min(max(rerank_k, top_k), A),
                reranker=reranker,
                threshold=kwargs.get("threshold", 0.0),
                exclude_ids=kwargs.get("exclude_ids"),
            )
    kwargs["accept"] = accept
    cap = min(graph.capacity, max(16 * L, 1024))
    # Escalate only while widening keeps finding MORE results: results can
    # be legitimately missing (threshold-dropped, or fewer reachable
    # accepted nodes than top_k), and "ids not all valid" alone would then
    # re-search at every width up to the cap on every call.  TWO consecutive
    # no-improvement rounds are required before stopping short of the cap:
    # plateau-then-jump geometries (a skewed accepted island that only
    # enters the bounded frontier at 4L, with L and 2L finding the same
    # partial set) recover on the second widening.
    prev_found = -1
    stalled = 0
    while True:
        out = _search_jit(
            graph, provider, queries, top_k, beam_width=L, **kwargs
        )
        res = out[0] if kwargs.get("return_state") else out
        found = int(jnp.sum(res.ids >= 0))
        if L >= cap or found == res.ids.size:
            return out
        stalled = stalled + 1 if found <= prev_found else 0
        if stalled >= 2:
            return out
        prev_found = found
        L = min(2 * L, cap)


def resume(
    graph: GraphIndex,
    provider,
    queries: jax.Array,
    previous: SearchResult,
    top_k: int,
    beam_width: int | None = None,
    reranker=None,
    state: BeamState | None = None,
    **kwargs,
) -> SearchResult:
    """Pull the NEXT ``top_k`` results after ``previous``.

    Reference: ``GraphSearcher.resume():509-547`` continues from evicted
    candidate state.  When ``state`` (from ``search(..., return_state=True)``)
    is given, the beam + expansion history carry over and the continuation
    costs only the marginal expansions (true resume).  Without it, the wave
    equivalent re-searches with a wider beam; either way the caller contract
    — more results, none repeated — is identical.
    """
    if state is not None and state.res_ids is not None:
        # a filtered-search state's beam is a (purged) frontier, not a
        # result set — continue filtered searches with the stateless
        # wider re-search instead
        state = None
    prev_k = previous.ids.shape[1]
    if beam_width is None:
        if state is not None:
            # the state already holds a converged beam: only widen enough to
            # page top_k past prev_k — the continuation then expands just
            # the marginal frontier instead of re-searching at 2x width
            beam_width = (3 * (top_k + prev_k) + 1) // 2
        else:
            beam_width = max(2 * (top_k + prev_k), 100)
    if state is not None:
        beam_width = max(beam_width, state.ids.shape[1])
    return search(
        graph,
        provider,
        queries,
        top_k=top_k,
        beam_width=beam_width,
        reranker=reranker,
        exclude_ids=previous.ids,
        init_state=state,
        **kwargs,
    )
