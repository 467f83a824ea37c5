"""NN-descent bulk construction — the fully-batched build path.

The wave builder (``builder.py``) mirrors the reference's insert semantics
but is latency-bound: each wave runs a sequential beam-search loop.  This
module builds the graph the way GPU ANN systems do (CAGRA, GGNN — see
PAPERS.md): NN-descent rounds where EVERY node refines its neighbor list
simultaneously from neighbors-of-neighbors + reverse edges, followed by a
single Vamana robust-prune + backlink pass.  Every step is a dense batched
gather/matmul/top-k over node chunks — no data-dependent loops — so the MXU
stays saturated and build time drops by an order of magnitude at 1M scale.

Status (measured, v5e-1, 200k x 128d): converges (kNN-recall ~0.95 in 8
rounds) and search recall reaches ~0.85 with the long-edge prune pool +
hierarchy, but the wave builder currently wins on BOTH time and quality
(47s / 0.97) because XLA's in-loop row gathers throttle descent rounds the
same way they throttle beam search, and descent touches ~3x more rows in
total.  Kept as the scalable alternative: descent rounds shard perfectly
across a mesh (no cross-node ordering), making it the candidate bulk path
for multi-chip 100M builds once the gather path is kernelized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.builder import GraphIndexBuilder, _pairwise_from_provider
from jvector_tpu.graph.diversity import dedup_sorted_desc, robust_prune
from jvector_tpu.graph.index import (
    NEG_INF,
    GraphConfig,
    GraphIndex,
    GraphLayer,
    bucket_capacity,
    empty_graph,
)
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.ops.similarity import SimilarityFunction


@partial(jax.jit, static_argnames=("s1", "s2", "n_valid"))
def _descent_chunk(
    provider,
    fwd_ids: jax.Array,  # [N_cap, K] current best lists (score-sorted desc)
    fwd_scores: jax.Array,
    rev_ids: jax.Array,  # [N_cap, R] sampled reverse edges
    chunk_ids: jax.Array,  # [C] nodes to refine this call
    s1: int,
    s2: int,
    n_valid: int,
):
    """One NN-descent refinement for a chunk of nodes.

    Candidates per node u: fwd(fwd(u)) over the top s1 neighbors' top s2
    entries, plus u's sampled reverse edges and THEIR top s2 lists.
    """
    C = chunk_ids.shape[0]
    K = fwd_ids.shape[1]

    fu = fwd_ids[chunk_ids]  # [C, K]
    ru = rev_ids[chunk_ids]  # [C, R]

    hop_src = jnp.concatenate([fu[:, :s1], ru], axis=1)  # [C, s1+R]
    safe_src = jnp.maximum(hop_src, 0)
    two_hop = fwd_ids[safe_src][:, :, :s2]  # [C, s1+R, s2]
    two_hop = jnp.where(
        (hop_src >= 0)[:, :, None], two_hop, -1
    ).reshape(C, -1)

    cand = jnp.concatenate([ru, two_hop], axis=1)  # [C, R + (s1+R)*s2]
    cand = jnp.where(
        (cand == chunk_ids[:, None]) | (cand >= n_valid), -1, cand
    )
    # drop candidates already in the fwd list (cheap pre-filter via dedup)
    safe_cand = jnp.maximum(cand, 0)
    qstate = provider.prepare(provider.vectors[chunk_ids])
    cand_scores = jnp.where(
        cand >= 0, provider.score(qstate, safe_cand), NEG_INF
    )

    all_ids = jnp.concatenate([fu, cand], axis=1)
    all_scores = jnp.concatenate([fwd_scores[chunk_ids], cand_scores], axis=1)
    all_ids, all_scores = dedup_sorted_desc(all_ids, all_scores)
    return all_ids[:, :K], all_scores[:, :K]


def _reverse_sample(fwd_ids: np.ndarray, n_valid: int, r: int, rng) -> np.ndarray:
    """Sample up to ``r`` reverse edges per node (host-side, cheap)."""
    n_cap, k = fwd_ids.shape
    src = np.repeat(np.arange(n_cap, dtype=np.int32), k)
    dst = fwd_ids.reshape(-1)
    keep = (dst >= 0) & (src < n_valid)
    src, dst = src[keep], dst[keep]
    # shuffle then take first r per destination
    perm = rng.permutation(len(dst))
    src, dst = src[perm], dst[perm]
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    rev = np.full((n_cap, r), -1, np.int32)
    starts = np.searchsorted(dst, np.arange(n_cap))
    ends = np.searchsorted(dst, np.arange(n_cap) + 1)
    take = np.minimum(ends - starts, r)
    # vectorized ragged fill
    rows = np.repeat(np.arange(n_cap), take)
    cols = np.concatenate([np.arange(t) for t in take]) if take.sum() else np.zeros(0, int)
    flat_idx = np.concatenate(
        [np.arange(s, s + t) for s, t in zip(starts, take)]
    ) if take.sum() else np.zeros(0, int)
    rev[rows, cols] = src[flat_idx]
    return rev


def nn_descent_build(
    vectors,
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
    config: GraphConfig | None = None,
    rounds: int = 8,
    k_build: int | None = None,
    s1: int = 12,
    s2: int = 8,
    rev_edges: int = 16,
    chunk: int = 16_384,
    seed: int = 0,
) -> tuple[GraphIndex, ExactScoreProvider]:
    """Bulk-build a Vamana graph via NN-descent + robust prune + backlinks."""
    sim = SimilarityFunction.parse(sim)
    config = config or GraphConfig()
    vectors = jnp.asarray(vectors, jnp.float32)
    n, d = vectors.shape
    n_cap = bucket_capacity(n)
    if n_cap > n:
        vectors_p = jnp.concatenate([vectors, jnp.zeros((n_cap - n, d))], axis=0)
    else:
        vectors_p = vectors
    provider = ExactScoreProvider(vectors=vectors_p, sim=sim)
    rng = np.random.default_rng(seed)
    K = k_build or max(int(1.5 * config.max_degree), 48)
    M = config.max_degree

    # --- init: random neighbor lists, scored ------------------------------
    init = rng.integers(0, n, size=(n_cap, K), dtype=np.int32)
    init[np.arange(n_cap)[:, None] == init] = (init[0, 0] + 1) % n  # no self
    fwd_ids = jnp.asarray(init)
    # score + sort init lists chunk-wise
    fwd_scores = jnp.full((n_cap, K), NEG_INF)
    for start in range(0, n_cap, chunk):
        ids = jnp.arange(start, min(start + chunk, n_cap), dtype=jnp.int32)
        qstate = provider.prepare(provider.vectors[ids])
        sc = provider.score(qstate, fwd_ids[ids])
        fwd_scores = jax.lax.dynamic_update_slice_in_dim(
            fwd_scores, sc, start, axis=0
        )
    srt_i, srt_s = dedup_sorted_desc(fwd_ids, fwd_scores)
    fwd_ids, fwd_scores = srt_i[:, :K], srt_s[:, :K]

    # Keep a slice of the INITIAL random lists as long-range prune
    # candidates.  NN-descent converges to pure near neighbors; robust
    # prune can only keep navigable far edges if far candidates exist in
    # the pool (Vamana gets them from medoid-seeded searches).  Without
    # these the pruned graph fragments into cluster islands.
    long_ids = fwd_ids[:, : max(8, M // 2)]
    long_scores = fwd_scores[:, : max(8, M // 2)]

    # --- descent rounds -----------------------------------------------------
    for rnd in range(rounds):
        rev = jnp.asarray(
            _reverse_sample(np.asarray(fwd_ids), n, rev_edges, rng)
        )
        new_ids = fwd_ids
        new_scores = fwd_scores
        for start in range(0, n_cap, chunk):
            ids = jnp.arange(start, min(start + chunk, n_cap), dtype=jnp.int32)
            ci, cs = _descent_chunk(
                provider, fwd_ids, fwd_scores, rev, ids, s1, s2, n
            )
            new_ids = jax.lax.dynamic_update_slice_in_dim(new_ids, ci, start, axis=0)
            new_scores = jax.lax.dynamic_update_slice_in_dim(
                new_scores, cs, start, axis=0
            )
        fwd_ids, fwd_scores = new_ids, new_scores

    # --- robust prune to M + write rows ------------------------------------
    graph = empty_graph(n_cap, config)
    layer = graph.base
    R_cap = layer.neighbors.shape[1]
    for start in range(0, n_cap, chunk):
        ids = jnp.arange(start, min(start + chunk, n_cap), dtype=jnp.int32)
        ci = jnp.concatenate([fwd_ids[ids], long_ids[ids]], axis=1)
        cs = jnp.concatenate([fwd_scores[ids], long_scores[ids]], axis=1)
        ci = jnp.where(ids[:, None] < n, ci, -1)
        cs = jnp.where(ci >= 0, cs, NEG_INF)
        ci, cs = dedup_sorted_desc(ci, cs)
        simmat = _pairwise_from_provider(provider, jnp.maximum(ci, 0))
        p_ids, p_scores, p_count = robust_prune(ci, cs, simmat, M, config.alphas)
        rows = jnp.where(ids < n, ids, n_cap)
        row_ids = jnp.concatenate(
            [p_ids, jnp.full((ids.shape[0], R_cap - M), -1, jnp.int32)], axis=1
        )
        row_scores = jnp.concatenate(
            [p_scores, jnp.full((ids.shape[0], R_cap - M), NEG_INF)], axis=1
        )
        layer = GraphLayer(
            neighbors=layer.neighbors.at[rows].set(row_ids, mode="drop"),
            scores=layer.scores.at[rows].set(row_scores, mode="drop"),
            counts=layer.counts.at[rows].set(p_count, mode="drop"),
        )

    # --- backlinks: vectorized group-append (cleanup re-prunes + dedups) ----
    # Mutual edges may append a duplicate into a row; that is safe — the
    # searcher's slot-sort dedups per expansion and cleanup()'s
    # dedup_sorted_desc removes them while enforcing degree.
    nbrs_np = np.asarray(layer.neighbors[:, :M])
    scores_np = np.asarray(layer.scores[:, :M])
    src = np.repeat(np.arange(n_cap, dtype=np.int32), M)
    dst = nbrs_np.reshape(-1)
    sc = scores_np.reshape(-1)
    keep = dst >= 0
    src, dst, sc = src[keep], dst[keep], sc[keep]
    order = np.argsort(dst, kind="stable")
    src, dst, sc = src[order], dst[order], sc[order]
    starts = np.searchsorted(dst, np.arange(n_cap))
    counts_np = np.asarray(layer.counts).copy()
    slack = layer.neighbors.shape[1]
    nbrs_full = np.asarray(layer.neighbors).copy()
    scores_full = np.asarray(layer.scores).copy()

    rank = np.arange(len(dst), dtype=np.int64) - starts[dst]
    pos = counts_np[dst] + rank
    ok = pos < slack
    nbrs_full[dst[ok], pos[ok]] = src[ok]
    scores_full[dst[ok], pos[ok]] = sc[ok]
    group = np.searchsorted(dst, np.arange(n_cap) + 1) - starts
    counts_np = np.minimum(counts_np + group, slack).astype(np.int32)

    graph = GraphIndex(
        layers=(
            GraphLayer(
                neighbors=jnp.asarray(nbrs_full),
                scores=jnp.asarray(scores_full),
                counts=jnp.asarray(counts_np),
            ),
        ),
        level_node_ids=(),
        entry_node=jnp.int32(0),
        num_nodes=jnp.int32(n),
        deleted=jnp.zeros((n_cap,), bool),
    )

    builder = GraphIndexBuilder(config)
    graph = builder.cleanup(graph, provider, vectors)  # enforce degree + entry
    if config.add_hierarchy:
        graph = builder.build_hierarchy(graph, vectors, sim)
    return graph, provider
