"""Batched Vamana graph construction (wave insertion).

TPU-native redesign of ``jv/graph/GraphIndexBuilder.java``.  The reference
inserts nodes concurrently from a thread pool; each insert beam-searches the
current graph, robust-prunes the candidates, CAS-writes the new row and
backlinks into neighbors' rows (re-pruning on overflow), with concurrent
inserts seeing each other through the ``insertionsInProgress`` snapshot
(``GraphIndexBuilder.java:605-659``).

Here the unit of concurrency is a *wave* of W nodes processed in one jitted
step:

1. beam-search all W nodes over the current graph in lock-step,
2. wave members score each other directly (all-pairs matmul) — this replaces
   the in-progress snapshot trick,
3. robust-prune each node's merged candidate list (batched),
4. write the W rows, then scatter backlinks with collision-free ranks
   (sort-by-target + run-rank), deduped against existing rows,
5. re-prune rows that exceeded the overflow cap (a bounded batch per wave —
   the analog of ``ConcurrentNeighborMap.insert``'s deferred enforcement).

``cleanup()`` enforces max degree everywhere, re-sorts rows, and recomputes
the entry point as the node nearest the centroid
(``BuildScoreProvider.approximateCentroid`` + ``cleanup():472-508``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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
from jvector_tpu.graph.searcher import search_layer
from jvector_tpu.ops.similarity import SimilarityFunction


def _pairwise_from_provider(provider, ids: jax.Array) -> jax.Array:
    """Candidate-pair similarity matrix ``[B, C, C]`` for prune."""
    safe = jnp.maximum(ids, 0)
    return provider.pairwise(safe, safe)


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def _insert_wave(
    graph: GraphIndex,
    provider,
    wave_ids: jax.Array,  # int32 [W], -1 padded on the ragged final wave
    wave_vectors: jax.Array,  # float32 [W, D] full-res vectors being inserted
    config: GraphConfig,
    prune_provider=None,
) -> GraphIndex:
    """One wave insert.  The graph argument is DONATED — callers that keep
    their input graph must pass copies (see ``add_nodes``).

    ``prune_provider`` (default: ``provider``) scores the intra-wave pairs
    and the diversity prune.  The SQ4-accelerated build passes the exact
    provider here: compressed scores tie on clusters tighter than the
    quantization step, and tie-broken prunes disconnect such clusters
    (tests/test_graph.py::test_backlink_burst_adversarial_fanin) — beam
    search tolerates the ties, the prune does not.
    """
    W = wave_ids.shape[0]
    layer = graph.base
    N_cap, R_cap = layer.neighbors.shape
    M = config.max_degree
    ef = config.ef_construction
    wave_valid = wave_ids >= 0
    safe_wave = jnp.where(wave_valid, wave_ids, 0)
    if prune_provider is None:
        prune_provider = provider

    qstate = provider.prepare(wave_vectors)

    # -- 1. beam search the current graph --------------------------------
    entries = jnp.where(
        wave_valid & (graph.entry_node >= 0), graph.entry_node, -1
    ).astype(jnp.int32)
    beam = search_layer(
        layer.neighbors,
        provider,
        qstate,
        entries,
        beam_width=ef,
        max_iters=config.max_build_iters,
        expand_per_iter=config.build_expand,
    )

    # -- 2. intra-wave candidates (replaces insertionsInProgress) --------
    prune_qstate = prune_provider.prepare(wave_vectors)
    wave_pair_scores = prune_provider.score(
        prune_qstate, jnp.broadcast_to(safe_wave[None, :], (W, W))
    )  # [W, W] score of query i vs wave node j
    self_mask = jnp.eye(W, dtype=bool)
    intra_valid = wave_valid[None, :] & wave_valid[:, None] & ~self_mask
    intra_scores = jnp.where(intra_valid, wave_pair_scores, NEG_INF)
    intra_ids = jnp.where(intra_valid, wave_ids[None, :], -1)
    intra_ids = jnp.broadcast_to(intra_ids, (W, W))

    # -- 3. merge + prune -------------------------------------------------
    # Keep the beam candidates and the intra-wave candidates in SEPARATE
    # quota (top-ef each), then prune over the union WITHOUT re-truncating
    # by score: when a wave holds a dense burst of near-duplicates, the
    # intra-wave scores would otherwise flood out every beam candidate and
    # sever the only cross-cluster (long-range) edges — the alpha ramp, not
    # the score, must decide which far edges survive
    # (tests/test_graph.py::test_backlink_burst_adversarial_fanin).
    if W > ef:
        intra_top_scores, intra_idx = jax.lax.top_k(intra_scores, ef)
        intra_top_ids = jnp.take_along_axis(intra_ids, intra_idx, axis=1)
    else:
        intra_top_scores, intra_top_ids = intra_scores, intra_ids
    cand_ids = jnp.concatenate([beam.ids[:, :ef], intra_top_ids], axis=1)
    cand_scores = jnp.concatenate(
        [beam.scores[:, :ef], intra_top_scores], axis=1
    )
    cand_ids, cand_scores = dedup_sorted_desc(cand_ids, cand_scores)
    if prune_provider is not provider:
        # compressed search scores only drove DISCOVERY; re-rank the pooled
        # candidates full-precision (one [W, C] row gather) so the prune,
        # the stored edge scores, and the greedy order are exact
        valid = cand_ids >= 0
        rescored = prune_provider.score(prune_qstate, jnp.maximum(cand_ids, 0))
        cand_scores = jnp.where(valid, rescored, NEG_INF)
        order = jnp.argsort(-cand_scores, axis=1)
        cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
        cand_scores = jnp.take_along_axis(cand_scores, order, axis=1)

    simmat = _pairwise_from_provider(prune_provider, cand_ids)
    sel_ids, sel_scores, sel_count = robust_prune(
        cand_ids, cand_scores, simmat, M, config.alphas
    )  # [W, M]

    # -- 4a. write the wave rows ------------------------------------------
    pad_cols = R_cap - M
    row_ids = jnp.concatenate(
        [sel_ids, jnp.full((W, pad_cols), -1, jnp.int32)], axis=1
    )
    row_scores = jnp.concatenate(
        [sel_scores, jnp.full((W, pad_cols), NEG_INF)], axis=1
    )
    scatter_rows = jnp.where(wave_valid, wave_ids, N_cap)  # drop invalid
    neighbors = layer.neighbors.at[scatter_rows].set(row_ids, mode="drop")
    scores = layer.scores.at[scatter_rows].set(row_scores, mode="drop")
    counts = layer.counts.at[scatter_rows].set(sel_count, mode="drop")

    # -- 4b. backlinks ------------------------------------------------------
    flat_t = sel_ids.reshape(-1)  # [W*M] targets
    flat_s = jnp.broadcast_to(wave_ids[:, None], (W, M)).reshape(-1)
    flat_sc = sel_scores.reshape(-1)
    bl_valid = (flat_t >= 0) & (flat_s >= 0)

    # dedup: target row may already contain source (mutual intra-wave picks)
    t_rows = neighbors[jnp.maximum(flat_t, 0)]  # [W*M, R_cap]
    exists = jnp.any(t_rows == flat_s[:, None], axis=1)
    bl_valid &= ~exists

    # sort by target, compute run ranks so collisions land in distinct slots
    big = jnp.int32(2**30)
    key = jnp.where(bl_valid, flat_t, big)
    key_sorted, s_sorted, sc_sorted, valid_sorted = jax.lax.sort(
        (key, flat_s, flat_sc, bl_valid.astype(jnp.int32)), num_keys=1
    )
    pos_idx = jnp.arange(key.shape[0], dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]]
    )
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos_idx, 0)
    )
    rank = pos_idx - run_start

    t_ok = jnp.where(valid_sorted == 1, key_sorted, 0)
    slot = counts[t_ok] + rank
    ok = (valid_sorted == 1) & (slot < R_cap)
    scatter_t = jnp.where(ok, t_ok, N_cap)
    scatter_slot = jnp.where(ok, slot, 0)
    neighbors = neighbors.at[scatter_t, scatter_slot].set(s_sorted, mode="drop")
    scores = scores.at[scatter_t, scatter_slot].set(sc_sorted, mode="drop")
    counts = counts.at[jnp.where(ok, t_ok, N_cap)].add(1, mode="drop")

    # -- 5. enforce overflow on a bounded batch of touched rows ------------
    over_cap = config.overflow_degree
    touched = jnp.where(bl_valid, flat_t, 0)
    touched_counts = jnp.where(bl_valid, counts[touched], -1)
    # take the W most-overflowed touched rows (dups are harmless: same
    # input row -> same pruned output scattered twice)
    _, worst_idx = jax.lax.top_k(touched_counts, W)
    enforce_rows = touched[worst_idx]  # [W]
    enforce_mask = counts[enforce_rows] > over_cap

    e_ids = neighbors[enforce_rows]  # [W, R_cap]
    e_scores = scores[enforce_rows]
    e_ids_m = jnp.where(
        jnp.arange(R_cap)[None, :] < counts[enforce_rows][:, None], e_ids, -1
    )
    e_scores_m = jnp.where(e_ids_m >= 0, e_scores, NEG_INF)
    e_ids_s, e_scores_s = dedup_sorted_desc(e_ids_m, e_scores_m)
    e_sim = _pairwise_from_provider(prune_provider, e_ids_s)
    p_ids, p_scores, p_count = robust_prune(
        e_ids_s, e_scores_s, e_sim, M, config.alphas
    )
    p_row_ids = jnp.concatenate(
        [p_ids, jnp.full((W, R_cap - M), -1, jnp.int32)], axis=1
    )
    p_row_scores = jnp.concatenate(
        [p_scores, jnp.full((W, R_cap - M), NEG_INF)], axis=1
    )
    er = jnp.where(enforce_mask, enforce_rows, N_cap)
    neighbors = neighbors.at[er].set(p_row_ids, mode="drop")
    scores = scores.at[er].set(p_row_scores, mode="drop")
    counts = counts.at[er].set(p_count, mode="drop")

    # -- bookkeeping --------------------------------------------------------
    n_new = jnp.sum(wave_valid).astype(jnp.int32)
    entry = jnp.where(
        graph.entry_node >= 0, graph.entry_node, jnp.where(n_new > 0, safe_wave[0], -1)
    ).astype(jnp.int32)

    return GraphIndex(
        layers=(GraphLayer(neighbors, scores, counts),) + graph.layers[1:],
        level_node_ids=graph.level_node_ids,
        entry_node=entry,
        num_nodes=graph.num_nodes + n_new,
        deleted=graph.deleted,
    )


@partial(jax.jit, static_argnames=("config", "chunk"), donate_argnums=(0,))
def _enforce_chunk(
    graph: GraphIndex, provider, start: jax.Array, config: GraphConfig, chunk: int
) -> GraphIndex:
    """Prune a contiguous chunk of rows down to max_degree (cleanup pass)."""
    layer = graph.base
    N_cap, R_cap = layer.neighbors.shape
    M = config.max_degree
    rows = start + jnp.arange(chunk, dtype=jnp.int32)
    valid_row = (rows < graph.num_nodes) & (layer.counts[jnp.minimum(rows, N_cap - 1)] > 0)
    safe_rows = jnp.minimum(rows, N_cap - 1)

    e_ids = layer.neighbors[safe_rows]
    e_scores = layer.scores[safe_rows]
    cnt = layer.counts[safe_rows]
    e_ids = jnp.where(jnp.arange(R_cap)[None, :] < cnt[:, None], e_ids, -1)
    e_scores = jnp.where(e_ids >= 0, e_scores, NEG_INF)
    e_ids_s, e_scores_s = dedup_sorted_desc(e_ids, e_scores)
    simmat = _pairwise_from_provider(provider, e_ids_s)
    p_ids, p_scores, p_count = robust_prune(
        e_ids_s, e_scores_s, simmat, M, config.alphas
    )
    row_ids = jnp.concatenate(
        [p_ids, jnp.full((chunk, R_cap - M), -1, jnp.int32)], axis=1
    )
    row_scores = jnp.concatenate(
        [p_scores, jnp.full((chunk, R_cap - M), NEG_INF)], axis=1
    )
    target = jnp.where(valid_row, rows, N_cap)
    layer = GraphLayer(
        neighbors=layer.neighbors.at[target].set(row_ids, mode="drop"),
        scores=layer.scores.at[target].set(row_scores, mode="drop"),
        counts=layer.counts.at[target].set(p_count, mode="drop"),
    )
    return GraphIndex(
        layers=(layer,) + graph.layers[1:],
        level_node_ids=graph.level_node_ids,
        entry_node=graph.entry_node,
        num_nodes=graph.num_nodes,
        deleted=graph.deleted,
    )


@dataclasses.dataclass
class GraphIndexBuilder:
    """Host-side driver around the jitted wave steps.

    Usage (mirrors ``GraphIndexBuilder.build(ravv)``)::

        builder = GraphIndexBuilder(config)
        graph = builder.build(vectors, sim)
    """

    config: GraphConfig = dataclasses.field(default_factory=GraphConfig)

    def build(
        self,
        vectors: jax.Array | np.ndarray,
        sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
        provider=None,
        cleanup: bool = True,
    ) -> tuple[GraphIndex, object]:
        sim = SimilarityFunction.parse(sim)
        vectors = jnp.asarray(vectors, jnp.float32)
        n, d = vectors.shape
        cfg = self.config
        w = cfg.wave_size
        n_cap = bucket_capacity(n)
        if provider is None:
            # pad the provider to capacity so same-bucket builds share jits;
            # padded rows are unreachable (no edges ever point at them)
            pv = vectors
            if n_cap > n:
                pv = jnp.concatenate(
                    [vectors, jnp.zeros((n_cap - n, d), jnp.float32)], axis=0
                )
            provider = ExactScoreProvider(vectors=pv, sim=sim)
            # SQ4-accelerated construction: wave searches AND prune run on
            # 4-bit codes (400k: 50s vs 80s exact at recall 0.980 vs 0.983);
            # cleanup and the returned provider stay full-precision
            build_provider = (
                self._sq4_build_provider(vectors, n_cap, sim)
                if cfg.build_compression == "sq4"
                else provider
            )
        else:
            build_provider = provider  # explicit providers are used as-is
        graph = empty_graph(n_cap, cfg)

        for start in range(0, n, w):
            ids = np.arange(start, start + w, dtype=np.int32)
            ids = np.where(ids < n, ids, -1)
            wv = vectors[jnp.minimum(jnp.asarray(ids), n - 1)]
            graph = _insert_wave(
                graph, build_provider, jnp.asarray(ids), wv, cfg,
                prune_provider=provider if build_provider is not provider else None,
            )

        if cleanup:
            graph = self.cleanup(graph, provider, vectors)
        if cfg.add_hierarchy:
            graph = self.build_hierarchy(graph, vectors, sim)
        return graph, provider

    def _sq4_build_provider(self, vectors: jax.Array, n_cap: int, sim):
        """SQ4 working set for construction (augmented rows, no fused tables)."""
        from jvector_tpu.graph.score import SQ4ScoreProvider
        from jvector_tpu.quantization.sq import ScalarQuantization4

        n = vectors.shape[0]
        sq = ScalarQuantization4.compute(vectors)  # compute() random-samples
        codes = sq.encode(vectors)
        if n_cap > n:
            codes = jnp.concatenate(
                [codes, jnp.zeros((n_cap - n, codes.shape[1]), jnp.uint8)]
            )
        from jvector_tpu.graph.score import sq4_aug_rows

        w2, norm2 = sq.node_constants(codes)
        const = norm2 if sim == SimilarityFunction.COSINE else w2
        return SQ4ScoreProvider(
            codes_packed=codes,
            node_w2=w2,
            node_norm2=norm2,
            fused_packed=jnp.zeros((n_cap, 0), jnp.uint8),
            fused_w2=jnp.zeros((n_cap, 0), jnp.float32),
            scale=sq.scale,
            offset=sq.offset,
            codes_aug=sq4_aug_rows(codes, const),
            sim=sim,
        )

    def build_hierarchy(
        self,
        graph: GraphIndex,
        vectors: jax.Array,
        sim: SimilarityFunction,
        seed: int = 0,
    ) -> GraphIndex:
        """Build HNSW-style upper levels as batched Vamana subgraphs.

        Levels are assigned geometrically up front (reference
        ``getRandomGraphLevel``); each level's subgraph is an ordinary wave
        build over the subset, stored in slot space.
        """
        from jvector_tpu.graph.hierarchy import assign_levels
        from jvector_tpu.graph.index import empty_layer

        cfg = self.config
        n = int(graph.num_nodes)
        levels = assign_levels(n, cfg.max_degree, seed)
        layers = [graph.base]
        node_ids: list[jax.Array] = []
        max_level = int(levels.max()) if n else 0
        for l in range(1, max_level + 1):
            ids = np.where(levels >= l)[0].astype(np.int32)
            if len(ids) == 0:
                break
            if len(ids) == 1:
                layers.append(empty_layer(1, cfg.row_cap))
                node_ids.append(jnp.asarray(ids))
                continue
            sub_cfg = dataclasses.replace(
                self.config,
                wave_size=min(cfg.wave_size, max(32, len(ids))),
                add_hierarchy=False,
            )
            sub_graph, _ = GraphIndexBuilder(sub_cfg).build(
                vectors[jnp.asarray(ids)], sim, cleanup=True
            )
            layers.append(sub_graph.base)
            node_ids.append(jnp.asarray(ids))
        return GraphIndex(
            layers=tuple(layers),
            level_node_ids=tuple(node_ids),
            entry_node=graph.entry_node,
            num_nodes=graph.num_nodes,
            deleted=graph.deleted,
        )

    def cleanup(
        self, graph: GraphIndex, provider, vectors: jax.Array | None = None
    ) -> GraphIndex:
        """Enforce degree + recompute entry point (reference ``cleanup():472-508``)."""
        cfg = self.config
        n_cap = graph.capacity
        chunk = min(1024, max(cfg.wave_size, 64))
        for start in range(0, n_cap, chunk):
            graph = _enforce_chunk(
                graph, provider, jnp.int32(start), cfg, chunk
            )
        if vectors is not None:
            centroid = jnp.mean(vectors, axis=0, keepdims=True)
            qstate = provider.prepare(centroid)
            n = vectors.shape[0]
            scores = provider.score(
                qstate, jnp.arange(n, dtype=jnp.int32)[None, :]
            )[0]
            entry = jnp.argmax(scores).astype(jnp.int32)
            graph = graph._replace(entry_node=entry)
        return graph


@partial(jax.jit, static_argnames=("config", "chunk"))
def _refine_chunk(
    graph: GraphIndex,
    provider,
    qvecs: jax.Array,  # [chunk, D] the chunk's own vectors (pre-sliced)
    start: jax.Array,
    config: GraphConfig,
    chunk: int,
) -> GraphIndex:
    """Re-search a chunk of nodes and merge the findings into their rows.

    Reference: ``GraphIndexBuilder.improveConnections`` inside ``cleanup()``
    (``:510-538``) — the refineFinalGraph pass.
    """
    layer = graph.base
    N_cap, R_cap = layer.neighbors.shape
    M = config.max_degree
    rows = start + jnp.arange(chunk, dtype=jnp.int32)
    safe_rows = jnp.minimum(rows, N_cap - 1)
    valid_row = (rows < graph.num_nodes) & ~graph.deleted[safe_rows]

    qstate = provider.prepare(qvecs)
    entries = jnp.where(valid_row, graph.entry_node, -1).astype(jnp.int32)
    beam = search_layer(
        layer.neighbors,
        provider,
        qstate,
        entries,
        beam_width=config.ef_construction,
        max_iters=config.max_build_iters,
    )

    old_ids = jnp.where(
        jnp.arange(R_cap)[None, :] < layer.counts[safe_rows][:, None],
        layer.neighbors[safe_rows],
        -1,
    )
    old_scores = jnp.where(old_ids >= 0, layer.scores[safe_rows], NEG_INF)
    cand_ids = jnp.concatenate([beam.ids, old_ids], axis=1)
    cand_scores = jnp.concatenate([beam.scores, old_scores], axis=1)
    # mask self-edges found by the search
    cand_ids = jnp.where(cand_ids == safe_rows[:, None], -1, cand_ids)
    cand_scores = jnp.where(cand_ids >= 0, cand_scores, NEG_INF)
    cand_ids, cand_scores = dedup_sorted_desc(cand_ids, cand_scores)

    simmat = _pairwise_from_provider(provider, cand_ids)
    p_ids, p_scores, p_count = robust_prune(
        cand_ids, cand_scores, simmat, M, config.alphas
    )
    row_ids = jnp.concatenate(
        [p_ids, jnp.full((chunk, R_cap - M), -1, jnp.int32)], axis=1
    )
    row_scores = jnp.concatenate(
        [p_scores, jnp.full((chunk, R_cap - M), NEG_INF)], axis=1
    )
    target = jnp.where(valid_row, rows, N_cap)
    return graph._replace(
        layers=(
            GraphLayer(
                neighbors=layer.neighbors.at[target].set(row_ids, mode="drop"),
                scores=layer.scores.at[target].set(row_scores, mode="drop"),
                counts=layer.counts.at[target].set(p_count, mode="drop"),
            ),
        )
        + graph.layers[1:]
    )


@partial(jax.jit, static_argnames=("chunk",))
def _rescore_chunk(
    graph: GraphIndex, provider, start: jax.Array, chunk: int
) -> GraphIndex:
    """Recompute edge scores of a row chunk with a (new) provider + resort.

    Reference: ``GraphIndexBuilder.rescore():391-434`` — used after PQ
    codebook fine-tuning so edge ordering matches the new scores.
    """
    layer = graph.base
    N_cap, R_cap = layer.neighbors.shape
    rows = start + jnp.arange(chunk, dtype=jnp.int32)
    safe_rows = jnp.minimum(rows, N_cap - 1)
    nbrs = layer.neighbors[safe_rows]
    valid = (jnp.arange(R_cap)[None, :] < layer.counts[safe_rows][:, None]) & (
        nbrs >= 0
    )
    scores = jnp.where(
        valid, provider.score_nodes(safe_rows, jnp.maximum(nbrs, 0)), NEG_INF
    )
    ids = jnp.where(valid, nbrs, -1)
    order = jnp.argsort(-scores, axis=1)
    ids = jnp.take_along_axis(ids, order, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    target = jnp.where(rows < N_cap, rows, N_cap)
    return graph._replace(
        layers=(
            GraphLayer(
                neighbors=layer.neighbors.at[target].set(ids, mode="drop"),
                scores=layer.scores.at[target].set(scores, mode="drop"),
                counts=layer.counts,
            ),
        )
        + graph.layers[1:]
    )


def refine_graph(
    graph: GraphIndex,
    provider,
    vectors: jax.Array | np.ndarray,
    config: GraphConfig,
    chunk: int = 1024,
) -> GraphIndex:
    """Full refineFinalGraph pass over the base layer.

    ``vectors`` may be a host numpy array (memmap welcome): only one chunk
    is uploaded per step, so the pass runs with bounded device memory.
    """
    n_vec = vectors.shape[0]
    for start in range(0, graph.capacity, chunk):
        rows = np.minimum(np.arange(start, start + chunk), n_vec - 1)
        qvecs = jnp.asarray(np.asarray(vectors[rows]) if isinstance(
            vectors, np.ndarray
        ) else vectors[jnp.asarray(rows)], jnp.float32)
        graph = _refine_chunk(
            graph, provider, qvecs, jnp.int32(start), config, chunk
        )
    return graph


def rescore_graph(graph: GraphIndex, provider, chunk: int = 2048) -> GraphIndex:
    """Recompute every edge score with ``provider`` (post PQ-refine)."""
    for start in range(0, graph.capacity, chunk):
        graph = _rescore_chunk(graph, provider, jnp.int32(start), chunk)
    return graph


def build_graph(
    vectors,
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
    config: GraphConfig | None = None,
    provider=None,
) -> tuple[GraphIndex, object]:
    """One-call bulk build (reference ``GraphIndexBuilder.build(ravv)``)."""
    return GraphIndexBuilder(config or GraphConfig()).build(
        vectors, sim, provider=provider
    )
