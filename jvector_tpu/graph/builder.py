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

from jvector_tpu.graph.diversity import (
    dedup_sorted_desc,
    robust_prune,
    tie_break_pairs,
    tie_break_scores,
)
from jvector_tpu.graph.index import (
    NEG_INF,
    GraphConfig,
    GraphIndex,
    GraphLayer,
    bucket_capacity,
    empty_graph,
    empty_layer,
)
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.graph.searcher import search_layer
from jvector_tpu.ops.pallas.scatter_rows import scatter_rows_nd_auto
from jvector_tpu.ops.similarity import SimilarityFunction


def _pairwise_from_provider(provider, ids: jax.Array) -> jax.Array:
    """Candidate-pair similarity matrix ``[B, C, C]`` for prune."""
    safe = jnp.maximum(ids, 0)
    return provider.pairwise(safe, safe)


def _prune_simmat(provider, ids: jax.Array) -> jax.Array:
    """Jittered pairwise matrix for the diversity prune.

    Exact providers take the single-gather bf16 fast path (the matrix only
    feeds dominance comparisons; see ``exact_pairwise_rows``)."""
    if isinstance(provider, ExactScoreProvider):
        from jvector_tpu.graph.score import exact_pairwise_rows

        sim = exact_pairwise_rows(
            provider.vectors[jnp.maximum(ids, 0)], provider.sim
        )
        return tie_break_pairs(ids, sim)
    return tie_break_pairs(ids, _pairwise_from_provider(provider, ids))


def _insert_wave(
    graph: GraphIndex,
    provider,
    wave_ids: jax.Array,  # int32 [W], -1 padded on the ragged final wave
    wave_vectors: jax.Array,  # float32 [W, D] full-res vectors being inserted
    config: GraphConfig,
    prune_provider=None,
    seed_ids: jax.Array | None = None,  # int32 [W, S-1] extra entry seeds
) -> GraphIndex:
    """One wave insert.  The graph argument is DONATED — callers that keep
    their input graph must pass copies (see ``add_nodes``).

    ``prune_provider`` (default: ``provider``) scores the intra-wave pairs
    and the diversity prune.  The SQ4-accelerated build passes the exact
    provider here: compressed scores tie on clusters tighter than the
    quantization step, and tie-broken prunes disconnect such clusters
    (tests/test_graph.py::test_backlink_burst_adversarial_fanin) — beam
    search tolerates the ties, the prune does not.

    Two programs, like the fused path: a read-only beam search and a
    scatter-only update.  In ONE program XLA defensively copies every
    array that is both captured by the search ``while_loop`` and scattered
    (at 10M that is a 5 GB neighbors copy — the difference between the
    LTM build compiling and an HBM OOM); split, the donated update
    scatters in place.
    """
    beam_ids, beam_scores = _wave_search(
        graph.base.neighbors,
        provider,
        graph.entry_node,
        wave_ids,
        wave_vectors,
        config,
        seed_ids,
    )
    rescore = prune_provider is not None and prune_provider is not provider
    return _wave_update_plain(
        graph,
        prune_provider if rescore else provider,
        wave_ids,
        wave_vectors,
        beam_ids,
        beam_scores,
        config,
        rescore,
    )


@partial(
    jax.jit, static_argnames=("config", "rescore"), donate_argnums=(0,)
)
def _wave_update_plain(
    graph: GraphIndex,
    prune_provider,  # scores intra-wave pairs, the prune (+ rescore)
    wave_ids: jax.Array,  # int32 [W], -1 padded on the ragged final wave
    wave_vectors: jax.Array,  # float32 [W, D]
    beam_ids: jax.Array,  # int32 [W, ef] from _wave_search
    beam_scores: jax.Array,  # float32 [W, ef]
    config: GraphConfig,
    rescore: bool = False,  # beam scores are compressed -> re-rank exact
) -> GraphIndex:
    """Scatter-only half of :func:`_insert_wave` (steps 2-5)."""
    W = wave_ids.shape[0]
    layer = graph.base
    N_cap, R_cap = layer.neighbors.shape
    M = config.max_degree
    ef = config.ef_construction
    wave_valid = wave_ids >= 0
    safe_wave = jnp.where(wave_valid, wave_ids, 0)

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
    # jitter BEFORE the top-ef intra quota: with quantized tie scores the
    # top_k otherwise picks the SAME lowest-index wave-mates for every
    # owner and the whole wave funnels into one tiny candidate pool
    intra_scores = tie_break_scores(safe_wave, intra_ids, intra_scores)

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
    cand_ids = jnp.concatenate([beam_ids[:, :ef], intra_top_ids], axis=1)
    cand_scores = jnp.concatenate(
        [beam_scores[:, :ef], intra_top_scores], axis=1
    )
    cand_scores = tie_break_scores(safe_wave, cand_ids, cand_scores)
    cand_ids, cand_scores = dedup_sorted_desc(cand_ids, cand_scores)
    if rescore:
        # compressed search scores only drove DISCOVERY; re-rank the pooled
        # candidates full-precision (one [W, C] row gather) so the prune,
        # the stored edge scores, and the greedy order are exact
        valid = cand_ids >= 0
        rescored = prune_provider.score(prune_qstate, jnp.maximum(cand_ids, 0))
        cand_scores = jnp.where(valid, rescored, NEG_INF)
        cand_scores = tie_break_scores(safe_wave, cand_ids, cand_scores)
        order = jnp.argsort(-cand_scores, axis=1)
        cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
        cand_scores = jnp.take_along_axis(cand_scores, order, axis=1)

    simmat = _prune_simmat(prune_provider, cand_ids)
    sel_ids, sel_scores, sel_count = robust_prune(
        cand_ids, cand_scores, simmat, M, config.alphas, algo=config.prune_algo
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
    e_scores_m = tie_break_scores(enforce_rows, e_ids_m, e_scores_m)
    e_ids_s, e_scores_s = dedup_sorted_desc(e_ids_m, e_scores_m)
    e_sim = _prune_simmat(prune_provider, e_ids_s)
    p_ids, p_scores, p_count = robust_prune(
        e_ids_s, e_scores_s, e_sim, M, config.alphas, algo=config.prune_algo
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


class _EntrySeedSampler:
    """Host-side multi-seed bookkeeping for wave builds.

    One object owns the RNG, the inserted-id prefix, and the update
    discipline (record AFTER the wave's search is dispatched) — the four
    build loops (in-memory fused/plain, LTM pq/sq4) all share it so they
    cannot drift apart.
    """

    def __init__(self, n: int, w: int, n_seeds: int):
        self.rng = np.random.default_rng(0xBEE5)
        self.inserted = np.empty(n, np.int32)
        self.n_ins = 0
        self.w = w
        self.n_seeds = max(1, n_seeds)

    def sample(self) -> jax.Array | None:
        return _sample_entry_seeds(
            self.rng, self.inserted, self.n_ins, self.w, self.n_seeds
        )

    def record(self, ids: np.ndarray) -> None:
        valid = ids[ids >= 0]
        self.inserted[self.n_ins : self.n_ins + valid.size] = valid
        self.n_ins += valid.size

    def state_dict(self) -> dict:
        """Checkpointable state (LTM build resume): RNG + inserted prefix."""
        return {
            "rng_state": self.rng.bit_generator.state,
            "inserted": self.inserted[: self.n_ins].copy(),
        }

    def load_state_dict(self, state: dict) -> None:
        self.rng.bit_generator.state = state["rng_state"]
        ins = np.asarray(state["inserted"], np.int32)
        self.inserted[: ins.size] = ins
        self.n_ins = int(ins.size)


def _sample_entry_seeds(
    rng: np.random.Generator,
    inserted: np.ndarray,  # int32 [n] prefix-filled with inserted node ids
    n_ins: int,
    w: int,
    n_seeds: int,
) -> jax.Array | None:
    """Host-sample extra beam-entry seeds from the already-inserted nodes.

    Returns ``None`` when the knob is off (single-entry searches compile to
    a distinct program, so the OFF case must not pass a [W, 0] array).
    The first wave gets an all ``-1`` array — same shape, so one compile.
    """
    if n_seeds <= 1:
        return None
    if n_ins > 0:
        sd = inserted[rng.integers(0, n_ins, (w, n_seeds - 1))]
    else:
        sd = np.full((w, n_seeds - 1), -1, np.int32)
    return jnp.asarray(sd)


@partial(jax.jit, static_argnames=("config",))
def _wave_search(
    graph_neighbors: jax.Array,
    provider,
    entry_node: jax.Array,
    wave_ids: jax.Array,  # int32 [W]
    wave_vectors: jax.Array,  # float32 [W, D]
    config: GraphConfig,
    seed_ids: jax.Array | None = None,  # int32 [W, S-1] extra entry seeds
) -> tuple[jax.Array, jax.Array]:
    """Beam-search a wave against the current graph (read-only program).

    Split out of the insert step so the fused code tables can be DONATED to
    :func:`_wave_update_fused` and scattered in place: XLA copies a multi-GB
    buffer that is both captured by a ``while_loop`` and scattered in the
    same program, so the search (while_loop, read-only) and the update
    (scatters, no loop over the tables) must be separate programs.

    ``seed_ids`` (host-sampled already-inserted nodes, -1 padded) seed the
    beam alongside the global entry — multiple start points shorten the
    graph-diameter walk that dominates sequential beam iterations.  The
    entry node stays a device scalar so no host sync is needed per wave.
    """
    ef = config.ef_construction
    wave_valid = wave_ids >= 0
    qstate = provider.prepare(wave_vectors)
    entries = jnp.where(wave_valid & (entry_node >= 0), entry_node, -1).astype(
        jnp.int32
    )
    if seed_ids is not None and seed_ids.shape[1] > 0:
        # clamp so total entries always fit the beam (ef)
        extra = seed_ids[:, : max(0, ef - 1)]
        extra = jnp.where(wave_valid[:, None], extra, -1).astype(jnp.int32)
        entries = jnp.concatenate([entries[:, None], extra], axis=1)
    packed_rows = config.row_cap if graph_neighbors.ndim == 3 else None
    cut = config.build_repack_after
    repack = 0 < cut < config.max_build_iters and wave_ids.shape[0] >= 64
    beam = search_layer(
        graph_neighbors,
        provider,
        qstate,
        entries,
        beam_width=ef,
        max_iters=cut if repack else config.max_build_iters,
        expand_per_iter=config.build_expand,
        # rank-3 = the packed [N/8, 8, 128] build adjacency (r4)
        packed_rows=packed_rows,
    )
    if repack:
        from jvector_tpu.graph.searcher import _repack_tail

        beam = _repack_tail(
            graph_neighbors,
            provider,
            qstate,
            beam,
            beam_width=ef,
            max_iters=config.max_build_iters,
            expand_per_iter=config.build_expand,
            packed_rows=packed_rows,
        )
    return beam.ids[:, :ef], beam.scores[:, :ef]


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0, 1, 2))
def _wave_update_fused(
    graph: GraphIndex,
    fused_packed: jax.Array,  # uint8 [N_cap, R_cap * MP] — DONATED
    fused_w2: jax.Array,  # f32 [N_cap, R_cap] — DONATED
    prune_provider,  # full-precision provider (rescore + prune)
    codes_packed: jax.Array,  # uint8 [N_cap, MP] the build SQ4 codes
    node_const: jax.Array,  # f32 [N_cap] sim-appropriate per-node constant
    wave_ids: jax.Array,  # int32 [W]
    wave_vectors: jax.Array,  # float32 [W, D]
    beam_ids: jax.Array,  # int32 [W, ef] from _wave_search
    beam_scores: jax.Array,  # float32 [W, ef] (approximate; rescored here)
    config: GraphConfig,
) -> tuple[GraphIndex, jax.Array, jax.Array]:
    """Insert a searched wave AND keep the fused SQ4 tables slot-exact.

    Mirrors :func:`_insert_wave` steps 2-5, plus: every adjacency write
    (wave rows, backlink slots, enforce rewrites) is mirrored into
    ``fused_packed``/``fused_w2`` so the NEXT wave's search gathers one
    fused row per expansion instead of R code rows (the serve path's ~50x
    gather cut, applied to construction).  The slot-alignment invariant
    (fused block j <-> adjacency slot j) is the same one the serve tables
    rely on.  Candidate rescoring and the prune stay full-precision.
    """
    W = wave_ids.shape[0]
    layer = graph.base
    N_cap, R_cap = layer.neighbors.shape
    M = config.max_degree
    ef = config.ef_construction
    mp = codes_packed.shape[1]
    wave_valid = wave_ids >= 0
    safe_wave = jnp.where(wave_valid, wave_ids, 0)

    # -- 2. intra-wave candidates (replaces insertionsInProgress) --------
    prune_qstate = prune_provider.prepare(wave_vectors)
    wave_pair_scores = prune_provider.score(
        prune_qstate, jnp.broadcast_to(safe_wave[None, :], (W, W))
    )
    self_mask = jnp.eye(W, dtype=bool)
    intra_valid = wave_valid[None, :] & wave_valid[:, None] & ~self_mask
    intra_scores = jnp.where(intra_valid, wave_pair_scores, NEG_INF)
    intra_ids = jnp.where(intra_valid, wave_ids[None, :], -1)
    intra_ids = jnp.broadcast_to(intra_ids, (W, W))
    # jitter BEFORE the top-ef intra quota: with quantized tie scores the
    # top_k otherwise picks the SAME lowest-index wave-mates for every
    # owner and the whole wave funnels into one tiny candidate pool
    intra_scores = tie_break_scores(safe_wave, intra_ids, intra_scores)

    # -- 3. merge + rescore exact + prune (see _insert_wave for the
    #       separate-quota / no-score-truncation invariants) --------------
    if W > ef:
        intra_top_scores, intra_idx = jax.lax.top_k(intra_scores, ef)
        intra_top_ids = jnp.take_along_axis(intra_ids, intra_idx, axis=1)
    else:
        intra_top_scores, intra_top_ids = intra_scores, intra_ids
    cand_ids = jnp.concatenate([beam_ids, intra_top_ids], axis=1)
    cand_scores = jnp.concatenate([beam_scores, intra_top_scores], axis=1)
    cand_ids, cand_scores = dedup_sorted_desc(cand_ids, cand_scores)
    valid = cand_ids >= 0
    rescored = prune_provider.score(prune_qstate, jnp.maximum(cand_ids, 0))
    cand_scores = jnp.where(valid, rescored, NEG_INF)
    cand_scores = tie_break_scores(safe_wave, cand_ids, cand_scores)
    order = jnp.argsort(-cand_scores, axis=1)
    cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    cand_scores = jnp.take_along_axis(cand_scores, order, axis=1)

    simmat = _prune_simmat(prune_provider, cand_ids)
    sel_ids, sel_scores, sel_count = robust_prune(
        cand_ids, cand_scores, simmat, M, config.alphas, algo=config.prune_algo
    )

    # -- 4a. write the wave rows (+ fused mirror) -------------------------
    pad_cols = R_cap - M
    row_ids = jnp.concatenate(
        [sel_ids, jnp.full((W, pad_cols), -1, jnp.int32)], axis=1
    )
    row_scores = jnp.concatenate(
        [sel_scores, jnp.full((W, pad_cols), NEG_INF)], axis=1
    )
    scatter_rows = jnp.where(wave_valid, wave_ids, N_cap)
    neighbors = layer.neighbors.at[scatter_rows].set(row_ids, mode="drop")
    scores = layer.scores.at[scatter_rows].set(row_scores, mode="drop")
    counts = layer.counts.at[scatter_rows].set(sel_count, mode="drop")

    def fused_rows_for(ids_rows: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Gather a full fused row image for adjacency rows ``[B, R_cap]``."""
        ok = ids_rows >= 0
        safe = jnp.maximum(ids_rows, 0)
        f_codes = jnp.where(ok[..., None], codes_packed[safe], 0)
        f_w2 = jnp.where(ok, node_const[safe], 0.0)
        return f_codes.reshape(ids_rows.shape[0], -1), f_w2

    def fused_write(table, rows, img):
        """Row write on the fused table.  Rank-3 whole-tile tables (aligned
        builds) go through the guaranteed-in-place Pallas row DMA — XLA's
        scatter COPIES the multi-GB table every wave no matter how the
        update is phrased (measured 3 x ~7 ms/wave at 1M, present even
        with zero reads of the table in the program; 0.03 ms in place).
        2-D tables (sharded shard_map path, unalignable dims) keep the
        XLA scatter."""
        if table.ndim == 3:
            return scatter_rows_nd_auto(
                table, rows, img.reshape((img.shape[0],) + table.shape[1:])
            )
        return table.at[rows].set(img, mode="drop")

    f_codes, f_w2 = fused_rows_for(row_ids)
    # write deferred: all three fused images land in ONE Pallas call below
    # (XLA only aliases the DONATED PROGRAM INPUT into a custom call —
    # chaining three aliased calls copied the 4 GB table twice per wave)

    # -- 4b. backlinks (+ fused slot mirror) ------------------------------
    flat_t = sel_ids.reshape(-1)
    flat_s = jnp.broadcast_to(wave_ids[:, None], (W, M)).reshape(-1)
    flat_sc = sel_scores.reshape(-1)
    bl_valid = (flat_t >= 0) & (flat_s >= 0)

    t_rows = neighbors[jnp.maximum(flat_t, 0)]
    exists = jnp.any(t_rows == flat_s[:, None], axis=1)
    bl_valid &= ~exists

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

    # Fused mirror for backlink targets.  Rank-3 aligned tables take the
    # SLOT-PATCH path: the combined Pallas kernel RMWs just the new slot of
    # each touched row in place (a backlink only APPENDS one slot), so no
    # backlink row images are built at all.  The unaligned/2-D fallback
    # rewrites the FULL fused row of every unique touched target from
    # codes_packed (W*M*R_cap row gathers, ~14 ms/wave at W=512) — XLA
    # phrasings of the slot patch (2-D-index element scatter, flat views,
    # cumsum segment patches) all compile or run worse, and a gather from
    # the donated table followed by a scatter into it forces a copy.
    from jvector_tpu.ops.pallas.scatter_rows import (
        fused_update_auto,
        fused_update_supported,
    )

    slot_patch = fused_update_supported(fused_packed.ndim, mp)
    if not slot_patch:
        uniq = (valid_sorted == 1) & is_start
        bl_rows = jnp.where(uniq, key_sorted, N_cap)
        safe_bl = jnp.minimum(bl_rows, N_cap - 1)
        r_ids = neighbors[safe_bl]
        r_ids = jnp.where(
            jnp.arange(R_cap)[None, :] < counts[safe_bl][:, None], r_ids, -1
        )
        bf_codes, bf_w2 = fused_rows_for(r_ids)

    # -- 5. enforce overflow (+ fused row rewrite) ------------------------
    over_cap = config.overflow_degree
    touched = jnp.where(bl_valid, flat_t, 0)
    touched_counts = jnp.where(bl_valid, counts[touched], -1)
    _, worst_idx = jax.lax.top_k(touched_counts, W)
    enforce_rows = touched[worst_idx]
    enforce_mask = counts[enforce_rows] > over_cap

    e_ids = neighbors[enforce_rows]
    e_scores = scores[enforce_rows]
    e_ids_m = jnp.where(
        jnp.arange(R_cap)[None, :] < counts[enforce_rows][:, None], e_ids, -1
    )
    e_scores_m = jnp.where(e_ids_m >= 0, e_scores, NEG_INF)
    e_scores_m = tie_break_scores(enforce_rows, e_ids_m, e_scores_m)
    e_ids_s, e_scores_s = dedup_sorted_desc(e_ids_m, e_scores_m)
    e_sim = _prune_simmat(prune_provider, e_ids_s)
    p_ids, p_scores, p_count = robust_prune(
        e_ids_s, e_scores_s, e_sim, M, config.alphas, algo=config.prune_algo
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

    pf_codes, pf_w2 = fused_rows_for(p_row_ids)

    # -- combined fused-table write, ONE aliased call -> zero copies.
    wave_in_er = jnp.any(scatter_rows[:, None] == er[None, :], axis=1)
    rows_a = jnp.where(wave_in_er, N_cap, scatter_rows)
    if slot_patch:
        # priority enforce > patch > wave is the kernel's phase order:
        # wave images land, slot patches RMW on top (so wave members that
        # receive backlinks get both), enforce images land last.  Patches
        # into enforce rows are masked out (pf images already include the
        # surviving backlinks).  Masking only removes whole runs (er rows)
        # or run tails (slot >= R_cap), so the sorted patch stream stays
        # run-contiguous — the kernel's one-RMW-per-run invariant.
        in_er = jnp.any(key_sorted[:, None] == er[None, :], axis=1)
        p_ok = ok & ~in_er
        p_rows = jnp.where(p_ok, t_ok, -1)
        src_codes = codes_packed[jnp.maximum(s_sorted, 0)]
        t3 = fused_packed.shape[1]
        fused_packed = fused_update_auto(
            fused_packed,
            rows_a,
            f_codes.reshape(W, t3, 128),
            p_rows,
            scatter_slot,
            src_codes,
            er,
            pf_codes.reshape(W, t3, 128),
            mp,
        )
        src_const = jnp.where(p_ok, node_const[jnp.maximum(s_sorted, 0)], 0.0)
        fused_w2 = fused_w2.at[rows_a].set(f_w2, mode="drop")
        fused_w2 = fused_w2.at[
            jnp.where(p_ok, t_ok, N_cap), scatter_slot
        ].set(src_const, mode="drop")
        fused_w2 = fused_w2.at[er].set(pf_w2, mode="drop")
    else:
        # full-image fallback: mask lower-priority rows covered by a
        # higher-priority image (each surviving index unique; duplicate
        # enforce rows carry identical images)
        wave_in_bl = jnp.any(scatter_rows[:, None] == bl_rows[None, :], axis=1)
        rows_a = jnp.where(wave_in_bl, N_cap, rows_a)
        bl_in_er = jnp.any(bl_rows[:, None] == er[None, :], axis=1)
        rows_b = jnp.where(bl_in_er, N_cap, bl_rows)
        all_rows = jnp.concatenate([rows_a, rows_b, er])
        fused_packed = fused_write(
            fused_packed, all_rows, jnp.concatenate([f_codes, bf_codes, pf_codes])
        )
        fused_w2 = fused_w2.at[all_rows].set(
            jnp.concatenate([f_w2, bf_w2, pf_w2]), mode="drop"
        )

    # -- bookkeeping ------------------------------------------------------
    n_new = jnp.sum(wave_valid).astype(jnp.int32)
    entry = jnp.where(
        graph.entry_node >= 0,
        graph.entry_node,
        jnp.where(n_new > 0, safe_wave[0], -1),
    ).astype(jnp.int32)

    new_graph = GraphIndex(
        layers=(GraphLayer(neighbors, scores, counts),) + graph.layers[1:],
        level_node_ids=graph.level_node_ids,
        entry_node=entry,
        num_nodes=graph.num_nodes + n_new,
        deleted=graph.deleted,
    )
    return new_graph, fused_packed, fused_w2


# ---------------------------------------------------------------------------
# Packed-adjacency wave update (r4): three programs per wave instead of two.
#
# The r3 two-program split left neighbors / scores / fused_w2 as XLA scatters
# inside the update program, and XLA defensively copies each of those tables
# every wave (measured r4 at 1M: three ~7.8 ms chunked-copy loops = 22 ms of
# an 83 ms wave).  The fix packs neighbors + edge scores into ONE [N/8, 8,
# 128] int32 table (`adj`: ids in lanes [0:R], f32 score bits in [64:64+R])
# and the fused per-slot constants into a second (`w2t`), both updated by a
# write-only Pallas program (ops/pallas/packed_adj.py).  Because a gather
# from a donated table followed by an aliased write forces a copy, the wave
# becomes THREE programs:
#
#   P1 `_wave_search`      — read-only beam search (packed gathers)
#   P2 `_wave_update_compute` — reads adj (pre-state) + computes everything:
#        prune, wave-row images, backlink patch stream, enforce images.
#        The reads that used to see mid-program writes are replaced by
#        pre-state + overlays (intra-wave rows from `sel_ids`, this wave's
#        appends scattered into a [W, R] temp).
#   P3 `_wave_apply_packed` — write-only: one aliased Pallas call per table.
#
# Semantics are identical to `_wave_update_fused` except enforce-row
# duplicates are dropped up front (the XLA scatter tolerated identical
# duplicate images; the image stream requires unique rows — output equal).
# ---------------------------------------------------------------------------


def _adj_rows(adj: jax.Array, ids: jax.Array, r: int):
    """Gather packed adjacency rows: ids ``[B...]`` (>= 0) ->
    ``(neighbor ids [B..., r] i32, scores [B..., r] f32)``."""
    rows = adj[ids >> 3, ids & 7]  # [B..., 128] i32
    return (
        rows[..., :r],
        jax.lax.bitcast_convert_type(rows[..., 64 : 64 + r], jnp.float32),
    )


def _intra_wave_scores(prune_provider, prune_qstate, wave_vectors, safe_wave):
    """Intra-wave all-pairs scores ``[W, W]``.

    For the exact provider this is a direct matmul on the wave vectors
    already at hand — the generic path gathers W*W rows (262k rows at
    W=512, ~3.7 ms/wave of pure row-gather, r4 measured) for vectors we
    are literally holding."""
    if isinstance(prune_provider, ExactScoreProvider):
        from jvector_tpu.ops.similarity import normalize_score, pairwise_raw

        qs = prune_provider.prepare(wave_vectors)
        raw = pairwise_raw(qs, wave_vectors.astype(jnp.float32), prune_provider.sim)
        return normalize_score(raw, prune_provider.sim)
    w = safe_wave.shape[0]
    return prune_provider.score(
        prune_qstate, jnp.broadcast_to(safe_wave[None, :], (w, w))
    )


@partial(jax.jit, static_argnames=("config", "rescore", "with_fused"))
def _wave_update_compute(
    adj: jax.Array,  # [N/8, 8, 128] i32 packed adjacency (READ-ONLY here)
    counts: jax.Array,  # [N] i32
    entry_node: jax.Array,
    num_nodes: jax.Array,
    prune_provider,  # full-precision provider (rescore + prune)
    codes_packed: jax.Array,  # uint8 [N_cap, MP] (unused if not with_fused)
    node_const: jax.Array,  # f32 [N_cap] (unused if not with_fused)
    wave_ids: jax.Array,  # int32 [W] contiguous ascending, -1 padded
    wave_vectors: jax.Array,  # float32 [W, D]
    beam_ids: jax.Array,  # int32 [W, ef]
    beam_scores: jax.Array,  # float32 [W, ef]
    config: GraphConfig,
    rescore: bool = True,  # re-rank merged candidates with prune_provider
    #   (True when it is a higher-precision provider than the search's;
    #   False mirrors _wave_update_plain's same-provider LTM path)
    with_fused: bool = True,  # also emit fused-table + w2 write streams
):
    """Read+compute half of the packed wave update.  Returns the write
    streams for :func:`_wave_apply_packed` plus updated counts/bookkeeping.

    With ``with_fused=False`` (the LTM non-fused / 100M regime) the adj
    stream omits the w2 components and ``fused_stream`` is ``None``:
    ``(a_rows, a_adj, m_key, m_slot, m_id, m_sc, m_img, e_adj_img)``."""
    W = wave_ids.shape[0]
    N_cap = adj.shape[0] * 8
    R_cap = config.row_cap
    M = config.max_degree
    ef = config.ef_construction
    mp = codes_packed.shape[1]
    wave_valid = wave_ids >= 0
    safe_wave = jnp.where(wave_valid, wave_ids, 0)

    # -- 2. intra-wave candidates --------------------------------------
    prune_qstate = prune_provider.prepare(wave_vectors)
    wave_pair_scores = _intra_wave_scores(
        prune_provider, prune_qstate, wave_vectors, safe_wave
    )
    self_mask = jnp.eye(W, dtype=bool)
    intra_valid = wave_valid[None, :] & wave_valid[:, None] & ~self_mask
    intra_scores = jnp.where(intra_valid, wave_pair_scores, NEG_INF)
    intra_ids = jnp.where(intra_valid, wave_ids[None, :], -1)
    intra_ids = jnp.broadcast_to(intra_ids, (W, W))
    intra_scores = tie_break_scores(safe_wave, intra_ids, intra_scores)

    # -- 3. merge + rescore exact + prune ------------------------------
    if W > ef:
        intra_top_scores, intra_idx = jax.lax.top_k(intra_scores, ef)
        intra_top_ids = jnp.take_along_axis(intra_ids, intra_idx, axis=1)
    else:
        intra_top_scores, intra_top_ids = intra_scores, intra_ids
    cand_ids = jnp.concatenate([beam_ids, intra_top_ids], axis=1)
    cand_scores = jnp.concatenate([beam_scores, intra_top_scores], axis=1)
    cand_ids, cand_scores = dedup_sorted_desc(cand_ids, cand_scores)
    valid = cand_ids >= 0
    exact_rows = rescore and isinstance(prune_provider, ExactScoreProvider)
    if exact_rows:
        # single-gather fast path: one [W, C, D] row gather feeds the exact
        # rescore AND (permuted in-register) the prune's pairwise matrix —
        # the gathers are row-count-bound, this was 3x ~100k rows/wave
        from jvector_tpu.graph.score import exact_pairwise_rows, exact_score_rows

        cand_va = prune_provider.vectors[jnp.maximum(cand_ids, 0)]
        rescored = exact_score_rows(prune_qstate, cand_va, prune_provider.sim)
        cand_scores = jnp.where(valid, rescored, NEG_INF)
    elif rescore:
        rescored = prune_provider.score(prune_qstate, jnp.maximum(cand_ids, 0))
        cand_scores = jnp.where(valid, rescored, NEG_INF)
    else:
        cand_scores = jnp.where(valid, cand_scores, NEG_INF)
    cand_scores = tie_break_scores(safe_wave, cand_ids, cand_scores)
    order = jnp.argsort(-cand_scores, axis=1)
    cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    cand_scores = jnp.take_along_axis(cand_scores, order, axis=1)

    if exact_rows:
        cand_va = jnp.take_along_axis(cand_va, order[..., None], axis=1)
        simmat = exact_pairwise_rows(cand_va, prune_provider.sim)
        simmat = tie_break_pairs(cand_ids, simmat)
    else:
        simmat = tie_break_pairs(
            cand_ids, _pairwise_from_provider(prune_provider, cand_ids)
        )
    sel_ids, sel_scores, sel_count = robust_prune(
        cand_ids, cand_scores, simmat, M, config.alphas, algo=config.prune_algo
    )

    # -- 4a. wave row images (whole-tile writes, so invalid members get
    #        explicit EMPTY images rather than scatter drops) ------------
    pad_cols = R_cap - M
    row_ids = jnp.concatenate(
        [sel_ids, jnp.full((W, pad_cols), -1, jnp.int32)], axis=1
    )
    row_scores = jnp.concatenate(
        [sel_scores, jnp.full((W, pad_cols), NEG_INF)], axis=1
    )
    row_ids = jnp.where(wave_valid[:, None], row_ids, -1)
    row_scores = jnp.where(wave_valid[:, None], row_scores, NEG_INF)
    scatter_rows = jnp.where(wave_valid, wave_ids, N_cap)
    counts1 = counts.at[scatter_rows].set(sel_count, mode="drop")

    def fused_rows_for(ids_rows: jax.Array) -> tuple[jax.Array, jax.Array]:
        ok = ids_rows >= 0
        safe = jnp.maximum(ids_rows, 0)
        f_codes = jnp.where(ok[..., None], codes_packed[safe], 0)
        f_w2 = jnp.where(ok, node_const[safe], 0.0)
        return f_codes.reshape(ids_rows.shape[0], -1), f_w2

    if with_fused:
        f_codes, f_w2 = fused_rows_for(row_ids)

    # -- 4b. backlinks: dedup against PRE-state + intra-wave overlay ----
    flat_t = sel_ids.reshape(-1)
    flat_s = jnp.broadcast_to(wave_ids[:, None], (W, M)).reshape(-1)
    flat_sc = sel_scores.reshape(-1)
    bl_valid = (flat_t >= 0) & (flat_s >= 0)

    t_pre_ids, _ = _adj_rows(adj, jnp.maximum(flat_t, 0), R_cap)
    exists_pre = jnp.any(t_pre_ids == flat_s[:, None], axis=1)
    # wave-member targets: their row is being replaced this wave — the
    # old row is irrelevant; mutual selection comes from sel_ids
    eq_w = flat_t[:, None] == scatter_rows[None, :]  # [W*M, W]
    is_wave_t = jnp.any(eq_w, axis=1)
    widx = jnp.argmax(eq_w, axis=1)
    mutual = jnp.any(sel_ids[widx] == flat_s[:, None], axis=1)
    exists = jnp.where(is_wave_t, mutual, exists_pre)
    bl_valid &= ~exists

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
    slot = counts1[t_ok] + rank
    ok = (valid_sorted == 1) & (slot < R_cap)
    scatter_slot = jnp.where(ok, slot, 0)
    counts2 = counts1.at[jnp.where(ok, t_ok, N_cap)].add(1, mode="drop")

    # -- 5. enforce overflow: reconstruct post-append rows from pre-state
    over_cap = config.overflow_degree
    touched = jnp.where(bl_valid, flat_t, 0)
    touched_counts = jnp.where(bl_valid, counts2[touched], -1)
    _, worst_idx = jax.lax.top_k(touched_counts, W)
    enforce_rows = touched[worst_idx]
    # drop duplicate rows (identical duplicate IMAGES were harmless as XLA
    # scatters; the image stream wants unique rows — same final state)
    first_occ = (
        jnp.argmax(enforce_rows[:, None] == enforce_rows[None, :], axis=1)
        == jnp.arange(W, dtype=jnp.int32)
    )
    enforce_mask = (counts2[enforce_rows] > over_cap) & first_occ

    safe_er = jnp.maximum(enforce_rows, 0)
    base_ids, base_scores = _adj_rows(adj, safe_er, R_cap)
    er_is_wave = jnp.any(
        enforce_rows[:, None] == scatter_rows[None, :], axis=1
    )
    ewidx = jnp.argmax(enforce_rows[:, None] == scatter_rows[None, :], axis=1)
    base_ids = jnp.where(er_is_wave[:, None], row_ids[ewidx], base_ids)
    base_scores = jnp.where(er_is_wave[:, None], row_scores[ewidx], base_scores)
    # overlay this wave's appends into the (unique) enforce rows
    eq_e = (key_sorted[:, None] == enforce_rows[None, :]) & ok[:, None]
    has_e = jnp.any(eq_e, axis=1)
    eidx = jnp.argmax(eq_e, axis=1)
    e_r = jnp.where(has_e, eidx, W)
    e_ids = base_ids.at[e_r, scatter_slot].set(s_sorted, mode="drop")
    e_scores = base_scores.at[e_r, scatter_slot].set(sc_sorted, mode="drop")

    e_ids_m = jnp.where(
        jnp.arange(R_cap)[None, :] < counts2[safe_er][:, None], e_ids, -1
    )
    e_scores_m = jnp.where(e_ids_m >= 0, e_scores, NEG_INF)
    e_scores_m = tie_break_scores(enforce_rows, e_ids_m, e_scores_m)
    e_ids_s, e_scores_s = dedup_sorted_desc(e_ids_m, e_scores_m)
    e_sim = _prune_simmat(prune_provider, e_ids_s)
    p_ids, p_scores, p_count = robust_prune(
        e_ids_s, e_scores_s, e_sim, M, config.alphas, algo=config.prune_algo
    )
    p_row_ids = jnp.concatenate(
        [p_ids, jnp.full((W, R_cap - M), -1, jnp.int32)], axis=1
    )
    p_row_scores = jnp.concatenate(
        [p_scores, jnp.full((W, R_cap - M), NEG_INF)], axis=1
    )
    er = jnp.where(enforce_mask, enforce_rows, N_cap)
    counts3 = counts2.at[er].set(p_count, mode="drop")
    if with_fused:
        pf_codes, pf_w2 = fused_rows_for(p_row_ids)

    # -- assemble the write streams -------------------------------------
    def adj_img(ids_img, scores_img):
        # lane layout: [ids R_cap | -1 pad to 64 | score bits R_cap | 0 pad]
        bits = jax.lax.bitcast_convert_type(scores_img, jnp.int32)
        return jnp.concatenate(
            [
                ids_img,
                jnp.full((W, 64 - R_cap), -1, jnp.int32),
                bits,
                jnp.zeros((W, 64 - R_cap), jnp.int32),
            ],
            axis=1,
        )

    def w2_img(w2_vals):
        bits = jax.lax.bitcast_convert_type(w2_vals.astype(jnp.float32), jnp.int32)
        return jnp.concatenate(
            [bits, jnp.zeros((W, 128 - R_cap), jnp.int32)], axis=1
        )

    a_rows = (safe_wave[0] >> 3) + jnp.arange(W // 8, dtype=jnp.int32)
    a_adj = adj_img(row_ids, row_scores).reshape(W // 8, 8, 128)

    # merged patch stream: appends (scalar patches) + enforce images,
    # sorted by logical row.  Appends into enforce rows are excluded (the
    # enforce image is the complete row); ``in_er`` also feeds the fused
    # kernel's patch mask.
    in_er = jnp.any(key_sorted[:, None] == er[None, :], axis=1)
    p_ok = ok & ~in_er
    app_key = jnp.where(p_ok, t_ok, big)
    app_id = s_sorted
    app_sc = jax.lax.bitcast_convert_type(sc_sorted, jnp.int32)
    er_key = jnp.where(enforce_mask, enforce_rows, big)
    zero_w = jnp.zeros((W,), jnp.int32)
    m_key = jnp.concatenate([app_key, er_key])
    m_slot = jnp.concatenate([scatter_slot, zero_w])
    m_id = jnp.concatenate([app_id, zero_w])
    m_sc = jnp.concatenate([app_sc, zero_w])
    m_img = jnp.concatenate(
        [jnp.full((W * M,), -1, jnp.int32), jnp.arange(W, dtype=jnp.int32)]
    )
    e_adj_img = adj_img(p_row_ids, p_row_scores)

    # -- bookkeeping ----------------------------------------------------
    n_new = jnp.sum(wave_valid).astype(jnp.int32)
    entry2 = jnp.where(
        entry_node >= 0,
        entry_node,
        jnp.where(n_new > 0, safe_wave[0], -1),
    ).astype(jnp.int32)
    num2 = num_nodes + n_new

    if not with_fused:
        m_key, m_slot, m_id, m_sc, m_img = jax.lax.sort(
            (m_key, m_slot, m_id, m_sc, m_img), num_keys=1
        )
        return (
            counts3,
            entry2,
            num2,
            (a_rows, a_adj, m_key, m_slot, m_id, m_sc, m_img, e_adj_img),
            None,
        )

    a_w2 = w2_img(f_w2).reshape(W // 8, 8, 128)
    app_w2 = jax.lax.bitcast_convert_type(
        node_const[jnp.maximum(s_sorted, 0)].astype(jnp.float32), jnp.int32
    )
    m_w2 = jnp.concatenate([app_w2, zero_w])
    m_key, m_slot, m_id, m_sc, m_w2, m_img = jax.lax.sort(
        (m_key, m_slot, m_id, m_sc, m_w2, m_img), num_keys=1
    )
    e_w2_img = w2_img(pf_w2)

    # fused-table streams (unchanged contract, see _wave_update_fused)
    wave_in_er = jnp.any(scatter_rows[:, None] == er[None, :], axis=1)
    f_rows_a = jnp.where(wave_in_er, N_cap, scatter_rows)
    f_p_rows = jnp.where(p_ok, t_ok, -1)
    f_src_codes = codes_packed[jnp.maximum(s_sorted, 0)]

    return (
        counts3,
        entry2,
        num2,
        (a_rows, a_adj, a_w2, m_key, m_slot, m_id, m_sc, m_w2, m_img,
         e_adj_img, e_w2_img),
        (f_rows_a, f_codes, f_p_rows, scatter_slot, f_src_codes, er, pf_codes),
    )


@partial(jax.jit, static_argnames=("mp",), donate_argnums=(0, 1, 2))
def _wave_apply_packed(
    adj: jax.Array,  # [N/8, 8, 128] i32 — DONATED
    w2t: jax.Array,  # [N/8, 8, 128] i32 — DONATED
    fused_packed: jax.Array,  # [N, T, 128] u8 — DONATED
    adj_stream: tuple,
    fused_stream: tuple,
    mp: int,
):
    """Write-only apply program: two aliased Pallas calls (packed adjacency
    + fused code table), no gathers of the donated tables."""
    from jvector_tpu.ops.pallas.packed_adj import packed_adj_update_auto

    (a_rows, a_adj, a_w2, m_key, m_slot, m_id, m_sc, m_w2, m_img,
     e_adj_img, e_w2_img) = adj_stream
    n_pr = adj.shape[0]
    prow = jnp.where(m_key < n_pr * 8, m_key >> 3, jnp.int32(2**30))
    sub = m_key & 7
    adj, w2t = packed_adj_update_auto(
        adj, w2t, a_rows, a_adj, a_w2, prow, sub, m_slot, m_id, m_sc, m_w2,
        m_img, e_adj_img, e_w2_img,
    )

    from jvector_tpu.ops.pallas.scatter_rows import fused_update_auto

    (f_rows_a, f_codes, f_p_rows, f_slots, f_src_codes, er, pf_codes) = (
        fused_stream
    )
    t3 = fused_packed.shape[1]
    w = f_codes.shape[0]
    fused_packed = fused_update_auto(
        fused_packed,
        f_rows_a,
        f_codes.reshape(w, t3, 128),
        f_p_rows,
        f_slots,
        f_src_codes,
        er,
        pf_codes.reshape(w, t3, 128),
        mp,
    )
    return adj, w2t, fused_packed


@partial(jax.jit, donate_argnums=(0,))
def _wave_apply_adj_only(adj: jax.Array, adj_stream: tuple) -> jax.Array:
    """Write-only apply for the non-fused packed build (LTM / 100M regime):
    one aliased Pallas call on the packed adjacency, no fused tables."""
    from jvector_tpu.ops.pallas.packed_adj import packed_adj_only_update_auto

    (a_rows, a_adj, m_key, m_slot, m_id, m_sc, m_img, e_adj_img) = adj_stream
    n_pr = adj.shape[0]
    prow = jnp.where(m_key < n_pr * 8, m_key >> 3, jnp.int32(2**30))
    sub = m_key & 7
    return packed_adj_only_update_auto(
        adj, a_rows, a_adj, prow, sub, m_slot, m_id, m_sc, m_img, e_adj_img
    )


def _packed_adj_eligible(cfg: GraphConfig, n_cap: int) -> bool:
    """Whether the packed [N/8, 8, 128] adjacency layout applies at all
    (layout + patch-stream alignment; no fused-table conditions)."""
    from jvector_tpu.ops.pallas.packed_adj import _CHUNK

    w = cfg.wave_size
    return (
        cfg.row_cap <= 64
        and w % 8 == 0
        and (w * (cfg.max_degree + 1)) % _CHUNK == 0
        and n_cap % 8 == 0
    )


def _packed_build_eligible(cfg: GraphConfig, mp: int, n_cap: int) -> bool:
    """Whether the packed-adjacency wave loop applies (see module comment)."""
    from jvector_tpu.ops.pallas.scatter_rows import fused_update_supported

    return (
        _packed_adj_eligible(cfg, n_cap)
        and (cfg.row_cap * mp) % 1024 == 0
        and fused_update_supported(3, mp)
    )


def _pack_adjacency(layer: GraphLayer, r_cap: int) -> jax.Array:
    """GraphLayer -> packed [N/8, 8, 128] i32 adjacency (build-loop entry).

    Materializes ~5x the packed table transiently (inputs + bitcast +
    concat + relayout) — fine for checkpoint-resume scale, but a fresh
    build must use :func:`_empty_packed_adjacency` instead (at 10M the 5x
    transient alone OOMs the 16 GB chip)."""
    n = layer.neighbors.shape[0]
    bits = jax.lax.bitcast_convert_type(layer.scores, jnp.int32)
    flat = jnp.concatenate(
        [
            layer.neighbors,
            jnp.full((n, 64 - r_cap), -1, jnp.int32),
            bits,
            jnp.zeros((n, 64 - r_cap), jnp.int32),
        ],
        axis=1,
    )
    return flat.reshape(n // 8, 8, 128)


def _empty_packed_adjacency(n_cap: int, r_cap: int) -> jax.Array:
    """Packed adjacency of an EMPTY graph, built without the [N, R]
    unpacked tables ever existing (one dense [N/8, 8, 128] buffer, no
    multi-GB transients — the 10M fresh-build entry point).

    Bit-identical to ``_pack_adjacency(empty_layer(n_cap, r_cap), r_cap)``:
    id lanes all -1, score lanes 64..64+r_cap = bitcast(-inf), rest 0.
    """
    sc_bits = jax.lax.bitcast_convert_type(
        jnp.full((r_cap,), NEG_INF, jnp.float32), jnp.int32
    )
    row = jnp.concatenate(
        [
            jnp.full((64,), -1, jnp.int32),
            sc_bits,
            jnp.zeros((64 - r_cap,), jnp.int32),
        ]
    )
    # broadcast fuses into the copy: peak device memory = the one output
    return jnp.broadcast_to(row, (n_cap // 8, 8, 128)).copy()


def _unpack_adjacency(
    adj: jax.Array, counts: jax.Array, r_cap: int
) -> GraphLayer:
    """Packed adjacency -> GraphLayer arrays (build-loop exit)."""
    n = adj.shape[0] * 8
    flat = adj.reshape(n, 128)
    return GraphLayer(
        neighbors=flat[:, :r_cap],
        scores=jax.lax.bitcast_convert_type(
            flat[:, 64 : 64 + r_cap], jnp.float32
        ),
        counts=counts,
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
    e_scores = tie_break_scores(safe_rows, e_ids, e_scores)
    e_ids_s, e_scores_s = dedup_sorted_desc(e_ids, e_scores)
    simmat = _prune_simmat(provider, e_ids_s)
    p_ids, p_scores, p_count = robust_prune(
        e_ids_s, e_scores_s, simmat, M, config.alphas, algo=config.prune_algo
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


@partial(
    jax.jit,
    static_argnames=("config", "chunk"),
    donate_argnums=(0, 1),
)
def _enforce_packed_chunk(
    adj: jax.Array,  # [N/8, 8, 128] i32 packed ids+score-bits (DONATED)
    counts: jax.Array,  # [N] i32 (DONATED)
    provider,
    start: jax.Array,  # i32 row start, % 8 == 0
    num_nodes: jax.Array,  # i32
    config: GraphConfig,
    chunk: int,  # % 8 == 0
) -> tuple[jax.Array, jax.Array]:
    """Enforce-degree on a contiguous chunk of PACKED rows, in place.

    The packed counterpart of :func:`_enforce_chunk`: reads the chunk with
    one ``dynamic_slice`` and writes it back with one
    ``dynamic_update_slice`` on donated buffers — contiguous slice updates
    alias in place, unlike the row scatters of the unpacked path, which
    XLA lowers as whole-table chunked-copy loops on multi-GB buffers
    (r4 traced: ~72 ms/chunk of cleanup at 1M was ~7x the accountable
    compute).  Also the only cleanup that FITS at 10M: the unpacked
    tables + their scatter copy exceed the 16 GB chip.
    """
    r_cap = config.row_cap
    M = config.max_degree
    g0 = start // 8
    blk = jax.lax.dynamic_slice(adj, (g0, 0, 0), (chunk // 8, 8, 128))
    flat = blk.reshape(chunk, 128)
    e_ids = flat[:, :r_cap]
    e_scores = jax.lax.bitcast_convert_type(
        flat[:, 64 : 64 + r_cap], jnp.float32
    )
    rows = start + jnp.arange(chunk, dtype=jnp.int32)
    cnt = jax.lax.dynamic_slice(counts, (start,), (chunk,))
    valid_row = (rows < num_nodes) & (cnt > 0)

    e_ids = jnp.where(jnp.arange(r_cap)[None, :] < cnt[:, None], e_ids, -1)
    e_scores = jnp.where(e_ids >= 0, e_scores, NEG_INF)
    e_scores = tie_break_scores(rows, e_ids, e_scores)
    e_ids_s, e_scores_s = dedup_sorted_desc(e_ids, e_scores)
    simmat = _prune_simmat(provider, e_ids_s)
    p_ids, p_scores, p_count = robust_prune(
        e_ids_s, e_scores_s, simmat, M, config.alphas, algo=config.prune_algo
    )
    new_ids = jnp.concatenate(
        [p_ids, jnp.full((chunk, 64 - M), -1, jnp.int32)], axis=1
    )
    # score lanes: NEG_INF pads only up to r_cap (mirroring _pack_adjacency /
    # _empty_packed_adjacency); lanes 64+r_cap..128 stay int32 zero so a
    # post-cleanup packed row remains bit-identical to _pack_adjacency of
    # its unpacked layer (pack-layout invariant; advisor r4)
    new_sc = jnp.concatenate(
        [p_scores, jnp.full((chunk, r_cap - M), NEG_INF, jnp.float32)], axis=1
    )
    new_flat = jnp.concatenate(
        [
            new_ids,
            jax.lax.bitcast_convert_type(new_sc, jnp.int32),
            jnp.zeros((chunk, 64 - r_cap), jnp.int32),
        ],
        axis=1,
    )
    new_flat = jnp.where(valid_row[:, None], new_flat, flat)
    new_cnt = jnp.where(valid_row, p_count, cnt)
    adj = jax.lax.dynamic_update_slice(
        adj, new_flat.reshape(chunk // 8, 8, 128), (g0, 0, 0)
    )
    counts = jax.lax.dynamic_update_slice(counts, new_cnt, (start,))
    return adj, counts


def packed_cleanup(
    adj: jax.Array,
    counts: jax.Array,
    provider,
    config: GraphConfig,
    num_nodes: jax.Array,
    chunk: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Enforce max_degree over the whole PACKED adjacency (cleanup pass).

    ``adj``/``counts`` are consumed (donated per chunk).  The tail chunk
    clamps its start back to ``n_cap - chunk``; re-enforcing the overlap
    rows is exactly idempotent (each kept edge was selected against the
    same earlier-kept set, and the tie-break jitter is id-derived).
    """
    n_cap = adj.shape[0] * 8
    chunk = min(chunk, n_cap)
    starts = list(range(0, n_cap - chunk + 1, chunk))
    if n_cap % chunk:
        starts.append(n_cap - chunk)
    for s in starts:
        adj, counts = _enforce_packed_chunk(
            adj, counts, provider, jnp.int32(s), num_nodes, config, chunk
        )
    return adj, counts


def _shuffled_wave_starts(n: int, wave: int, seed: int = 0x5EED) -> list[int]:
    """Deterministically shuffled wave insertion order.

    Vamana robustness depends on shuffled insertion: on a cluster- or
    time-ordered corpus, id-order waves build each cluster against a graph
    that does not yet contain the others, so cross-cluster bridges only
    form by backlink accidents (measured: an adversarial cluster-block
    corpus served at recall 0.0 because ~49 bridge edges sat on rows the
    query beam never expands).  Shuffling the WAVE order interleaves
    clusters — every wave searches a graph containing the other regions,
    so the alpha ramp admits long-range edges in both directions — while
    keeping each wave a contiguous chunk (stream/memmap-friendly loads,
    positional inline writes).  Reference: DiskANN/Vamana builds shuffle
    insertion order for the same reason.
    """
    starts = list(range(0, n, wave))
    np.random.default_rng(seed).shuffle(starts)
    return starts


def _fused_aligned_config(cfg: GraphConfig, mp: int) -> GraphConfig:
    """Bump row capacity so fused rows are whole HBM tiles.

    The fused code table updates run as guaranteed-in-place Pallas row DMAs
    (ops/pallas/scatter_rows.py); row DMA needs the row stride
    (row_cap * MP bytes) to be a whole number of u8 HBM tiles, i.e. a
    multiple of 1024 bytes — e.g. d=128 (MP=64) aligns row_cap 56 -> 64.
    Dims that cannot align within +64 slots fall back to the XLA scatters
    (correct, just slower: the scatter copies the table each wave).
    """
    r = cfg.row_cap
    r2 = r
    while (r2 * mp) % 1024 and r2 < r + 64:
        r2 += 8
    if (r2 * mp) % 1024 or r2 == r:
        return cfg
    return dataclasses.replace(cfg, row_slack=cfg.row_slack + (r2 - r))


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
        import logging
        import time as _time

        log = logging.getLogger(__name__)
        timed = log.isEnabledFor(logging.INFO)  # opt-in phase timing
        t_phase = _time.time()
        if provider is None and cfg.build_compression == "sq4":
            # whole-tile fused rows -> in-place Pallas table updates
            cfg = _fused_aligned_config(cfg, (d + 1) // 2)
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
        if timed:
            jax.block_until_ready(getattr(build_provider, "codes_packed", vectors))
            log.info("build phase: provider prep %.1fs", _time.time() - t_phase)
            t_phase = _time.time()
        graph = empty_graph(n_cap, cfg)

        # Wave vectors: waves are CONTIGUOUS id ranges, so a dynamic slice
        # of the capacity-padded provider array replaces the per-wave fancy
        # gather — the gather's host-side dispatch alone cost ~8 ms/wave
        # (r4 traced), a fifth of the whole wave.
        wave_src = (
            provider.vectors
            if isinstance(provider, ExactScoreProvider)
            and provider.vectors.shape[0] == n_cap
            and provider.vectors.dtype == jnp.float32
            and n_cap % w == 0
            else None
        )

        def _wave_vecs(start: int, ids_dev: jax.Array) -> jax.Array:
            if wave_src is not None:
                return jax.lax.dynamic_slice_in_dim(wave_src, start, w)
            return vectors[jnp.minimum(ids_dev, n - 1)]

        enforced = False  # packed builds enforce-degree pre-unpack
        if build_provider is not provider and _packed_build_eligible(
            cfg, build_provider.codes_packed.shape[1], n_cap
        ):
            # Packed-adjacency fused build (r4): neighbors+scores live in
            # one [N/8, 8, 128] i32 table and w2 in a second, both updated
            # in place by a write-only Pallas program — the XLA scatters
            # they replace defensively copied all three tables every wave
            # (22 ms of an 83 ms wave at 1M).  See the module comment above
            # _wave_update_compute for the three-program structure.
            mp = build_provider.codes_packed.shape[1]
            k_row = cfg.row_cap * mp
            fused_packed = jnp.zeros((n_cap, k_row // 128, 128), jnp.uint8)
            # fresh build: construct the packed table directly (the
            # pack-from-layer path holds ~5x the table transiently) and
            # drop the empty [N, R] layer so its lane-padded GB is freed
            adj = _empty_packed_adjacency(n_cap, cfg.row_cap)
            w2t = jnp.zeros((n_cap // 8, 8, 128), jnp.int32)
            counts = graph.base.counts
            entry = graph.entry_node
            num_nodes = graph.num_nodes
            graph = graph._replace(
                layers=(empty_layer(8, cfg.row_cap),) + graph.layers[1:]
            )
            const = (
                build_provider.node_norm2
                if sim == SimilarityFunction.COSINE
                else build_provider.node_w2
            )
            codes_packed = build_provider.codes_packed
            seeds = _EntrySeedSampler(n, w, cfg.build_entry_seeds)
            for start in _shuffled_wave_starts(n, w):
                ids = np.arange(start, start + w, dtype=np.int32)
                ids = np.where(ids < n, ids, -1)
                ids_dev = jnp.asarray(ids)
                wv = _wave_vecs(start, ids_dev)
                bp = dataclasses.replace(
                    build_provider, fused_packed=fused_packed, fused_w2=w2t
                )
                beam_ids, beam_scores = _wave_search(
                    adj, bp, entry, ids_dev, wv, cfg, seeds.sample()
                )
                seeds.record(ids)
                counts, entry, num_nodes, adj_stream, fused_stream = (
                    _wave_update_compute(
                        adj, counts, entry, num_nodes, provider,
                        codes_packed, const, ids_dev, wv,
                        beam_ids, beam_scores, cfg,
                    )
                )
                adj, w2t, fused_packed = _wave_apply_packed(
                    adj, w2t, fused_packed, adj_stream, fused_stream, mp
                )
            if cleanup:
                # enforce on the PACKED layout: contiguous in-place slice
                # updates instead of the unpacked path's whole-table
                # scatter-copy loops (r4: 17.5s -> ~4s of the 1M build)
                if timed:
                    jax.block_until_ready(adj)
                    log.info(
                        "build phase: wave loop %.1fs", _time.time() - t_phase
                    )
                    t_phase = _time.time()
                adj, counts = packed_cleanup(
                    adj, counts, provider, cfg, num_nodes
                )
                enforced = True
            graph = GraphIndex(
                layers=(_unpack_adjacency(adj, counts, cfg.row_cap),)
                + graph.layers[1:],
                level_node_ids=graph.level_node_ids,
                entry_node=entry,
                num_nodes=num_nodes,
                deleted=graph.deleted,
            )
        elif build_provider is not provider:
            # Fused-SQ4 construction: maintain incremental fused code tables
            # so every wave search gathers ONE row per expansion (Q*E rows)
            # instead of one row per scored edge (Q*E*R rows) — row-count-
            # bound XLA gathers were ~60% of round-2 build time.
            mp = build_provider.codes_packed.shape[1]
            k_row = cfg.row_cap * mp
            if k_row % 1024 == 0:
                # rank-3 whole-tile table: kept rank-3 through the WHOLE
                # loop (a 2-D view round-trip would relayout-copy 4 GB per
                # wave once the Pallas call pins the rank-3 layout)
                fused_packed = jnp.zeros((n_cap, k_row // 128, 128), jnp.uint8)
            else:
                fused_packed = jnp.zeros((n_cap, k_row), jnp.uint8)
            fused_w2 = jnp.zeros((n_cap, cfg.row_cap), jnp.float32)
            const = (
                build_provider.node_norm2
                if sim == SimilarityFunction.COSINE
                else build_provider.node_w2
            )
            codes_packed = build_provider.codes_packed
            # multi-seed wave searches: sample extra entry points from the
            # already-inserted prefix HOST-side (the wave schedule is host-
            # known, so no device sync) — see GraphConfig.build_entry_seeds
            seeds = _EntrySeedSampler(n, w, cfg.build_entry_seeds)
            for start in _shuffled_wave_starts(n, w):
                ids = np.arange(start, start + w, dtype=np.int32)
                ids = np.where(ids < n, ids, -1)
                ids_dev = jnp.asarray(ids)
                wv = _wave_vecs(start, ids_dev)
                bp = dataclasses.replace(
                    build_provider, fused_packed=fused_packed, fused_w2=fused_w2
                )
                beam_ids, beam_scores = _wave_search(
                    graph.base.neighbors,
                    bp,
                    graph.entry_node,
                    ids_dev,
                    wv,
                    cfg,
                    seeds.sample(),
                )
                seeds.record(ids)
                graph, fused_packed, fused_w2 = _wave_update_fused(
                    graph,
                    fused_packed,
                    fused_w2,
                    provider,
                    codes_packed,
                    const,
                    ids_dev,
                    wv,
                    beam_ids,
                    beam_scores,
                    cfg,
                )
        else:
            seeds = _EntrySeedSampler(n, w, cfg.build_entry_seeds)
            for start in _shuffled_wave_starts(n, w):
                ids = np.arange(start, start + w, dtype=np.int32)
                ids = np.where(ids < n, ids, -1)
                wv = _wave_vecs(start, jnp.asarray(ids))
                graph = _insert_wave(
                    graph, build_provider, jnp.asarray(ids), wv, cfg,
                    seed_ids=seeds.sample(),
                )
                seeds.record(ids)

        if timed and not enforced:
            jax.block_until_ready(graph.base.neighbors)
            log.info("build phase: wave loop %.1fs", _time.time() - t_phase)
            t_phase = _time.time()
        if cleanup:
            graph = self.cleanup(graph, provider, vectors, enforce=not enforced)
            if timed:
                jax.block_until_ready(graph.base.neighbors)
                log.info("build phase: cleanup %.1fs", _time.time() - t_phase)
                t_phase = _time.time()
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

        cfg = self.config
        n = int(graph.num_nodes)
        levels = assign_levels(n, cfg.max_degree, seed)
        sub_ids = np.where(levels >= 1)[0].astype(np.int32)
        return self.build_hierarchy_from_subset(
            graph, sub_ids, vectors[jnp.asarray(sub_ids)],
            levels[sub_ids], sim,
        )

    def build_hierarchy_from_subset(
        self,
        graph: GraphIndex,
        sub_ids: np.ndarray,  # int32 [S] GLOBAL ordinals with level >= 1
        sub_vectors: jax.Array,  # [S, D] those nodes' full-res vectors
        sub_levels: np.ndarray,  # int32 [S] assigned level of each sub node
        sim: SimilarityFunction,
    ) -> GraphIndex:
        """Attach upper levels given only the LEVEL>=1 nodes' vectors.

        The larger-than-memory build path uses this: upper levels cover
        ~1/max_degree of the corpus (reference ``OnDiskGraphIndex`` keeps
        exactly this slice in memory, ``OnDiskGraphIndex.java:132-162``),
        so their vectors fit on device even when the corpus does not.
        """
        from jvector_tpu.graph.index import empty_layer

        cfg = self.config
        layers = [graph.base]
        node_ids: list[jax.Array] = []
        max_level = int(sub_levels.max()) if len(sub_levels) else 0
        for l in range(1, max_level + 1):
            local = np.where(sub_levels >= l)[0].astype(np.int32)
            if len(local) == 0:
                break
            ids = sub_ids[local]
            if len(local) == 1:
                layers.append(empty_layer(1, cfg.row_cap))
                node_ids.append(jnp.asarray(ids))
                continue
            sub_cfg = dataclasses.replace(
                cfg,
                wave_size=min(cfg.wave_size, max(32, len(local))),
                add_hierarchy=False,
            )
            sub_graph, _ = GraphIndexBuilder(sub_cfg).build(
                sub_vectors[jnp.asarray(local)], sim, cleanup=True
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
        self,
        graph: GraphIndex,
        provider,
        vectors: jax.Array | None = None,
        enforce: bool = True,
    ) -> GraphIndex:
        """Enforce degree + recompute entry point (reference ``cleanup():472-508``).

        ``enforce=False`` skips the degree pass (packed builds already ran
        :func:`packed_cleanup` on the packed layout) and keeps only the
        centroid entry-point selection."""
        cfg = self.config
        n_cap = graph.capacity
        # big chunks amortize the prune's sequential-step overhead (the
        # [B, C] per-step work is tiny; B=4096 keeps the VPU busy) — the
        # cleanup pass was ~25% of 1M build time at chunk 1024
        chunk = min(4096, max(cfg.wave_size, 64))
        for start in range(0, n_cap, chunk) if enforce else ():
            graph = _enforce_chunk(
                graph, provider, jnp.int32(start), cfg, chunk
            )
        if vectors is not None:
            centroid = jnp.mean(vectors, axis=0, keepdims=True)
            qstate = provider.prepare(centroid)
            n = vectors.shape[0]
            # chunked argmax: one full-table score call materializes a
            # [1, n, D] f32 intermediate (5 GB at 10M) — same hazard as
            # the LTM entry scoring (disk/ltm._entry_by_centroid)
            chunk = 1 << 20
            best_score, best_id = -float("inf"), 0
            for a in range(0, n, chunk):
                ids = jnp.arange(a, min(a + chunk, n), dtype=jnp.int32)
                sc = provider.score(qstate, ids[None, :])[0]
                i = int(jnp.argmax(sc))
                s = float(sc[i])
                if s > best_score:
                    best_score, best_id = s, a + i
            graph = graph._replace(entry_node=jnp.int32(best_id))
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
    cand_scores = tie_break_scores(safe_rows, cand_ids, cand_scores)
    cand_ids, cand_scores = dedup_sorted_desc(cand_ids, cand_scores)

    simmat = _prune_simmat(provider, cand_ids)
    p_ids, p_scores, p_count = robust_prune(
        cand_ids, cand_scores, simmat, M, config.alphas, algo=config.prune_algo
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
