"""Bounded-memory graph serving: adjacency + codes stay on HOST.

Reference: the defining disk feature of ``OnDiskGraphIndex`` — beam search
reads each expanded node's record (adjacency + fused codes) from storage
with O(beam) memory (``OnDiskGraphIndex.View:522-645``,
``getPackedNeighbors:593-612`` does ONE contiguous read per expansion).

TPU equivalent: the graph's big arrays (``neighbors [N, R]``,
``fused_packed [N, R, MP]``, ``fused_w2 [N, R]``) live in host RAM as
memmaps of the index file; HBM holds only the wave's beam state (a few MB).
Each iteration:

1. a jitted device step merges the previously streamed expansion rows into
   the beam (exact compare-based dedup, same as the in-HBM searcher) and
   pops the next ``E`` candidates per query,
2. the host fancy-indexes the popped rows out of the memmaps (one
   contiguous row per expansion — the same locality the reference gets
   from one disk seek) and ships them to the device.

The device never holds more than ``[Q, E, R]`` rows of graph data, so the
searchable corpus is bounded by host RAM/disk, not HBM — this is what
serves the 100M larger-than-memory config.  The full-precision rerank tier
(:mod:`jvector_tpu.disk.host_tier`) composes on top.

Hierarchical graphs serve with the reference's exact split
(``OnDiskGraphIndex.java:132-162`` / ``loadInMemoryLayers``): the upper
levels (~1/max_degree of the nodes) plus their SQ4 codes are HBM-resident,
the per-query descent runs entirely on device, and only the L0 beam
streams rows from host.  Flat graphs skip straight to the L0 beam from the
global entry point.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.index import NEG_INF
from jvector_tpu.graph.searcher import (
    BeamState,
    SearchResult,
    _dedup_new,
    _history_len,
    _merge_beam,
)
from jvector_tpu.ops.similarity import SimilarityFunction, normalize_score


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["scale", "offset"],
    meta_fields=["sim"],
)
@dataclasses.dataclass(frozen=True)
class SQ4StreamScorer:
    """Query-side SQ4 math for streamed rows (no device-resident codes)."""

    scale: jax.Array  # [D_pad]
    offset: jax.Array  # [D_pad]
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    def prepare(self, queries: jax.Array):
        q = queries.astype(jnp.float32)
        d = q.shape[-1]
        dp = self.scale.shape[0]
        if d < dp:
            q = jnp.concatenate(
                [q, jnp.zeros(q.shape[:-1] + (dp - d,), q.dtype)], axis=-1
            )
        from jvector_tpu.quantization.sq import group_dims

        if self.sim == SimilarityFunction.EUCLIDEAN:
            qb = q - self.offset
            return group_dims(-2.0 * self.scale * qb), jnp.sum(qb * qb, axis=-1)
        if self.sim == SimilarityFunction.COSINE:
            qn = q / jnp.maximum(
                jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)), 1e-30
            )
            return group_dims(qn * self.scale), jnp.sum(qn * self.offset, axis=-1)
        return group_dims(q * self.scale), jnp.sum(q * self.offset, axis=-1)

    def score_rows(self, qstate, k_packed: jax.Array, w2: jax.Array) -> jax.Array:
        """k_packed ``[Q, C, MP]`` uint8, w2 ``[Q, C]`` -> scores ``[Q, C]``."""
        from jvector_tpu.quantization.sq import unpack_nibble_rows_grouped

        u, c0 = qstate
        k = unpack_nibble_rows_grouped(k_packed).astype(jnp.float32)
        acc = jnp.einsum("qcd,qd->qc", k, u, preferred_element_type=jnp.float32)
        if self.sim == SimilarityFunction.EUCLIDEAN:
            raw = jnp.maximum(acc + c0[:, None] + w2, 0.0)
        elif self.sim == SimilarityFunction.COSINE:
            raw = (acc + c0[:, None]) / jnp.maximum(jnp.sqrt(w2), 1e-30)
        else:
            raw = acc + c0[:, None]
        return normalize_score(raw, self.sim)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["codes", "w2", "scorer"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _SlotSQ4Provider:
    """SQ4 scoring over a device-resident SLOT-indexed code block.

    The upper-level descent's provider: levels address nodes by slot (the
    level's own 0..nl-1 space), and the level's codes are small enough to
    live in HBM (~1/max_degree of the corpus), so scoring is one local
    gather + the stream scorer's arithmetic ADC."""

    codes: jax.Array  # [nl, MP] uint8
    w2: jax.Array  # [nl] float32
    scorer: SQ4StreamScorer

    def prepare(self, queries: jax.Array):
        return self.scorer.prepare(queries)

    def score(self, qstate, slot_ids: jax.Array) -> jax.Array:
        return self.scorer.score_rows(
            qstate, self.codes[slot_ids], self.w2[slot_ids]
        )


@partial(jax.jit, static_argnames=("expand",), donate_argnums=(0,))
def _host_step(
    state: BeamState,
    scorer: SQ4StreamScorer,
    qstate,
    sel_prev: jax.Array,  # int32 [Q, E] (-1 = inactive)
    nbrs: jax.Array,  # int32 [Q, E, R] rows for sel_prev
    k_rows: jax.Array,  # uint8 [Q, E, R, MP]
    w2_rows: jax.Array,  # float32 [Q, E, R]
    expand: int,
):
    """Merge the streamed expansion, then pop the next E candidates."""
    Q, E, R = nbrs.shape
    active_prev = sel_prev >= 0

    flat_nbrs = nbrs.reshape(Q, E * R)
    valid = (flat_nbrs >= 0) & jnp.repeat(active_prev, R, axis=1)
    flat_nbrs = jnp.where(valid, flat_nbrs, -1)
    fresh = valid & _dedup_new(flat_nbrs, state.ids, state.history)
    scores = scorer.score_rows(
        qstate, k_rows.reshape(Q, E * R, -1), w2_rows.reshape(Q, E * R)
    )
    new_scores = jnp.where(fresh, scores, NEG_INF)
    new_ids = jnp.where(fresh, flat_nbrs, -1)
    ids2, scores2, expanded2 = _merge_beam(
        state.ids, state.scores, state.expanded, new_ids, new_scores
    )

    # pop phase
    sel_scores = jnp.where(~expanded2, scores2, NEG_INF)
    top_scores, sel_idx = jax.lax.top_k(sel_scores, expand)
    active = top_scores > NEG_INF
    sel_ids = jnp.take_along_axis(ids2, sel_idx, axis=1)
    L = ids2.shape[1]
    hit = jnp.any(
        (jnp.arange(L, dtype=jnp.int32)[None, :, None] == sel_idx[:, None, :])
        & active[:, None, :],
        axis=2,
    )
    pos = (state.iters * expand) % state.history.shape[1]
    history = jax.lax.dynamic_update_slice(
        state.history, jnp.where(active, sel_ids, -1), (jnp.int32(0), pos)
    )
    new_state = BeamState(
        ids=ids2,
        scores=scores2,
        expanded=expanded2 | hit,
        history=history,
        visited_count=state.visited_count + jnp.sum(fresh, axis=1).astype(jnp.int32),
        expanded_count=state.expanded_count
        + jnp.sum(active, axis=1).astype(jnp.int32),
        iters=state.iters + 1,
        stale=state.stale,
    )
    return new_state, jnp.where(active, sel_ids, -1)


@partial(jax.jit, static_argnames=("expand",), donate_argnums=(0, 1, 2))
def _host_step_filtered(
    state: BeamState,
    res_ids: jax.Array,  # int32 [Q, K] ACCEPTED results channel (desc)
    res_scores: jax.Array,  # float32 [Q, K]
    scorer: SQ4StreamScorer,
    qstate,
    sel_prev: jax.Array,
    nbrs: jax.Array,
    acc_bits: jax.Array,  # bool [Q, E, R] accept mask of the streamed nbrs
    k_rows: jax.Array,
    w2_rows: jax.Array,
    expand: int,
):
    """Filtered (acceptOrds) variant of :func:`_host_step`.

    Same in-loop semantics as the in-HBM searcher's filtered mode
    (``graph/searcher.py``, reference ``GraphSearcher.java:406-457``): the
    beam traverses accepted and non-accepted nodes alike, ACCEPTED
    discoveries accumulate in a dedicated top-K channel, popped slots
    leave the beam (pure frontier — results live in the channel), and
    candidates retire once they cannot beat the worst accepted result.
    The accept bits ride the same host gather as the adjacency rows.
    """
    Q, E, R = nbrs.shape
    active_prev = sel_prev >= 0

    flat_nbrs = nbrs.reshape(Q, E * R)
    acc = acc_bits.reshape(Q, E * R)
    valid = (flat_nbrs >= 0) & jnp.repeat(active_prev, R, axis=1)
    flat_nbrs = jnp.where(valid, flat_nbrs, -1)
    fresh = valid & _dedup_new(flat_nbrs, state.ids, state.history)
    scores = scorer.score_rows(
        qstate, k_rows.reshape(Q, E * R, -1), w2_rows.reshape(Q, E * R)
    )
    # accepted discoveries -> result channel.  The merge DEDUPS by id:
    # filtered searches expand far past the history ring's capacity, so
    # purged nodes get re-admitted as "fresh" — without dedup the
    # duplicates crowd the channel and inflate the retirement floor
    # (measured: recall 0.44 vs 1.0 at 5% selectivity).
    from jvector_tpu.graph.diversity import dedup_sorted_desc

    ch_ids = jnp.concatenate(
        [res_ids, jnp.where(fresh & acc, flat_nbrs, -1)], axis=1
    )
    ch_sc = jnp.concatenate(
        [res_scores, jnp.where(fresh & acc, scores, NEG_INF)], axis=1
    )
    d_ids, d_sc = dedup_sorted_desc(ch_ids, ch_sc)
    res_ids2, res_scores2 = d_ids[:, : res_ids.shape[1]], d_sc[:, : res_ids.shape[1]]

    new_scores = jnp.where(fresh, scores, NEG_INF)
    new_ids = jnp.where(fresh, flat_nbrs, -1)
    ids2, scores2, expanded2 = _merge_beam(
        state.ids, state.scores, state.expanded, new_ids, new_scores
    )

    # pop phase with the filtered stop rule: only candidates that can still
    # beat the worst accepted result stay poppable (worst = NEG_INF while
    # the channel is not yet full, so nothing retires early)
    worst = res_scores2[:, -1]
    sel_scores = jnp.where(
        ~expanded2 & (scores2 > worst[:, None]), scores2, NEG_INF
    )
    top_scores, sel_idx = jax.lax.top_k(sel_scores, expand)
    active = top_scores > NEG_INF
    sel_ids = jnp.take_along_axis(ids2, sel_idx, axis=1)
    L = ids2.shape[1]
    hit = jnp.any(
        (jnp.arange(L, dtype=jnp.int32)[None, :, None] == sel_idx[:, None, :])
        & active[:, None, :],
        axis=2,
    )
    pos = (state.iters * expand) % state.history.shape[1]
    history = jax.lax.dynamic_update_slice(
        state.history, jnp.where(active, sel_ids, -1), (jnp.int32(0), pos)
    )
    new_state = BeamState(
        ids=jnp.where(hit, -1, ids2),  # popped slots leave the frontier
        scores=jnp.where(hit, NEG_INF, scores2),
        expanded=expanded2 & ~hit,
        history=history,
        visited_count=state.visited_count + jnp.sum(fresh, axis=1).astype(jnp.int32),
        expanded_count=state.expanded_count
        + jnp.sum(active, axis=1).astype(jnp.int32),
        iters=state.iters + 1,
        stale=state.stale,
    )
    return new_state, res_ids2, res_scores2, jnp.where(active, sel_ids, -1)


@dataclasses.dataclass
class HostGraphIndex:
    """SQ4-fused graph whose arrays live on host (memmap-friendly)."""

    neighbors: np.ndarray  # [N, R] int32
    fused_packed: np.ndarray  # [N, R*MP] uint8 (2-D, matches the provider)
    fused_w2: np.ndarray  # [N, R] float32
    codes_packed: np.ndarray  # [N, MP] uint8 (entry scoring)
    node_const: np.ndarray  # [N] float32 (w2 or norm2 per sim)
    scale: np.ndarray  # [D_pad]
    offset: np.ndarray  # [D_pad]
    entry_node: int
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN
    deleted: np.ndarray | None = None  # [N] bool
    rerank_store: "object | None" = None  # HostVectorStore from inline vectors
    # hierarchy (empty = flat): per level l >= 1, the level's SLOT-space
    # adjacency and its global node ordinals.  These are tiny
    # (~1/max_degree^l of the corpus) and go HBM-resident at first search —
    # the reference's loadInMemoryLayers split (OnDiskGraphIndex.java:132-162).
    upper_neighbors: tuple = ()  # np [nl, R] int32 per level
    upper_node_ids: tuple = ()  # np [nl] int32 per level (ascending)

    @staticmethod
    def load(path) -> "HostGraphIndex":
        """Memmap the graph + fused-SQ4 feature straight off an index file."""
        from jvector_tpu.disk.format import FeatureId, load_index

        idx = load_index(path)
        r = idx.reader
        f = f"feature/{FeatureId.FUSED_SQ4}"
        sim = SimilarityFunction.parse(idx.meta.get("similarity", "euclidean"))
        deleted = (
            r.read("graph/deleted", mmap=True)
            if r.has_array("graph/deleted")
            else None
        )
        upper_n, upper_ids = [], []
        for l in range(1, int(idx.meta.get("num_levels", 1))):
            upper_n.append(np.asarray(r.read(f"graph/L{l}/neighbors")))
            upper_ids.append(np.asarray(r.read(f"graph/L{l}/node_ids")))
        # inline full-res vectors present -> default two-pass serving (the
        # reference's on-disk contract: beam on codes, topK reranked exact,
        # OnDiskGraphIndex.View.getVectorInto); stays a host memmap, only
        # [Q, rerank_k] rows ever reach the device
        inline = f"feature/{FeatureId.INLINE_VECTORS}/vectors"
        store = None
        if r.has_array(inline):
            from jvector_tpu.disk.host_tier import HostVectorStore

            store = HostVectorStore.from_index_file(r, inline, sim)
        from jvector_tpu.disk.format import _read_l0_neighbors

        return HostGraphIndex(
            # version-dispatching read: v3 paired files unpack to [N, R]
            # (plain files stay zero-copy memmaps)
            neighbors=_read_l0_neighbors(r, mmap=True),
            fused_packed=r.read(f"{f}/fused_packed", mmap=True),
            fused_w2=r.read(f"{f}/fused_w2", mmap=True),
            codes_packed=r.read(f"{f}/codes_packed", mmap=True),
            node_const=r.read(f"{f}/node_const", mmap=True),
            scale=np.asarray(r.read(f"{f}/scale")),
            offset=np.asarray(r.read(f"{f}/offset")),
            entry_node=int(idx.meta["entry_node"]),
            sim=sim,
            deleted=deleted,
            rerank_store=store,
            upper_neighbors=tuple(upper_n),
            upper_node_ids=tuple(upper_ids),
        )

    def _upper_device(self) -> list:
        """Upload the upper levels once (adjacency + codes + consts)."""
        dev = getattr(self, "_upper_dev", None)
        if dev is None:
            dev = []
            for nbrs, ids in zip(self.upper_neighbors, self.upper_node_ids):
                safe = np.minimum(ids, self.codes_packed.shape[0] - 1)
                dev.append(
                    {
                        "nbrs": jnp.asarray(nbrs),
                        "ids": jnp.asarray(ids),
                        "codes": jnp.asarray(
                            np.ascontiguousarray(self.codes_packed[safe])
                        ),
                        "w2": jnp.asarray(
                            np.ascontiguousarray(self.node_const[safe])
                        ),
                    }
                )
            object.__setattr__(self, "_upper_dev", dev)
        return dev

    def _descend(
        self, scorer: SQ4StreamScorer, queries: jax.Array, hierarchy_beam: int = 1
    ) -> np.ndarray:
        """Device descent through the upper levels -> per-query L0 entries.

        Same structure as the in-HBM ``_descend_hierarchy`` (score ALL
        top-level nodes, then a narrow beam per middle level), but over the
        HBM-resident level code blocks — zero host round-trips per level.
        """
        from jvector_tpu.graph.searcher import search_layer

        dev = self._upper_device()
        qstate = scorer.prepare(queries)
        Q = queries.shape[0]
        top = dev[-1]
        n_top = top["ids"].shape[0]
        sc = scorer.score_rows(
            qstate,
            jnp.broadcast_to(top["codes"][None], (Q,) + top["codes"].shape),
            jnp.broadcast_to(top["w2"][None], (Q, n_top)),
        )
        if self.deleted is not None:
            dead = jnp.asarray(np.asarray(self.deleted)[np.asarray(
                self.upper_node_ids[-1]
            )])
            sc = jnp.where(dead[None, :], NEG_INF, sc)
        best = top["ids"][jnp.argmax(sc, axis=1)]
        best = jnp.where(
            jnp.max(sc, axis=1) > NEG_INF, best, jnp.int32(self.entry_node)
        )
        for l in range(len(dev) - 2, -1, -1):
            lv = dev[l]
            provider = _SlotSQ4Provider(
                codes=lv["codes"], w2=lv["w2"], scorer=scorer
            )
            # slots_for: level ids are ascending (np.where order), so the
            # searchsorted mapping from global ordinals to slots applies
            from jvector_tpu.graph.hierarchy import slots_for

            entry_slots = slots_for(lv["ids"], best)
            beam = search_layer(
                lv["nbrs"],
                provider,
                qstate,
                entry_slots,
                beam_width=max(1, hierarchy_beam),
                max_iters=64,
            )
            top_slot = jnp.clip(beam.ids[:, 0], 0, lv["ids"].shape[0] - 1)
            best = lv["ids"][top_slot]
        return np.asarray(best, np.int32)

    def hbm_bytes(self, n_queries: int, beam_width: int, expand: int) -> int:
        """Device working-set estimate: beam state + one streamed expansion."""
        q, l = n_queries, beam_width
        r = self.neighbors.shape[1]
        mp = self.fused_packed.shape[1] // r
        t = 256  # history ring order of magnitude
        beam = q * l * (4 + 4 + 1) + q * t * 4
        streamed = q * expand * r * (4 + mp + 4)
        return beam + streamed

    def _filtered_brute(
        self, queries, top_k, acc_ids, beam_width, rerank, threshold
    ) -> SearchResult:
        """Exact evaluation of a small accepted set: one host gather of the
        A accepted code rows, one device scoring pass, optional rerank."""
        from jvector_tpu.util.native import gather_rows

        scorer = SQ4StreamScorer(
            scale=jnp.asarray(self.scale),
            offset=jnp.asarray(self.offset),
            sim=self.sim,
        )
        queries = jnp.asarray(queries)
        Q = queries.shape[0]
        A = 1 << max(4, int(max(acc_ids.size, top_k) - 1).bit_length())
        ids = np.full(A, -1, np.int32)
        ids[: acc_ids.size] = acc_ids
        safe = np.maximum(ids, 0)
        k_rows = jnp.asarray(gather_rows(self.codes_packed, safe))
        w2 = jnp.asarray(np.ascontiguousarray(self.node_const[safe]))
        sc = _host_brute_score(scorer, queries, k_rows, w2, jnp.asarray(ids >= 0))
        k1 = min(max(top_k, beam_width if rerank is not None else top_k), A)
        approx, idx = jax.lax.top_k(sc, k1)
        pick = jnp.take_along_axis(
            jnp.broadcast_to(jnp.asarray(ids)[None], (Q, A)), idx, axis=1
        )
        pick = jnp.where(approx > NEG_INF, pick, -1)
        res = SearchResult(
            ids=pick,
            scores=approx,
            visited_count=jnp.full((Q,), int(acc_ids.size), jnp.int32),
            expanded_count=jnp.zeros((Q,), jnp.int32),
            reranked_count=jnp.zeros((Q,), jnp.int32),
            approx_scores=approx,
        )
        if rerank is not None:
            res = rerank.rerank(queries, res, top_k)
        else:
            res = res._replace(
                ids=pick[:, :top_k],
                scores=approx[:, :top_k],
                approx_scores=approx[:, :top_k],
            )
        if threshold > 0.0:
            ok = res.scores >= threshold
            res = res._replace(
                ids=jnp.where(ok, res.ids, -1),
                scores=jnp.where(ok, res.scores, NEG_INF),
            )
        return res

    def search(
        self,
        queries: jax.Array,
        top_k: int,
        beam_width: int = 64,
        expand: int = 4,
        max_iters: int = 200,
        rerank=None,  # HostVectorStore | None (default: the index's inline
        #   vectors when present) | False to force single-pass
        pipeline: int = 2,
        accept: "np.ndarray | None" = None,  # bool [N] acceptOrds mask
        threshold: float = 0.0,  # drop results scoring below this similarity
        accept_brute_cutoff: int | None = None,
        hierarchy_beam: int = 1,  # descent beam width (hierarchical indexes)
    ) -> SearchResult:
        """Wave beam search streaming graph rows from host per iteration.

        ``pipeline`` splits the query wave into that many phase-shifted
        sub-waves: while one lane's jitted step runs on the device, the
        OTHER lane's rows are gathered on the host, so the host "disk
        read" overlaps device compute instead of strictly alternating
        (the reference gets the same overlap from per-searcher reader
        threads, ``OnDiskGraphIndex.View:522-645``).  ``pipeline=1``
        restores the serial loop.

        ``accept`` runs the IN-LOOP filtered search (selective acceptOrds,
        same semantics as the in-HBM searcher): accepted results
        accumulate in a dedicated channel while the beam keeps expanding
        until no candidate can beat the worst accepted result — a
        low-cardinality filter still returns a full result set.
        """
        from jvector_tpu.util.native import gather_rows

        if rerank is None:
            rerank = self.rerank_store  # two-pass by default when available
        elif rerank is False:
            rerank = None
        acc_full = None
        if accept is not None:
            acc_full = np.zeros(self.neighbors.shape[0], bool)
            a = np.asarray(accept, bool)
            acc_full[: a.shape[0]] = a
            if self.deleted is not None:
                acc_full &= ~np.asarray(self.deleted)
            # low-cardinality cutoff (same rationale + default as the
            # in-HBM searcher / Cassandra SAI): exact evaluation of a small
            # accepted set beats traversal and is immune to the skewed
            # far-island geometry.  One host gather of A code rows.
            acc_ids = np.flatnonzero(acc_full)
            cutoff = (
                max(4 * beam_width, 512)
                if accept_brute_cutoff is None
                else accept_brute_cutoff
            )
            if acc_ids.size <= cutoff:
                return self._filtered_brute(
                    queries, top_k, acc_ids, beam_width, rerank, threshold
                )
        scorer = SQ4StreamScorer(
            scale=jnp.asarray(self.scale),
            offset=jnp.asarray(self.offset),
            sim=self.sim,
        )
        queries = jnp.asarray(queries)
        Q = queries.shape[0]
        L = beam_width
        # filtered searches expand far past quiescence; size the dedup ring
        # like the in-HBM filtered mode (2x beam)
        T = _history_len(expand, max_iters, (2 * L) if acc_full is not None else L, None)
        K = max(top_k, beam_width)  # filtered result-channel width
        R = self.neighbors.shape[1]
        mp = self.fused_packed.shape[1] // R
        n_lanes = max(1, min(pipeline, Q))
        # balanced contiguous lane split (equal sizes share one compile)
        cuts = [Q * i // n_lanes for i in range(n_lanes + 1)]

        # per-query L0 entry points: hierarchical indexes descend the
        # HBM-resident upper levels (per-query entries), flat indexes seed
        # every query at the global entry
        if self.upper_node_ids:
            entries_np = self._descend(scorer, queries, hierarchy_beam)
        else:
            entries_np = np.full(Q, self.entry_node, np.int32)

        class _Lane:
            pass

        lanes = []
        for a, b in zip(cuts[:-1], cuts[1:]):
            ln = _Lane()
            ln.a, ln.b = a, b
            qn = b - a
            ln.qstate = scorer.prepare(queries[a:b])
            e_ids_np = entries_np[a:b]
            e_ids = jnp.asarray(e_ids_np)
            e_k = jnp.asarray(gather_rows(self.codes_packed, e_ids_np))
            e_w2 = jnp.asarray(np.ascontiguousarray(self.node_const[e_ids_np]))
            e_score = scorer.score_rows(
                ln.qstate, e_k[:, None, :], e_w2[:, None]
            )
            ln.state = BeamState(
                ids=jnp.full((qn, L), -1, jnp.int32).at[:, 0].set(e_ids),
                scores=jnp.full((qn, L), NEG_INF).at[:, 0].set(e_score[:, 0]),
                expanded=jnp.zeros((qn, L), bool),
                history=jnp.full((qn, T), -1, jnp.int32),
                visited_count=jnp.ones((qn,), jnp.int32),
                expanded_count=jnp.zeros((qn,), jnp.int32),
                iters=jnp.int32(0),
                stale=None,
            )
            ln.done = False
            empty = (
                jnp.full((qn, expand), -1, jnp.int32),
                jnp.full((qn, expand, R), -1, jnp.int32),
                jnp.zeros((qn, expand, R, mp), jnp.uint8),
                jnp.zeros((qn, expand, R), jnp.float32),
            )
            if acc_full is not None:
                # accepted-results channel, seeded with each query's entry
                # when that entry passes the filter
                entry_ok = jnp.asarray(acc_full[e_ids_np])
                ln.res_ids = (
                    jnp.full((qn, K), -1, jnp.int32)
                    .at[:, 0].set(jnp.where(entry_ok, e_ids, -1))
                )
                ln.res_scores = (
                    jnp.full((qn, K), NEG_INF)
                    .at[:, 0].set(jnp.where(entry_ok, e_score[:, 0], NEG_INF))
                )
                # EXACT per-query popped-set (host bitset, N/8 bytes/query):
                # filtered searches run far past the device history ring's
                # capacity, and a forgotten pop re-entering the purged
                # frontier re-pops forever (measured: 8000 pops, no
                # termination, holes at 1% selectivity).  Masking streamed
                # neighbors against the popped set restores the reference's
                # exact-visited termination guarantee; dropped-but-unpopped
                # candidates stay re-discoverable (same as the in-HBM ring).
                ln.popped = np.zeros(
                    (qn, (self.neighbors.shape[0] + 7) // 8), np.uint8
                )
                ln.popped[np.arange(qn), e_ids_np >> 3] |= (
                    np.uint8(1) << (e_ids_np & 7).astype(np.uint8)
                )
                ln.state, ln.res_ids, ln.res_scores, ln.sel_dev = (
                    _host_step_filtered(
                        ln.state, ln.res_ids, ln.res_scores, scorer, ln.qstate,
                        empty[0], empty[1],
                        jnp.zeros((qn, expand, R), bool), empty[2], empty[3],
                        expand,
                    )
                )
            else:
                # prologue dispatch: merge nothing, pop the entry
                ln.state, ln.sel_dev = _host_step(
                    ln.state, scorer, ln.qstate, *empty, expand
                )
            lanes.append(ln)

        for _ in range(max_iters):
            if all(ln.done for ln in lanes):
                break
            for ln in lanes:
                if ln.done:
                    continue
                qn = ln.b - ln.a
                sel_np = np.asarray(ln.sel_dev)  # blocks THIS lane's step
                if (sel_np < 0).all():
                    ln.done = True
                    continue
                safe = np.minimum(
                    np.maximum(sel_np, 0), self.neighbors.shape[0] - 1
                ).reshape(-1)
                # the host-side "disk read" — one contiguous row per
                # expansion, parallel memcpy; the other lane's device step
                # (dispatched below last round) runs concurrently
                nbrs_np = gather_rows(self.neighbors, safe).reshape(qn, expand, R)
                rows_d = jnp.asarray(
                    gather_rows(self.fused_packed, safe).reshape(qn, expand, R, mp)
                )
                w2_d = jnp.asarray(
                    gather_rows(self.fused_w2, safe).reshape(qn, expand, R)
                )
                if acc_full is not None:
                    # mark this round's pops in the exact popped-set, and
                    # drop streamed neighbors that were already popped (they
                    # were purged from the frontier and must never return)
                    qi = np.repeat(np.arange(qn), expand)
                    pops = sel_np.reshape(-1)
                    ok = pops >= 0
                    np.bitwise_or.at(
                        ln.popped,
                        (qi[ok], pops[ok] >> 3),
                        np.uint8(1) << (pops[ok] & 7).astype(np.uint8),
                    )
                    safe_n = np.maximum(nbrs_np, 0)
                    seen = (
                        ln.popped[
                            np.arange(qn)[:, None, None], safe_n >> 3
                        ]
                        >> (safe_n & 7)
                    ) & 1
                    nbrs_np = np.where(
                        (nbrs_np >= 0) & (seen == 0), nbrs_np, -1
                    )
                    nbrs_d = jnp.asarray(nbrs_np)
                    # accept bits ride the same host gather as the rows
                    acc_d = jnp.asarray(
                        acc_full[np.maximum(nbrs_np, 0)] & (nbrs_np >= 0)
                    )
                    ln.state, ln.res_ids, ln.res_scores, ln.sel_dev = (
                        _host_step_filtered(
                            ln.state, ln.res_ids, ln.res_scores, scorer,
                            ln.qstate, jnp.asarray(sel_np), nbrs_d, acc_d,
                            rows_d, w2_d, expand,
                        )
                    )
                else:
                    ln.state, ln.sel_dev = _host_step(
                        ln.state, scorer, ln.qstate, jnp.asarray(sel_np),
                        jnp.asarray(nbrs_np), rows_d, w2_d, expand,
                    )

        state = BeamState(
            ids=jnp.concatenate([ln.state.ids for ln in lanes]),
            scores=jnp.concatenate([ln.state.scores for ln in lanes]),
            expanded=jnp.concatenate([ln.state.expanded for ln in lanes]),
            history=jnp.concatenate([ln.state.history for ln in lanes]),
            visited_count=jnp.concatenate(
                [ln.state.visited_count for ln in lanes]
            ),
            expanded_count=jnp.concatenate(
                [ln.state.expanded_count for ln in lanes]
            ),
            iters=lanes[0].state.iters,
            stale=None,
        )
        def _apply_threshold(res: SearchResult) -> SearchResult:
            # result contract of the reference's threshold search: results
            # below the similarity threshold are dropped (the reference
            # additionally early-terminates via ScoreTracker; the host loop
            # terminates on frontier exhaustion either way)
            if threshold <= 0.0:
                return res
            ok = res.scores >= threshold
            return res._replace(
                ids=jnp.where(ok, res.ids, -1),
                scores=jnp.where(ok, res.scores, NEG_INF),
            )

        if acc_full is not None:
            # filtered: results come from the accepted channel (already
            # sorted desc, deleted folded into the mask)
            ids = jnp.concatenate([ln.res_ids for ln in lanes])
            scores = jnp.concatenate([ln.res_scores for ln in lanes])
            k_out = K if rerank is not None else top_k
            approx = SearchResult(
                ids=ids[:, :k_out],
                scores=scores[:, :k_out],
                visited_count=state.visited_count,
                expanded_count=state.expanded_count,
                reranked_count=jnp.zeros((Q,), jnp.int32),
                approx_scores=scores[:, :k_out],
            )
            if rerank is not None:
                return _apply_threshold(
                    rerank.rerank(jnp.asarray(queries), approx, top_k)
                )
            return _apply_threshold(approx)
        ids, scores = state.ids, state.scores
        if self.deleted is not None and self.deleted.any():
            dead = jnp.asarray(self.deleted)[jnp.maximum(ids, 0)] & (ids >= 0)
            ids = jnp.where(dead, -1, ids)
            scores = jnp.where(dead, NEG_INF, scores)
        order = jnp.argsort(-scores, axis=1)
        k_out = beam_width if rerank is not None else top_k
        out_ids = jnp.take_along_axis(ids, order, axis=1)[:, :k_out]
        out_scores = jnp.take_along_axis(scores, order, axis=1)[:, :k_out]
        approx = SearchResult(
            ids=out_ids,
            scores=out_scores,
            visited_count=state.visited_count,
            expanded_count=state.expanded_count,
            reranked_count=jnp.zeros((Q,), jnp.int32),
            approx_scores=out_scores,
        )
        if rerank is not None:
            return _apply_threshold(
                rerank.rerank(jnp.asarray(queries), approx, top_k)
            )
        return _apply_threshold(
            approx._replace(
                ids=approx.ids[:, :top_k],
                scores=approx.scores[:, :top_k],
                approx_scores=approx.scores[:, :top_k],
            )
        )


@jax.jit
def _host_brute_score(scorer, queries, k_rows, w2, valid):
    """Score all candidate code rows for every query (SQ4StreamScorer is a
    registered pytree, so one compile per shape bucket)."""
    qstate = scorer.prepare(queries)
    Q = queries.shape[0]
    A = k_rows.shape[0]
    sc = scorer.score_rows(
        qstate,
        jnp.broadcast_to(k_rows[None], (Q,) + k_rows.shape),
        jnp.broadcast_to(w2[None], (Q, A)),
    )
    return jnp.where(valid[None], sc, NEG_INF)


@dataclasses.dataclass
class ShardedHostIndex:
    """Bounded-memory serving over a sharded-LTM directory.

    The 100M serve tier (BASELINE config 5): every shard is a self-
    contained :class:`HostGraphIndex` (adjacency + fused codes memmapped,
    O(wave x beam) HBM) built by
    :func:`jvector_tpu.parallel.build.sharded_build_on_disk`; a query wave
    searches each shard and the per-shard topK merge by score — the
    reference's multi-segment search lifecycle
    (``GraphSearcher.java:386-404``) over segment files.

    Shards are searched sequentially HERE (one host); a deployment runs
    one shard per host and merges the same per-shard ``SearchResult``s —
    the merge is pure (ids are globalized by shard offset, scores are
    exact after the default per-shard rerank, hence comparable without a
    shared quantizer).
    """

    shards: list[HostGraphIndex]
    offsets: list[int]  # global ordinal of each shard's local node 0
    n_total: int

    @staticmethod
    def load(directory) -> "ShardedHostIndex":
        import json
        import os

        directory = os.fspath(directory)
        with open(os.path.join(directory, "manifest.json")) as f:
            man = json.load(f)
        shards = [
            HostGraphIndex.load(os.path.join(directory, fname))
            for fname in man["shards"]
        ]
        offsets = [s * man["n_local"] for s in range(man["n_shards"])]
        return ShardedHostIndex(
            shards=shards, offsets=offsets, n_total=man["n_total"]
        )

    def search(
        self,
        queries: jax.Array,
        top_k: int,
        beam_width: int = 64,
        expand: int = 4,
        max_iters: int = 200,
        rerank=None,  # forwarded per shard (None = each shard's inline store)
        pipeline: int = 2,
        accept: "np.ndarray | None" = None,  # bool [n_total] GLOBAL mask
        threshold: float = 0.0,
        accept_brute_cutoff: int | None = None,
    ) -> SearchResult:
        """Search every shard, globalize ids, merge the topK by score.

        ``accept`` is a global-ordinal mask; each shard runs the in-loop
        filtered search on its slice (shards with zero accepted nodes are
        skipped outright).
        """
        acc = None if accept is None else np.asarray(accept, bool)
        # per-shard VALID node count (not array capacity: shard containers
        # are padded to a shared compile bucket, so slicing the global mask
        # by hg.neighbors.shape[0] would bleed the next shard's accept bits
        # onto this shard's padding ordinals); the dataclass is publicly
        # constructible with NON-uniform offsets (one-shard-per-host
        # deployments), so each shard's bound is the next offset, not a
        # single uniform step
        per, offs = [], []
        for i, (hg, off) in enumerate(zip(self.shards, self.offsets)):
            end = (
                self.offsets[i + 1]
                if i + 1 < len(self.offsets)
                else self.n_total
            )
            acc_s = None
            if acc is not None:
                acc_s = acc[off:end]
                if not acc_s.any():
                    continue  # nothing in this shard can be returned
            per.append(
                hg.search(
                    queries,
                    top_k=top_k,
                    beam_width=beam_width,
                    expand=expand,
                    max_iters=max_iters,
                    rerank=rerank,
                    pipeline=pipeline,
                    accept=acc_s,
                    threshold=threshold,
                    accept_brute_cutoff=accept_brute_cutoff,
                )
            )
            offs.append(off)
        if not per:  # empty filter: nothing anywhere can be returned
            Q = np.asarray(queries).shape[0]
            z = jnp.zeros((Q,), jnp.int32)
            return SearchResult(
                ids=jnp.full((Q, top_k), -1, jnp.int32),
                scores=jnp.full((Q, top_k), NEG_INF),
                visited_count=z, expanded_count=z, reranked_count=z,
                approx_scores=jnp.full((Q, top_k), NEG_INF),
            )
        ids = jnp.concatenate(
            [jnp.where(r.ids >= 0, r.ids + off, -1) for r, off in zip(per, offs)],
            axis=1,
        )
        scores = jnp.concatenate([r.scores for r in per], axis=1)
        approx = jnp.concatenate(
            [
                r.approx_scores if r.approx_scores is not None else r.scores
                for r in per
            ],
            axis=1,
        )
        order = jnp.argsort(-scores, axis=1)[:, :top_k]
        return SearchResult(
            ids=jnp.take_along_axis(ids, order, axis=1),
            scores=jnp.take_along_axis(scores, order, axis=1),
            visited_count=sum(r.visited_count for r in per),
            expanded_count=sum(r.expanded_count for r in per),
            reranked_count=sum(r.reranked_count for r in per),
            approx_scores=jnp.take_along_axis(approx, order, axis=1),
        )


def write_sq4_index(path, graph, sq, codes_packed, provider, sim, **extra_features):
    """Persist a graph + fused-SQ4 feature for host-tier serving.

    ``provider`` is the :class:`SQ4ScoreProvider` whose fused tables were
    built against ``graph.base.neighbors`` (ids must correspond; pass
    ``renumber=False`` graphs or renumber before building the provider).
    """
    from jvector_tpu.disk.format import FeatureId, write_index

    sim = SimilarityFunction.parse(sim)
    const = (
        provider.node_norm2 if sim == SimilarityFunction.COSINE else provider.node_w2
    )
    feats = {
        FeatureId.FUSED_SQ4: {
            "codes_packed": np.asarray(codes_packed),
            "node_const": np.asarray(const),
            "fused_packed": np.asarray(provider.fused_packed),
            "fused_w2": np.asarray(provider.fused_w2),
            "scale": np.asarray(provider.scale),
            "offset": np.asarray(provider.offset),
        }
    }
    feats.update(extra_features)
    write_index(
        path, graph, features=feats, renumber=False, similarity=sim.value
    )
