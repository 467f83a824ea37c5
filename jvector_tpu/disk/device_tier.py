"""HBM-resident bounded-memory serving tier (the fast 10M-per-chip mode).

The host tier (:mod:`jvector_tpu.disk.host_graph`) bounds DEVICE memory by
streaming rows from host RAM per wave — correct at any scale, but every wave
pays the host link (7-44 QPS at 10M over a PCIe-class tunnel).  This module
is the other end of the memory/speed trade: the index's *small* arrays stay
resident in HBM and searches never touch the host at all.

What fits at 10M x 128d on one 16 GB chip:

- paired-row adjacency ``int32 [N/2, 2R]`` — two nodes per physical row.
  A plain ``[N, R<=64]`` int32 table lane-pads 2x on TPU (min tile minor
  128), so pairing halves the footprint: 2.56 GB instead of 5.1 GB.
- SQ4 augmented code rows ``uint8 [N, MP+4]`` (codes + per-node constant in
  ONE gatherable row) — 1.3 GB.
- rerank vectors, bfloat16 ``[N, D]`` — 2.4 GB (f32 optional at 4.8 GB).
- hierarchy levels (~3% of nodes) — ~0.2 GB.

Total ~6.5 GB: the first pass, the hierarchy descent AND the rerank all run
on-device, so serving throughput is the on-chip search rate, not the link.

Reference parity: this is the TPU answer to ``OnDiskGraphIndex``'s
memory/disk split (``OnDiskGraphIndex.java:132-162`` keeps upper layers +
hot state in memory, streams L0 records through the page cache).  On TPU
the "page cache" is HBM and the capacity cliff is explicit, so the engine
offers both tiers: this one while the compact arrays fit (~30M x 128d per
16 GB chip), the host tier beyond it.

The fused SQ4 table (``R * MP`` bytes/node — 41 GB at 10M) deliberately
does NOT load: non-fused scoring gathers one aug row per *candidate*
instead of one fused row per *expansion*.  That is R times more gathered
rows per iteration, but XLA row gathers are row-count bound (~14 ns/row),
and ~65k rows/iteration is ~1 ms — the fused layout's win only matters
when it also fits.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.index import NEG_INF, GraphIndex, GraphLayer
from jvector_tpu.graph.score import ExactScoreProvider, SQ4ScoreProvider
from jvector_tpu.graph.searcher import (
    SearchResult,
    _descend_hierarchy,
    _repack_tail,
    search_layer,
)
from jvector_tpu.ops.similarity import SimilarityFunction

logger = logging.getLogger(__name__)


def _register(cls, data_fields, meta_fields):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=data_fields,
        meta_fields=meta_fields,
    )(cls)


def pack_adjacency_pairs_host(neighbors: np.ndarray, r_pad: int) -> np.ndarray:
    """``[N, R]`` int32 (-1 padded) -> paired ``[N/2, 2*r_pad]``, on host.

    ``r_pad`` must satisfy ``(2 * r_pad) % 128 == 0`` so the device layout
    has no lane padding.  N odd gets one phantom node (all -1).
    """
    n, r = neighbors.shape
    assert (2 * r_pad) % 128 == 0 and r_pad >= r, (r, r_pad)
    if n % 2:
        neighbors = np.concatenate(
            [neighbors, np.full((1, r), -1, np.int32)], axis=0
        )
        n += 1
    if r < r_pad:
        out = np.full((n, r_pad), -1, np.int32)
        out[:, :r] = neighbors
        neighbors = out
    return np.ascontiguousarray(neighbors, np.int32).reshape(n // 2, 2 * r_pad)


def sq4_aug_rows_host(codes_packed: np.ndarray, const: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`jvector_tpu.graph.score.sq4_aug_rows`."""
    cb = np.ascontiguousarray(const, np.float32).view(np.uint8).reshape(-1, 4)
    return np.concatenate(
        [np.ascontiguousarray(codes_packed, np.uint8), cb], axis=1
    )


@partial(
    _register,
    data_fields=[
        "adj_pairs",
        "provider",
        "reranker",
        "upper",
        "entry_node",
        "num_nodes",
        "deleted",
    ],
    meta_fields=["row_cap", "sim"],
)
@dataclasses.dataclass(frozen=True)
class DeviceTierIndex:
    """A fully HBM-resident serving index (see module docstring)."""

    adj_pairs: jax.Array  # int32 [N_cap/2, 2*row_cap]
    provider: SQ4ScoreProvider  # aug-backed, non-fused
    reranker: ExactScoreProvider  # bf16/f32 vectors on device
    upper: GraphIndex | None  # hierarchy levels (dummy base layer) or None
    entry_node: jax.Array  # int32 scalar
    num_nodes: jax.Array  # int32 scalar
    deleted: jax.Array  # bool [N_cap]
    row_cap: int = 64
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    @property
    def capacity(self) -> int:
        return self.adj_pairs.shape[0] * 2

    def hbm_bytes(self) -> int:
        """Resident device bytes (reference ``Accountable.ramBytesUsed``)."""
        total = 0
        for leaf in jax.tree_util.tree_leaves(self):
            if hasattr(leaf, "nbytes"):
                total += int(leaf.nbytes)
        return total

    @classmethod
    def from_arrays(
        cls,
        neighbors: np.ndarray,  # [N_cap, R] int32, -1 padded (host)
        codes_packed: np.ndarray,  # [N_cap, MP] uint8 (host)
        node_const: np.ndarray,  # [N_cap] f32: w2 (euclid/dot) or norm2 (cos)
        vectors: np.ndarray,  # [N, D] rerank rows (host)
        scale: np.ndarray,
        offset: np.ndarray,
        sim,
        entry_node: int,
        num_nodes: int,
        upper_layers: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = (),
        # [(neighbors, counts, node_ids)] for levels 1..L-1, slot-space
        deleted: np.ndarray | None = None,
        rerank_dtype=jnp.bfloat16,
        paired: bool = False,  # neighbors IS already the [N/2, 2*Rp] blob
        # (the v3 on-disk layout) — uploaded verbatim, no host repack
    ) -> "DeviceTierIndex":
        sim = SimilarityFunction.parse(sim)
        if paired:
            r_pad = neighbors.shape[1] // 2
            pairs = jnp.asarray(np.asarray(neighbors, np.int32))
            n_cap = codes_packed.shape[0]
        else:
            n_cap, r = neighbors.shape
            r_pad = ((max(r, 1) + 63) // 64) * 64
            pairs = jnp.asarray(
                pack_adjacency_pairs_host(np.asarray(neighbors), r_pad)
            )
        cap2 = pairs.shape[0] * 2  # >= n_cap (odd-capacity phantom)

        const = np.zeros(cap2, np.float32)
        const[:n_cap] = np.asarray(node_const, np.float32)
        codes = np.zeros((cap2, codes_packed.shape[1]), np.uint8)
        codes[:n_cap] = np.asarray(codes_packed)
        aug = jnp.asarray(sq4_aug_rows_host(codes, const))
        const_dev = jnp.asarray(const)
        provider = SQ4ScoreProvider(
            codes_packed=None,
            node_w2=const_dev,
            node_norm2=const_dev,
            fused_packed=jnp.zeros((1, 0), jnp.uint8),
            fused_w2=jnp.zeros((1, 0), jnp.float32),
            scale=jnp.asarray(np.asarray(scale, np.float32)),
            offset=jnp.asarray(np.asarray(offset, np.float32)),
            codes_aug=aug,
            sim=sim,
        )

        vec = np.zeros((cap2, vectors.shape[1]), np.float32)
        vec[: vectors.shape[0]] = np.asarray(vectors, np.float32)
        if rerank_dtype == jnp.bfloat16:
            import ml_dtypes

            vec = vec.astype(ml_dtypes.bfloat16)
        reranker = ExactScoreProvider(vectors=jnp.asarray(vec), sim=sim)

        if deleted is None:
            del_dev = jnp.zeros((cap2,), bool)
        else:
            d = np.zeros(cap2, bool)
            d[:n_cap] = np.asarray(deleted, bool)
            del_dev = jnp.asarray(d)

        upper = None
        if upper_layers:
            # real upper levels + an 8-row dummy base: _descend_hierarchy
            # never reads layer 0 (it seeds from the TOP level and walks
            # down to level 1), but GraphIndex counts levels by layers
            dummy = GraphLayer(
                neighbors=jnp.full((8, 8), -1, jnp.int32),
                scores=jnp.full((8, 8), NEG_INF, jnp.float32),
                counts=jnp.zeros((8,), jnp.int32),
            )
            layers = [dummy]
            level_ids = []
            for nbrs_l, counts_l, ids_l in upper_layers:
                ids_np = np.asarray(ids_l)
                assert np.all(np.diff(ids_np) > 0), "level ids must be sorted"
                nbrs_d = jnp.asarray(np.asarray(nbrs_l, np.int32))
                layers.append(
                    GraphLayer(
                        neighbors=nbrs_d,
                        scores=jnp.where(nbrs_d >= 0, 0.0, NEG_INF),
                        counts=jnp.asarray(np.asarray(counts_l, np.int32)),
                    )
                )
                level_ids.append(jnp.asarray(ids_np.astype(np.int32)))
            upper = GraphIndex(
                layers=tuple(layers),
                level_node_ids=tuple(level_ids),
                entry_node=jnp.int32(entry_node),
                num_nodes=jnp.int32(num_nodes),
                deleted=del_dev,
            )

        return cls(
            adj_pairs=pairs,
            provider=provider,
            reranker=reranker,
            upper=upper,
            entry_node=jnp.int32(entry_node),
            num_nodes=jnp.int32(num_nodes),
            deleted=del_dev,
            row_cap=r_pad,
            sim=sim,
        )

    @classmethod
    def load(
        cls,
        path: str,
        use_hierarchy: bool = True,
        rerank_dtype=jnp.bfloat16,
        log_progress: bool = False,
    ) -> "DeviceTierIndex":
        """Load a saved container's compact arrays into HBM.

        Reads ONLY the small blobs (adjacency, SQ4 codes + constants, f32
        vectors for rerank, hierarchy) — the fused table, if present, is
        skipped entirely (see module docstring).
        """
        from jvector_tpu.disk.format import IndexFileReader

        r = IndexFileReader(path)
        meta = r.meta
        sim = meta.get("similarity", "euclidean")
        f = "feature/fused_sq4"
        if not r.has_array(f"{f}/codes_packed"):
            raise ValueError(
                f"{path}: no fused_sq4 codes — the device tier serves "
                "SQ4-compressed containers (features present: "
                f"{meta.get('features')})"
            )

        def step(msg):
            if log_progress:
                logger.info("device-tier load: %s", msg)

        step("adjacency")
        paired = not r.has_array("graph/L0/neighbors") and (
            r.meta.get("l0_layout") == "paired"
        )
        if paired:
            # v3 layout: the blob IS the device layout — zero host repack
            neighbors = np.asarray(r.read("graph/L0/neighbors_paired"))
        else:
            neighbors = np.asarray(r.read("graph/L0/neighbors"))
        step("codes")
        codes = np.asarray(r.read(f"{f}/codes_packed"))
        const = np.asarray(r.read(f"{f}/node_const"))
        scale = np.asarray(r.read(f"{f}/scale"))
        offset = np.asarray(r.read(f"{f}/offset"))
        step("vectors")
        vectors = np.asarray(r.read("feature/inline_vectors/vectors"))
        deleted = (
            np.asarray(r.read("graph/deleted"))
            if r.has_array("graph/deleted")
            else None
        )
        upper = []
        if use_hierarchy:
            for l in range(1, meta.get("num_levels", 1)):
                upper.append(
                    (
                        np.asarray(r.read(f"graph/L{l}/neighbors")),
                        np.asarray(r.read(f"graph/L{l}/counts")),
                        np.asarray(r.read(f"graph/L{l}/node_ids")),
                    )
                )
        step("device upload")
        idx = cls.from_arrays(
            neighbors=neighbors,
            codes_packed=codes,
            node_const=const,
            vectors=vectors,
            scale=scale,
            offset=offset,
            sim=sim,
            entry_node=meta["entry_node"],
            num_nodes=meta["num_nodes"],
            upper_layers=upper,
            deleted=deleted,
            rerank_dtype=rerank_dtype,
            paired=paired,
        )
        step(f"done ({idx.hbm_bytes() / 2**30:.2f} GB HBM)")
        return idx

    def search(
        self,
        queries: jax.Array,  # [Q, D]
        top_k: int,
        beam_width: int | None = None,
        rerank_k: int | None = None,
        expand_per_iter: int = 1,
        entry_seeds: int = 1,
        hierarchy_beam: int = 1,
        max_iters: int = 1000,
        repack_after: int = 0,
    ) -> SearchResult:
        """Two-pass on-device wave search (same contract as
        :func:`jvector_tpu.graph.search`, minus filtered/threshold modes —
        those serve through the standard tiers).

        ``repack_after`` finishes the wave's convergence tail at quarter
        width (see :func:`jvector_tpu.graph.searcher._repack_tail`) — the
        tier is row-gather issue-rate bound and gathers are issued for
        every lane each iteration, so compacting the tail cuts issued rows
        directly.  ~2x ``beam_width`` is a good cut.
        """
        if beam_width is None:
            beam_width = max(top_k, 100)
        if rerank_k is None:
            rerank_k = beam_width
        return _device_search(
            self,
            jnp.asarray(queries),
            top_k=top_k,
            beam_width=beam_width,
            rerank_k=rerank_k,
            expand_per_iter=expand_per_iter,
            entry_seeds=entry_seeds,
            hierarchy_beam=hierarchy_beam,
            max_iters=max_iters,
            repack_after=repack_after,
        )


@partial(
    jax.jit,
    static_argnames=(
        "top_k",
        "beam_width",
        "rerank_k",
        "expand_per_iter",
        "entry_seeds",
        "hierarchy_beam",
        "max_iters",
        "repack_after",
    ),
)
def _device_search(
    idx: DeviceTierIndex,
    queries: jax.Array,
    top_k: int,
    beam_width: int,
    rerank_k: int,
    expand_per_iter: int,
    entry_seeds: int,
    hierarchy_beam: int,
    max_iters: int,
    repack_after: int = 0,
) -> SearchResult:
    provider = idx.provider
    qstate = provider.prepare(queries)
    Q = queries.shape[0]

    if idx.upper is not None:
        entries = _descend_hierarchy(
            idx.upper, provider, qstate, Q, hierarchy_beam
        )[:, None]
    else:
        entries = jnp.broadcast_to(idx.entry_node[None], (Q,)).astype(
            jnp.int32
        )[:, None]
    if entry_seeds > 1:
        # ordinal-strided extra seeds (see _search_jit's entry_seeds note)
        entry_seeds = min(entry_seeds, beam_width)
        s = jnp.arange(1, entry_seeds, dtype=jnp.int32)
        strided = s * (idx.num_nodes // jnp.int32(entry_seeds))
        entries = jnp.concatenate(
            [entries, jnp.broadcast_to(strided[None], (Q, entry_seeds - 1))],
            axis=1,
        )

    repack = 0 < repack_after < max_iters and Q >= 64
    final = search_layer(
        idx.adj_pairs,
        provider,
        qstate,
        entries,
        beam_width=beam_width,
        max_iters=repack_after if repack else max_iters,
        expand_per_iter=expand_per_iter,
        packed_pairs=idx.row_cap,
    )
    if repack:
        final = _repack_tail(
            idx.adj_pairs,
            provider,
            qstate,
            final,
            beam_width=beam_width,
            max_iters=max_iters,
            expand_per_iter=expand_per_iter,
            packed_pairs=idx.row_cap,
        )

    cand_ids = final.ids[:, :rerank_k]
    cand_scores = final.scores[:, :rerank_k]
    safe = jnp.maximum(cand_ids, 0)
    ok = (cand_ids >= 0) & ~idx.deleted[safe]
    exact = jnp.where(
        ok, idx.reranker.score(idx.reranker.prepare(queries), safe), NEG_INF
    )
    order = jnp.argsort(-exact, axis=1)
    ids = jnp.take_along_axis(
        jnp.where(ok, cand_ids, -1), order, axis=1
    )[:, :top_k]
    scores = jnp.take_along_axis(exact, order, axis=1)[:, :top_k]
    approx = jnp.take_along_axis(cand_scores, order, axis=1)[:, :top_k]
    return SearchResult(
        ids=ids,
        scores=scores,
        visited_count=final.visited_count,
        expanded_count=final.expanded_count,
        reranked_count=jnp.sum(ok, axis=1).astype(jnp.int32),
        approx_scores=approx,
    )
