"""N:1 index compaction (streaming merge of segment indexes).

Reference: ``jv/graph/disk/OnDiskGraphIndexCompactor.java`` (1779 LoC, the
largest file) + ``docs/compaction.md``.  Per node per level the reference
gathers candidates from the *same* source (existing neighbors, filtered +
rescored) and from *other* sources (a beam search per other source), then
applies Vamana diversity with alpha in {1.0, 1.2}; PQ sidecars are retrained
on proportionally sampled merged data (``PQRetrainer``).

TPU redesign: nodes are processed in batched waves — the per-node "beam
search into every other source" becomes one query-wave ``search_layer`` per
(wave, other-source) pair, and the merged rows are written by scatter.  No
backlinks are needed: every output row is computed independently from both
edge directions' candidates, so the merge is embarrassingly wave-parallel
(the reference needs its batch pipeline + backpressure machinery instead,
``runBatchesWithBackpressure:1290``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.builder import GraphIndexBuilder
from jvector_tpu.graph.diversity import dedup_sorted_desc, robust_prune
from jvector_tpu.graph.index import (
    NEG_INF,
    GraphConfig,
    GraphIndex,
    GraphLayer,
    empty_graph,
)
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.graph.searcher import search_layer
from jvector_tpu.ops.similarity import SimilarityFunction


@dataclasses.dataclass
class CompactionSource:
    """One input segment: its graph, vectors, and an optional live mask.

    ``vectors`` may be a host numpy array (memmap welcome): the PQ-sidecar
    compaction path (``pq=`` argument of :func:`compact_indexes`) streams
    them wave-by-wave and never uploads a full source to HBM — the
    reference compacts 10M x 2560d under ``-Xmx5g`` the same way.
    """

    graph: GraphIndex
    vectors: jax.Array | np.ndarray  # [N_i, D]
    live: np.ndarray | None = None  # bool [N_i]; None = all live

    def live_ids(self) -> np.ndarray:
        n = int(self.graph.num_nodes)
        live = (
            np.ones(n, bool)
            if self.live is None
            else np.asarray(self.live[:n], bool)
        )
        live &= ~np.asarray(self.graph.deleted[:n])
        return np.where(live)[0].astype(np.int32)

    @classmethod
    def from_index_file(cls, path, live=None) -> "CompactionSource":
        """Open a saved segment (e.g. one `sharded_build_on_disk` shard) as
        a compaction input: graph arrays on device, full-res vectors left
        as a HOST memmap (the PQ-sidecar mode streams them wave-by-wave —
        the reference compactor's segment-file lifecycle,
        ``OnDiskGraphIndexCompactor.java:54+``)."""
        from jvector_tpu.disk.format import FeatureId, load_index

        idx = load_index(path)
        vectors = idx.reader.read(
            f"feature/{FeatureId.INLINE_VECTORS}/vectors", mmap=True
        )
        return cls(graph=idx.graph_to_device(), vectors=vectors, live=live)


def retrain_pq(
    sources: list[CompactionSource],
    live_ids: list[np.ndarray],
    base_pq,
    sim: SimilarityFunction,
    min_per_source: int = 1000,
    seed: int = 0,
):
    """Balanced proportional PQ retraining over the merged corpus.

    Reference: ``PQRetrainer.retrain`` + ``sampleBalanced`` — sample each
    source proportionally to its live count (>= min_per_source each, total
    <= MAX_PQ_TRAINING_SET_SIZE), read rows in sorted order (sequential IO
    on memmaps), train a fresh PQ with the base PQ's M/cluster parameters.
    """
    from jvector_tpu.quantization.pq import (
        MAX_TRAINING_SET_SIZE,
        ProductQuantization,
    )

    total = sum(len(x) for x in live_ids)
    rng = np.random.default_rng(seed)
    parts = []
    if total <= MAX_TRAINING_SET_SIZE:
        picks = live_ids
    else:
        picks = []
        for ids in live_ids:
            want = max(
                min(min_per_source, len(ids)),
                int(round(MAX_TRAINING_SET_SIZE * len(ids) / total)),
            )
            want = min(want, len(ids))
            picks.append(np.sort(rng.choice(ids, size=want, replace=False)))
    for s, ids in zip(sources, picks):
        parts.append(np.asarray(s.vectors)[ids])
    sample = np.concatenate(parts, axis=0)
    return ProductQuantization.compute(
        sample,
        m=base_pq.m,
        clusters=base_pq.clusters,
        globally_center=sim == SimilarityFunction.EUCLIDEAN,
        anisotropic_threshold=base_pq.anisotropic_threshold,
    )


def compact_indexes(
    sources: list[CompactionSource],
    config: GraphConfig | None = None,
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
    per_source_candidates: int = 32,
    wave: int = 256,
    pq=None,
    retrain: bool = True,
    refine_merged: bool = False,
) -> tuple[GraphIndex, object, list[np.ndarray]]:
    """Merge N segment indexes into one.

    Returns ``(merged_graph, merged_provider, mappers)`` where ``mappers[i]``
    maps source-i old ordinal -> new ordinal (-1 for dead ordinals), the
    reference's ``OrdinalMapper`` contract.

    Two memory modes:

    - ``pq=None`` (exact): all live vectors are uploaded and scoring is
      full-precision — fine when the merged corpus fits HBM.
    - ``pq=ProductQuantization`` (the sidecar strategy,
      ``QuantizationCompactionStrategy``/``SidecarCompactionStrategy``):
      codebooks are retrained on a balanced proportional sample
      (``PQRetrainer``, disable with ``retrain=False``), every source is
      re-encoded (streamed in blocks), and ALL graph scoring — in-source
      searches, merged-space candidate scores, the diversity prune — runs
      on codes.  Source ``vectors`` may be host numpy arrays/memmaps; only
      one wave of query vectors is uploaded at a time, so device memory is
      bounded by codes + adjacency, never the f32 corpus.  The returned
      provider is the merged :class:`ADCScoreProvider` (rebuild the PQ via
      ``ProductQuantization(codebooks=p.codebooks, center=p.center, ...)``).

    ``refine_merged=True`` runs the in-place ``refineCompactedGraph``
    post-pass (``OnDiskGraphIndexCompactor.java:460-571``) over the output.
    """
    sim = SimilarityFunction.parse(sim)
    config = config or GraphConfig()
    n_src = len(sources)

    # ---- ordinal remap (OffsetMapper over live ids) ------------------------
    live_ids = [s.live_ids() for s in sources]
    offsets = np.cumsum([0] + [len(x) for x in live_ids])
    total = int(offsets[-1])
    mappers = []
    for i, s in enumerate(sources):
        m = np.full(int(s.graph.num_nodes), -1, np.int32)
        m[live_ids[i]] = np.arange(len(live_ids[i]), dtype=np.int32) + offsets[i]
        mappers.append(m)

    from jvector_tpu.graph.index import bucket_capacity

    n_cap_out = bucket_capacity(total)

    if pq is not None:
        if retrain:
            pq = retrain_pq(sources, live_ids, pq, sim)
        # encode every source in full ordinal space (tombstones stay
        # traversable during in-source searches) — streamed in blocks
        src_codes = []
        for s in sources:
            n_i = int(s.graph.num_nodes)
            codes_i = pq.encode(np.asarray(s.vectors[:n_i]))
            cap_i = s.graph.capacity
            if cap_i > n_i:
                codes_i = jnp.concatenate(
                    [codes_i, jnp.zeros((cap_i - n_i, codes_i.shape[1]), jnp.uint8)]
                )
            src_codes.append(codes_i)
        merged_codes = jnp.concatenate(
            [codes_i[jnp.asarray(ids)] for codes_i, ids in zip(src_codes, live_ids)]
        )
        if n_cap_out > total:
            merged_codes = jnp.concatenate(
                [
                    merged_codes,
                    jnp.zeros((n_cap_out - total, merged_codes.shape[1]), jnp.uint8),
                ]
            )
        merged_provider = pq.provider(merged_codes, sim)
        src_providers = [pq.provider(c, sim) for c in src_codes]
        merged_vectors = None
    else:
        merged_vectors = jnp.concatenate(
            [
                jnp.asarray(np.asarray(s.vectors)[ids])
                for s, ids in zip(sources, live_ids)
            ],
            axis=0,
        )
        padded = merged_vectors
        if n_cap_out > total:
            padded = jnp.concatenate(
                [
                    merged_vectors,
                    jnp.zeros(
                        (n_cap_out - total, merged_vectors.shape[1]), jnp.float32
                    ),
                ]
            )
        merged_provider = ExactScoreProvider(vectors=padded, sim=sim)
        src_providers = [
            ExactScoreProvider(vectors=jnp.asarray(s.vectors), sim=sim)
            for s in sources
        ]

    out = empty_graph(n_cap_out, config)
    out_layer = out.base
    R_cap = out_layer.neighbors.shape[1]
    M = config.max_degree

    mapper_dev = [jnp.asarray(m) for m in mappers]

    # ---- per-source waves ----------------------------------------------------
    for si, s in enumerate(sources):
        ids_i = live_ids[si]
        for w0 in range(0, len(ids_i), wave):
            batch = ids_i[w0 : w0 + wave]
            b = len(batch)
            pad = wave - b
            batch_pad = np.concatenate([batch, np.full(pad, -1, np.int32)])
            bdev = jnp.asarray(np.maximum(batch_pad, 0))
            valid = jnp.asarray(batch_pad >= 0)
            # one wave of query vectors; host-resident sources upload a slice
            qvecs = jnp.asarray(
                np.asarray(s.vectors[np.maximum(batch_pad, 0)])
                if isinstance(s.vectors, np.ndarray)
                else s.vectors[bdev],
                jnp.float32,
            )  # [W, D]

            # same-source: existing neighbors, live-filtered, remapped
            nbrs = s.graph.base.neighbors[bdev]  # [W, R_src]
            nbr_new = jnp.where(nbrs >= 0, mapper_dev[si][jnp.maximum(nbrs, 0)], -1)
            qstate_merged = merged_provider.prepare(qvecs)
            same_scores = jnp.where(
                nbr_new >= 0,
                merged_provider.score(qstate_merged, jnp.maximum(nbr_new, 0)),
                NEG_INF,
            )
            cand_ids = [nbr_new]
            cand_scores = [same_scores]

            # other sources: query-wave beam search each, remap results
            for sj in range(n_src):
                if sj == si:
                    continue
                other = sources[sj]
                prov_j = src_providers[sj]
                qstate_j = prov_j.prepare(qvecs)
                entries = jnp.where(
                    valid, other.graph.entry_node, -1
                ).astype(jnp.int32)
                beam = search_layer(
                    other.graph.base.neighbors,
                    prov_j,
                    qstate_j,
                    entries,
                    beam_width=max(per_source_candidates, config.max_degree),
                    max_iters=config.max_build_iters,
                )
                got = beam.ids[:, :per_source_candidates]
                got_new = jnp.where(
                    got >= 0, mapper_dev[sj][jnp.maximum(got, 0)], -1
                )
                got_scores = jnp.where(
                    got_new >= 0,
                    merged_provider.score(qstate_merged, jnp.maximum(got_new, 0)),
                    NEG_INF,
                )
                cand_ids.append(got_new)
                cand_scores.append(got_scores)

            cids = jnp.concatenate(cand_ids, axis=1)
            cscores = jnp.concatenate(cand_scores, axis=1)
            # mask self + invalid rows
            self_new = mapper_dev[si][bdev]
            cids = jnp.where(
                (cids == self_new[:, None]) | ~valid[:, None], -1, cids
            )
            cscores = jnp.where(cids >= 0, cscores, NEG_INF)
            # NOTE: no top-ef truncation here.  The same-source neighbors
            # include the source graph's long-range (diversity/backlink)
            # edges, which score LOW; dropping low-scoring candidates
            # before the prune disconnects the merged graph (the alpha ramp
            # is what decides which far edges survive, not the score).
            cids, cscores = dedup_sorted_desc(cids, cscores)

            simmat = merged_provider.pairwise(
                jnp.maximum(cids, 0), jnp.maximum(cids, 0)
            )
            p_ids, p_scores, p_count = robust_prune(
                cids, cscores, simmat, M, config.alphas
            )

            rows = jnp.where(valid, self_new, n_cap_out)
            row_ids = jnp.concatenate(
                [p_ids, jnp.full((wave, R_cap - M), -1, jnp.int32)], axis=1
            )
            row_scores = jnp.concatenate(
                [p_scores, jnp.full((wave, R_cap - M), NEG_INF)], axis=1
            )
            out_layer = GraphLayer(
                neighbors=out_layer.neighbors.at[rows].set(row_ids, mode="drop"),
                scores=out_layer.scores.at[rows].set(row_scores, mode="drop"),
                counts=out_layer.counts.at[rows].set(p_count, mode="drop"),
            )

    # ---- entry + hierarchy ----------------------------------------------------
    if merged_vectors is not None:
        centroid = jnp.mean(merged_vectors, axis=0, keepdims=True)
    else:
        # streamed centroid: accumulate per-source sums on host
        acc = None
        for s, ids in zip(sources, live_ids):
            v = np.asarray(s.vectors)[ids]
            acc = v.sum(axis=0) if acc is None else acc + v.sum(axis=0)
        centroid = jnp.asarray((acc / max(total, 1))[None, :], jnp.float32)
    qstate = merged_provider.prepare(centroid)
    entry = jnp.argmax(
        merged_provider.score(qstate, jnp.arange(total, dtype=jnp.int32)[None, :])[0]
    ).astype(jnp.int32)

    merged = GraphIndex(
        layers=(out_layer,),
        level_node_ids=(),
        entry_node=entry,
        num_nodes=jnp.int32(total),
        deleted=jnp.zeros((n_cap_out,), bool),
    )
    if refine_merged:
        from jvector_tpu.graph.builder import refine_graph

        if merged_vectors is not None:
            refine_vecs = merged_vectors
        else:
            refine_vecs = np.concatenate(
                [np.asarray(s.vectors)[ids] for s, ids in zip(sources, live_ids)]
            )
        merged = refine_graph(
            merged, merged_provider, refine_vecs, config,
            chunk=min(1024, n_cap_out),
        )
    if config.add_hierarchy:
        if merged_vectors is None:
            merged_vectors = jnp.concatenate(
                [
                    jnp.asarray(np.asarray(s.vectors)[ids])
                    for s, ids in zip(sources, live_ids)
                ]
            )
        merged = GraphIndexBuilder(config).build_hierarchy(
            merged, merged_vectors, sim
        )
    return merged, merged_provider, mappers
