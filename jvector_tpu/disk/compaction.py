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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.builder import GraphIndexBuilder
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
            # quantized (PQ-sidecar) merges need the deterministic tie-break
            # jitter or duplicate bursts prune to identical neighbor sets
            # (CLAUDE.md invariant; harmless for exact scores)
            cscores = tie_break_scores(jnp.maximum(self_new, 0), cids, cscores)
            cids, cscores = dedup_sorted_desc(cids, cscores)

            simmat = tie_break_pairs(
                cids,
                merged_provider.pairwise(
                    jnp.maximum(cids, 0), jnp.maximum(cids, 0)
                ),
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


@partial(jax.jit, static_argnames=("max_degree", "alphas"))
def _prune_wave_streamed(provider, rows_dev, cids, max_degree, alphas):
    """One output wave of the streamed compactor: mask self/invalid, rescore
    candidates against their owner (provider codes), dedup, diversity-prune.
    The provider rides as a jit ARGUMENT — its multi-GB code arrays must
    never be baked into the program as closure constants."""
    owner_valid = rows_dev >= 0
    cids = jnp.where(
        owner_valid[:, None] & (cids != rows_dev[:, None]), cids, -1
    )
    cscores = jnp.where(
        cids >= 0,
        provider.score_nodes(jnp.maximum(rows_dev, 0), jnp.maximum(cids, 0)),
        NEG_INF,
    )
    # quantized scores tie exactly on tight clusters — without the
    # deterministic per-(owner, candidate) jitter every merged row picks the
    # SAME neighbors and duplicate bursts shatter into islands (the
    # tests/test_graph.py adversarial fan-in mode, same invariant as the
    # builder's prune)
    cscores = tie_break_scores(jnp.maximum(rows_dev, 0), cids, cscores)
    cids, cscores = dedup_sorted_desc(cids, cscores)
    simmat = tie_break_pairs(
        cids, provider.pairwise(jnp.maximum(cids, 0), jnp.maximum(cids, 0))
    )
    return robust_prune(cids, cscores, simmat, max_degree, alphas)


class _DeviceLedger:
    """Tracks the compactor's own big device allocations (logical bytes).

    The streamed compactor's contract is that device memory stays bounded
    by {one source's working set} + {merged codes} + wave transients, never
    the merged graph.  The ledger makes that auditable: every multi-MB
    device array the compactor allocates is registered with a phase tag
    (un-instrumented sub-calls, like the hierarchy sub-build, register a
    byte ESTIMATE), and ``peak`` is asserted by tests against a budget
    smaller than the merged graph would need.
    """

    def __init__(self):
        self.live: dict[str, int] = {}
        self.peak = 0

    def add(self, tag: str, *arrays) -> None:
        self.live[tag] = sum(int(a.nbytes) for a in arrays if a is not None)
        self.peak = max(self.peak, sum(self.live.values()))

    def add_bytes(self, tag: str, nbytes: int) -> None:
        """Register an ESTIMATE for allocations made inside a sub-call we
        don't instrument array-by-array (e.g. the hierarchy sub-build)."""
        self.live[tag] = int(nbytes)
        self.peak = max(self.peak, sum(self.live.values()))

    def drop(self, tag: str) -> None:
        self.live.pop(tag, None)


def compact_on_disk(
    source_paths: list,
    out_path: str,
    config: GraphConfig | None = None,
    per_source_candidates: int = 32,
    wave: int = 256,
    live: "list[np.ndarray | None] | None" = None,
    save_fused: bool = False,
    add_hierarchy: bool | None = None,
    block: int = 262_144,
    device_budget_bytes: int | None = None,
    seed: int = 0,
) -> tuple[list[np.ndarray], dict]:
    """N:1 compaction of SAVED segments with bounded device memory.

    The reference compacts 10M x 2560d under a 5 GB heap by streaming
    merged records to disk in backpressured batches
    (``OnDiskGraphIndexCompactor.runBatchesWithBackpressure:1290`` +
    ``CompactWriter``); :func:`compact_indexes` instead materializes the
    merged graph on device, capping it near HBM scale.  This function is
    the streaming equivalent: the merged graph NEVER exists in device (or
    host) memory — output rows go straight into reserved file extents
    (``IndexFileWriter.reserve_array``/``write_rows``, the LTM inline
    path).

    Device working set, by phase:

    1. merged SQ4 codes (fit on a balanced proportional sample — the
       ``PQRetrainer`` analog — then block-streamed encode of every live
       vector): ``[total, MP+4]`` aug rows.
    2. per OTHER-source search sweeps: ONE source's paired adjacency +
       its SQ4 codes at a time (sources are visited sequentially; each
       si-wave beam-searches the resident source sj, the
       ``gatherFromOtherSource`` analog).  Candidate IDS accumulate on
       host — scores are recomputed in the prune phase, so the host
       buffer is ``total x C`` int32, not float-heavy.
    3. prune waves: dedup + pairwise + robust prune per output wave
       (``CompactVamanaDiversityProvider`` analog, same no-score-truncation
       invariant), rows written positionally.

    Sources are container files saved by ``write_index``/LTM builds with
    the ``inline_vectors`` feature.  Full-res vectors stay host memmaps
    throughout; the output carries inline vectors + a fresh ``fused_sq4``
    sidecar (codes/constants/scale/offset; the 41-GB-class fused table
    only with ``save_fused=True``) and is servable by every tier
    (device/host/standard).

    Returns ``(mappers, stats)``: per-source old->new ordinal maps and a
    stats dict whose ``peak_device_bytes`` is checked against
    ``device_budget_bytes`` (raises if exceeded — tests monkeypatch small
    budgets to prove the bound).
    """
    from jvector_tpu.disk.device_tier import pack_adjacency_pairs_host
    from jvector_tpu.disk.format import (
        FeatureId,
        IndexFileReader,
        IndexFileWriter,
    )
    from jvector_tpu.graph.score import SQ4ScoreProvider, sq4_aug_rows
    from jvector_tpu.quantization.sq import (
        MAX_TRAINING_SET_SIZE,
        ScalarQuantization4,
    )

    config = config or GraphConfig()
    M = config.max_degree
    ledger = _DeviceLedger()

    def check_budget(phase: str):
        if device_budget_bytes is not None and ledger.peak > device_budget_bytes:
            raise MemoryError(
                f"compact_on_disk exceeded device budget in {phase}: "
                f"{ledger.peak} > {device_budget_bytes} bytes"
            )

    # ---- open sources ------------------------------------------------------
    readers = [IndexFileReader(str(p)) for p in source_paths]
    n_src = len(readers)
    sims = {r.meta.get("similarity", "euclidean") for r in readers}
    assert len(sims) == 1, f"mixed similarities: {sims}"
    sim = SimilarityFunction.parse(next(iter(sims)))
    # version-dispatching read: v3 paired-L0 sources unpack to plain [N, R]
    # (plain sources stay host memmaps)
    from jvector_tpu.disk.format import _read_l0_neighbors

    nbrs_mm = [_read_l0_neighbors(r, mmap=True) for r in readers]
    vecs_mm = [
        r.read(f"feature/{FeatureId.INLINE_VECTORS}/vectors") for r in readers
    ]
    dim = vecs_mm[0].shape[1]
    n_nodes = [int(r.meta["num_nodes"]) for r in readers]
    entries_src = [int(r.meta["entry_node"]) for r in readers]

    live_ids = []
    for i, r in enumerate(readers):
        mask = np.ones(n_nodes[i], bool)
        if r.has_array("graph/deleted"):
            mask &= ~np.asarray(r.read("graph/deleted"))[: n_nodes[i]]
        if live is not None and live[i] is not None:
            mask &= np.asarray(live[i][: n_nodes[i]], bool)
        live_ids.append(np.where(mask)[0].astype(np.int32))
    offsets = np.cumsum([0] + [len(x) for x in live_ids])
    total = int(offsets[-1])
    mappers = []
    for i in range(n_src):
        m = np.full(n_nodes[i], -1, np.int32)
        m[live_ids[i]] = np.arange(len(live_ids[i]), dtype=np.int32) + offsets[i]
        mappers.append(m)

    # ---- merged SQ4 fit (balanced proportional sample) + streamed encode ---
    rng = np.random.default_rng(seed)
    parts = []
    for ids, vm in zip(live_ids, vecs_mm):
        want = min(
            len(ids),
            max(1000, int(round(MAX_TRAINING_SET_SIZE * len(ids) / max(total, 1)))),
        )
        pick = np.sort(rng.choice(ids, size=want, replace=False))
        parts.append(np.asarray(vm[pick], np.float32))
    sq = ScalarQuantization4.compute(np.concatenate(parts, axis=0))
    mp = sq.compressed_size

    # encode blocks into a HOST buffer and upload once — an eager per-block
    # dynamic_update_slice would copy the whole device buffer every block
    # (O(total^2/block) device traffic plus an untracked transient copy)
    merged_host = np.empty((total, mp), np.uint8)
    for i, (ids, vm) in enumerate(zip(live_ids, vecs_mm)):
        for a in range(0, len(ids), block):
            rows = np.asarray(vm[ids[a : a + block]], np.float32)
            merged_host[offsets[i] + a : offsets[i] + a + len(rows)] = (
                np.asarray(sq._encode_block(jnp.asarray(rows)))
            )
    merged_codes = jnp.asarray(merged_host)
    del merged_host
    w2_m, norm2_m = sq.node_constants(merged_codes)
    const_m = norm2_m if sim == SimilarityFunction.COSINE else w2_m

    def aug_provider(codes, const):
        return SQ4ScoreProvider(
            codes_packed=None,
            node_w2=const,
            node_norm2=const,
            fused_packed=jnp.zeros((1, 0), jnp.uint8),
            fused_w2=jnp.zeros((1, 0), jnp.float32),
            scale=sq.scale,
            offset=sq.offset,
            codes_aug=sq4_aug_rows(codes, const),
            sim=sim,
        )

    merged_provider = aug_provider(merged_codes, const_m)
    ledger.add("merged_codes", merged_codes, merged_provider.codes_aug, const_m)
    check_budget("merged codes")

    # ---- candidate ids on host ---------------------------------------------
    r_src_max = max(int(nm.shape[1]) for nm in nbrs_mm)
    c_tot = r_src_max + (n_src - 1) * per_source_candidates
    cand = np.full((total, c_tot), -1, np.int32)

    # same-source: existing neighbors remapped (gatherFromSameSource)
    for i in range(n_src):
        ids = live_ids[i]
        for a in range(0, len(ids), block):
            rows = np.asarray(nbrs_mm[i][ids[a : a + block]])
            remapped = np.where(rows >= 0, mappers[i][np.maximum(rows, 0)], -1)
            cand[offsets[i] + a : offsets[i] + a + len(rows), : rows.shape[1]] = (
                remapped
            )

    # other-source beam searches, one resident source at a time
    C = per_source_candidates
    for sj in range(n_src):
        if n_src == 1:
            break
        r_j = int(nbrs_mm[sj].shape[1])
        r_pad = ((r_j + 63) // 64) * 64
        adj_j = jnp.asarray(
            pack_adjacency_pairs_host(np.asarray(nbrs_mm[sj]), r_pad)
        )
        codes_j_host = np.empty((n_nodes[sj], mp), np.uint8)
        for a in range(0, n_nodes[sj], block):
            rows = np.asarray(vecs_mm[sj][a : a + block], np.float32)
            codes_j_host[a : a + len(rows)] = np.asarray(
                sq._encode_block(jnp.asarray(rows))
            )
        codes_j = jnp.asarray(codes_j_host)
        del codes_j_host
        w2_j, norm2_j = sq.node_constants(codes_j)
        const_j = norm2_j if sim == SimilarityFunction.COSINE else w2_j
        prov_j = aug_provider(codes_j, const_j)
        ledger.add("source", adj_j, codes_j, prov_j.codes_aug, const_j)
        check_budget(f"source {sj} working set")

        col0 = r_src_max  # this sweep's column block in `cand`
        for si in range(n_src):
            if si == sj:
                continue
            # column block for (si searching sj): stable per sj ordering
            kj = sum(1 for x in range(n_src) if x != si and x < sj)
            cols = slice(col0 + kj * C, col0 + (kj + 1) * C)
            ids = live_ids[si]
            for a in range(0, len(ids), wave):
                batch = ids[a : a + wave]
                b = len(batch)
                # pad the tail wave to a fixed shape (one compile per source
                # capacity bucket): -1 entries make padded rows inert
                qv = np.zeros((wave, dim), np.float32)
                qv[:b] = np.asarray(vecs_mm[si][batch], np.float32)
                ent = np.full(wave, -1, np.int32)
                ent[:b] = entries_src[sj]
                qstate = prov_j.prepare(jnp.asarray(qv))
                beam = search_layer(
                    adj_j,
                    prov_j,
                    qstate,
                    jnp.asarray(ent),
                    beam_width=max(C, M),
                    max_iters=config.max_build_iters,
                    expand_per_iter=config.build_expand,
                    packed_pairs=r_pad,
                )
                got = np.asarray(beam.ids[:b, :C])
                cand[offsets[si] + a : offsets[si] + a + b, cols] = np.where(
                    got >= 0, mappers[sj][np.maximum(got, 0)], -1
                )
        ledger.drop("source")

    # ---- prune + stream rows to reserved extents ---------------------------
    writer = IndexFileWriter(out_path)
    try:
        writer.reserve_array("graph/L0/neighbors", (total, M), np.int32)
        writer.reserve_array("graph/L0/counts", (total,), np.int32)
        writer.reserve_array(
            f"feature/{FeatureId.INLINE_VECTORS}/vectors",
            (total, dim),
            np.float32,
        )

        for a in range(0, total, wave):
            b = min(wave, total - a)
            rows_np = np.full(wave, -1, np.int32)
            rows_np[:b] = np.arange(a, a + b, dtype=np.int32)
            cids = np.full((wave, c_tot), -1, np.int32)
            cids[:b] = cand[a : a + b]
            p_ids, p_scores, p_count = _prune_wave_streamed(
                merged_provider, jnp.asarray(rows_np), jnp.asarray(cids),
                M, config.alphas,
            )
            writer.write_rows(
                "graph/L0/neighbors", a, np.asarray(p_ids[:b], np.int32)
            )
            writer.write_rows(
                "graph/L0/counts", a, np.asarray(p_count[:b], np.int32)
            )

        # inline vectors: pure host stream, never on device
        for i, ids in enumerate(live_ids):
            for a in range(0, len(ids), block):
                writer.write_rows(
                    f"feature/{FeatureId.INLINE_VECTORS}/vectors",
                    int(offsets[i]) + a,
                    np.asarray(vecs_mm[i][ids[a : a + block]], np.float32),
                )

        # entry: argmax similarity to the streamed centroid
        acc = np.zeros(dim, np.float64)
        for ids, vm in zip(live_ids, vecs_mm):
            for a in range(0, len(ids), block):
                acc += np.asarray(vm[ids[a : a + block]], np.float64).sum(axis=0)
        centroid = jnp.asarray((acc / max(total, 1))[None, :], jnp.float32)
        qs = merged_provider.prepare(centroid)
        best_id, best_sc = 0, -np.inf
        for a in range(0, total, 1 << 20):
            b = min(1 << 20, total - a)
            sc = merged_provider.score(
                qs, (a + jnp.arange(b, dtype=jnp.int32))[None, :]
            )[0]
            j = int(jnp.argmax(sc))
            v = float(sc[j])
            if v > best_sc:
                best_id, best_sc = a + j, v
        entry = int(best_id)

        # SQ4 sidecar feature (codes + constants; fused table opt-in)
        codes_np = np.asarray(merged_codes)
        f = FeatureId.FUSED_SQ4
        writer.add_array(f"feature/{f}/codes_packed", codes_np)
        writer.add_array(
            f"feature/{f}/node_const", np.asarray(const_m, np.float32)
        )
        writer.add_array(f"feature/{f}/scale", np.asarray(sq.scale))
        writer.add_array(f"feature/{f}/offset", np.asarray(sq.offset))

        num_levels = 1
        hier = config.add_hierarchy if add_hierarchy is None else add_hierarchy
        if hier and total > 1:
            from jvector_tpu.graph.hierarchy import assign_levels

            levels = assign_levels(total, M, seed)
            sub_ids = np.where(levels >= 1)[0].astype(np.int32)
            if len(sub_ids):
                # gather only the upper-level nodes' vectors (bounded: ~N/M)
                sub_vecs = np.empty((len(sub_ids), dim), np.float32)
                for i, ids in enumerate(live_ids):
                    lo, hi = int(offsets[i]), int(offsets[i + 1])
                    sel = np.where((sub_ids >= lo) & (sub_ids < hi))[0]
                    sub_vecs[sel] = vecs_mm[i][ids[sub_ids[sel] - lo]]
                base = GraphLayer(
                    neighbors=jnp.full((8, 8), -1, jnp.int32),
                    scores=jnp.full((8, 8), NEG_INF, jnp.float32),
                    counts=jnp.zeros((8,), jnp.int32),
                )
                shell = GraphIndex(
                    layers=(base,),
                    level_node_ids=(),
                    entry_node=jnp.int32(entry),
                    num_nodes=jnp.int32(total),
                    deleted=jnp.zeros((8,), bool),
                )
                sub_dev = jnp.asarray(sub_vecs)
                ledger.add("hier", sub_dev)
                # the sub-build's own tables: unpacked upper-level graph
                # (neighbors + scores, ~2x minor-dim lane padding) — an
                # estimate, since build_hierarchy_from_subset isn't
                # instrumented array-by-array
                ledger.add_bytes(
                    "hier_build", len(sub_ids) * config.row_cap * 8 * 2
                )
                check_budget("hierarchy")
                shell = GraphIndexBuilder(config).build_hierarchy_from_subset(
                    shell, sub_ids, sub_dev, levels[sub_ids], sim
                )
                ledger.drop("hier")
                ledger.drop("hier_build")
                for l in range(1, shell.num_levels):
                    writer.add_array(
                        f"graph/L{l}/neighbors",
                        np.asarray(shell.layers[l].neighbors),
                    )
                    writer.add_array(
                        f"graph/L{l}/counts", np.asarray(shell.layers[l].counts)
                    )
                    writer.add_array(
                        f"graph/L{l}/node_ids",
                        np.asarray(shell.level_node_ids[l - 1]),
                    )
                num_levels = shell.num_levels

        if save_fused:
            from jvector_tpu.graph.score import build_fused_sq4_host

            const_np = np.asarray(const_m, np.float32)
            writer.reserve_array(
                f"feature/{f}/fused_packed", (total, M * mp), np.uint8
            )
            writer.reserve_array(
                f"feature/{f}/fused_w2", (total, M), np.float32
            )
            # re-read the just-written adjacency rows (host) in blocks
            e = writer._arrays["graph/L0/neighbors"]
            for a in range(0, total, block):
                b = min(block, total - a)
                writer._f.flush()
                adj_rows = np.fromfile(
                    out_path,
                    dtype=np.int32,
                    count=b * M,
                    offset=e.offset + a * M * 4,
                ).reshape(b, M)
                fp, fw = build_fused_sq4_host(adj_rows, codes_np, const_np)
                writer.write_rows(f"feature/{f}/fused_packed", a, fp)
                writer.write_rows(f"feature/{f}/fused_w2", a, fw)

        writer.set_meta(
            num_levels=num_levels,
            entry_node=entry,
            num_nodes=total,
            features=[FeatureId.INLINE_VECTORS, f],
            similarity=sim.value,
            dimension=dim,
            compacted_from=[str(p) for p in source_paths],
        )
    finally:
        writer.close()

    stats = {
        "total": total,
        "peak_device_bytes": ledger.peak,
        "sources": n_src,
    }
    return mappers, stats
