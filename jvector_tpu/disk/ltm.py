"""Larger-than-memory (LTM) index construction.

Reference: tutorial 3 / ``SiftSmall.siftDiskAnnLTM`` (``SiftSmall.java:219-260``)
and ``Grid.buildOnDisk:367-478``: PQ codes are the only full-corpus working
set; full-resolution vectors stream to disk incrementally
(``writeFeaturesInline``) while the graph is built with PQ-approximate
scores; edges are written in a second pass.

TPU redesign: the compressed working set is the device-resident
``uint8 [N, M]`` code array; full-res vectors visit HBM only one wave at a
time and land in a reserved extent of the output file.  The graph build is
the ordinary wave insert with the ADC score provider — the inserted wave's
full-res vectors act as queries, exactly like the reference's
``searchProviderFor(vector)``.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial as _partial
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.disk.format import FeatureId, IndexFileWriter
from jvector_tpu.graph.builder import (
    GraphIndexBuilder,
    _EntrySeedSampler,
    _insert_wave,
    _shuffled_wave_starts,
)
from jvector_tpu.graph.index import GraphConfig, GraphIndex, empty_graph
from jvector_tpu.graph.score import ADCScoreProvider
from jvector_tpu.ops.similarity import SimilarityFunction
from jvector_tpu.quantization.pq import ProductQuantization


def _add_array_chunked(
    writer: IndexFileWriter,
    name: str,
    arr: jax.Array,
    dtype,
    max_bytes: int = 256 << 20,
) -> None:
    """Stream a device array into the file in bounded transfers.

    Multi-GB single ``np.asarray`` downloads have crashed the remote-chip
    tunnel at 10M scale; bounded row-chunk transfers also keep host RSS flat.
    """
    dt = np.dtype(dtype)
    shape = tuple(arr.shape)
    row_bytes = max(1, int(np.prod(shape[1:]))) * dt.itemsize
    writer.reserve_array(name, shape, dt)
    chunk = max(1, max_bytes // row_bytes)
    for a in range(0, shape[0], chunk):
        writer.write_rows(name, a, np.asarray(arr[a : a + chunk], dt))


@_partial(jax.jit, donate_argnums=(0,))
def _patch_rows(dst: jax.Array, chunk: jax.Array, start) -> jax.Array:
    return jax.lax.dynamic_update_slice_in_dim(dst, chunk, start, axis=0)


def _upload_chunked(arr: np.ndarray, max_bytes: int = 512 << 20) -> jax.Array:
    """Host→device upload in bounded row chunks (tunnel-safe mirror of
    :func:`_add_array_chunked`; multi-GB single transfers are the risk).

    The destination is allocated once and patched in place per chunk
    (donated jit) — peak device memory is the array + ONE chunk.  A
    ``concatenate`` of all chunks would transiently hold 2x the array,
    which at 10M (neighbors+scores ~10 GB physical) is the difference
    between a resume fitting HBM and an OOM in the exact crash-recovery
    scenario the checkpoint exists for.
    """
    row_bytes = max(1, int(np.prod(arr.shape[1:]))) * arr.dtype.itemsize
    chunk = max(1, max_bytes // row_bytes)
    if arr.ndim == 0 or arr.shape[0] <= chunk:
        return jnp.asarray(np.ascontiguousarray(arr))
    dst = jnp.zeros(arr.shape, arr.dtype)
    for a in range(0, arr.shape[0], chunk):
        part = jax.device_put(np.ascontiguousarray(arr[a : a + chunk]))
        dst = _patch_rows(dst, part, jnp.int32(a))
    return dst


def _download_unpack_adj(
    adj: jax.Array, r_cap: int, max_bytes: int = 256 << 20
) -> tuple[np.ndarray, np.ndarray]:
    """Packed ``[N/8, 8, 128]`` int32 adjacency -> host ``(neighbors,
    scores)`` ``[N, r_cap]`` arrays, downloaded in bounded chunks.

    The caller frees ``adj`` before uploading the halves — unpacking on
    device would hold both layouts at once (15.4 GB at 10M, over HBM)."""
    n_pr = adj.shape[0]
    n = n_pr * 8
    nb = np.empty((n, r_cap), np.int32)
    sc = np.empty((n, r_cap), np.float32)
    chunk = max(1, max_bytes // (8 * 128 * 4))
    for a in range(0, n_pr, chunk):
        b = min(a + chunk, n_pr)
        blk = np.asarray(adj[a:b]).reshape(-1, 128)
        nb[a * 8 : b * 8] = blk[:, :r_cap]
        sc[a * 8 : b * 8] = np.ascontiguousarray(
            blk[:, 64 : 64 + r_cap]
        ).view(np.float32)
    return nb, sc


# device-memory budget for the incremental fused table during LTM builds;
# past it the build falls back to plain augmented-row searches (the 100M
# regime).  Module-level so tests can force the non-fused path at small n.
_FUSED_BUILD_BUDGET = 6 << 30

# fused-table budget for the SAVED index's device-resident serving tier;
# past it the save streams the fused layout into the file host-side and
# returns a fused-less provider (serving goes through HostGraphIndex)
_FUSED_SERVE_BUDGET = 4 << 30


@_partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("cosine",))
def _ltm_wave_encode(aug, node_w2, node_norm2, sq, wave, start, cosine):
    """One program per wave for the LTM working-set update.

    Eagerly, this was ~6 dispatches per wave and THREE out-of-place
    dynamic_update_slice copies of the multi-GB working set (no donation
    outside jit); fused + donated they update in place.
    """
    from jvector_tpu.graph.score import sq4_aug_rows

    wave_codes = sq.encode(wave)
    w2_w, norm2_w = sq.node_constants(wave_codes)
    node_w2 = jax.lax.dynamic_update_slice_in_dim(node_w2, w2_w, start, axis=0)
    node_norm2 = jax.lax.dynamic_update_slice_in_dim(
        node_norm2, norm2_w, start, axis=0
    )
    const_w = norm2_w if cosine else w2_w
    aug = jax.lax.dynamic_update_slice_in_dim(
        aug, sq4_aug_rows(wave_codes, const_w), start, axis=0
    )
    return aug, node_w2, node_norm2, wave_codes


def _ckpt_save(
    path: str,
    writer: IndexFileWriter,
    seeds: "_EntrySeedSampler",
    waves_done: int,
    arrays: dict[str, tuple],
    meta: dict,
) -> None:
    """Atomically persist mid-build state to ``path`` (a jvtpu container).

    Durability for the larger-than-memory wave loop: a multi-hour 10M+
    stream build survives process/device loss and resumes at the last
    checkpointed wave (reference durability analog: footer-last commit +
    ``OnDiskGraphIndexCache`` atomic-rename discipline).  The tmp+rename
    plus the container's own footer check make torn checkpoints
    unreadable rather than corrupt.
    """
    tmp = path + ".tmp"
    w = IndexFileWriter(tmp)
    for name, (arr, dtype) in arrays.items():
        _add_array_chunked(w, name, arr, dtype)
    ss = seeds.state_dict()
    w.add_array("seeds/inserted", np.asarray(ss["inserted"], np.int32))
    import json as _json

    w.set_meta(
        waves_done=waves_done,
        rng_state=_json.dumps(ss["rng_state"]),
        writer_state=writer.state_dict(),
        **meta,
    )
    w.close()
    os.replace(tmp, path)


def _config_knobs(config) -> dict:
    """The GraphConfig knobs that shape build state/behavior.

    Baked into every checkpoint and validated on resume: resuming under
    different knobs would splice two differently-built halves together
    (and desynchronize the entry-seed RNG), silently breaking the
    documented bit-identical guarantee.
    """
    return {
        "wave": config.wave_size,
        "max_degree": config.max_degree,
        "ef_construction": config.ef_construction,
        "neighbor_overflow": config.neighbor_overflow,
        "alpha": config.alpha,
        "build_expand": config.build_expand,
        "build_entry_seeds": config.build_entry_seeds,
    }


def _ckpt_load(path: str, index_path: str, expect_meta: dict) -> dict | None:
    """Load a checkpoint if present, valid, and built with matching knobs.

    Any defect — torn file, missing blobs, knob mismatch, a missing or
    shrunken partial index file, or an index that is already COMMITTED
    (valid footer: the checkpoint is stale and resuming would destroy a
    good index) — logs a warning and returns ``None``: the caller
    rebuilds from scratch.  Resume must never be less safe than rebuild.
    """
    import json as _json
    import logging

    log = logging.getLogger(__name__)
    if not os.path.exists(path):
        return None
    from jvector_tpu.disk.format import IndexFileReader

    try:
        r = IndexFileReader(index_path)
        if r.meta:  # committed index at the output path: checkpoint is stale
            log.warning(
                "ignoring checkpoint %s: %s is already a committed index",
                path, index_path,
            )
            return None
    except Exception:
        pass  # no/partial index file — the normal mid-build state
    try:
        r = IndexFileReader(path)
        for k, v in expect_meta.items():
            if r.meta.get(k) != v:
                log.warning(
                    "ignoring checkpoint %s: %s=%r != %r", path, k, r.meta.get(k), v
                )
                return None
        ws = r.meta["writer_state"]
        if (
            not os.path.exists(index_path)
            or os.path.getsize(index_path) < ws["file_size"]
        ):
            log.warning(
                "ignoring checkpoint %s: partial index %s missing or shorter "
                "than the checkpointed size", path, index_path,
            )
            return None
        return {
            "meta": r.meta,
            "reader": r,
            "seeds_state": {
                "rng_state": _json.loads(r.meta["rng_state"]),
                "inserted": r.read("seeds/inserted", mmap=False),
            },
        }
    except Exception as e:  # torn/corrupt/foreign checkpoint: rebuild
        log.warning("ignoring bad checkpoint %s: %s", path, e)
        return None


def _entry_by_centroid(provider, centroid, n: int, chunk: int = 1 << 20) -> int:
    """Node nearest the (decoded) centroid, scored in bounded chunks.

    One full-table ``provider.score`` call materializes an unpacked
    ``[1, n_cap, D]`` float32 intermediate — ~5.4 GB at 10M x 128d, an HBM
    OOM on top of the resident working set.  Chunked scoring keeps the
    peak at ``[1, chunk, D]`` (~0.5 GB) for a handful of host syncs.
    """
    qstate = provider.prepare(centroid)
    best_score, best_id = -np.inf, 0
    for a in range(0, n, chunk):
        ids = jnp.arange(a, min(a + chunk, n), dtype=jnp.int32)
        sc = provider.score(qstate, ids[None, :])[0]
        i = int(jnp.argmax(sc))
        s = float(sc[i])
        if s > best_score:
            best_score, best_id = s, a + i
    return best_id


def build_on_disk_ltm(
    path: str,
    vectors: "np.ndarray | Callable[[int, int], np.ndarray]",
    n: int,
    dim: int,
    pq: ProductQuantization | None = None,
    config: GraphConfig | None = None,
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
    pq_m: int | None = None,
    training_sample: int = 65_536,
    seed: int = 0,
    compression: str = "pq",
    capacity: int | None = None,
    checkpoint_every: int = 0,
) -> tuple[GraphIndex, object]:
    """Stream-build an index bigger than device memory, writing as we go.

    ``vectors`` is either an in-memory array (tests) or a chunk loader
    ``f(start, stop) -> np.ndarray`` (the streaming case).  Returns the
    built graph + the compressed provider (the working set); the full
    index (graph + inline full-res vectors + compressed sidecar) is on
    disk at ``path``.

    ``compression="sq4"`` uses the TPU-native 4-bit scalar quantizer
    instead of PQ: the working set is half the size of 8-bit PQ codes,
    scoring is gather-light arithmetic ADC, and the saved index carries
    the fused-SQ4 feature so it can be served directly by
    :class:`jvector_tpu.disk.host_graph.HostGraphIndex` with bounded
    device memory — the full 100M larger-than-memory pipeline.

    ``checkpoint_every`` (waves; 0 = off) periodically persists
    the full build state to ``path + ".ckpt"``; re-running the same call
    resumes at the last checkpoint — multi-hour stream builds survive
    process or device loss.  Resumed builds are bit-identical to
    uninterrupted ones (deterministic wave order + checkpointed RNG).
    """
    sim = SimilarityFunction.parse(sim)
    config = config or GraphConfig()
    load = (lambda a, b: vectors[a:b]) if isinstance(vectors, np.ndarray) else vectors
    if compression == "sq4":
        return _build_on_disk_ltm_sq4(
            path, load, n, dim, config, sim, training_sample, seed, capacity,
            checkpoint_every,
        )

    import logging

    log = logging.getLogger(__name__)
    path = str(path)
    ckpt_file = path + ".ckpt"
    ckpt = None
    if checkpoint_every:
        ckpt = _ckpt_load(
            ckpt_file, path,
            {"n": n, "dim": dim, "compression": "pq", "sim": str(sim.value),
             "seed": seed, "row_cap": config.row_cap, **_config_knobs(config)},
        )

    # ---- phase A: PQ training on a sample --------------------------------
    def _fit_pq():
        rng = np.random.default_rng(seed)
        k = min(training_sample, n)
        sample_rows = np.sort(rng.choice(n, k, replace=False))
        # chunked gather keeps the sample read streaming-friendly
        chunks = []
        step = 262_144
        for a in range(0, n, step):
            in_chunk = sample_rows[(sample_rows >= a) & (sample_rows < a + step)]
            if len(in_chunk):
                blk = load(a, min(a + step, n))
                chunks.append(blk[in_chunk - a])
        sample = np.concatenate(chunks, axis=0)
        return ProductQuantization.compute(
            sample, m=pq_m or max(4, dim // 8), clusters=256, seed=seed
        )

    pq_arg = pq
    if ckpt is not None:
        r = ckpt["reader"]
        pq = ProductQuantization(
            codebooks=jnp.asarray(r.read("pq/codebooks", mmap=False)),
            center=(
                jnp.asarray(r.read("pq/center", mmap=False))
                if r.has_array("pq/center")
                else None
            ),
            original_dim=int(ckpt["meta"]["pq_original_dim"]),
        )
    elif pq is None:
        pq = _fit_pq()

    from jvector_tpu.graph.index import bucket_capacity

    n_cap = capacity if capacity else bucket_capacity(n)
    n_cap = max(-(-n_cap // 1024) * 1024, -(-n // 1024) * 1024)
    if ckpt is not None and int(ckpt["meta"]["n_cap"]) != n_cap:
        log.warning("checkpoint %s: layout mismatch, rebuilding", ckpt_file)
        ckpt = None
        pq = pq_arg if pq_arg is not None else _fit_pq()

    w = config.wave_size
    n_waves = (n + w - 1) // w
    seeds = _EntrySeedSampler(n, w, config.build_entry_seeds)
    waves_done = 0
    if ckpt is not None:
        # reopen the partial file BEFORE the heavy device restore (a
        # missing/shrunken file downgrades to a clean rebuild)
        try:
            writer = IndexFileWriter.resume(path, ckpt["meta"]["writer_state"])
        except (ValueError, OSError) as e:
            log.warning("cannot resume %s (%s); rebuilding", path, e)
            ckpt = None
            pq = pq_arg if pq_arg is not None else _fit_pq()
    if ckpt is not None:
        # restore without pre-allocating empty copies (see the sq4 path:
        # resume must peak at steady-state build HBM, not 2x)
        r = ckpt["reader"]
        from jvector_tpu.graph.index import GraphLayer

        codes = _upload_chunked(r.read("state/codes"))
        graph = GraphIndex(
            layers=(
                GraphLayer(
                    neighbors=_upload_chunked(r.read("graph/L0/neighbors")),
                    scores=_upload_chunked(r.read("graph/L0/scores")),
                    counts=_upload_chunked(r.read("graph/L0/counts")),
                ),
            ),
            level_node_ids=(),
            entry_node=jnp.int32(int(ckpt["meta"]["entry_node"])),
            num_nodes=jnp.int32(int(ckpt["meta"]["num_nodes"])),
            deleted=jnp.zeros((n_cap,), bool),
        )
        seeds.load_state_dict(ckpt["seeds_state"])
        waves_done = int(ckpt["meta"]["waves_done"])
        log.info("resuming ltm build at wave %d/%d", waves_done, n_waves)
    else:
        codes = jnp.zeros((n_cap, pq.m), jnp.uint8)
        graph = empty_graph(n_cap, config)
        writer = IndexFileWriter(path)
        writer.reserve_array(
            f"feature/{FeatureId.INLINE_VECTORS}/vectors", (n, dim), np.float32
        )

    def _checkpoint(wi_done: int) -> None:
        jax.block_until_ready(graph.base.neighbors)
        arrs = {
            "graph/L0/neighbors": (graph.base.neighbors, np.int32),
            "graph/L0/scores": (graph.base.scores, np.float32),
            "graph/L0/counts": (graph.base.counts, np.int32),
            "state/codes": (codes, np.uint8),
            "pq/codebooks": (pq.codebooks, np.float32),
        }
        if pq.center is not None:
            arrs["pq/center"] = (pq.center, np.float32)
        _ckpt_save(
            ckpt_file, writer, seeds, wi_done, arrs,
            dict(
                n=n, dim=dim, compression="pq", sim=str(sim.value),
                seed=seed, row_cap=config.row_cap, **_config_knobs(config),
                n_cap=n_cap, entry_node=int(graph.entry_node),
                num_nodes=int(graph.num_nodes),
                pq_original_dim=pq.original_dim,
            ),
        )
        log.info("ltm checkpoint at wave %d/%d", wi_done, n_waves)

    # ---- phase B: stream waves (shuffled order, see
    # graph.builder._shuffled_wave_starts — the loader only ever sees
    # contiguous chunk reads, and the inline vector writes are positional)
    for wi, start in enumerate(_shuffled_wave_starts(n, w)):
        if wi < waves_done:
            continue  # resumed: state already reflects these waves
        stop = min(start + w, n)
        wave_np = np.asarray(load(start, stop), np.float32)
        # full-res vectors go to disk NOW (never all in memory)
        writer.write_rows(
            f"feature/{FeatureId.INLINE_VECTORS}/vectors", start, wave_np
        )
        wave = jnp.asarray(wave_np)
        wave_codes = pq.encode(wave)
        codes = jax.lax.dynamic_update_slice_in_dim(codes, wave_codes, start, axis=0)
        provider = ADCScoreProvider(
            codes=codes, codebooks=pq.codebooks, center=pq.center, sim=sim
        )

        ids = np.arange(start, start + w, dtype=np.int32)
        ids = np.where(ids < n, ids, -1)
        if stop - start < w:  # ragged final wave: pad queries
            wave = jnp.concatenate(
                [wave, jnp.zeros((w - (stop - start), dim), jnp.float32)], axis=0
            )
        graph = _insert_wave(
            graph, provider, jnp.asarray(ids), wave, config,
            seed_ids=seeds.sample(),
        )
        seeds.record(ids)
        if (
            checkpoint_every
            and (wi + 1) % checkpoint_every == 0
            and (wi + 1) < n_waves
        ):
            _checkpoint(wi + 1)

    # ---- phase C: cleanup + persist graph ---------------------------------
    provider = ADCScoreProvider(
        codes=codes, codebooks=pq.codebooks, center=pq.center, sim=sim
    )
    builder = GraphIndexBuilder(config)
    graph = builder.cleanup(graph, provider, vectors=None)
    # entry point: PQ-decoded centroid proxy — nearest to mean of decoded set
    centroid = jnp.mean(pq.decode(codes[: min(n, 65_536)]), axis=0, keepdims=True)
    graph = graph._replace(
        entry_node=jnp.int32(_entry_by_centroid(provider, centroid, n))
    )

    for l, layer in enumerate(graph.layers):
        writer.add_array(f"graph/L{l}/neighbors", np.asarray(layer.neighbors))
        writer.add_array(f"graph/L{l}/counts", np.asarray(layer.counts))
    writer.add_array(f"feature/{FeatureId.PQ_CODES}/codes", np.asarray(codes))
    writer.add_array(
        f"feature/{FeatureId.PQ_CODES}/codebooks", np.asarray(pq.codebooks)
    )
    if pq.center is not None:
        writer.add_array(f"feature/{FeatureId.PQ_CODES}/center", np.asarray(pq.center))
    writer.set_meta(
        num_levels=graph.num_levels,
        entry_node=int(graph.entry_node),
        num_nodes=int(graph.num_nodes),
        features=[FeatureId.INLINE_VECTORS, FeatureId.PQ_CODES],
        similarity=str(sim.value),
        dimension=dim,
        pq_original_dim=pq.original_dim,
        ltm=True,
    )
    writer.close()
    # Remove even when this run had checkpoint_every=0: a stale .ckpt from an
    # earlier crashed run must never outlive a freshly committed index (a
    # later checkpointed run would otherwise try to resume over it).
    if os.path.exists(ckpt_file):
        os.remove(ckpt_file)
    return graph, provider


def _build_on_disk_ltm_sq4(
    path, load, n, dim, config, sim, training_sample, seed, capacity=None,
    checkpoint_every=0,
):
    """SQ4 LTM build: 4-bit working set + fused-SQ4 save for host serving."""
    from jvector_tpu.graph.score import (
        SQ4ScoreProvider,
        build_fused_sq4,
        sq4_aug_rows,
    )
    from jvector_tpu.quantization.sq import ScalarQuantization4

    path = str(path)
    ckpt_file = path + ".ckpt"
    ckpt = None
    if checkpoint_every:
        ckpt = _ckpt_load(
            ckpt_file, path,
            {"n": n, "dim": dim, "compression": "sq4", "sim": str(sim.value),
             "seed": seed, **_config_knobs(config)},
        )
    def _fit_sq():
        rng = np.random.default_rng(seed)
        k = min(training_sample, n)
        sample_rows = np.sort(rng.choice(n, k, replace=False))
        chunks = []
        step = 262_144
        for a in range(0, n, step):
            in_chunk = sample_rows[(sample_rows >= a) & (sample_rows < a + step)]
            if len(in_chunk):
                blk = load(a, min(a + step, n))
                chunks.append(np.asarray(blk)[in_chunk - a])
        return ScalarQuantization4.compute(np.concatenate(chunks, axis=0))

    if ckpt is not None:
        sq = ScalarQuantization4(
            scale=jnp.asarray(ckpt["reader"].read("sq/scale", mmap=False)),
            offset=jnp.asarray(ckpt["reader"].read("sq/offset", mmap=False)),
            original_dim=int(ckpt["meta"]["sq_original_dim"]),
        )
    else:
        sq = _fit_sq()

    from jvector_tpu.graph.builder import _fused_aligned_config
    from jvector_tpu.graph.index import bucket_capacity

    # one-shot big builds can pin capacity to ~n: the default 12.5%-slack
    # compile bucket costs ~560 MB of padded graph arrays at 10M — the
    # margin between the update program compiling and an HBM OOM.  Keep a
    # 1024 alignment so layouts stay tidy.
    n_cap = capacity if capacity else bucket_capacity(n)
    n_cap = max(-(-n_cap // 1024) * 1024, -(-n // 1024) * 1024)
    mp = sq.compressed_size
    # Fused-accelerated LTM construction: when the incremental fused code
    # table fits device memory, build with the same fused wave programs as
    # the in-memory path (one 4 KB row gather per expansion instead of R
    # code rows).  Past the budget, fall back to plain augmented-row
    # searches (gather-bound but O(codes) HBM) — the 100M regime.
    config = _fused_aligned_config(config, mp)
    fused_bytes = n_cap * config.row_cap * (mp + 4)
    fused_build = (
        (config.row_cap * mp) % 1024 == 0
        and (mp % 128 == 0 or 128 % mp == 0)
        and fused_bytes < _FUSED_BUILD_BUDGET
    )
    # Past the fused budget (the 10M+/100M regime) the adjacency itself
    # switches to the packed [N/8, 8, 128] int32 layout updated in place
    # by the adj-only Pallas apply: HALF the graph HBM of the lane-padded
    # [N, R] pair (5.1 GB vs 10.2 GB at 10M) and no per-wave XLA scatter
    # copies (which scale with table size).  See builder.py's packed-wave
    # module comment.
    from jvector_tpu.graph.builder import _packed_adj_eligible

    packed_build = (not fused_build) and _packed_adj_eligible(config, n_cap)
    # non-fused builds keep ONE device copy of the codes (inside the aug
    # rows); a separate codes array duplicated 1.25 GB (padded) at 10M and
    # tipped HBM over the compile budget.  The fused path needs the real
    # array (fused table updates gather from it).

    def make_provider(codes, node_w2, node_norm2, aug):
        # empty fused tables: the build scores via plain (augmented) code
        # rows; the fused layout is written once the adjacency is final
        return SQ4ScoreProvider(
            codes_packed=codes,
            node_w2=node_w2,
            node_norm2=node_norm2,
            fused_packed=jnp.zeros((n_cap, 0), jnp.uint8),
            fused_w2=jnp.zeros((n_cap, 0), jnp.float32),
            scale=sq.scale,
            offset=sq.offset,
            codes_aug=aug,
            sim=sim,
        )

    import logging
    import time as _time

    log = logging.getLogger(__name__)
    if fused_build:
        from jvector_tpu.graph.builder import _wave_search, _wave_update_fused
    if packed_build:
        from jvector_tpu.graph.builder import (
            _empty_packed_adjacency,
            _wave_apply_adj_only,
            _wave_search,
            _wave_update_compute,
            packed_cleanup,
        )

    w = config.wave_size
    n_waves = (n + w - 1) // w
    seeds = _EntrySeedSampler(n, w, config.build_entry_seeds)
    waves_done = 0
    if ckpt is not None and (
        int(ckpt["meta"]["n_cap"]) != n_cap
        or int(ckpt["meta"]["row_cap"]) != config.row_cap
        or bool(ckpt["meta"]["fused"]) != fused_build
        or bool(ckpt["meta"].get("packed", False)) != packed_build
    ):
        log.warning("checkpoint %s: layout mismatch, rebuilding", ckpt_file)
        ckpt, sq = None, _fit_sq()
    if ckpt is not None:
        # reopen the partial file BEFORE the heavy device restore — a
        # missing/shrunken file downgrades to a clean rebuild, never a
        # zero-extended one (IndexFileWriter.resume refuses those)
        try:
            writer = IndexFileWriter.resume(path, ckpt["meta"]["writer_state"])
        except (ValueError, OSError) as e:
            log.warning("cannot resume %s (%s); rebuilding", path, e)
            ckpt, sq = None, _fit_sq()
    if ckpt is not None:
        # device state comes straight from the checkpoint — nothing is
        # pre-allocated, so resume peaks at steady-state build HBM + one
        # upload chunk (at 10M the graph arrays alone are ~10 GB physical;
        # a second zero-allocated copy would OOM the 16 GB chip)
        r = ckpt["reader"]
        from jvector_tpu.graph.index import GraphLayer

        if packed_build:
            graph = None
            adj = _upload_chunked(r.read("state/adj_packed"))
            counts = _upload_chunked(r.read("graph/L0/counts"))
            entry = jnp.int32(int(ckpt["meta"]["entry_node"]))
            num_nodes = jnp.int32(int(ckpt["meta"]["num_nodes"]))
        else:
            graph = GraphIndex(
                layers=(
                    GraphLayer(
                        neighbors=_upload_chunked(r.read("graph/L0/neighbors")),
                        scores=_upload_chunked(r.read("graph/L0/scores")),
                        counts=_upload_chunked(r.read("graph/L0/counts")),
                    ),
                ),
                level_node_ids=(),
                entry_node=jnp.int32(int(ckpt["meta"]["entry_node"])),
                num_nodes=jnp.int32(int(ckpt["meta"]["num_nodes"])),
                deleted=jnp.zeros((n_cap,), bool),
            )
        aug = _upload_chunked(r.read("state/aug"))
        node_w2 = _upload_chunked(r.read("state/node_w2"))
        node_norm2 = _upload_chunked(r.read("state/node_norm2"))
        if fused_build:
            codes = _upload_chunked(r.read("state/codes"))
            fused_packed = _upload_chunked(r.read("state/fused_packed"))
            fused_w2 = _upload_chunked(r.read("state/fused_w2"))
        else:
            codes = None
        seeds.load_state_dict(ckpt["seeds_state"])
        waves_done = int(ckpt["meta"]["waves_done"])
        log.info("resuming ltm build at wave %d/%d", waves_done, n_waves)
    else:
        node_w2 = jnp.zeros((n_cap,), jnp.float32)
        node_norm2 = jnp.zeros((n_cap,), jnp.float32)
        aug = jnp.zeros((n_cap, mp + 4), jnp.uint8)
        if fused_build:
            k_row = config.row_cap * mp
            fused_packed = jnp.zeros((n_cap, k_row // 128, 128), jnp.uint8)
            fused_w2 = jnp.zeros((n_cap, config.row_cap), jnp.float32)
            codes = jnp.zeros((n_cap, mp), jnp.uint8)
        else:
            codes = None  # aug-backed provider (one device copy of the codes)
        if packed_build:
            # the packed table IS the graph until unpack; built directly —
            # packing an empty [N, R] layer materializes ~5x the table
            # transiently, which OOMs the chip at 10M (r4 measured)
            adj = _empty_packed_adjacency(n_cap, config.row_cap)
            counts = jnp.zeros((n_cap,), jnp.int32)
            entry = jnp.int32(-1)
            num_nodes = jnp.int32(0)
            graph = None
        else:
            graph = empty_graph(n_cap, config)
        writer = IndexFileWriter(path)
        writer.reserve_array(
            f"feature/{FeatureId.INLINE_VECTORS}/vectors", (n, dim), np.float32
        )

    def _checkpoint(wi_done: int) -> None:
        if packed_build:
            jax.block_until_ready(adj)
            arrs = {
                "state/adj_packed": (adj, np.int32),
                "graph/L0/counts": (counts, np.int32),
            }
            ckpt_entry, ckpt_num = int(entry), int(num_nodes)
        else:
            jax.block_until_ready(graph.base.neighbors)
            arrs = {
                "graph/L0/neighbors": (graph.base.neighbors, np.int32),
                "graph/L0/scores": (graph.base.scores, np.float32),
                "graph/L0/counts": (graph.base.counts, np.int32),
            }
            ckpt_entry, ckpt_num = int(graph.entry_node), int(graph.num_nodes)
        arrs.update(
            {
                "state/aug": (aug, np.uint8),
                "state/node_w2": (node_w2, np.float32),
                "state/node_norm2": (node_norm2, np.float32),
                "sq/scale": (sq.scale, np.float32),
                "sq/offset": (sq.offset, np.float32),
            }
        )
        if fused_build:
            arrs["state/codes"] = (codes, np.uint8)
            arrs["state/fused_packed"] = (fused_packed, np.uint8)
            arrs["state/fused_w2"] = (fused_w2, np.float32)
        _ckpt_save(
            ckpt_file, writer, seeds, wi_done, arrs,
            dict(
                n=n, dim=dim, compression="sq4", sim=str(sim.value),
                seed=seed, **_config_knobs(config),
                n_cap=n_cap, row_cap=config.row_cap, fused=fused_build,
                packed=packed_build,
                entry_node=ckpt_entry,
                num_nodes=ckpt_num,
                sq_original_dim=sq.original_dim,
            ),
        )
        log.info("ltm checkpoint at wave %d/%d", wi_done, n_waves)

    if packed_build:
        # placeholder args for _wave_update_compute's fused-only params
        # (with_fused=False never touches them; tiny fixed shapes keep the
        # jit cache stable across waves)
        _PACKED_DUMMY_CODES = jnp.zeros((8, 2), jnp.uint8)
        _PACKED_DUMMY_CONST = jnp.zeros((8,), jnp.float32)

    t_wave = _time.time()
    for wi, start in enumerate(_shuffled_wave_starts(n, w)):
        if wi < waves_done:
            continue  # resumed: state already reflects these waves
        if wi and wi % 256 == 0:
            # bounded sync: surfaces async device faults at an attributable
            # wave instead of at save time, and keeps the dispatch queue short
            jax.block_until_ready(adj if packed_build else graph.base.neighbors)
            log.info(
                "ltm build wave %d/%d (%.1fs)",
                wi, (n + w - 1) // w, _time.time() - t_wave,
            )
        stop = min(start + w, n)
        wave_np = np.asarray(load(start, stop), np.float32)
        writer.write_rows(
            f"feature/{FeatureId.INLINE_VECTORS}/vectors", start, wave_np
        )
        wave = jnp.asarray(wave_np)
        aug, node_w2, node_norm2, wave_codes = _ltm_wave_encode(
            aug, node_w2, node_norm2, sq, wave, jnp.int32(start),
            cosine=sim == SimilarityFunction.COSINE,
        )
        if fused_build:
            codes = jax.lax.dynamic_update_slice_in_dim(
                codes, wave_codes, start, axis=0
            )
        provider = make_provider(codes, node_w2, node_norm2, aug)

        ids = np.arange(start, start + w, dtype=np.int32)
        ids = np.where(ids < n, ids, -1)
        if stop - start < w:
            wave = jnp.concatenate(
                [wave, jnp.zeros((w - (stop - start), dim), jnp.float32)], axis=0
            )
        seed_dev = seeds.sample()
        if fused_build:
            # fused wave search + slot-exact table maintenance; the rescore
            # and prune run on the SAME SQ4 provider (full-res rows of
            # arbitrary existing nodes are not device-resident in LTM — the
            # tie-break jitter covers quantized prune ties, and the
            # adversarial fan-in test runs against this path)
            bp = dataclasses.replace(
                provider, fused_packed=fused_packed, fused_w2=fused_w2
            )
            ids_dev = jnp.asarray(ids)
            beam_ids, beam_scores = _wave_search(
                graph.base.neighbors, bp, graph.entry_node, ids_dev, wave,
                config, seed_dev,
            )
            node_const = (
                node_norm2 if sim == SimilarityFunction.COSINE else node_w2
            )
            graph, fused_packed, fused_w2 = _wave_update_fused(
                graph, fused_packed, fused_w2, provider, codes, node_const,
                ids_dev, wave, beam_ids, beam_scores, config,
            )
        elif packed_build:
            # packed three-program wave (builder.py packed-wave comment):
            # read-only search on the packed table, read+compute against
            # pre-state, aliased adj-only Pallas apply.  rescore=False /
            # same-provider mirrors the _insert_wave LTM semantics.
            ids_dev = jnp.asarray(ids)
            beam_ids, beam_scores = _wave_search(
                adj, provider, entry, ids_dev, wave, config, seed_dev
            )
            counts, entry, num_nodes, adj_stream, _ = _wave_update_compute(
                adj, counts, entry, num_nodes, provider,
                _PACKED_DUMMY_CODES, _PACKED_DUMMY_CONST, ids_dev, wave,
                beam_ids, beam_scores, config,
                rescore=False, with_fused=False,
            )
            adj = _wave_apply_adj_only(adj, adj_stream)
        else:
            graph = _insert_wave(
                graph, provider, jnp.asarray(ids), wave, config,
                seed_ids=seed_dev,
            )
        seeds.record(ids)
        if (
            checkpoint_every
            and (wi + 1) % checkpoint_every == 0
            and (wi + 1) < n_waves
        ):
            _checkpoint(wi + 1)

    provider = make_provider(codes, node_w2, node_norm2, aug)
    if packed_build:
        # enforce-degree on the PACKED layout first: the unpacked enforce
        # scatters whole rows, and at 10M its table copy alone exceeds the
        # chip (10.2 GB tables + 10.2 GB scatter copy); the packed pass is
        # contiguous in-place slice updates, no copies
        jax.block_until_ready(adj)
        log.info("ltm packed waves done (%.1fs); cleanup", _time.time() - t_wave)
        adj, counts = packed_cleanup(adj, counts, provider, config, num_nodes)
        # unpack via a host round-trip: on-device unpack would hold the
        # packed table (5.1 GB at 10M) AND the lane-padded halves (10.2 GB)
        # at once — over HBM.  Download packed chunks, free the table,
        # upload the halves; peak device = max of the two layouts + chunk.
        jax.block_until_ready(adj)
        log.info("ltm packed cleanup done (%.1fs); unpack", _time.time() - t_wave)
        nb_np, sc_np = _download_unpack_adj(adj, config.row_cap)
        del adj
        from jvector_tpu.graph.index import GraphLayer

        graph = GraphIndex(
            layers=(
                GraphLayer(
                    neighbors=_upload_chunked(nb_np),
                    scores=_upload_chunked(sc_np),
                    counts=counts,
                ),
            ),
            level_node_ids=(),
            entry_node=entry,
            num_nodes=num_nodes,
            deleted=jnp.zeros((n_cap,), bool),
        )
        nb_host = nb_np  # reused by the save (L0 write + host fused layout)
        del sc_np
    else:
        nb_host = None
    jax.block_until_ready(graph.base.neighbors)
    if fused_build:
        # cleanup rewrites rows wholesale; the save phase rebuilds the
        # fused layout from the FINAL adjacency, so free the working tables
        del fused_packed, fused_w2, bp
    log.info("ltm build waves done (%.1fs); cleanup", _time.time() - t_wave)
    builder = GraphIndexBuilder(config)
    # packed builds already enforced degree on the packed layout above
    graph = builder.cleanup(graph, provider, vectors=None,
                            enforce=not packed_build)
    jax.block_until_ready(graph.base.neighbors)
    log.info("ltm cleanup done (%.1fs); save", _time.time() - t_wave)
    centroid = jnp.mean(provider.decode(jnp.arange(min(n, 65_536))), axis=0)[None]
    graph = graph._replace(
        entry_node=jnp.int32(_entry_by_centroid(provider, centroid, n))
    )

    if config.add_hierarchy:
        # Upper levels over ~n/max_degree sampled nodes (the slice the
        # reference's on-disk format keeps IN MEMORY while L0 streams,
        # OnDiskGraphIndex.java:132-162).  Their full-res vectors are
        # fetched from the source in one chunked pass — at 10M x 128d the
        # level-1 slice is ~312k rows / 160 MB, device-resident with room
        # to spare even in the 100M regime.
        from jvector_tpu.graph.hierarchy import assign_levels

        t_h = _time.time()
        levels = assign_levels(n, config.max_degree, seed)
        sub_ids = np.where(levels >= 1)[0].astype(np.int32)
        if len(sub_ids):
            sub_vecs = np.empty((len(sub_ids), dim), np.float32)
            pos = 0
            step = 262_144
            for a in range(0, n, step):
                sel = sub_ids[(sub_ids >= a) & (sub_ids < a + step)]
                if len(sel):
                    blk = np.asarray(load(a, min(a + step, n)))
                    sub_vecs[pos : pos + len(sel)] = blk[sel - a]
                    pos += len(sel)
            graph = GraphIndexBuilder(config).build_hierarchy_from_subset(
                graph, sub_ids, jnp.asarray(sub_vecs),
                levels[sub_ids], sim,
            )
            log.info(
                "ltm hierarchy: %d levels over %d nodes (%.1fs)",
                graph.num_levels - 1, len(sub_ids), _time.time() - t_h,
            )

    # final fused layout against the cleaned adjacency -> host-servable.
    # Small indexes keep the fused tables on device (fast in-HBM serving);
    # big ones stream fused chunks straight into the file and return a
    # fused-less provider — serving then goes through HostGraphIndex.
    const = node_norm2 if sim == SimilarityFunction.COSINE else node_w2
    r_cap = graph.row_cap
    fused_bytes = n_cap * r_cap * (mp + 4)
    keep_fused_on_device = fused_bytes < _FUSED_SERVE_BUDGET

    if not keep_fused_on_device and nb_host is None:
        # one bounded-chunk download, reused for BOTH the L0 write and the
        # host-side fused layout below
        nb_host = np.empty((n_cap, r_cap), np.int32)
        step = max(1, (256 << 20) // (r_cap * 4))
        for a in range(0, n_cap, step):
            b = min(a + step, n_cap)
            nb_host[a:b] = np.asarray(graph.base.neighbors[a:b])
    for l, layer in enumerate(graph.layers):
        if l == 0 and nb_host is not None:
            writer.add_array("graph/L0/neighbors", nb_host)
        else:
            _add_array_chunked(
                writer, f"graph/L{l}/neighbors", layer.neighbors, np.int32
            )
        writer.add_array(f"graph/L{l}/counts", np.asarray(layer.counts))
        if l >= 1:
            writer.add_array(
                f"graph/L{l}/node_ids", np.asarray(graph.level_node_ids[l - 1])
            )
    f = f"feature/{FeatureId.FUSED_SQ4}"
    if codes is None:
        # materialize the [N, MP] view once for the save/fused-layout pass
        # (the wave loop is over; the transient fits easily now)
        codes = provider._codes_array()
    if keep_fused_on_device:
        _add_array_chunked(writer, f"{f}/codes_packed", codes, np.uint8)
        codes_np = None
    else:
        # download once, write from host; the same copy feeds the
        # host-side fused layout below
        codes_np = np.empty((n_cap, mp), np.uint8)
        step = max(1, (256 << 20) // mp)
        for a in range(0, n_cap, step):
            b = min(a + step, n_cap)
            codes_np[a:b] = np.asarray(codes[a:b])
        writer.add_array(f"{f}/codes_packed", codes_np)
    writer.add_array(f"{f}/node_const", np.asarray(const))
    if keep_fused_on_device:
        fused_packed, fused_w2 = build_fused_sq4(graph.base.neighbors, codes, const)
        provider = SQ4ScoreProvider(
            codes_packed=codes,
            node_w2=node_w2,
            node_norm2=node_norm2,
            fused_packed=fused_packed,
            fused_w2=fused_w2,
            scale=sq.scale,
            offset=sq.offset,
            codes_aug=aug,
            sim=sim,
        )
        _add_array_chunked(writer, f"{f}/fused_packed", fused_packed, np.uint8)
        _add_array_chunked(writer, f"{f}/fused_w2", fused_w2, np.float32)
    else:
        provider = make_provider(codes, node_w2, node_norm2, aug)
        writer.reserve_array(
            f"{f}/fused_packed", (n_cap, r_cap * mp), np.uint8
        )
        writer.reserve_array(f"{f}/fused_w2", (n_cap, r_cap), np.float32)
        # HOST-side fused layout: a pure gather of host-resident codes.
        # Computing it on device downloads (MP+4) x N x R bytes over the
        # link — 41 GB / ~38 min at 10M on the tunnel — for zero FLOPs.
        from jvector_tpu.graph.score import build_fused_sq4_host

        const_np = np.asarray(const)
        chunk = max(1, (1 << 29) // (r_cap * mp))
        for a in range(0, n_cap, chunk):
            b = min(a + chunk, n_cap)
            fp_c, fw_c = build_fused_sq4_host(
                nb_host[a:b], codes_np, const_np
            )
            writer.write_rows(f"{f}/fused_packed", a, fp_c)
            writer.write_rows(f"{f}/fused_w2", a, fw_c)
    writer.add_array(f"{f}/scale", np.asarray(sq.scale))
    writer.add_array(f"{f}/offset", np.asarray(sq.offset))
    writer.set_meta(
        num_levels=graph.num_levels,
        entry_node=int(graph.entry_node),
        num_nodes=int(graph.num_nodes),
        features=[FeatureId.INLINE_VECTORS, FeatureId.FUSED_SQ4],
        similarity=str(sim.value),
        dimension=dim,
        ltm=True,
    )
    writer.close()
    # Remove even when this run had checkpoint_every=0: a stale .ckpt from an
    # earlier crashed run must never outlive a freshly committed index (a
    # later checkpointed run would otherwise try to resume over it).
    if os.path.exists(ckpt_file):
        os.remove(ckpt_file)
    return graph, provider
