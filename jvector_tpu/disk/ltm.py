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

from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.disk.format import FeatureId, IndexFileWriter
from jvector_tpu.graph.builder import GraphIndexBuilder, _insert_wave
from jvector_tpu.graph.index import GraphConfig, GraphIndex, empty_graph
from jvector_tpu.graph.score import ADCScoreProvider
from jvector_tpu.ops.similarity import SimilarityFunction
from jvector_tpu.quantization.pq import ProductQuantization


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
) -> tuple[GraphIndex, ADCScoreProvider]:
    """Stream-build an index bigger than device memory, writing as we go.

    ``vectors`` is either an in-memory array (tests) or a chunk loader
    ``f(start, stop) -> np.ndarray`` (the streaming case).  Returns the
    built graph + the PQ provider (the compressed working set); the full
    index (graph + inline full-res vectors + PQ sidecar) is on disk at
    ``path``.
    """
    sim = SimilarityFunction.parse(sim)
    config = config or GraphConfig()
    load = (lambda a, b: vectors[a:b]) if isinstance(vectors, np.ndarray) else vectors

    # ---- phase A: PQ training on a sample --------------------------------
    if pq is None:
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
        pq = ProductQuantization.compute(
            sample, m=pq_m or max(4, dim // 8), clusters=256, seed=seed
        )

    from jvector_tpu.graph.index import bucket_capacity

    n_cap = bucket_capacity(n)
    codes = jnp.zeros((n_cap, pq.m), jnp.uint8)
    graph = empty_graph(n_cap, config)

    writer = IndexFileWriter(path)
    writer.reserve_array(f"feature/{FeatureId.INLINE_VECTORS}/vectors", (n, dim), np.float32)

    # ---- phase B: stream waves -------------------------------------------
    w = config.wave_size
    for start in range(0, n, w):
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
        graph = _insert_wave(graph, provider, jnp.asarray(ids), wave, config)

    # ---- phase C: cleanup + persist graph ---------------------------------
    provider = ADCScoreProvider(
        codes=codes, codebooks=pq.codebooks, center=pq.center, sim=sim
    )
    builder = GraphIndexBuilder(config)
    graph = builder.cleanup(graph, provider, vectors=None)
    # entry point: PQ-decoded centroid proxy — nearest to mean of decoded set
    centroid = jnp.mean(pq.decode(codes[: min(n, 65_536)]), axis=0, keepdims=True)
    qstate = provider.prepare(centroid)
    entry_scores = provider.score(
        qstate, jnp.arange(n_cap, dtype=jnp.int32)[None, :]
    )[0]
    entry_scores = jnp.where(jnp.arange(n_cap) < n, entry_scores, -jnp.inf)
    graph = graph._replace(entry_node=jnp.argmax(entry_scores).astype(jnp.int32))

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
    return graph, provider
