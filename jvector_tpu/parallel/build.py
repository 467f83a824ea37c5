"""ICI-sharded index construction + sharded serving.

The 100M / v5e-pod design (SURVEY.md §2.9 [TPU note], BASELINE config 5):

- **Build**: nodes are partitioned across the mesh; every chip builds the
  Vamana graph of its own shard with the ordinary wave-insert step running
  shard-locally under ``shard_map`` — zero collectives in the build loop, so
  construction scales linearly with chips (the TPU analog of the reference's
  "construction scales linearly with cores", README.md:27-29).
- **Serve**: queries are replicated; each chip beam-searches its shard; the
  per-shard topK merge is ONE ``all_gather`` + top-k over ICI.  This is the
  reference's multi-index scatter-gather contract (one index per sstable,
  ``GraphSearcher.java:386-404``) with the merge moved on-chip.
- A pod-built sharded index can later be merged into a single graph with
  ``disk.compaction.compact_indexes`` (shards are just compaction sources).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jvector_tpu.graph.builder import _insert_wave
from jvector_tpu.graph.index import GraphConfig, GraphIndex, empty_graph
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.graph.searcher import search_layer
from jvector_tpu.ops.similarity import SimilarityFunction


@dataclasses.dataclass
class ShardedIndex:
    """Per-shard graphs/providers stacked on a leading device axis."""

    graphs: GraphIndex  # every leaf has leading [n_shards, ...]
    providers: ExactScoreProvider  # vectors [n_shards, n_local, D]
    n_shards: int
    n_local: int  # capacity per shard
    n_total: int  # true corpus size

    def global_ids(self, shard: int, local_ids: np.ndarray) -> np.ndarray:
        return shard * self.n_local + local_ids


def _shard_specs(tree, axis: str):
    return jax.tree.map(lambda _: P(axis), tree)


def sharded_build(
    vectors: np.ndarray,
    mesh: Mesh,
    config: GraphConfig | None = None,
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
    axis: str = "shard",
) -> ShardedIndex:
    """Build one subgraph per mesh device over a round-robin node partition."""
    sim = SimilarityFunction.parse(sim)
    config = config or GraphConfig()
    n_dev = mesh.devices.size
    n, d = vectors.shape
    n_local = -(-n // n_dev)
    pad = n_dev * n_local - n
    vp = np.concatenate([vectors, np.zeros((pad, d), np.float32)]) if pad else vectors
    # block partition: shard s owns global ids [s*n_local, (s+1)*n_local)
    stacked = jnp.asarray(vp.reshape(n_dev, n_local, d))
    stacked = jax.device_put(stacked, NamedSharding(mesh, P(axis, None, None)))

    providers = ExactScoreProvider(vectors=stacked, sim=sim)

    # per-shard empty graphs, stacked
    proto = empty_graph(n_local, config)
    graphs = jax.tree.map(
        lambda leaf: jax.device_put(
            jnp.broadcast_to(leaf[None], (n_dev,) + leaf.shape),
            NamedSharding(mesh, P(axis, *([None] * leaf.ndim))),
        ),
        proto,
    )

    # per-shard live count (the final shard may be ragged)
    counts = np.full(n_dev, n_local, np.int64)
    if pad:
        counts[-1] = n_local - pad

    def _step_local(g, p, ids, wv):
        # shard_map blocks keep a leading size-1 device axis; strip it,
        # run the ordinary single-shard wave insert, restore it.
        g0 = jax.tree.map(lambda x: x[0], g)
        p0 = jax.tree.map(lambda x: x[0], p)
        out = _insert_wave(g0, p0, ids[0, 0], wv[0, 0], config)
        return jax.tree.map(lambda x: x[None], out)

    step = jax.jit(
        jax.shard_map(
            _step_local,
            mesh=mesh,
            in_specs=(
                _shard_specs(graphs, axis),
                _shard_specs(providers, axis),
                P(axis, None, None),
                P(axis, None, None, None),
            ),
            out_specs=_shard_specs(graphs, axis),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )

    w = config.wave_size
    for start in range(0, n_local, w):
        ids = np.arange(start, start + w, dtype=np.int32)
        # per-shard validity differs only on the ragged final shard
        ids_per_shard = np.broadcast_to(ids, (n_dev, w)).copy()
        for s in range(n_dev):
            ids_per_shard[s] = np.where(ids < counts[s], ids, -1)
        wave_vecs = stacked[:, np.clip(ids, 0, n_local - 1), :]
        graphs = step(
            graphs,
            providers,
            jax.device_put(
                jnp.asarray(ids_per_shard)[:, None, :],
                NamedSharding(mesh, P(axis, None, None)),
            ),
            jax.device_put(
                wave_vecs[:, None], NamedSharding(mesh, P(axis, None, None, None))
            ),
        )

    return ShardedIndex(
        graphs=graphs,
        providers=providers,
        n_shards=n_dev,
        n_local=n_local,
        n_total=n,
    )


def sharded_graph_search(
    index: ShardedIndex,
    queries: jax.Array,
    mesh: Mesh,
    top_k: int,
    beam_width: int | None = None,
    axis: str = "shard",
):
    """Replicated queries, shard-local beam search, ICI all-gather merge.

    Returns global ids ``[Q, top_k]`` + scores.
    """
    beam_width = beam_width or max(top_k, 100)
    n_local = index.n_local
    n_total = index.n_total

    def local_search(graph, provider, q):
        graph = jax.tree.map(lambda x: x[0], graph)
        provider = jax.tree.map(lambda x: x[0], provider)
        qstate = provider.prepare(q)
        qn = q.shape[0]
        entries = jnp.broadcast_to(graph.entry_node[None], (qn,)).astype(jnp.int32)
        beam = search_layer(
            graph.base.neighbors,
            provider,
            qstate,
            entries,
            beam_width=beam_width,
            max_iters=1000,
        )
        s, sel = jax.lax.top_k(beam.scores, top_k)
        local_ids = jnp.take_along_axis(beam.ids, sel, axis=1)
        shard = jax.lax.axis_index(axis)
        gids = jnp.where(local_ids >= 0, local_ids + shard * n_local, -1)
        s = jnp.where((gids >= 0) & (gids < n_total), s, -jnp.inf)
        gids = jnp.where(s > -jnp.inf, gids, -1)
        # merge across shards on ICI
        s_all = jax.lax.all_gather(s, axis, axis=1).reshape(qn, -1)
        g_all = jax.lax.all_gather(gids, axis, axis=1).reshape(qn, -1)
        sm, pick = jax.lax.top_k(s_all, top_k)
        return jnp.take_along_axis(g_all, pick, axis=1), sm

    fn = jax.jit(
        jax.shard_map(
            local_search,
            mesh=mesh,
            in_specs=(
                _shard_specs(index.graphs, axis),
                _shard_specs(index.providers, axis),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return fn(index.graphs, index.providers, queries)
