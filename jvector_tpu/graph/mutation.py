"""Index mutation: tombstone deletes, FreshDiskANN splice cleanup, inserts.

Reference: ``GraphIndexBuilder.markNodeDeleted`` (tombstone bitset),
``removeDeletedNodes:689-799`` (FreshDiskANN §4.2 edge splice: a live node
whose neighbor is deleted inherits that neighbor's live neighbors, then
re-prunes), and incremental ``addGraphNode`` on an existing index.

TPU redesign: the splice runs as a batched pass over row chunks — gather the
2-hop frontier through deleted neighbors, dedup, rescore against the owner,
robust-prune — instead of per-node sequential splicing.  Capacity growth for
inserts is a host-side array pad + the ordinary wave-insert step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.builder import GraphIndexBuilder, _insert_wave
from jvector_tpu.graph.diversity import dedup_sorted_desc, robust_prune
from jvector_tpu.graph.index import (
    NEG_INF,
    GraphConfig,
    GraphIndex,
    GraphLayer,
)
from jvector_tpu.graph.score import ExactScoreProvider


def mark_deleted(graph: GraphIndex, ids) -> GraphIndex:
    """Tombstone nodes (kept traversable until :func:`remove_deleted`)."""
    ids = jnp.asarray(ids, jnp.int32)
    return graph._replace(deleted=graph.deleted.at[ids].set(True))


# NOTE: no donation — the incoming graph may share buffers with a caller's
# pre-delete graph (mark_deleted only replaces the tombstone array).
@partial(jax.jit, static_argnames=("config", "chunk"))
def _splice_chunk(
    graph: GraphIndex, provider, start: jax.Array, config: GraphConfig, chunk: int
) -> GraphIndex:
    """Splice one chunk of live rows around their deleted neighbors."""
    layer = graph.base
    N_cap, R = layer.neighbors.shape
    M = config.max_degree
    rows = start + jnp.arange(chunk, dtype=jnp.int32)
    safe_rows = jnp.minimum(rows, N_cap - 1)
    row_live = (rows < N_cap) & ~graph.deleted[safe_rows] & (layer.counts[safe_rows] > 0)

    nbrs = layer.neighbors[safe_rows]  # [B, R]
    scores = layer.scores[safe_rows]
    nbr_valid = nbrs >= 0
    nbr_deleted = nbr_valid & graph.deleted[jnp.maximum(nbrs, 0)]
    needs = row_live & jnp.any(nbr_deleted, axis=1)

    # candidates: live 1-hop neighbors + 2-hop through deleted neighbors
    live_ids = jnp.where(nbr_valid & ~nbr_deleted, nbrs, -1)
    live_scores = jnp.where(live_ids >= 0, scores, NEG_INF)

    hop_src = jnp.where(nbr_deleted, nbrs, 0)
    two_hop = layer.neighbors[hop_src]  # [B, R, R]
    two_hop = jnp.where(nbr_deleted[:, :, None], two_hop, -1).reshape(chunk, R * R)
    # drop deleted/2-hop self references; score against owner
    th_valid = (two_hop >= 0) & ~graph.deleted[jnp.maximum(two_hop, 0)]
    th_valid &= two_hop != safe_rows[:, None]
    two_hop = jnp.where(th_valid, two_hop, -1)
    th_scores = jnp.where(
        th_valid,
        provider.score_nodes(safe_rows, jnp.maximum(two_hop, 0)),
        NEG_INF,
    )

    # Truncate only the 2-hop flood by score; the node's EXISTING live edges
    # always ride into the prune pool.  Low-scoring long-range edges would
    # otherwise be evicted by the wave of near 2-hop candidates and the
    # spliced graph disconnects — the same invariant compaction enforces by
    # exempting same-source edges from its score truncation.
    th_ids, th_sorted = dedup_sorted_desc(two_hop, th_scores)
    th_ids = th_ids[:, : config.ef_construction]
    th_sorted = th_sorted[:, : config.ef_construction]
    cand_ids = jnp.concatenate([live_ids, th_ids], axis=1)
    cand_scores = jnp.concatenate([live_scores, th_sorted], axis=1)
    cand_ids, cand_scores = dedup_sorted_desc(cand_ids, cand_scores)

    safe_cand = jnp.maximum(cand_ids, 0)
    simmat = provider.pairwise(safe_cand, safe_cand)
    p_ids, p_scores, p_count = robust_prune(
        cand_ids, cand_scores, simmat, M, config.alphas
    )
    new_ids = jnp.concatenate(
        [p_ids, jnp.full((chunk, R - M), -1, jnp.int32)], axis=1
    )
    new_scores = jnp.concatenate(
        [p_scores, jnp.full((chunk, R - M), NEG_INF)], axis=1
    )

    # NOTE: deleted rows are wiped AFTER all chunks run — later chunks still
    # need the deleted rows' adjacency for their own 2-hop splices.
    target = jnp.where(needs, rows, N_cap)
    neighbors = layer.neighbors.at[target].set(new_ids, mode="drop")
    nscores = layer.scores.at[target].set(new_scores, mode="drop")
    counts = layer.counts.at[target].set(p_count, mode="drop")

    return graph._replace(
        layers=(GraphLayer(neighbors, nscores, counts),) + graph.layers[1:]
    )


def remove_deleted(
    graph: GraphIndex,
    provider,
    config: GraphConfig,
    chunk: int = 1024,
) -> GraphIndex:
    """FreshDiskANN splice over the whole base layer + entry repair.

    Hierarchy levels drop deleted nodes from their adjacency (upper layers
    are rebuilt cheaply on the next full cleanup; searches stay correct
    because descent only needs *an* entry point).
    """
    n_cap = graph.capacity
    for start in range(0, n_cap, chunk):
        graph = _splice_chunk(graph, provider, jnp.int32(start), config, chunk)

    # wipe deleted rows (safe now: all splices are done)
    base = graph.base
    dcol = graph.deleted[:, None]
    graph = graph._replace(
        layers=(
            GraphLayer(
                neighbors=jnp.where(dcol, -1, base.neighbors),
                scores=jnp.where(dcol, NEG_INF, base.scores),
                counts=jnp.where(graph.deleted, 0, base.counts),
            ),
        )
        + graph.layers[1:]
    )

    # upper layers: mask out edges to deleted nodes
    new_layers = [graph.base]
    for l in range(1, graph.num_levels):
        layer = graph.layers[l]
        ids_l = graph.level_node_ids[l - 1]
        slot_deleted = graph.deleted[ids_l]  # [n_l]
        nbr_del = jnp.where(
            layer.neighbors >= 0,
            slot_deleted[jnp.maximum(layer.neighbors, 0)],
            False,
        )
        neighbors = jnp.where(nbr_del, -1, layer.neighbors)
        scores = jnp.where(nbr_del, NEG_INF, layer.scores)
        counts = jnp.sum(neighbors >= 0, axis=1).astype(jnp.int32)
        new_layers.append(GraphLayer(neighbors, scores, counts))
    graph = graph._replace(layers=tuple(new_layers))

    # entry repair: if deleted, pick the live node with max degree
    entry_dead = graph.deleted[jnp.maximum(graph.entry_node, 0)] | (
        graph.entry_node < 0
    )
    live_deg = jnp.where(graph.deleted, -1, graph.base.counts)
    new_entry = jnp.argmax(live_deg).astype(jnp.int32)
    graph = graph._replace(
        entry_node=jnp.where(entry_dead, new_entry, graph.entry_node)
    )
    # Tombstones are KEPT: the mask now marks holes.  Spliced nodes are
    # disconnected, but hierarchy seeding and result filtering still need to
    # know the slots are dead (the reference's ordinal remap happens at
    # save time via OrdinalMapper, not here).
    return graph


def add_nodes(
    graph: GraphIndex,
    provider: ExactScoreProvider,
    new_vectors,
    config: GraphConfig,
) -> tuple[GraphIndex, ExactScoreProvider]:
    """Insert new nodes into an existing index (incremental ``addGraphNode``).

    Grows capacity host-side, concatenates vectors into the provider, and
    runs the ordinary wave-insert step per wave of new nodes.
    """
    new_vectors = jnp.asarray(new_vectors, jnp.float32)
    k = new_vectors.shape[0]
    n0 = int(graph.num_nodes)
    n_cap = graph.capacity
    from jvector_tpu.graph.index import bucket_capacity

    need = n0 + k
    if need > n_cap:
        pad = bucket_capacity(need) - n_cap
        base = graph.base
        layer = GraphLayer(
            neighbors=jnp.concatenate(
                [base.neighbors, jnp.full((pad, base.neighbors.shape[1]), -1, jnp.int32)]
            ),
            scores=jnp.concatenate(
                [base.scores, jnp.full((pad, base.scores.shape[1]), NEG_INF)]
            ),
            counts=jnp.concatenate([base.counts, jnp.zeros((pad,), jnp.int32)]),
        )
        graph = graph._replace(
            layers=(layer,) + graph.layers[1:],
            deleted=jnp.concatenate([graph.deleted, jnp.zeros((pad,), bool)]),
        )
    # _insert_wave donates its ENTIRE graph pytree (donate_argnums=(0,)):
    # every leaf the caller may still reference — base layer, upper levels,
    # deleted mask, entry/num_nodes scalars — must be copied, or on TPU the
    # caller's buffers are invalidated by the first wave (CPU tests cannot
    # catch this: donation is a no-op there).
    graph = jax.tree.map(lambda x: x.copy(), graph)

    vectors = jnp.concatenate([provider.vectors[:n0], new_vectors], axis=0)
    # keep provider capacity aligned with graph capacity
    if vectors.shape[0] < graph.capacity:
        vectors = jnp.concatenate(
            [
                vectors,
                jnp.zeros((graph.capacity - vectors.shape[0], vectors.shape[1])),
            ]
        )
    provider = ExactScoreProvider(vectors=vectors, sim=provider.sim)

    w = config.wave_size
    for start in range(0, k, w):
        ids = np.arange(n0 + start, n0 + start + w, dtype=np.int32)
        ids = np.where(ids < n0 + k, ids, -1)
        wv = vectors[jnp.minimum(jnp.asarray(np.maximum(ids, 0)), need - 1)]
        graph = _insert_wave(graph, provider, jnp.asarray(ids), wv, config)

    if graph.num_levels > 1 and config.add_hierarchy:
        # refresh the (tiny) upper levels so new nodes participate in the
        # descent; rebuilding them costs ~n/maxDegree inserts
        graph = graph._replace(layers=graph.layers[:1], level_node_ids=())
        graph = GraphIndexBuilder(config).build_hierarchy(
            graph, provider.vectors[: n0 + k], provider.sim
        )
    return graph, provider
