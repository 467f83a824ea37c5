"""Graph index data model: padded device arrays instead of pointer graphs.

Reference equivalents: ``jv/graph/OnHeapGraphIndex.java`` (mutable layers of
``ConcurrentNeighborMap``) and ``jv/graph/ImmutableGraphIndex.java`` (read
view).  On TPU a layer is a dense rectangle:

- ``neighbors: int32[N_cap, R]`` — neighbor ids, ``-1`` padded.  ``R`` is the
  row capacity: ``max_degree`` plus overflow slack, mirroring the reference's
  ``overflow * maxDegree`` cap (``ConcurrentNeighborMap.java:298-323``).
- ``scores: float32[N_cap, R]`` — edge similarity scores (higher = closer),
  the ``NodeArray`` score channel.
- ``counts: int32[N_cap]`` — live entries per row.

Rows keep the invariant that entries are unique, score-sorted descending, and
padded with (-1, -inf).  Uniqueness keeps the searcher's compare-based dedup
and the builder's backlink collision handling exact, and the fused
neighbor-code tables (one code block per row slot) unambiguous.

Hierarchy (the optional HNSW-style levels, ``OnHeapGraphIndex.java:86-101``)
is a list of such layers over progressively fewer nodes; level l>0 stores a
compacted node-id remap so upper layers stay small.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """Static build/search hyperparameters (hashable; safe as a jit static arg).

    Mirrors the reference's ``GraphIndexBuilder`` constructor args:
    ``maxDegree`` (M), ``efConstruction`` (beamWidth), ``neighborOverflow``,
    ``alpha`` (``GraphIndexBuilder.java:150-210``).
    """

    max_degree: int = 32
    ef_construction: int = 100
    neighbor_overflow: float = 1.2
    alpha: float = 1.2
    # Row capacity: overflow cap rounded up to a multiple of 8 plus slack for
    # backlink bursts within a wave before the enforce pass runs.
    row_slack: int = 16
    # 512/2 measured fastest for the fused-SQ4 build at 400k x 128d on
    # v5e-1 (76s vs 80s @256/2, 95s @512/1); recall identical across knobs
    wave_size: int = 512
    # Hierarchy (HNSW-style levels on top of the Vamana base layer).
    add_hierarchy: bool = False
    # Max beam-search iterations during build (safety bound for while_loop).
    max_build_iters: int = 400
    # Beam expansions per iteration during build searches (trades a few
    # extra scored edges for proportionally fewer sequential loop steps).
    # 2 wins now that fused rows made build gathers cheap (round-2's E=1
    # preference was an artifact of the gather-bound regime).
    build_expand: int = 2
    # Construction-time scoring: "sq4" (default) runs the wave beam SEARCHES
    # on 4-bit scalar-quantized codes — 1.6x faster than full-precision at
    # 400k (50s vs 80s) within 0.003 recall; None scores full-precision.
    # Candidate rescoring, the diversity prune, stored edge scores, cleanup
    # passes and the returned search provider are always full-precision
    # (quantized prunes tie-break near-duplicate clusters apart — see
    # _insert_wave's docstring).
    build_compression: str | None = "sq4"
    # Diversity-prune algorithm: "fixpoint" resolves the greedy scan as a
    # parallel dominance fixpoint (greedy-EQUIVALENT output, O(chain-depth)
    # MXU rounds instead of C*len(alphas) sequential steps — see
    # diversity.robust_prune_fixpoint); "greedy" is the sequential scan.
    prune_algo: str = "fixpoint"
    # Entry seeds per build-wave search: 1 = the global entry node only;
    # k > 1 adds k-1 random already-inserted nodes, shortening the
    # graph-diameter walk that dominates sequential beam iterations.
    build_entry_seeds: int = 4
    # Two-phase build-wave searches: after this many lockstep beam
    # iterations, compact the still-active minority of the wave into a
    # quarter-width sub-wave and finish there (see
    # searcher._repack_tail).  The wave pays max-iters over all lanes
    # but the convergence tail is long, so this cuts wave-search device
    # time ~20-40%.  Lanes truncated past the sub-wave width degrade
    # like max_build_iters — the candidate pool is never score-truncated
    # (the prune invariant holds).  0 disables.
    build_repack_after: int = 0

    @property
    def overflow_degree(self) -> int:
        return int(self.max_degree * self.neighbor_overflow + 0.5)

    @property
    def row_cap(self) -> int:
        r = self.overflow_degree + self.row_slack
        return ((r + 7) // 8) * 8

    @property
    def alphas(self) -> tuple[float, ...]:
        """Alpha ramp 1.0 -> alpha in steps of 0.2 (``VamanaDiversityProvider.java:45-96``)."""
        out = []
        a = 1.0
        while a < self.alpha - 1e-6:
            out.append(round(a, 3))
            a += 0.2
        out.append(self.alpha)
        return tuple(out)


class GraphLayer(NamedTuple):
    """One adjacency level as device arrays."""

    neighbors: jax.Array  # int32 [N_cap, R]
    scores: jax.Array  # float32 [N_cap, R]
    counts: jax.Array  # int32 [N_cap]


class GraphIndex(NamedTuple):
    """The index: base layer + optional hierarchy levels.

    ``node_ids_per_level[l]`` maps level-l slot -> base ordinal for l >= 1
    (level 0 is the identity over all nodes and stores no map).
    """

    layers: tuple[GraphLayer, ...]
    level_node_ids: tuple[jax.Array, ...]  # per level >=1: int32 [n_l]
    entry_node: jax.Array  # int32 scalar (base ordinal)
    num_nodes: jax.Array  # int32 scalar - live nodes in base layer
    deleted: jax.Array  # bool [N_cap] - tombstones (markNodeDeleted)

    @property
    def base(self) -> GraphLayer:
        return self.layers[0]

    @property
    def capacity(self) -> int:
        return self.layers[0].neighbors.shape[0]

    @property
    def row_cap(self) -> int:
        return self.layers[0].neighbors.shape[1]

    @property
    def num_levels(self) -> int:
        return len(self.layers)

    def size(self) -> int:
        return int(self.num_nodes)

    def average_degree(self) -> float:
        """Reference: ``OnHeapGraphIndex.getAverageDegree``."""
        n = int(self.num_nodes)
        if n == 0:
            return 0.0
        return float(jnp.sum(self.base.counts[:n])) / n


def bucket_capacity(n: int, min_bucket: int = 256) -> int:
    """Round capacity up to a compile-friendly bucket (<=12.5% slack).

    Distinct array shapes retrace/recompile every jitted step; bucketing to
    8 sizes per octave makes builds over similar corpus sizes share compiles
    (shard builds, compaction sources, growing indexes).
    """
    if n <= min_bucket:
        return min_bucket
    octave = 1 << ((n - 1).bit_length() - 1)  # largest power of two < n
    step = max(octave // 8, min_bucket)
    return ((n + step - 1) // step) * step


def empty_layer(capacity: int, row_cap: int) -> GraphLayer:
    return GraphLayer(
        neighbors=jnp.full((capacity, row_cap), -1, jnp.int32),
        scores=jnp.full((capacity, row_cap), NEG_INF, jnp.float32),
        counts=jnp.zeros((capacity,), jnp.int32),
    )


def empty_graph(capacity: int, config: GraphConfig) -> GraphIndex:
    """Allocate an empty single-level graph with the config's row capacity."""
    return GraphIndex(
        layers=(empty_layer(capacity, config.row_cap),),
        level_node_ids=(),
        entry_node=jnp.int32(-1),
        num_nodes=jnp.int32(0),
        deleted=jnp.zeros((capacity,), bool),
    )


@partial(jax.jit, donate_argnums=(0,))
def sort_rows(layer: GraphLayer) -> GraphLayer:
    """Re-establish the sorted-desc row invariant after out-of-order appends."""
    order = jnp.argsort(-layer.scores, axis=1)
    return GraphLayer(
        neighbors=jnp.take_along_axis(layer.neighbors, order, axis=1),
        scores=jnp.take_along_axis(layer.scores, order, axis=1),
        counts=layer.counts,
    )
