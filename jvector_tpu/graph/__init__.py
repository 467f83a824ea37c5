"""Graph core: batched Vamana build + query-wave beam search.

TPU-native redesign of the reference's L4 (``jv/graph/``):

- ``OnHeapGraphIndex`` + ``ConcurrentNeighborMap`` (CAS copy-on-write rows)
  -> :class:`GraphIndex`, a pytree of padded device arrays
  (``neighbors[int32 N, R]``, ``scores[f32 N, R]``, ``counts[int32 N]``).
- ``GraphSearcher`` (pop-one-expand-one beam with heaps)
  -> :func:`search`, a jitted query-wave beam search over a fixed-width beam
  with exact compare-based visited dedup (beam + expansion-history ring).
- ``GraphIndexBuilder`` (concurrent inserts + insertionsInProgress snapshots)
  -> :class:`GraphIndexBuilder` wave insertion: a wave of W nodes is
  beam-searched, pruned and linked in one batched step; wave members see each
  other as candidates, replacing the reference's in-progress set.
"""

from jvector_tpu.graph.index import GraphIndex, GraphConfig
from jvector_tpu.graph.score import (
    ExactScoreProvider,
    ADCScoreProvider,
    BQScoreProvider,
    FusedADCScoreProvider,
    LUT16ScoreProvider,
    SQ4ScoreProvider,
    build_fused_codes,
    build_fused_codes_lut16,
    build_fused_sq4,
)
from jvector_tpu.graph.searcher import search, resume, SearchResult, BeamState
from jvector_tpu.graph.builder import GraphIndexBuilder, build_graph

__all__ = [
    "GraphIndex",
    "GraphConfig",
    "ExactScoreProvider",
    "ADCScoreProvider",
    "BQScoreProvider",
    "FusedADCScoreProvider",
    "LUT16ScoreProvider",
    "SQ4ScoreProvider",
    "build_fused_codes",
    "build_fused_codes_lut16",
    "build_fused_sq4",
    "search",
    "resume",
    "SearchResult",
    "BeamState",
    "GraphIndexBuilder",
    "build_graph",
]
