"""Benchmark harness (TPU-native L7 — the reference's de-facto CLI).

Reference: ``jvector-examples`` — ``Bench``/``BenchYAML``/``Grid`` engine,
``benchmarks/`` (Throughput/Latency/Accuracy/Count), ``yaml/`` config schema,
``reporting/`` (CSV/JSONL).  Same YAML parameter surface (outDegree,
efConstruction, neighborOverflow, addHierarchy, compression PQ m/mFactor/k/
anisotropicThreshold, reranking, topKOverquery), same metric set.
"""

from jvector_tpu.bench.metrics import (
    AccuracyMetrics,
    LatencyStats,
    recall_at_k,
    mean_average_precision,
)
from jvector_tpu.bench.grid import Grid, GridConfig, run_yaml

__all__ = [
    "AccuracyMetrics",
    "LatencyStats",
    "recall_at_k",
    "mean_average_precision",
    "Grid",
    "GridConfig",
    "run_yaml",
]
