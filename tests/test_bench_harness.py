"""Bench harness tests (reference: AccuracyMetricsTest, BenchmarkSummarizerTest,
BenchYAML schema)."""

import json

import numpy as np
import pytest

from jvector_tpu.bench import Grid, GridConfig
from jvector_tpu.bench.metrics import (
    LatencyStats,
    mean_average_precision,
    recall_at_k,
)
from jvector_tpu.util.datasets import synthetic_dataset


def test_recall_and_map():
    gt = np.asarray([[1, 2, 3], [4, 5, 6]])
    perfect = np.asarray([[3, 2, 1], [4, 5, 6]])
    assert recall_at_k(perfect, gt, 3) == 1.0
    assert mean_average_precision(np.asarray([[1, 2, 3]]), np.asarray([[1, 2, 3]]), 3) == 1.0
    # one miss
    res = np.asarray([[1, 9, 3], [4, 5, 9]])
    assert recall_at_k(res, gt, 3) == pytest.approx(4 / 6)
    # MAP penalizes late hits
    late = mean_average_precision(np.asarray([[9, 9, 1]]), gt[:1], 3)
    early = mean_average_precision(np.asarray([[1, 9, 9]]), gt[:1], 3)
    assert early > late


def test_latency_stats():
    s = LatencyStats.compute([0.1, 0.2, 0.1], [100, 100, 100])
    assert s.qps_max == pytest.approx(1000.0)
    assert s.avg_ms == pytest.approx(133.333, rel=1e-3)


def test_grid_runs_and_reports(tmp_path):
    ds = synthetic_dataset(n=800, dim=16, n_queries=64, k=10, seed=5)
    cfg = GridConfig(
        out_degree=[8],
        ef_construction=[24],
        add_hierarchy=[False],
        compression=[None, {"type": "PQ", "mFactor": 4, "k": 32}, {"type": "SQ4"}],
        reranking=["FP32"],
        top_k_overquery={10: [2.0]},
        wave_size=64,
    )
    grid = Grid(ds, cfg)
    rows = grid.run(verbose=False)
    assert len(rows) == 3  # three compression configs x one (topK, oq)
    assert {r["compression"] for r in rows} == {"NONE", "PQ", "SQ4"}
    assert all("git_sha" in r and "config_hash" in r for r in rows)
    for r in rows:
        assert r["recall"] > 0.5
        assert r["qps_avg"] > 0
        assert r["index_build_time_s"] > 0
    grid.write_csv(tmp_path / "x.csv")
    grid.write_jsonl(tmp_path / "x.jsonl")
    lines = (tmp_path / "x.jsonl").read_text().strip().split("\n")
    assert len(lines) == 3 and json.loads(lines[0])["topK"] == 10
    assert (tmp_path / "x.csv").read_text().startswith("dataset,")


def test_grid_search_compression_decoupled(tmp_path):
    """search.compression decouples serve compression from construction
    (reference default.yml search.compression block; VERDICT r2 missing #5)
    and the compressor cache trains each codebook once across rows."""
    ds = synthetic_dataset(n=800, dim=16, n_queries=64, k=10, seed=5)
    cfg = GridConfig(
        out_degree=[8],
        ef_construction=[24],
        add_hierarchy=[False],
        compression=[{"type": "PQ", "mFactor": 4, "k": 32}],
        search_compression=[None, {"type": "SQ4"}],
        reranking=["FP32"],
        top_k_overquery={10: [2.0]},
        wave_size=64,
    )
    grid = Grid(ds, cfg, compressor_cache_dir=str(tmp_path / "ccache"))
    rows = grid.run(verbose=False)
    # one build config x two serve compressions
    assert len(rows) == 2
    assert {r["compression"] for r in rows} == {"NONE", "SQ4"}
    assert {r["buildCompression"] for r in rows} == {"PQ"}
    # cache populated (pq trained once, committed atomically)
    cached = list((tmp_path / "ccache").glob("compressor-*.jvtpu"))
    assert len(cached) >= 1


def test_yaml_schema_parses(tmp_path):
    yaml_text = """
yamlSchemaVersion: 1
construction:
  outDegree: [8]
  efConstruction: [24]
  neighborOverflow: [1.2f]
  addHierarchy: [No]
  compression:
    - type: PQ
      mFactor: 4
      k: 32
  reranking: [FP32]
search:
  compression:
    - none
    - type: SQ4
  topKOverquery:
    10: [2.0]
"""
    p = tmp_path / "cfg.yml"
    p.write_text(yaml_text)
    import yaml as pyyaml

    cfg = GridConfig.from_yaml_dict(pyyaml.safe_load(yaml_text))
    assert cfg.out_degree == [8]
    assert cfg.neighbor_overflow == [1.2]
    assert cfg.add_hierarchy == [False]
    assert cfg.compression[0]["type"] == "PQ"
    assert cfg.search_compression == [None, {"type": "SQ4"}]
    assert cfg.top_k_overquery == {10: [2.0]}


def test_bench_cli_main(tmp_path):
    """python -m jvector_tpu.bench: catalog regex -> grid run -> reports."""
    import os

    cat = tmp_path / "cat.yml"
    cat.write_text(
        "datasets:\n"
        "  tiny-synth:\n"
        "    format: synthetic\n"
        "    n: 800\n"
        "    dim: 16\n"
        "    n_queries: 20\n"
        "    k: 10\n"
        "    similarity: euclidean\n"
        "    seed: 0\n"
    )
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "yamlSchemaVersion: 1\n"
        "construction:\n"
        "  outDegree: [8]\n"
        "  efConstruction: [24]\n"
        "  addHierarchy: [No]\n"
        "  compression: [none]\n"
        "search:\n"
        "  topKOverquery:\n"
        "    5: [2.0]\n"
    )
    from jvector_tpu.bench.__main__ import main

    out = tmp_path / "reports"
    rc = main(
        ["tiny.*", "--config", str(cfg), "--catalog", str(cat),
         "--output", str(out)]
    )
    assert rc == 0
    files = os.listdir(out)
    assert any(f.endswith(".csv") for f in files)
    assert any(f.endswith(".jsonl") for f in files)
    assert main(["nomatch.*", "--catalog", str(cat)]) == 2
