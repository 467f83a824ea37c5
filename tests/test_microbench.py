"""Micro-bench-as-test (reference: microbench/{GraphBuildBench,
GraphIndexBench, SimilarityBench} + benchmarks-jmh).  Asserts loose sanity
bounds so regressions fail loudly; timings print under ``pytest -s``."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.ops.adc import adc_score, build_partial_sums
from jvector_tpu.ops.similarity import pairwise_scores
from jvector_tpu.quantization import ProductQuantization
from jvector_tpu.util.datasets import synthetic_dataset

RNG = np.random.default_rng(0)


def _time(fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def test_similarity_bench():
    q = jnp.asarray(RNG.normal(size=(256, 128)).astype(np.float32))
    b = jnp.asarray(RNG.normal(size=(4096, 128)).astype(np.float32))
    dt = _time(lambda: pairwise_scores(q, b, "euclidean"))
    rate = 256 * 4096 / dt
    print(f"\nsimilarity: {rate/1e6:.0f}M pairs/s")
    assert rate > 1e6  # loose floor, any backend


def test_adc_bench():
    M, K = 16, 256
    cb = jnp.asarray(RNG.normal(size=(M, K, 8)).astype(np.float32))
    q = jnp.asarray(RNG.normal(size=(64, M * 8)).astype(np.float32))
    codes = jnp.asarray(RNG.integers(0, K, size=(64, 512, M)).astype(np.int32))
    luts = build_partial_sums(q, cb, "euclidean")
    dt = _time(lambda: adc_score(luts, codes))
    rate = 64 * 512 / dt
    print(f"adc: {rate/1e6:.1f}M candidates/s")
    assert rate > 1e5


def test_pq_training_bench():
    data = RNG.normal(size=(8192, 64)).astype(np.float32)
    t0 = time.time()
    pq = ProductQuantization.compute(data, m=8, clusters=64, iters=4)
    dt = time.time() - t0
    print(f"pq train 8k x 64d: {dt:.2f}s")
    assert dt < 120


def test_build_and_search_bench():
    ds = synthetic_dataset(n=2000, dim=32, n_queries=64, k=10, seed=7)
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    t0 = time.time()
    g, p = build_graph(ds.base, "euclidean", cfg)
    jax.block_until_ready(g.base.neighbors)
    build_dt = time.time() - t0
    q = jnp.asarray(ds.queries)
    dt = _time(lambda: search(g, p, q, top_k=10, beam_width=40).ids)
    print(f"build 2k: {build_dt:.1f}s  search: {64/dt:.0f} QPS")
    assert build_dt < 300 and 64 / dt > 10


def test_compact_micro_bench():
    """The streamed-compaction microbenchmark (micro.py --compact) runs end
    to end and reports a bounded device peak (CompactorBenchmark analog)."""
    from jvector_tpu.bench.micro import run_compact_micro

    rows = run_compact_micro(n=1200, dim=24, segments=2)
    (row,) = rows
    assert row["unit"] == "merged nodes/s"
    assert row["value"] > 0
    # device peak far below the merged graph working set (the streaming
    # contract); 1200 x row_cap x 8 bytes is already ~0.6 MB unpadded
    assert row["peak_device_mb"] < 5.0
    print(f"\ncompact micro: {row['value']:.0f} merged nodes/s, "
          f"peak {row['peak_device_mb']} MB")
