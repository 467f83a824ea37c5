"""Multi-device tests on the 8-way virtual CPU mesh (the analog of the
reference's multithread tests, per SURVEY.md §4 TPU test plan)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jvector_tpu.graph import GraphConfig, build_graph, search
from jvector_tpu.parallel import (
    make_mesh,
    sharded_brute_force,
    sharded_search,
)
from jvector_tpu.util.datasets import recall_at_k, synthetic_dataset


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(n=1200, dim=16, n_queries=64, k=10, seed=5)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_brute_force_matches_gt(ds):
    mesh = make_mesh(8, "nodes")
    scores, ids = sharded_brute_force(
        jnp.asarray(ds.queries), jnp.asarray(ds.base), mesh, k=10, sim=ds.similarity
    )
    r = recall_at_k(np.asarray(ids), ds.ground_truth, 10)
    assert r == 1.0


def test_sharded_search_matches_single_device(ds):
    cfg = GraphConfig(max_degree=12, ef_construction=32, wave_size=128)
    graph, provider = build_graph(ds.base, ds.similarity, cfg)
    single = search(graph, provider, jnp.asarray(ds.queries), top_k=10, beam_width=32)

    mesh = make_mesh(8, "dp")
    multi = sharded_search(
        graph, provider, jnp.asarray(ds.queries), mesh, top_k=10, beam_width=32
    )
    np.testing.assert_array_equal(np.asarray(single.ids), np.asarray(multi.ids))
    r = recall_at_k(np.asarray(multi.ids), ds.ground_truth, 10)
    assert r >= 0.95
