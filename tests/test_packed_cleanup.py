"""Packed-layout cleanup (enforce-degree) + host-side fused save.

The 10M LTM regime cannot run the unpacked enforce pass: the [N, R]
tables plus their scatter copy exceed the 16 GB chip, and the row
scatters lower as whole-table copy loops (r4 traced ~72 ms/chunk at 1M).
``packed_cleanup`` enforces on the packed [N/8, 8, 128] adjacency with
contiguous in-place slice updates and must be EXACTLY equivalent.

Reference analog: ``GraphIndexBuilder.cleanup():472-508`` (enforce
max_degree on every row).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jvector_tpu.graph.builder import (
    _empty_packed_adjacency,
    _enforce_chunk,
    _pack_adjacency,
    _unpack_adjacency,
    packed_cleanup,
)
from jvector_tpu.graph.index import (
    GraphConfig,
    GraphIndex,
    GraphLayer,
    empty_layer,
)
from jvector_tpu.graph.score import ExactScoreProvider
from jvector_tpu.ops.similarity import SimilarityFunction


def _random_layer(rng, n, d, cfg):
    """Random sorted-desc unique-id rows (the builder's row invariant)."""
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    R = cfg.row_cap
    ids = np.full((n, R), -1, np.int32)
    scores = np.full((n, R), -np.inf, np.float32)
    counts = np.zeros(n, np.int32)
    for i in range(n):
        c = int(rng.integers(0, R + 1))
        cand = rng.permutation(n - 1)[:c]
        cand = np.where(cand >= i, cand + 1, cand)  # no self edges
        s = -np.linalg.norm(vecs[cand] - vecs[i], axis=1)
        o = np.argsort(-s)
        ids[i, :c] = cand[o]
        scores[i, :c] = s[o]
        counts[i] = c
    return vecs, ids, scores, counts


def test_empty_packed_adjacency_matches_pack():
    for r_cap in (32, 64):
        a = _pack_adjacency(empty_layer(256, r_cap), r_cap)
        b = _empty_packed_adjacency(256, r_cap)
        assert a.shape == b.shape
        assert bool(jnp.all(a == b))


@pytest.mark.parametrize("n,chunk", [(256, 64), (296, 64)])  # 296: tail clamp
def test_packed_cleanup_matches_generic_enforce(n, chunk):
    rng = np.random.default_rng(0)
    cfg = GraphConfig(max_degree=8, ef_construction=16)
    vecs, ids, scores, counts = _random_layer(rng, n, 16, cfg)
    prov = ExactScoreProvider(
        vectors=jnp.asarray(vecs), sim=SimilarityFunction.EUCLIDEAN
    )
    R = cfg.row_cap

    adj = _pack_adjacency(
        GraphLayer(
            neighbors=jnp.asarray(ids),
            scores=jnp.asarray(scores),
            counts=jnp.asarray(counts),
        ),
        R,
    )
    adj2, cnt2 = packed_cleanup(
        adj, jnp.asarray(counts), prov, cfg, jnp.int32(n), chunk=chunk
    )
    lay_p = _unpack_adjacency(adj2, cnt2, R)

    # generic path on fresh copies (the enforce chunks donate their input)
    g = GraphIndex(
        layers=(
            GraphLayer(
                neighbors=jnp.asarray(ids),
                scores=jnp.asarray(scores),
                counts=jnp.asarray(counts),
            ),
        ),
        level_node_ids=(),
        entry_node=jnp.int32(0),
        num_nodes=jnp.int32(n),
        deleted=jnp.zeros((n,), bool),
    )
    for s0 in range(0, n, chunk):
        g = _enforce_chunk(g, prov, jnp.int32(min(s0, n - chunk)), cfg, chunk)

    nb_g = np.asarray(g.base.neighbors)
    nb_p = np.asarray(lay_p.neighbors)[:n]
    assert np.array_equal(np.asarray(g.base.counts), np.asarray(cnt2)[:n])
    assert np.array_equal(nb_g, nb_p)
    m = nb_g >= 0
    assert np.allclose(
        np.asarray(g.base.scores)[m], np.asarray(lay_p.scores)[:n][m]
    )
    # every row obeys max_degree
    assert int(jnp.max(cnt2)) <= cfg.max_degree

    # tail-clamp overlap re-enforce is exactly idempotent
    adj3, cnt3 = packed_cleanup(adj2, cnt2, prov, cfg, jnp.int32(n), chunk=chunk)
    assert np.array_equal(nb_p, np.asarray(_unpack_adjacency(adj3, cnt3, R).neighbors)[:n])


def test_build_fused_sq4_host_matches_device():
    from jvector_tpu.graph.score import build_fused_sq4, build_fused_sq4_host

    rng = np.random.default_rng(1)
    n, R, mp = 200, 16, 8
    nb = rng.integers(-1, n, size=(n, R)).astype(np.int32)
    codes = rng.integers(0, 256, size=(n, mp), dtype=np.uint8)
    w2 = rng.normal(size=(n,)).astype(np.float32)
    fp_d, fw_d = build_fused_sq4(jnp.asarray(nb), jnp.asarray(codes), jnp.asarray(w2))
    fp_h, fw_h = build_fused_sq4_host(nb, codes, w2)
    assert np.array_equal(np.asarray(fp_d), fp_h)
    assert np.array_equal(np.asarray(fw_d), fw_h)


def test_ltm_streamed_host_save_roundtrip(tmp_path, monkeypatch):
    """Force the 10M save regime (packed build + streamed host-side fused
    layout) at toy scale and serve the file through HostGraphIndex."""
    import jvector_tpu.disk.ltm as ltm_mod
    from jvector_tpu.disk.host_graph import HostGraphIndex
    from jvector_tpu.disk.ltm import build_on_disk_ltm
    from jvector_tpu.util.datasets import (
        exact_ground_truth,
        recall_at_k,
        synthetic_dataset,
    )

    monkeypatch.setattr(ltm_mod, "_FUSED_BUILD_BUDGET", 0)  # packed build
    monkeypatch.setattr(ltm_mod, "_FUSED_SERVE_BUDGET", 0)  # host-side save
    n, d = 4096, 32
    ds = synthetic_dataset(n=n, dim=d, n_queries=64, k=10, n_clusters=32, seed=2)
    base = np.asarray(ds.base)
    gt = exact_ground_truth(ds.base, ds.queries, 10)
    cfg = GraphConfig(max_degree=16, ef_construction=48)
    path = str(tmp_path / "streamed.jvtpu")
    build_on_disk_ltm(
        path, lambda a, b: base[a:b], n=n, dim=d, config=cfg,
        compression="sq4", capacity=n,
    )
    hg = HostGraphIndex.load(path)
    res = hg.search(jnp.asarray(ds.queries), top_k=10, beam_width=48, expand=4)
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    assert r >= 0.9, r
