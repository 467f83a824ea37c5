"""ICI-sharded index construction + sharded serving.

The 100M / v5e-pod design (SURVEY.md §2.9 [TPU note], BASELINE config 5):

- **Build**: nodes are partitioned across the mesh; every chip builds the
  Vamana graph of its own shard with the ordinary wave-insert step running
  shard-locally under ``shard_map`` — zero collectives in the build loop, so
  construction scales linearly with chips (the TPU analog of the reference's
  "construction scales linearly with cores", README.md:27-29).  The default
  build runs the flagship compressed path per shard: SQ4 fused-row wave
  searches + full-precision rescore/prune, with per-shard incremental fused
  tables (same two-program structure as the single-chip build).
- **Serve**: queries are replicated; each chip beam-searches its shard with
  the fused SQ4 first pass, exact-reranks its local candidates (gated by a
  cross-shard APPROXIMATE-score floor — the reference's
  ``worstApproximateScoreInTopK`` / rerankFloor contract,
  ``GraphSearcher.java:386-404``), and the merge is ONE ``all_gather`` +
  top-k over ICI.
- **Persist**: :func:`save_sharded` writes one container per shard (the
  same FUSED_SQ4 feature layout the LTM/host tiers use) plus a manifest;
  :func:`load_sharded` restacks them onto a mesh.
- A pod-built sharded index can later be merged into a single graph with
  ``disk.compaction.compact_indexes`` (shards are just compaction sources).

The quantizer is GLOBAL (trained on a uniform random sample of the whole
corpus): per-dim affine ranges are a corpus-level fit, and a shared
quantizer keeps first-pass scores comparable across shards at the merge —
per-shard codebooks would need the merge floor to absorb cross-shard score
bias (the ``floor_slack`` caveat in ``graph/multi.py``).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jvector_tpu.graph.builder import (
    _empty_packed_adjacency,
    _fused_aligned_config,
    _insert_wave,
    _packed_build_eligible,
    _shuffled_wave_starts,
    _unpack_adjacency,
    _wave_apply_packed,
    _wave_search,
    _wave_update_compute,
    _wave_update_fused,
)
from jvector_tpu.graph.index import NEG_INF, GraphConfig, GraphIndex, empty_graph
from jvector_tpu.graph.score import ExactScoreProvider, SQ4ScoreProvider
from jvector_tpu.graph.searcher import search_layer
from jvector_tpu.ops.similarity import SimilarityFunction


@dataclasses.dataclass
class ShardedIndex:
    """Per-shard graphs/providers stacked on a leading device axis."""

    graphs: GraphIndex  # every leaf has leading [n_shards, ...]
    providers: ExactScoreProvider  # exact rerank providers, vectors [S, n_local, D]
    n_shards: int
    n_local: int  # capacity per shard
    n_total: int  # true corpus size
    # fused-SQ4 first-pass providers (stacked) — None for exact-only builds
    search_providers: SQ4ScoreProvider | None = None
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    def global_ids(self, shard: int, local_ids: np.ndarray) -> np.ndarray:
        return shard * self.n_local + local_ids


def _shard_specs(tree, axis: str):
    return jax.tree.map(lambda _: P(axis), tree)


def _sq4_spec(axis: str, sim: SimilarityFunction) -> SQ4ScoreProvider:
    """PartitionSpec pytree matching a stacked SQ4 provider: per-node arrays
    ride the shard axis, the quantizer params are replicated."""
    return SQ4ScoreProvider(
        codes_packed=P(axis),
        node_w2=P(axis),
        node_norm2=P(axis),
        fused_packed=P(axis),
        fused_w2=P(axis),
        scale=P(),
        offset=P(),
        codes_aug=P(axis),
        sim=sim,
    )


def _strip_sq4(p: SQ4ScoreProvider) -> SQ4ScoreProvider:
    """Drop the size-1 shard-block axis shard_map leaves on sharded fields."""
    return dataclasses.replace(
        p,
        codes_packed=p.codes_packed[0],
        node_w2=p.node_w2[0],
        node_norm2=p.node_norm2[0],
        fused_packed=p.fused_packed[0],
        fused_w2=p.fused_w2[0],
        codes_aug=p.codes_aug[0],
    )


def sharded_build(
    vectors: np.ndarray,
    mesh: Mesh,
    config: GraphConfig | None = None,
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
    axis: str = "shard",
    build_compression: str | None = "sq4",
) -> ShardedIndex:
    """Build one subgraph per mesh device over a block node partition.

    ``build_compression="sq4"`` (default) runs the flagship compressed build
    per shard: fused-SQ4 wave searches, exact rescore + prune, incremental
    fused tables — and returns a :class:`ShardedIndex` whose
    ``search_providers`` serve the fused first pass directly.  ``None``
    builds and serves full-precision.
    """
    sim = SimilarityFunction.parse(sim)
    config = config or GraphConfig()
    if build_compression == "sq4":
        # whole-tile fused rows -> in-place Pallas table updates per shard
        config = _fused_aligned_config(config, (vectors.shape[1] + 1) // 2)
    n_dev = mesh.devices.size
    n, d = vectors.shape
    # shard capacity rounded to %8: the packed [N/8, 8, 128] adjacency
    # needs it, and a few inert pad rows cost nothing in the other modes
    n_local = ((-(-n // n_dev) + 7) // 8) * 8
    pad = n_dev * n_local - n
    vp = np.concatenate([vectors, np.zeros((pad, d), np.float32)]) if pad else np.asarray(vectors, np.float32)
    # block partition: shard s owns global ids [s*n_local, (s+1)*n_local)
    stacked = jnp.asarray(vp.reshape(n_dev, n_local, d))
    stacked = jax.device_put(stacked, NamedSharding(mesh, P(axis, None, None)))

    providers = ExactScoreProvider(vectors=stacked, sim=sim)

    # per-shard empty graphs, stacked — allocated LAZILY: the packed-
    # adjacency regime never uses the unpacked [n_local, R] tables, and
    # keeping them resident for the whole build would defeat the
    # lowest-memory per-shard design (~1 KB/row/shard of dead lane-padded
    # tables at the 100M target)
    def make_graphs():
        proto = empty_graph(n_local, config)
        return jax.tree.map(
            lambda leaf: jax.device_put(
                jnp.broadcast_to(leaf[None], (n_dev,) + leaf.shape),
                NamedSharding(mesh, P(axis, *([None] * leaf.ndim))),
            ),
            proto,
        )

    # per-shard live count (rounding can leave MULTIPLE ragged tail shards)
    counts = np.clip(n - np.arange(n_dev) * n_local, 0, n_local).astype(np.int64)

    if build_compression == "sq4":
        return _sharded_build_sq4(
            vectors, vp, stacked, providers, make_graphs, counts, mesh,
            config, sim, axis
        )
    graphs = make_graphs()

    def _step_local(g, p, ids, wv):
        # shard_map blocks keep a leading size-1 device axis; strip it,
        # run the ordinary single-shard wave insert, restore it.
        g0 = jax.tree.map(lambda x: x[0], g)
        p0 = jax.tree.map(lambda x: x[0], p)
        out = _insert_wave(g0, p0, ids[0], wv[0], config)
        return jax.tree.map(lambda x: x[None], out)

    step = jax.jit(
        jax.shard_map(
            _step_local,
            mesh=mesh,
            in_specs=(
                _shard_specs(graphs, axis),
                _shard_specs(providers, axis),
                P(axis, None),
                P(axis, None, None),
            ),
            out_specs=_shard_specs(graphs, axis),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )

    w = config.wave_size
    n_dev_ = mesh.devices.size
    for start in _shuffled_wave_starts(n_local, w):
        ids_per_shard, wave_vecs = _wave_inputs(
            start, w, counts, stacked, n_local, n_dev_
        )
        graphs = step(
            graphs,
            providers,
            jax.device_put(ids_per_shard, NamedSharding(mesh, P(axis, None))),
            jax.device_put(wave_vecs, NamedSharding(mesh, P(axis, None, None))),
        )

    return ShardedIndex(
        graphs=graphs,
        providers=providers,
        n_shards=n_dev,
        n_local=n_local,
        n_total=n,
        sim=sim,
    )


def _wave_inputs(start, w, counts, stacked, n_local, n_dev):
    ids = np.arange(start, start + w, dtype=np.int32)
    ids_per_shard = np.broadcast_to(ids, (n_dev, w)).copy()
    for s in range(n_dev):
        ids_per_shard[s] = np.where(ids < counts[s], ids, -1)
    wave_vecs = stacked[:, np.clip(ids, 0, n_local - 1), :]
    return jnp.asarray(ids_per_shard), wave_vecs


def _sharded_build_sq4(
    vectors, vp, stacked, providers, make_graphs, counts, mesh, config, sim, axis
):
    """The compressed sharded build loop (fused tables per shard)."""
    from jvector_tpu.graph.score import sq4_aug_rows
    from jvector_tpu.quantization.sq import ScalarQuantization4

    n_dev = mesh.devices.size
    n_local = stacked.shape[1]
    sq = ScalarQuantization4.compute(vectors)  # global fit, random sample
    codes = sq.encode(jnp.asarray(vp)).reshape(n_dev, n_local, -1)
    mp = codes.shape[-1]
    w2, norm2 = sq.node_constants(codes)
    const = norm2 if sim == SimilarityFunction.COSINE else w2
    shard3 = NamedSharding(mesh, P(axis, None, None))
    shard2 = NamedSharding(mesh, P(axis, None))
    codes = jax.device_put(codes, shard3)
    r_cap = config.row_cap
    if _packed_build_eligible(config, mp, n_local):
        # the lowest-memory per-shard regime (the 100M / pod design): each
        # shard runs the packed-adjacency three-program wave loop shard-
        # locally (same programs as the single-chip r4 build and the LTM)
        return _sharded_build_sq4_packed(
            sq, codes, w2, norm2, const, providers, counts, mesh, config,
            sim, axis, n_local, stacked,
        )
    graphs = make_graphs()  # only the unpacked regime needs the [N, R] tables
    fused_packed = jax.device_put(
        jnp.zeros((n_dev, n_local, r_cap * mp), jnp.uint8), shard3
    )
    fused_w2 = jax.device_put(jnp.zeros((n_dev, n_local, r_cap), jnp.float32), shard3)
    base_provider = SQ4ScoreProvider(
        codes_packed=codes,
        node_w2=jax.device_put(w2, shard2),
        node_norm2=jax.device_put(norm2, shard2),
        fused_packed=fused_packed,
        fused_w2=fused_w2,
        scale=sq.scale,
        offset=sq.offset,
        codes_aug=jax.device_put(sq4_aug_rows(codes, const), shard3),
        sim=sim,
    )
    const_dev = jax.device_put(const, shard2)
    graph_specs = _shard_specs(graphs, axis)
    sq4_specs = _sq4_spec(axis, sim)

    def _search_local(g, bp, ids, wv):
        g0 = jax.tree.map(lambda x: x[0], g)
        bp0 = _strip_sq4(bp)
        bi, bs = _wave_search(
            g0.base.neighbors, bp0, g0.entry_node, ids[0], wv[0], config
        )
        return bi[None], bs[None]

    search_step = jax.jit(
        jax.shard_map(
            _search_local,
            mesh=mesh,
            in_specs=(graph_specs, sq4_specs, P(axis, None), P(axis, None, None)),
            out_specs=(P(axis, None, None), P(axis, None, None)),
            check_vma=False,
        )
    )

    def _update_local(g, fp, fw, ep, cp, cn, ids, wv, bi, bs):
        g0 = jax.tree.map(lambda x: x[0], g)
        ep0 = jax.tree.map(lambda x: x[0], ep)
        g2, fp2, fw2 = _wave_update_fused(
            g0, fp[0], fw[0], ep0, cp[0], cn[0], ids[0], wv[0], bi[0], bs[0], config
        )
        return (
            jax.tree.map(lambda x: x[None], g2),
            fp2[None],
            fw2[None],
        )

    update_step = jax.jit(
        jax.shard_map(
            _update_local,
            mesh=mesh,
            in_specs=(
                graph_specs,
                P(axis, None, None),
                P(axis, None, None),
                _shard_specs(providers, axis),
                P(axis, None, None),
                P(axis, None),
                P(axis, None),
                P(axis, None, None),
                P(axis, None, None),
                P(axis, None, None),
            ),
            out_specs=(graph_specs, P(axis, None, None), P(axis, None, None)),
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2),
    )

    w = config.wave_size
    for start in _shuffled_wave_starts(n_local, w):
        ids_per_shard, wave_vecs = _wave_inputs(
            start, w, counts, stacked, n_local, n_dev
        )
        ids_dev = jax.device_put(ids_per_shard, shard2)
        wv_dev = jax.device_put(wave_vecs, shard3)
        bp = dataclasses.replace(
            base_provider, fused_packed=fused_packed, fused_w2=fused_w2
        )
        bi, bs = search_step(graphs, bp, ids_dev, wv_dev)
        graphs, fused_packed, fused_w2 = update_step(
            graphs,
            fused_packed,
            fused_w2,
            providers,
            codes,
            const_dev,
            ids_dev,
            wv_dev,
            bi,
            bs,
        )

    search_providers = dataclasses.replace(
        base_provider, fused_packed=fused_packed, fused_w2=fused_w2
    )
    return ShardedIndex(
        graphs=graphs,
        providers=providers,
        n_shards=n_dev,
        n_local=n_local,
        n_total=int(counts.sum()),
        search_providers=search_providers,
        sim=sim,
    )


def _sharded_build_sq4_packed(
    sq, codes, w2, norm2, const, providers, counts, mesh, config, sim, axis,
    n_local, stacked,
):
    """Packed-adjacency sharded build: the r4 three-program wave loop
    (read-only packed search / read+compute / aliased in-place apply —
    see ``graph/builder.py``'s packed-wave module comment) running
    shard-locally under ``shard_map``.  The lowest-memory per-shard build
    regime: adjacency+scores share one ``[n/8, 8, 128]`` int32 table per
    shard, in-place updated, so a pod mesh builds with the same HBM
    profile per chip as the single-chip 10M build."""
    from jvector_tpu.graph.score import sq4_aug_rows

    n_dev = mesh.devices.size
    mp = codes.shape[-1]
    r_cap = config.row_cap

    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        )

    w2 = put(w2)
    norm2 = put(norm2)
    const_dev = put(const)
    aug = put(sq4_aug_rows(codes, const_dev))
    k_row = r_cap * mp
    fused_packed = put(
        jnp.zeros((n_dev, n_local, k_row // 128, 128), jnp.uint8)
    )
    adj = put(
        jnp.broadcast_to(
            _empty_packed_adjacency(n_local, r_cap)[None],
            (n_dev, n_local // 8, 8, 128),
        )
    )
    w2t = put(jnp.zeros((n_dev, n_local // 8, 8, 128), jnp.int32))
    cnt = put(jnp.zeros((n_dev, n_local), jnp.int32))
    entry = put(jnp.full((n_dev,), -1, jnp.int32))
    num = put(jnp.zeros((n_dev,), jnp.int32))

    base_provider = SQ4ScoreProvider(
        codes_packed=codes,
        node_w2=w2,
        node_norm2=norm2,
        fused_packed=fused_packed,
        fused_w2=w2t,
        scale=sq.scale,
        offset=sq.offset,
        codes_aug=aug,
        sim=sim,
    )
    sq4_specs = _sq4_spec(axis, sim)
    prov_specs = _shard_specs(providers, axis)

    def _search_local(a, bp, ent, ids, wv):
        bp0 = _strip_sq4(bp)
        bi, bs = _wave_search(a[0], bp0, ent[0], ids[0], wv[0], config)
        return bi[None], bs[None]

    search_step = jax.jit(
        jax.shard_map(
            _search_local,
            mesh=mesh,
            in_specs=(P(axis), sq4_specs, P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )

    def _compute_local(a, c, ent, nn, ep, cp, cd, ids, wv, bi, bs):
        ep0 = jax.tree.map(lambda x: x[0], ep)
        c2, e2, n2, adj_stream, fused_stream = _wave_update_compute(
            a[0], c[0], ent[0], nn[0], ep0, cp[0], cd[0], ids[0], wv[0],
            bi[0], bs[0], config,
        )
        lift = lambda t: jax.tree.map(lambda x: x[None], t)  # noqa: E731
        return c2[None], e2[None], n2[None], lift(adj_stream), lift(fused_stream)

    compute_step = jax.jit(
        jax.shard_map(
            _compute_local,
            mesh=mesh,
            in_specs=(
                P(axis), P(axis), P(axis), P(axis), prov_specs,
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            ),
            out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            check_vma=False,
        ),
        donate_argnums=(1,),
    )

    def _apply_local(a, wt, fp, adj_stream, fused_stream):
        strip = lambda t: jax.tree.map(lambda x: x[0], t)  # noqa: E731
        a2, w2_, f2 = _wave_apply_packed(
            a[0], wt[0], fp[0], strip(adj_stream), strip(fused_stream), mp
        )
        return a2[None], w2_[None], f2[None]

    apply_step = jax.jit(
        jax.shard_map(
            _apply_local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2),
    )

    w = config.wave_size
    for start in _shuffled_wave_starts(n_local, w):
        ids_per_shard, wave_vecs = _wave_inputs(
            start, w, counts, stacked, n_local, n_dev
        )
        ids_dev = put(ids_per_shard)
        wv_dev = put(wave_vecs)
        bp = dataclasses.replace(
            base_provider, fused_packed=fused_packed, fused_w2=w2t
        )
        bi, bs = search_step(adj, bp, entry, ids_dev, wv_dev)
        cnt, entry, num, adj_stream, fused_stream = compute_step(
            adj, cnt, entry, num, providers, codes, const_dev,
            ids_dev, wv_dev, bi, bs,
        )
        adj, w2t, fused_packed = apply_step(
            adj, w2t, fused_packed, adj_stream, fused_stream
        )

    def _unpack_local(a, c):
        layer = _unpack_adjacency(a[0], c[0], r_cap)
        return jax.tree.map(lambda x: x[None], layer)

    unpack = jax.jit(
        jax.shard_map(
            _unpack_local,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    layer = unpack(adj, cnt)
    graphs = GraphIndex(
        layers=(layer,),
        level_node_ids=(),
        entry_node=entry,
        num_nodes=num,
        deleted=put(jnp.zeros((n_dev, n_local), bool)),
    )
    search_providers = dataclasses.replace(
        base_provider, fused_packed=fused_packed, fused_w2=w2t
    )
    return ShardedIndex(
        graphs=graphs,
        providers=providers,
        n_shards=n_dev,
        n_local=n_local,
        n_total=int(counts.sum()),
        search_providers=search_providers,
        sim=sim,
    )


def sharded_graph_search(
    index: ShardedIndex,
    queries: jax.Array,
    mesh: Mesh,
    top_k: int,
    beam_width: int | None = None,
    rerank_k: int | None = None,
    axis: str = "shard",
    floor_slack: float | None = None,
):
    """Replicated queries, shard-local beam search, ICI all-gather merge.

    With a compressed index (``search_providers`` set) this is a TWO-PASS
    search: fused SQ4 first pass per shard, then a shard-local exact rerank
    of the top ``rerank_k`` beam entries, then ONE ``all_gather`` + top-k
    merge of exact scores.

    The reference's rerankFloor / ``worstApproximateScoreInTopK`` gating
    (``GraphSearcher.java:386-404``) is deliberately NOT applied by default:
    on TPU the rerank is one batched gather+matmul whose cost is identical
    with or without lane masking, while gating on the cross-shard
    APPROXIMATE floor measurably drops exact-topK candidates whose approx
    score sits below the floor (0.94 vs 1.00 recall on the 8-shard mesh
    test).  Pass ``floor_slack`` to re-enable the gate where rerank gathers
    are genuinely expensive (host-streamed tiers); it then costs one tiny
    extra all_gather of topK approx scores.

    Returns global ids ``[Q, top_k]`` + scores.
    """
    beam_width = beam_width or max(top_k, 100)
    rerank_k = rerank_k or beam_width
    n_local = index.n_local
    n_total = index.n_total
    two_pass = index.search_providers is not None

    def local_search(graph, sp, ep, q):
        graph = jax.tree.map(lambda x: x[0], graph)
        ep0 = jax.tree.map(lambda x: x[0], ep)
        first = _strip_sq4(sp) if two_pass else ep0
        qstate = first.prepare(q)
        qn = q.shape[0]
        entries = jnp.broadcast_to(graph.entry_node[None], (qn,)).astype(jnp.int32)
        beam = search_layer(
            graph.base.neighbors,
            first,
            qstate,
            entries,
            beam_width=beam_width,
            max_iters=1000,
        )
        shard = jax.lax.axis_index(axis)
        if two_pass:
            cand_ids = beam.ids[:, :rerank_k]
            cand_approx = beam.scores[:, :rerank_k]
            valid = (cand_ids >= 0) & (cand_ids + shard * n_local < n_total)
            cand_approx = jnp.where(valid, cand_approx, NEG_INF)
            rr = valid
            if floor_slack is not None:
                # cross-shard approximate floor: global topK-th approx score
                approx_all = jax.lax.all_gather(
                    cand_approx[:, :top_k], axis, axis=1
                ).reshape(qn, -1)
                floor = jax.lax.top_k(approx_all, top_k)[0][:, -1] - floor_slack
                rr = valid & (cand_approx >= floor[:, None])
            exact = jnp.where(
                rr,
                ep0.score(ep0.prepare(q), jnp.maximum(cand_ids, 0)),
                NEG_INF,
            )
            s, sel = jax.lax.top_k(exact, top_k)
            local_ids = jnp.take_along_axis(cand_ids, sel, axis=1)
        else:
            s, sel = jax.lax.top_k(beam.scores, top_k)
            local_ids = jnp.take_along_axis(beam.ids, sel, axis=1)
        gids = jnp.where(local_ids >= 0, local_ids + shard * n_local, -1)
        s = jnp.where((gids >= 0) & (gids < n_total) & (s > NEG_INF), s, -jnp.inf)
        gids = jnp.where(s > -jnp.inf, gids, -1)
        # merge across shards on ICI
        s_all = jax.lax.all_gather(s, axis, axis=1).reshape(qn, -1)
        g_all = jax.lax.all_gather(gids, axis, axis=1).reshape(qn, -1)
        sm, pick = jax.lax.top_k(s_all, top_k)
        return jnp.take_along_axis(g_all, pick, axis=1), sm

    sp_arg = index.search_providers if two_pass else index.providers
    sp_spec = (
        _sq4_spec(axis, index.sim) if two_pass else _shard_specs(index.providers, axis)
    )
    fn = jax.jit(
        jax.shard_map(
            local_search,
            mesh=mesh,
            in_specs=(
                _shard_specs(index.graphs, axis),
                sp_spec,
                _shard_specs(index.providers, axis),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return fn(index.graphs, sp_arg, index.providers, queries)


# ---------------------------------------------------------------------------
# Sharded persistence: one container per shard + a manifest.
# Reference contract: one OnDiskGraphIndex per segment + the multi-index
# search lifecycle (Grid/compaction reopen segments independently).
# ---------------------------------------------------------------------------


def save_sharded(index: ShardedIndex, directory: str | os.PathLike) -> None:
    """Write each shard as an ordinary index container + ``manifest.json``.

    Shard files use the same FUSED_SQ4 feature layout as the LTM/host tiers
    (``disk/ltm.py``), so a single shard is also directly servable via
    ``HostGraphIndex.load`` or :func:`jvector_tpu.disk.format.load_index`.
    """
    from jvector_tpu.disk.format import FeatureId, write_index

    directory = os.fspath(directory)
    os.makedirs(directory, exist_ok=True)
    sq4 = index.search_providers
    files = []
    for s in range(index.n_shards):
        graph_s = jax.tree.map(lambda x, s=s: np.asarray(x)[s], index.graphs)
        feats = {
            FeatureId.INLINE_VECTORS: {
                "vectors": np.asarray(index.providers.vectors[s])
            }
        }
        if sq4 is not None:
            const = (
                sq4.node_norm2
                if index.sim == SimilarityFunction.COSINE
                else sq4.node_w2
            )
            # normalize the packed-build layouts to the on-disk 2-D
            # convention: rank-3 fused rows flatten, and the packed
            # [n/8, 8, 128] int32 w2 table (f32 bits in lanes [0:R])
            # unpacks to [n, R] float32
            fp = np.asarray(sq4.fused_packed[s])
            if fp.ndim == 3:
                fp = fp.reshape(fp.shape[0], -1)
            fw = np.asarray(sq4.fused_w2[s])
            if fw.ndim == 3:
                r_cap = index.graphs.layers[0].neighbors.shape[-1]
                fw = (
                    fw.reshape(-1, 128)[:, :r_cap]
                    .copy()
                    .view(np.float32)
                )
            feats[FeatureId.FUSED_SQ4] = {
                "codes_packed": np.asarray(sq4.codes_packed[s]),
                "node_const": np.asarray(const[s]),
                "fused_packed": fp,
                "fused_w2": fw,
                "scale": np.asarray(sq4.scale),
                "offset": np.asarray(sq4.offset),
            }
        fname = f"shard{s:04d}.jvtpu"
        write_index(
            os.path.join(directory, fname),
            graph_s,
            features=feats,
            renumber=False,
            similarity=str(index.sim.value),
            shard=s,
        )
        files.append(fname)
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(
            {
                "version": 1,
                "n_shards": index.n_shards,
                "n_local": index.n_local,
                "n_total": index.n_total,
                "similarity": str(index.sim.value),
                "sq4": sq4 is not None,
                "shards": files,
            },
            f,
        )


def sharded_build_on_disk(
    directory: str | os.PathLike,
    vectors: "np.ndarray | object",
    n: int,
    dim: int,
    shards: int,
    config: GraphConfig | None = None,
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
    training_sample: int = 65_536,
    seed: int = 0,
    checkpoint_every: int = 0,
) -> dict:
    """Stream-build one LARGER-THAN-MEMORY shard container per partition.

    The 100M pipeline end to end (BASELINE config 5): the corpus is block-
    partitioned into ``shards`` contiguous ranges; each range is built with
    :func:`jvector_tpu.disk.ltm.build_on_disk_ltm` (SQ4 working set on
    device, full-res vectors streamed to the shard file, optional
    wave-level ``checkpoint_every``) into ``shard%04d.jvtpu`` + a manifest
    compatible with :func:`load_sharded` (device serving) and
    ``ShardedHostIndex.load`` (bounded-memory host serving).

    On one chip the shards build SEQUENTIALLY (this loop); on a pod each
    host runs its own shard — the builds are fully independent (disjoint
    node ranges, zero cross-shard traffic), so wall-clock scales linearly
    with hosts exactly like the in-memory :func:`sharded_build`.

    Restartable at TWO levels: shards whose containers are already
    committed (valid footer) are skipped, and the in-progress shard
    resumes from its own wave checkpoint.

    Unlike :func:`sharded_build` (global quantizer), each shard trains its
    own quantizer on its range — shard files stay self-contained.  Merged
    serving reranks EXACT by default (inline vectors ride every shard
    file), so cross-shard score comparability never depends on a shared
    codebook; first-pass-only merges inherit the per-shard-bias caveat of
    ``graph/multi.py``'s ``floor_slack``.

    ``vectors`` is an array or a chunk loader ``f(start, stop)``.
    Returns the manifest dict.
    """
    from jvector_tpu.disk.format import IndexFileReader
    from jvector_tpu.disk.ltm import build_on_disk_ltm
    from jvector_tpu.graph.index import bucket_capacity

    sim = SimilarityFunction.parse(sim)
    config = config or GraphConfig()
    directory = os.fspath(directory)
    os.makedirs(directory, exist_ok=True)
    load = (
        (lambda a, b: vectors[a:b]) if isinstance(vectors, np.ndarray) else vectors
    )
    n_local = -(-n // shards)
    # one capacity for every shard (incl. the ragged last): equal-shaped
    # containers stack cleanly in load_sharded and share compile buckets
    cap = bucket_capacity(n_local)
    files = []
    for s in range(shards):
        a, b = s * n_local, min((s + 1) * n_local, n)
        fname = f"shard{s:04d}.jvtpu"
        fpath = os.path.join(directory, fname)
        files.append(fname)
        try:
            if IndexFileReader(fpath).meta.get("ltm"):
                continue  # committed in a previous run
        except Exception:
            pass
        build_on_disk_ltm(
            fpath,
            lambda i, j, a=a: load(a + i, a + j),
            n=b - a,
            dim=dim,
            config=config,
            sim=sim,
            training_sample=training_sample,
            seed=seed + s,  # independent quantizer sample per shard range
            compression="sq4",
            capacity=cap,
            checkpoint_every=checkpoint_every,
        )
    manifest = {
        "version": 1,
        "n_shards": shards,
        "n_local": n_local,
        "n_total": n,
        "similarity": str(sim.value),
        "sq4": True,
        "ltm": True,
        "shards": files,
    }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def load_sharded(
    directory: str | os.PathLike, mesh: Mesh, axis: str = "shard"
) -> ShardedIndex:
    """Reopen a :func:`save_sharded` directory onto a mesh."""
    from jvector_tpu.disk.format import FeatureId, load_index
    from jvector_tpu.graph.index import GraphLayer
    from jvector_tpu.graph.score import sq4_aug_rows

    directory = os.fspath(directory)
    with open(os.path.join(directory, "manifest.json")) as f:
        man = json.load(f)
    if man["n_shards"] != mesh.devices.size:
        raise ValueError(
            f"manifest has {man['n_shards']} shards, mesh has {mesh.devices.size}"
        )
    sim = SimilarityFunction.parse(man["similarity"])
    nbrs, cnts, scores, deleted, entries, nums = [], [], [], [], [], []
    vecs = []
    sq_feats: dict[str, list[np.ndarray]] = {
        k: [] for k in ("codes_packed", "node_const", "fused_packed", "fused_w2")
    }
    scales: list[np.ndarray] = []
    offsets_q: list[np.ndarray] = []
    f4 = f"feature/{FeatureId.FUSED_SQ4}"
    for fname in man["shards"]:
        idx = load_index(os.path.join(directory, fname))
        r = idx.reader
        nbrs.append(np.asarray(r.read("graph/L0/neighbors")))
        cnts.append(np.asarray(r.read("graph/L0/counts")))
        if r.has_array("graph/L0/scores"):
            scores.append(np.asarray(r.read("graph/L0/scores")))
        else:
            scores.append(
                np.where(nbrs[-1] >= 0, 0.0, -np.inf).astype(np.float32)
            )
        if r.has_array("graph/deleted"):
            deleted.append(np.asarray(r.read("graph/deleted")))
        else:
            deleted.append(np.zeros(nbrs[-1].shape[0], bool))
        entries.append(idx.meta["entry_node"])
        nums.append(idx.meta["num_nodes"])
        vecs.append(
            np.asarray(r.read(f"feature/{FeatureId.INLINE_VECTORS}/vectors"))
        )
        if man.get("sq4"):
            for k in sq_feats:
                sq_feats[k].append(np.asarray(r.read(f"{f4}/{k}")))
            scales.append(np.asarray(r.read(f"{f4}/scale")))
            offsets_q.append(np.asarray(r.read(f"{f4}/offset")))

    # shard containers are padded to a shared compile bucket; a ragged last
    # shard's inline vectors block is the only per-n array — pad it so the
    # stacked provider rows line up with the capacity-shaped graph arrays
    cap = nbrs[0].shape[0]
    vecs = [
        v
        if v.shape[0] == cap
        else np.concatenate(
            [v, np.zeros((cap - v.shape[0], v.shape[1]), v.dtype)]
        )
        for v in vecs
    ]

    scale = offset = None
    if man.get("sq4"):
        scale, offset = scales[0], offsets_q[0]
        same_q = all(
            np.array_equal(scales[0], s) and np.array_equal(offsets_q[0], o)
            for s, o in zip(scales, offsets_q)
        )
        if not same_q:
            # sharded_build_on_disk trains an INDEPENDENT quantizer per
            # shard (self-contained segment files); a mesh-stacked provider
            # needs one affine, so re-encode every shard with a UNION
            # affine covering every shard's trained range (lo=min offsets,
            # hi=max offsets+15*scales — any single shard's affine would
            # clip distribution-drifted shards) and rebuild the fused
            # tables (load-time cost only — the shard files are untouched,
            # and the host tier keeps using each shard's own quantizer)
            from jvector_tpu.quantization.sq import ScalarQuantization4

            lo = np.minimum.reduce(offsets_q)
            hi = np.maximum.reduce(
                [o + 15.0 * s for s, o in zip(scales, offsets_q)]
            )
            offset = lo.astype(np.float32)
            scale = np.maximum((hi - lo) / 15.0, 1e-12).astype(np.float32)
            sq0 = ScalarQuantization4(
                scale=jnp.asarray(scale),
                offset=jnp.asarray(offset),
                original_dim=int(vecs[0].shape[1]),
            )
            # chunked: whole-shard fancy indexing would materialize a
            # [cap, R, MP] u8 intermediate (~26 GB/shard at the advertised
            # 12.5M-nodes-per-shard scale) and push the full f32 shard
            # through the device in one transfer
            chunk = 65_536
            for si, v in enumerate(vecs):
                cap_s = v.shape[0]
                nb = nbrs[si]
                r = nb.shape[1]
                mp = None
                codes_s = const_s = None
                for st in range(0, cap_s, chunk):
                    cb = sq0.encode(jnp.asarray(v[st : st + chunk]))
                    w2_b, norm2_b = sq0.node_constants(cb)
                    cb = np.asarray(cb)
                    if codes_s is None:
                        mp = cb.shape[1]
                        codes_s = np.empty((cap_s, mp), np.uint8)
                        const_s = np.empty((cap_s,), np.float32)
                    codes_s[st : st + chunk] = cb
                    const_s[st : st + chunk] = np.asarray(
                        norm2_b
                        if sim == SimilarityFunction.COSINE
                        else w2_b
                    )
                fused_p = np.zeros((cap_s, r * mp), np.uint8)
                fused_w = np.zeros((cap_s, r), np.float32)
                for st in range(0, cap_s, chunk):
                    blk = nb[st : st + chunk]
                    ok = blk >= 0
                    safe = np.maximum(blk, 0)
                    fused_p[st : st + chunk] = np.where(
                        ok[..., None], codes_s[safe], 0
                    ).reshape(blk.shape[0], -1)
                    fused_w[st : st + chunk] = np.where(
                        ok, const_s[safe], 0.0
                    )
                sq_feats["codes_packed"][si] = codes_s
                sq_feats["node_const"][si] = const_s
                sq_feats["fused_packed"][si] = fused_p
                sq_feats["fused_w2"][si] = fused_w

    def put(arr):
        spec = P(axis, *([None] * (arr.ndim - 1)))
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

    graphs = GraphIndex(
        layers=(
            GraphLayer(
                neighbors=put(np.stack(nbrs)),
                scores=put(np.stack(scores)),
                counts=put(np.stack(cnts)),
            ),
        ),
        level_node_ids=(),
        entry_node=put(np.asarray(entries, np.int32)),
        num_nodes=put(np.asarray(nums, np.int32)),
        deleted=put(np.stack(deleted)),
    )
    providers = ExactScoreProvider(vectors=put(np.stack(vecs)), sim=sim)
    search_providers = None
    if man.get("sq4"):
        codes = put(np.stack(sq_feats["codes_packed"]))
        const = put(np.stack(sq_feats["node_const"]))
        # both per-node constants are deterministic functions of the codes;
        # recompute rather than double-store (node_const stays on disk for
        # the host tier's benefit)
        from jvector_tpu.quantization.sq import ScalarQuantization4

        sq = ScalarQuantization4(
            scale=jnp.asarray(scale),
            offset=jnp.asarray(offset),
            original_dim=int(vecs[0].shape[1]),
        )
        w2, norm2 = sq.node_constants(codes)
        search_providers = SQ4ScoreProvider(
            codes_packed=codes,
            node_w2=w2,
            node_norm2=norm2,
            fused_packed=put(np.stack(sq_feats["fused_packed"])),
            fused_w2=put(np.stack(sq_feats["fused_w2"])),
            scale=jnp.asarray(scale),
            offset=jnp.asarray(offset),
            codes_aug=sq4_aug_rows(codes, const),
            sim=sim,
        )
    return ShardedIndex(
        graphs=graphs,
        providers=providers,
        n_shards=man["n_shards"],
        n_local=man["n_local"],
        n_total=man["n_total"],
        search_providers=search_providers,
        sim=sim,
    )
