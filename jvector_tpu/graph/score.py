"""Score providers: the strategy objects behind search and build scoring.

TPU-native equivalent of ``jv/graph/similarity/``:

- ``SearchScoreProvider`` = {approximate score fn, exact reranker}
  -> a provider pytree with ``prepare(queries)`` + ``score(qstate, ids)``,
  plus an optional separate reranker provider for the two-pass search.
- ``BuildScoreProvider`` (``BuildScoreProvider.java:32-259``)
  -> the same providers plus ``pairwise(ids_a, ids_b)`` used by the
  diversity prune (``diversityFunctionFor``).

Providers are registered dataclass pytrees: array fields are traced, the
similarity enum rides as static metadata, so one jitted search specializes
per provider type + similarity, exactly like the reference specializes score
functions per compression type.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from jvector_tpu.ops.adc import adc_score, build_partial_sums
from jvector_tpu.ops.hamming import _popcount32, pack_bits
from jvector_tpu.ops.similarity import (
    SimilarityFunction,
    normalize_score,
)


def _register(cls, data_fields, meta_fields):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=data_fields,
        meta_fields=meta_fields,
    )(cls)


def exact_score_rows(qstate, vecs: jax.Array, sim: SimilarityFunction) -> jax.Array:
    """Exact scores from ALREADY-GATHERED rows: qstate ``[Q, D]``,
    vecs ``[Q, R, D]`` -> ``[Q, R]``.

    The build's wave update gathers each candidate row once and derives
    BOTH the exact rescore and the prune's pairwise matrix from it —
    XLA row gathers are row-count-bound (~14 ns/row), so the three
    separate gathers of the same ~100k rows/wave were pure waste."""
    vecs = vecs.astype(jnp.float32)
    if sim == SimilarityFunction.DOT_PRODUCT:
        raw = jnp.einsum("qd,qrd->qr", qstate, vecs, preferred_element_type=jnp.float32)
    elif sim == SimilarityFunction.COSINE:
        dots = jnp.einsum("qd,qrd->qr", qstate, vecs, preferred_element_type=jnp.float32)
        vn = jnp.sqrt(jnp.sum(vecs * vecs, axis=-1))
        raw = dots / jnp.maximum(vn, 1e-30)
    else:
        q2 = jnp.sum(qstate * qstate, axis=-1)[:, None]
        v2 = jnp.sum(vecs * vecs, axis=-1)
        dots = jnp.einsum("qd,qrd->qr", qstate, vecs, preferred_element_type=jnp.float32)
        raw = jnp.maximum(q2 + v2 - 2.0 * dots, 0.0)
    return normalize_score(raw, sim)


def exact_pairwise_rows(
    va: jax.Array, sim: SimilarityFunction, half: bool = True
) -> jax.Array:
    """All-pairs similarity from gathered rows: ``[B, C, D]`` -> ``[B, C, C]``.

    ``half=True`` runs the O(C^2 D) dot products in bfloat16 (f32
    accumulate): the matrix only feeds the diversity prune's dominance
    COMPARISONS (stored edge scores are rescored exact separately), the
    squared norms stay f32, and the prune's tie-break jitter already
    covers sub-epsilon ties.  ~6x MXU throughput over f32."""
    va = va.astype(jnp.float32)
    vd = va.astype(jnp.bfloat16) if half else va
    dots = jnp.einsum(
        "bcd,bed->bce", vd, vd, preferred_element_type=jnp.float32
    )
    if sim == SimilarityFunction.DOT_PRODUCT:
        raw = dots
    elif sim == SimilarityFunction.COSINE:
        n2 = jnp.sqrt(jnp.sum(va * va, axis=-1))
        raw = dots / jnp.maximum(n2[:, :, None] * n2[:, None, :], 1e-30)
    else:
        a2 = jnp.sum(va * va, axis=-1)
        raw = jnp.maximum(a2[:, :, None] + a2[:, None, :] - 2.0 * dots, 0.0)
    return normalize_score(raw, sim)


@partial(_register, data_fields=["vectors"], meta_fields=["sim"])
@dataclasses.dataclass(frozen=True)
class ExactScoreProvider:
    """Full-precision scoring over HBM-resident vectors ``[N, D]``.

    Reference: ``BuildScoreProvider.randomAccessScoreProvider`` +
    ``DefaultSearchScoreProvider.exact``.
    """

    vectors: jax.Array  # [N, D] float32
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    @property
    def exact(self) -> bool:
        return True

    def prepare(self, queries: jax.Array) -> jax.Array:
        """Per-wave query state (the analog of building the query's decoder)."""
        queries = queries.astype(jnp.float32)
        if self.sim == SimilarityFunction.COSINE:
            n = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
            return queries / jnp.maximum(n, 1e-30)
        return queries

    def score(self, qstate: jax.Array, ids: jax.Array) -> jax.Array:
        """Score queries against node ids: qstate ``[Q, D]``, ids ``[Q, R]`` -> ``[Q, R]``.

        ``vectors`` may be stored bfloat16 (half the HBM gather traffic);
        arithmetic is promoted to f32 after the gather.
        """
        vecs = self.vectors[ids].astype(jnp.float32)  # [Q, R, D]
        if self.sim == SimilarityFunction.DOT_PRODUCT:
            raw = jnp.einsum("qd,qrd->qr", qstate, vecs, preferred_element_type=jnp.float32)
        elif self.sim == SimilarityFunction.COSINE:
            dots = jnp.einsum("qd,qrd->qr", qstate, vecs, preferred_element_type=jnp.float32)
            vn = jnp.sqrt(jnp.sum(vecs * vecs, axis=-1))
            raw = dots / jnp.maximum(vn, 1e-30)  # qstate already normalized
        else:
            q2 = jnp.sum(qstate * qstate, axis=-1)[:, None]
            v2 = jnp.sum(vecs * vecs, axis=-1)
            dots = jnp.einsum("qd,qrd->qr", qstate, vecs, preferred_element_type=jnp.float32)
            raw = jnp.maximum(q2 + v2 - 2.0 * dots, 0.0)
        return normalize_score(raw, self.sim)

    def score_nodes(self, node_ids: jax.Array, ids: jax.Array) -> jax.Array:
        """Node-to-node scores: node_ids ``[B]``, ids ``[B, R]`` -> ``[B, R]``."""
        return self.score(self.prepare(self.vectors[node_ids]), ids)

    def pairwise(self, ids_a: jax.Array, ids_b: jax.Array) -> jax.Array:
        """Batched all-pairs: ids_a ``[B, Ca]``, ids_b ``[B, Cb]`` -> ``[B, Ca, Cb]``.

        The diversity-prune kernel (``diversityFunctionFor`` in the reference).
        """
        va = self.vectors[ids_a].astype(jnp.float32)  # [B, Ca, D]
        vb = self.vectors[ids_b].astype(jnp.float32)  # [B, Cb, D]
        dots = jnp.einsum("bcd,bed->bce", va, vb, preferred_element_type=jnp.float32)
        if self.sim == SimilarityFunction.DOT_PRODUCT:
            raw = dots
        elif self.sim == SimilarityFunction.COSINE:
            na = jnp.sqrt(jnp.sum(va * va, axis=-1))[:, :, None]
            nb = jnp.sqrt(jnp.sum(vb * vb, axis=-1))[:, None, :]
            raw = dots / jnp.maximum(na * nb, 1e-30)
        else:
            a2 = jnp.sum(va * va, axis=-1)[:, :, None]
            b2 = jnp.sum(vb * vb, axis=-1)[:, None, :]
            raw = jnp.maximum(a2 + b2 - 2.0 * dots, 0.0)
        return normalize_score(raw, self.sim)


@partial(
    _register,
    data_fields=["codes", "codebooks", "center"],
    meta_fields=["sim"],
)
@dataclasses.dataclass(frozen=True)
class ADCScoreProvider:
    """PQ compressed scoring via per-query ADC lookup tables.

    Reference: ``PQVectors.precomputedScoreFunctionFor`` -> ``PQDecoder``
    (LUT built once per query, gather+sum per candidate) and
    ``BuildScoreProvider.pqBuildScoreProvider``.
    """

    codes: jax.Array  # [N, M] uint8
    codebooks: jax.Array  # [M, K, S] float32
    center: jax.Array | None  # [D_pad] global centering vector or None
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    @property
    def exact(self) -> bool:
        return False

    @property
    def padded_dim(self) -> int:
        m, _, s = self.codebooks.shape
        return m * s

    def _pad(self, queries: jax.Array) -> jax.Array:
        d = queries.shape[-1]
        dp = self.padded_dim
        if d < dp:
            queries = jnp.concatenate(
                [queries, jnp.zeros(queries.shape[:-1] + (dp - d,), queries.dtype)],
                axis=-1,
            )
        return queries

    def prepare(self, queries: jax.Array) -> jax.Array:
        """Build LUTs ``[Q, M, K]`` (the ``calculatePartialSums`` step)."""
        q = self._pad(queries)
        if self.center is not None:
            q = q - self.center
        if self.sim == SimilarityFunction.COSINE:
            n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
            q = q / jnp.maximum(n, 1e-30)
            luts = build_partial_sums(q, self.codebooks, SimilarityFunction.DOT_PRODUCT)
            # cosine needs the centroid norm table folded in at score time;
            # store it stacked on the LUT channel: [Q, M, K] dot + norms row.
            return luts
        return build_partial_sums(q, self.codebooks, self.sim)

    def score(self, luts: jax.Array, ids: jax.Array) -> jax.Array:
        from jvector_tpu.ops.pallas.adc_kernel import adc_score_auto

        codes = self.codes[ids]  # [Q, R, M]
        raw = adc_score_auto(luts, codes)
        if self.sim == SimilarityFunction.COSINE:
            c2 = jnp.sum(self.codebooks * self.codebooks, axis=-1)  # [M, K]
            mag = adc_score_auto(jnp.broadcast_to(c2[None], luts.shape), codes)
            raw = raw / jnp.maximum(jnp.sqrt(mag), 1e-30)
        return normalize_score(raw, self.sim)

    def decode_centered(self, ids: jax.Array) -> jax.Array:
        """Decode codes to (padded, still-centered) vectors ``[..., M*S]``.

        Reference: ``ProductQuantization.decodeCentered``.
        """
        codes = self.codes[ids].astype(jnp.int32)  # [..., M]
        m = self.codebooks.shape[0]
        parts = [self.codebooks[i][codes[..., i]] for i in range(m)]
        return jnp.concatenate(parts, axis=-1)

    def score_nodes(self, node_ids: jax.Array, ids: jax.Array) -> jax.Array:
        """Node-to-node code-to-code scores: node_ids ``[B]``, ids ``[B, R]``.

        Reference: ``PQVectors.diversityFunctionFor`` +
        ``createCodebookPartialSums`` (``ProductQuantization.java:609-628``)
        make PQ-PQ compares O(M) centroid-pair lookups.  Because subspaces
        are independent, ``sum_m measure(c_a_m, c_b_m)`` equals the measure
        between the DECODED vectors, so on TPU the table lookup becomes one
        MXU matmul over decoded rows — same math, no gathers.
        """
        from jvector_tpu.ops.similarity import pairwise_raw

        a = self.decode_centered(node_ids)[:, None, :]  # [B, 1, D]
        b = self.decode_centered(ids)  # [B, R, D]
        raw = pairwise_raw(a, b, self.sim)[:, 0, :]
        return normalize_score(raw, self.sim)

    def pairwise(self, ids_a: jax.Array, ids_b: jax.Array) -> jax.Array:
        """Batched all-pairs code-to-code (decode both sides + MXU matmul)."""
        from jvector_tpu.ops.similarity import pairwise_raw

        a = self.decode_centered(ids_a)  # [B, Ca, D]
        b = self.decode_centered(ids_b)  # [B, Cb, D]
        raw = pairwise_raw(a, b, self.sim)
        return normalize_score(raw, self.sim)


@partial(
    _register,
    data_fields=["codes", "fused_codes", "codebooks", "center"],
    meta_fields=["sim"],
)
@dataclasses.dataclass(frozen=True)
class FusedADCScoreProvider:
    """Edge-fused ADC: each node's row stores its NEIGHBORS' PQ codes.

    Reference: ``FusedPQ`` + ``FusedPQDecoder`` (``FusedPQ.java:146-161``,
    ``FusedPQDecoder.java:79-111``) — the codes of all R neighbors are laid
    out contiguously with the adjacency so one read scores a whole
    expansion.  On TPU this turns the search loop's R-row-per-query code
    gather into ONE row per query (``fused_codes[u]``), the same locality
    win the reference gets from one disk read.

    ``codes [N, M]`` remain for entry/hierarchy/rerank-k scoring.
    """

    codes: jax.Array  # [N, M] uint8
    fused_codes: jax.Array  # [N, R, M] uint8, aligned with graph neighbors
    codebooks: jax.Array  # [M, K, S]
    center: jax.Array | None
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    @property
    def exact(self) -> bool:
        return False

    @property
    def supports_fused(self) -> bool:
        return True

    def _plain(self) -> ADCScoreProvider:
        return ADCScoreProvider(
            codes=self.codes,
            codebooks=self.codebooks,
            center=self.center,
            sim=self.sim,
        )

    def prepare(self, queries: jax.Array) -> jax.Array:
        return self._plain().prepare(queries)

    def score(self, luts: jax.Array, ids: jax.Array) -> jax.Array:
        return self._plain().score(luts, ids)

    def score_edges(self, luts: jax.Array, node_ids: jax.Array) -> jax.Array:
        """Score ALL neighbors of ``node_ids [Q]`` or ``[Q, E]`` -> ``[Q, E*R]``.

        The fused gather: one contiguous row of R*M code bytes per expansion.
        """
        from jvector_tpu.ops.pallas.adc_kernel import adc_score_auto

        q = node_ids.shape[0]
        codes = self.fused_codes[node_ids]  # [Q, (E,) R, M] — row gathers
        if codes.ndim == 4:
            codes = codes.reshape(q, -1, codes.shape[-1])  # [Q, E*R, M]
        raw = adc_score_auto(luts, codes)
        if self.sim == SimilarityFunction.COSINE:
            c2 = jnp.sum(self.codebooks * self.codebooks, axis=-1)
            mag = adc_score_auto(jnp.broadcast_to(c2[None], luts.shape), codes)
            raw = raw / jnp.maximum(jnp.sqrt(mag), 1e-30)
        return normalize_score(raw, self.sim)


def build_fused_codes(
    neighbors: jax.Array, codes: jax.Array, chunk: int = 65_536
) -> jax.Array:
    """Pack each node's neighbors' codes next to its adjacency row.

    Reference: the FusedPQ write path packs neighbor codes inline per L0
    record (``FusedPQ.writeInline``).  Padding slots get code 0 (their score
    is masked by the -1 neighbor id at search time).
    """
    n, r = neighbors.shape
    m = codes.shape[1]
    out = jnp.zeros((n, r, m), jnp.uint8)
    for start in range(0, n, chunk):
        blk = neighbors[start : start + chunk]
        safe = jnp.maximum(blk, 0)
        gathered = jnp.where((blk >= 0)[..., None], codes[safe], 0)
        out = jax.lax.dynamic_update_slice_in_dim(out, gathered, start, axis=0)
    return out


@partial(
    _register,
    data_fields=["codes_packed", "fused_packed", "codebooks", "center"],
    meta_fields=["sim"],
)
@dataclasses.dataclass(frozen=True)
class LUT16ScoreProvider:
    """Edge-fused 4-bit PQ scoring (the TPU Quicker-ADC analog).

    Reference relationship: the reference's fused path (``FusedPQ`` +
    ``FusedPQDecoder``) pins K=256 because AVX shuffles gather 8-bit LUTs
    well; on TPU there is no VPU gather, so the LUT lookup is a one-hot
    select whose cost scales with K.  K=16 with twice the subspaces keeps
    the same bits/vector while making the select 16x cheaper and the LUT
    16x smaller — the same trade SCANN's SIMD LUT16 makes on CPU.

    Layouts (see :mod:`jvector_tpu.ops.pallas.adc16_kernel`):

    - ``codes_packed  [N, MP]``    uint8 (MP = M/2 packed bytes)
    - ``fused_packed  [N, MP, R]`` uint8 — neighbor codes transposed so the
      kernel's per-subspace dynamic slice lands on a sublane dim.
    """

    codes_packed: jax.Array  # [N, MP] uint8
    fused_packed: jax.Array  # [N, MP, R] uint8
    codebooks: jax.Array  # [M, 16, S]
    center: jax.Array | None
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    @property
    def exact(self) -> bool:
        return False

    @property
    def supports_fused(self) -> bool:
        return True

    @property
    def padded_dim(self) -> int:
        m, _, s = self.codebooks.shape
        return m * s

    def prepare(self, queries: jax.Array) -> jax.Array:
        """LUTs in paired kernel layout ``[Q, MP, 32]``."""
        from jvector_tpu.ops.pallas.adc16_kernel import lut_pairs

        d = queries.shape[-1]
        dp = self.padded_dim
        if d < dp:
            queries = jnp.concatenate(
                [queries, jnp.zeros(queries.shape[:-1] + (dp - d,), queries.dtype)],
                axis=-1,
            )
        if self.center is not None:
            queries = queries - self.center
        if self.sim == SimilarityFunction.COSINE:
            n = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
            queries = queries / jnp.maximum(n, 1e-30)
            luts = build_partial_sums(
                queries, self.codebooks, SimilarityFunction.DOT_PRODUCT
            )
        else:
            luts = build_partial_sums(queries, self.codebooks, self.sim)
        return lut_pairs(luts)

    def _norm(self, raw: jax.Array, codes_t: jax.Array, luts: jax.Array) -> jax.Array:
        if self.sim == SimilarityFunction.COSINE:
            from jvector_tpu.ops.pallas.adc16_kernel import adc16_auto, lut_pairs

            c2 = lut_pairs(
                jnp.sum(self.codebooks * self.codebooks, axis=-1)[None]
            )  # [1, MP, 32]
            mag = adc16_auto(jnp.broadcast_to(c2, luts.shape), codes_t)
            raw = raw / jnp.maximum(jnp.sqrt(mag), 1e-30)
        return normalize_score(raw, self.sim)

    def score(self, luts: jax.Array, ids: jax.Array) -> jax.Array:
        """ids ``[Q, C]`` -> scores ``[Q, C]`` (entry/hierarchy/rerank pool)."""
        from jvector_tpu.ops.pallas.adc16_kernel import adc16_auto

        codes = self.codes_packed[ids]  # [Q, C, MP]
        codes_t = codes.transpose(0, 2, 1)  # [Q, MP, C]
        raw = adc16_auto(luts, codes_t)
        return self._norm(raw, codes_t, luts)

    def score_edges(self, luts: jax.Array, node_ids: jax.Array) -> jax.Array:
        """``[Q]`` or ``[Q, E]`` expanded nodes -> neighbor scores ``[Q, E*R]``."""
        from jvector_tpu.ops.pallas.adc16_kernel import adc16_auto

        q = node_ids.shape[0]
        rows = self.fused_packed[node_ids]  # [Q, (E,) MP, R]
        if rows.ndim == 4:
            rows = rows.transpose(0, 2, 1, 3).reshape(q, rows.shape[2], -1)
        raw = adc16_auto(luts, rows)  # [Q, E*R]
        return self._norm(raw, rows, luts)

    # -- build-time surface (decode origin, ADC against candidates) --------

    def decode_centered(self, ids: jax.Array) -> jax.Array:
        from jvector_tpu.ops.pallas.adc16_kernel import unpack_nibbles

        codes = unpack_nibbles(self.codes_packed[ids]).astype(jnp.int32)
        m = self.codebooks.shape[0]
        parts = [self.codebooks[i][codes[..., i]] for i in range(m)]
        return jnp.concatenate(parts, axis=-1)

    def score_nodes(self, node_ids: jax.Array, ids: jax.Array) -> jax.Array:
        origins = self.decode_centered(node_ids)
        if self.sim == SimilarityFunction.COSINE:
            n = jnp.sqrt(jnp.sum(origins * origins, axis=-1, keepdims=True))
            origins = origins / jnp.maximum(n, 1e-30)
        from jvector_tpu.ops.pallas.adc16_kernel import lut_pairs

        sim = (
            SimilarityFunction.DOT_PRODUCT
            if self.sim == SimilarityFunction.COSINE
            else self.sim
        )
        luts = lut_pairs(build_partial_sums(origins, self.codebooks, sim))
        return self.score(luts, ids)

    def pairwise(self, ids_a: jax.Array, ids_b: jax.Array) -> jax.Array:
        B, Ca = ids_a.shape
        Cb = ids_b.shape[1]
        flat = self.score_nodes(
            ids_a.reshape(-1),
            jnp.broadcast_to(ids_b[:, None], (B, Ca, Cb)).reshape(B * Ca, Cb),
        )
        return flat.reshape(B, Ca, Cb)


def build_fused_codes_lut16(
    neighbors: jax.Array, codes_packed: jax.Array, chunk: int = 65_536
) -> jax.Array:
    """Pack neighbors' packed-4-bit codes next to the adjacency, transposed.

    Returns ``[N, MP, R]`` uint8: ``out[n, j, r] = codes_packed[nbr[n,r], j]``
    (code 0 for -1 padding; masked by the neighbor id at search time).
    """
    n, r = neighbors.shape
    mp = codes_packed.shape[1]
    out = jnp.zeros((n, mp, r), jnp.uint8)
    for start in range(0, n, chunk):
        blk = neighbors[start : start + chunk]
        safe = jnp.maximum(blk, 0)
        gathered = jnp.where(
            (blk >= 0)[:, None, :],
            codes_packed[safe].transpose(0, 2, 1),  # [B, MP, R]
            0,
        )
        out = jax.lax.dynamic_update_slice_in_dim(out, gathered, start, axis=0)
    return out


@partial(
    _register,
    data_fields=[
        "codes_packed",
        "node_w2",
        "node_norm2",
        "fused_packed",
        "fused_w2",
        "scale",
        "offset",
        "codes_aug",
    ],
    meta_fields=["sim"],
)
@dataclasses.dataclass(frozen=True)
class SQ4ScoreProvider:
    """Edge-fused 4-bit scalar-quantized scoring — gather-free ADC.

    The TPU-native flagship first pass (see
    :class:`jvector_tpu.quantization.sq.ScalarQuantization4`): the affine
    dequant makes every similarity a fused unpack+FMA+reduce over raw code
    nibbles, so scoring runs at full VPU rate with 8x less HBM gather
    traffic than exact f32 rows.  Fills the reference's fused-compression
    slot (``FusedPQ``/``FusedPQDecoder``) with arithmetic instead of LUTs.

    - ``codes_packed [N, D/2]`` uint8 — entry/hierarchy/arbitrary-id scoring
    - ``fused_packed [N, R * D/2]`` uint8 — neighbors' codes per node row,
      kept 2-D: XLA relayouts high-rank uint8 arrays at the jit boundary
      (a measured 24 ms copy of the 3.6 GB table per search call at 1M)
    - ``fused_w2     [N, R]`` float32 — the neighbors' per-node constant:
      ``sum (a k)^2`` for EUCLIDEAN, ``||dequant||^2`` for COSINE (build it
      from the matching ``node_constants`` column), unused for DOT_PRODUCT
    """

    # None = derive code rows from ``codes_aug[..., :MP]`` inside jit (the
    # column slice fuses into the row gather) — the LTM working set keeps
    # ONE device copy of the codes instead of two (codes + aug duplicated
    # the 10M corpus's 1.25 GB padded code table and tipped HBM over)
    codes_packed: jax.Array | None  # [N, MP] uint8
    node_w2: jax.Array  # [N] float32: sum (a k)^2
    node_norm2: jax.Array  # [N] float32: ||dequant||^2
    fused_packed: jax.Array  # [N, R*MP] uint8 (2-D, see class docstring)
    fused_w2: jax.Array  # [N, R] float32
    scale: jax.Array  # [D_pad] float32
    offset: jax.Array  # [D_pad] float32
    # augmented rows [N, MP+4]: packed codes + the sim-appropriate per-node
    # constant as 4 LE bytes, so plain (non-fused) scoring is ONE row gather
    # — XLA gathers are row-count-bound, and codes+w2+norm2 as three
    # separate gathers tripled the build/LTM search cost.  None = rebuildable
    # on demand (sq4_aug_rows); scoring falls back to separate gathers.
    codes_aug: jax.Array | None = None
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    @property
    def exact(self) -> bool:
        return False

    @property
    def supports_fused(self) -> bool:
        # a provider built with empty fused tables (e.g. the LTM working
        # set before the final layout exists) scores via plain code rows
        return self.fused_packed.shape[1] > 0

    @property
    def mp(self) -> int:
        """Packed code bytes per node (with or without a codes_packed array)."""
        if self.codes_packed is not None:
            return self.codes_packed.shape[1]
        return self.codes_aug.shape[1] - 4

    def _code_rows(self, ids: jax.Array) -> jax.Array:
        """Gather packed code rows for arbitrary ids (aug-backed if needed)."""
        if self.codes_packed is not None:
            return self.codes_packed[ids]
        return self.codes_aug[ids][..., : self.mp]

    def _codes_array(self) -> jax.Array:
        """A whole [N, MP] codes array (materializes a slice when aug-backed
        — only for save/refresh paths, never per-wave)."""
        if self.codes_packed is not None:
            return self.codes_packed
        return self.codes_aug[:, : self.mp]

    @property
    def padded_dim(self) -> int:
        return self.scale.shape[0]

    def prepare(self, queries: jax.Array):
        """Query state: FMA vector ``u [Q, D]`` (GROUPED dim order, see
        ``unpack_nibble_rows_grouped``) + constant ``c0 [Q]``."""
        from jvector_tpu.quantization.sq import group_dims

        q = queries.astype(jnp.float32)
        d = q.shape[-1]
        if d < self.padded_dim:
            q = jnp.concatenate(
                [q, jnp.zeros(q.shape[:-1] + (self.padded_dim - d,), q.dtype)],
                axis=-1,
            )
        if self.sim == SimilarityFunction.EUCLIDEAN:
            qb = q - self.offset
            u = -2.0 * self.scale * qb  # [Q, D]
            c0 = jnp.sum(qb * qb, axis=-1)  # [Q]
            return group_dims(u), c0
        if self.sim == SimilarityFunction.COSINE:
            qn = q / jnp.maximum(
                jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)), 1e-30
            )
            return group_dims(qn * self.scale), jnp.sum(qn * self.offset, axis=-1)
        return group_dims(q * self.scale), jnp.sum(q * self.offset, axis=-1)

    def _finish(self, acc, c0, w2, norm2):
        """acc = sum u*k over dims; combine with constants per similarity."""
        if self.sim == SimilarityFunction.EUCLIDEAN:
            raw = jnp.maximum(acc + c0[:, None] + w2, 0.0)
        elif self.sim == SimilarityFunction.COSINE:
            raw = (acc + c0[:, None]) / jnp.maximum(jnp.sqrt(norm2), 1e-30)
        else:
            raw = acc + c0[:, None]
        return normalize_score(raw, self.sim)

    def score(self, qstate, ids: jax.Array) -> jax.Array:
        """ids ``[Q, C]`` -> scores ``[Q, C]``."""
        from jvector_tpu.quantization.sq import unpack_nibble_rows

        from jvector_tpu.quantization.sq import unpack_nibble_rows_grouped

        u, c0 = qstate
        if self.codes_aug is not None:
            mp = self.mp
            rows = self.codes_aug[ids]  # ONE gather: codes + packed constant
            k = unpack_nibble_rows_grouped(rows[..., :mp]).astype(jnp.float32)
            acc = jnp.einsum(
                "qcd,qd->qc", k, u, preferred_element_type=jnp.float32
            )
            b = rows[..., mp : mp + 4].astype(jnp.uint32)
            const = jax.lax.bitcast_convert_type(
                b[..., 0]
                | (b[..., 1] << 8)
                | (b[..., 2] << 16)
                | (b[..., 3] << 24),
                jnp.float32,
            )
            return self._finish(acc, c0, const, const)
        k = unpack_nibble_rows_grouped(self._code_rows(ids)).astype(jnp.float32)
        acc = jnp.einsum("qcd,qd->qc", k, u, preferred_element_type=jnp.float32)
        return self._finish(acc, c0, self.node_w2[ids], self.node_norm2[ids])

    def refreshed_for(self, neighbors: jax.Array) -> "SQ4ScoreProvider":
        """Rebuild the fused tables against a (mutated) adjacency.

        The fused tables are a SNAPSHOT of the adjacency's slot layout:
        after ``add_nodes`` / ``remove_deleted`` / ``refine_graph`` mutate
        rows, call this before serving or edge scores read stale codes.
        """
        const = (
            self.node_norm2
            if self.sim == SimilarityFunction.COSINE
            else self.node_w2
        )
        fused_packed, fused_w2 = build_fused_sq4(
            neighbors, self._codes_array(), const
        )
        return dataclasses.replace(
            self, fused_packed=fused_packed, fused_w2=fused_w2
        )

    def score_edges(self, qstate, node_ids: jax.Array) -> jax.Array:
        """``[Q]`` or ``[Q, E]`` expanded nodes -> neighbor scores ``[Q, E*R]``."""
        from jvector_tpu.quantization.sq import unpack_nibble_rows_grouped

        u, c0 = qstate
        q = node_ids.shape[0]
        mp = self.mp
        rows = self.fused_packed[node_ids]  # [Q, (E,) R*MP]
        if self.fused_w2.ndim == 3:
            # builder packed layout [N/8, 8, 128] int32 (f32 bits in lanes
            # [0:R]): one 512-byte physical-row gather per expanded node,
            # kept in place by the packed-adjacency Pallas update
            fp = self.fused_packed.shape
            r = (fp[1] * fp[2] if len(fp) == 3 else fp[1]) // mp
            w2r = self.fused_w2[node_ids >> 3, node_ids & 7]  # [Q,(E,) 128]
            w2 = jax.lax.bitcast_convert_type(w2r, jnp.float32)[..., :r]
        else:
            w2 = self.fused_w2[node_ids]  # [Q, (E,) R]
        rows = rows.reshape(q, -1, mp)  # [Q, E*R, MP]
        w2 = w2.reshape(q, -1)
        k = unpack_nibble_rows_grouped(rows).astype(jnp.float32)  # [Q, E*R, D]
        acc = jnp.einsum("qcd,qd->qc", k, u, preferred_element_type=jnp.float32)
        return self._finish(acc, c0, w2, w2)

    # -- build-time surface -------------------------------------------------

    def decode(self, ids: jax.Array) -> jax.Array:
        from jvector_tpu.quantization.sq import unpack_nibble_rows

        k = unpack_nibble_rows(self._code_rows(ids)).astype(jnp.float32)
        return k * self.scale + self.offset

    def score_nodes(self, node_ids: jax.Array, ids: jax.Array) -> jax.Array:
        return self.score(self.prepare(self.decode(node_ids)), ids)

    def pairwise(self, ids_a: jax.Array, ids_b: jax.Array) -> jax.Array:
        """All-pairs on dequantized vectors — one decode per side, one MXU
        matmul (the diversity-prune kernel)."""
        from jvector_tpu.ops.similarity import pairwise_raw

        a = self.decode(ids_a)
        b = a if ids_a is ids_b else self.decode(ids_b)
        raw = pairwise_raw(a, b, self.sim)
        return normalize_score(raw, self.sim)


def sq4_aug_rows(codes_packed: jax.Array, const: jax.Array) -> jax.Array:
    """Pack codes + per-node constant into one gatherable row ``[N, MP+4]``.

    ``const`` is the sim-appropriate scalar (w2 for euclidean, norm2 for
    cosine, anything for dot — it is ignored); stored as 4 LE bytes.
    """
    cb = jax.lax.bitcast_convert_type(const.astype(jnp.float32), jnp.uint32)
    bytes4 = jnp.stack(
        [
            (cb & 0xFF),
            (cb >> 8) & 0xFF,
            (cb >> 16) & 0xFF,
            (cb >> 24) & 0xFF,
        ],
        axis=-1,
    ).astype(jnp.uint8)
    return jnp.concatenate([codes_packed, bytes4], axis=-1)


def build_fused_sq4(
    neighbors: jax.Array,
    codes_packed: jax.Array,
    node_w2: jax.Array,
    chunk: int = 65_536,
) -> tuple[jax.Array, jax.Array]:
    """Fused SQ4 layout: neighbors' packed codes + euclidean constants.

    Returns ``(fused_packed [N, R*MP] uint8, fused_w2 [N, R] float32)``;
    -1 padding slots get code 0 / w2 0 (masked by neighbor id at search).
    """
    n, r = neighbors.shape
    mp = codes_packed.shape[1]
    out = jnp.zeros((n, r * mp), jnp.uint8)
    out_w2 = jnp.zeros((n, r), jnp.float32)
    for start in range(0, n, chunk):
        blk = neighbors[start : start + chunk]
        safe = jnp.maximum(blk, 0)
        ok = blk >= 0
        gathered = jnp.where(ok[..., None], codes_packed[safe], 0)
        w2 = jnp.where(ok, node_w2[safe], 0.0)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, gathered.reshape(blk.shape[0], -1), start, axis=0
        )
        out_w2 = jax.lax.dynamic_update_slice_in_dim(out_w2, w2, start, axis=0)
    return out, out_w2


def build_fused_sq4_host(
    neighbors: "np.ndarray",  # [B, R] int32, -1 padded
    codes_packed: "np.ndarray",  # [N, MP] uint8 (host)
    node_w2: "np.ndarray",  # [N] float32 (host)
) -> "tuple[np.ndarray, np.ndarray]":
    """Numpy twin of :func:`build_fused_sq4` for host-resident saves.

    The LTM save streams the fused layout into the index file; computing
    it on DEVICE means downloading ~(MP+4) bytes x N x R over the link —
    41 GB at 10M x 128d, ~38 min over a PCIe-class tunnel — for what is a
    pure gather of host-resident codes.  Must stay bit-identical to the
    device version (tests/test_ltm.py::test_build_fused_sq4_host_matches).
    """
    import numpy as np

    safe = np.maximum(neighbors, 0)
    ok = neighbors >= 0
    gathered = codes_packed[safe]  # [B, R, MP]
    gathered[~ok] = 0
    w2 = np.where(ok, node_w2[safe], np.float32(0.0)).astype(np.float32)
    return gathered.reshape(neighbors.shape[0], -1), w2


@partial(_register, data_fields=["codes", "center"], meta_fields=["dim"])
@dataclasses.dataclass(frozen=True)
class BQScoreProvider:
    """Binary-quantized scoring: query packed once, XOR+popcount per candidate.

    Reference: ``BQVectors.java:116-118`` (``1 - hamming/d``) and
    ``BuildScoreProvider.bqBuildScoreProvider``.
    """

    codes: jax.Array  # [N, W] uint32 packed
    center: jax.Array | None = None  # [D] centroid subtracted before sign test
    dim: int = 0

    @property
    def exact(self) -> bool:
        return False

    def prepare(self, queries: jax.Array) -> jax.Array:
        if self.center is not None:
            queries = queries - self.center
        return pack_bits(queries)

    def _sim(self, qcodes: jax.Array, codes: jax.Array) -> jax.Array:
        h = jnp.sum(_popcount32(jnp.bitwise_xor(qcodes, codes)), axis=-1)
        d = self.dim if self.dim else self.codes.shape[-1] * 32
        return 1.0 - h.astype(jnp.float32) / float(d)

    def score(self, qstate: jax.Array, ids: jax.Array) -> jax.Array:
        return self._sim(qstate[:, None, :], self.codes[ids])

    def score_nodes(self, node_ids: jax.Array, ids: jax.Array) -> jax.Array:
        return self._sim(self.codes[node_ids][:, None, :], self.codes[ids])

    def pairwise(self, ids_a: jax.Array, ids_b: jax.Array) -> jax.Array:
        return self._sim(self.codes[ids_a][:, :, None, :], self.codes[ids_b][:, None, :, :])
