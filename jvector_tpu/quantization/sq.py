"""4-bit scalar quantization (SQ4): per-dim affine codes, arithmetic ADC.

TPU-native first-pass compression.  Rationale: every table-based ADC (the
reference's ``PQDecoder``/``FusedPQDecoder``, our LUT16) needs a per-code
LUT *gather*, which TPUs lack — one-hot selects cost O(K) VPU ops per code.
SQ4 removes the table: each dimension stores a 4-bit level ``k`` with an
affine dequant ``v_m ~= a_m * k + b_m``, and the measures factor into pure
multiply-reduce over the raw codes:

- EUCLIDEAN: ``||q - v||^2 = C(q) + sum_m u_m(q) * k_m + w2(v)`` with
  ``u_m = -2 a_m (q_m - b_m)``, ``C = ||q - b||^2``, ``w2 = sum (a_m k_m)^2``
  (w2 is a per-NODE scalar computed once at encode time).
- DOT: ``<q, v> = sum_m (q_m a_m) k_m + <q, b>``.
- COSINE: dot / sqrt(norm2(v)) with ``norm2`` another per-node constant.

So scoring a candidate block is one fused unpack+FMA+reduce — the same XLA
fusion shape as exact f32 scoring but reading 4 bits/dim instead of 32.

Reference relationship: fills the ``CompressedVectors`` slot next to PQ/BQ/
NVQ (``jv/quantization/``); the fit (clipped per-dim range) follows the
same train-on-sample contract as ``ProductQuantization.compute``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_TRAINING_SET_SIZE = 131_072


def _register(cls, data_fields, meta_fields):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=data_fields,
        meta_fields=meta_fields,
    )(cls)


def pack_nibble_rows(codes: jax.Array) -> jax.Array:
    """``[..., D]`` values <16 -> packed ``[..., D/2]`` uint8 (lo, hi)."""
    c = codes.astype(jnp.uint8)
    return (c[..., 0::2] | (c[..., 1::2] << 4)).astype(jnp.uint8)


def unpack_nibble_rows(packed: jax.Array) -> jax.Array:
    """Packed ``[..., D/2]`` uint8 -> ``[..., D]`` int32 levels."""
    lo = (packed & 0xF).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def unpack_nibble_rows_grouped(packed: jax.Array) -> jax.Array:
    """Packed ``[..., D/2]`` uint8 -> ``[..., D]`` levels in GROUPED order
    ``[even dims..., odd dims...]`` — a plain concat, no lane interleave
    (the interleaving reshape in :func:`unpack_nibble_rows` is a minor-dim
    shuffle XLA lowers poorly inside the search loop).  Pair with a query
    vector permuted by :func:`group_dims`.
    """
    lo = (packed & 0xF).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    return jnp.concatenate([lo, hi], axis=-1)


def group_dims(u: jax.Array) -> jax.Array:
    """Permute the trailing dim to ``[even..., odd...]`` (grouped order)."""
    return jnp.concatenate([u[..., 0::2], u[..., 1::2]], axis=-1)


@partial(_register, data_fields=["scale", "offset"], meta_fields=["original_dim"])
@dataclasses.dataclass(frozen=True)
class ScalarQuantization4:
    """Per-dim affine 4-bit quantizer: ``v ~= scale * k + offset``."""

    scale: jax.Array  # [D_pad] float32 (a_m)
    offset: jax.Array  # [D_pad] float32 (b_m)
    original_dim: int

    @staticmethod
    def compute(
        vectors: jax.Array | np.ndarray,
        clip_quantile: float = 0.001,
        seed: int = 0,
    ) -> "ScalarQuantization4":
        """Fit per-dim clipped ranges on a <=128k UNIFORM RANDOM sample.

        Pass the FULL corpus — never a prefix slice: on cluster- or
        time-ordered corpora the first 128k rows bias the per-dim quantile
        fit and recall silently degrades (reference
        ``ProductQuantization.compute`` Floyd-samples for the same reason,
        ``ProductQuantization.java:141-179``).  Device arrays are sampled
        by an on-device gather so only the sample crosses to the host.
        """
        n, d = vectors.shape
        if n > MAX_TRAINING_SET_SIZE:
            idx = np.sort(
                np.random.default_rng(seed).choice(
                    n, MAX_TRAINING_SET_SIZE, replace=False
                )
            )
            if isinstance(vectors, jax.Array):
                vectors = vectors[jnp.asarray(idx)]
            else:
                vectors = vectors[idx]
        if isinstance(vectors, jax.Array):
            # quantiles on device: downloading the 128k-row sample costs
            # ~3.6 s over a PCIe-class link (65 MB), the [2, D] result is
            # free.  One fused sort serves both tails.
            qs = jnp.quantile(
                vectors.astype(jnp.float32),
                jnp.asarray([clip_quantile, 1.0 - clip_quantile], jnp.float32),
                axis=0,
            )
            lo, hi = np.asarray(qs[0]), np.asarray(qs[1])
        else:
            vectors = np.asarray(vectors, np.float32)
            lo = np.quantile(vectors, clip_quantile, axis=0)
            hi = np.quantile(vectors, 1.0 - clip_quantile, axis=0)
        d_pad = ((d + 1) // 2) * 2
        # padded dims get scale 1 / offset 0: codes come out 0 (not 0/0=NaN)
        # and contribute nothing to any measure
        scale = np.ones(d_pad, np.float32)
        offset = np.zeros(d_pad, np.float32)
        scale[:d] = np.maximum((hi - lo) / 15.0, 1e-12)
        offset[:d] = lo
        return ScalarQuantization4(
            scale=jnp.asarray(scale), offset=jnp.asarray(offset), original_dim=d
        )

    @property
    def padded_dim(self) -> int:
        return self.scale.shape[0]

    @property
    def compressed_size(self) -> int:
        """Bytes per encoded vector (packed nibbles)."""
        return self.padded_dim // 2

    def _pad(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        if d < self.padded_dim:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (self.padded_dim - d,), x.dtype)],
                axis=-1,
            )
        return x

    @partial(jax.jit, static_argnames=())
    def _encode_block(self, vectors: jax.Array) -> jax.Array:
        x = self._pad(jnp.asarray(vectors, jnp.float32))
        k = jnp.clip(jnp.round((x - self.offset) / self.scale), 0, 15)
        return pack_nibble_rows(k.astype(jnp.uint8))

    def level_codebooks(self) -> jax.Array:
        """The quantizer viewed as PQ codebooks ``[D_pad, 16, 1]``.

        SQ4 is exactly product quantization with D subspaces of size 1 and
        16 fixed affine levels ``a_m * k + b_m`` — this view lets SQ4 reuse
        the PQ machinery (anisotropic coordinate descent, ADC analyses)
        verbatim.
        """
        k = jnp.arange(16, dtype=jnp.float32)
        return (self.scale[:, None] * k[None, :] + self.offset[:, None])[..., None]

    def encode_anisotropic(
        self,
        vectors: jax.Array | np.ndarray,
        threshold: float = 0.2,
        block: int = 65_536,
    ) -> jax.Array:
        """Anisotropic SQ4 encoding (SCANN §3.2 applied to scalar levels).

        Per-vector coordinate descent re-picks each dim's 4-bit level to
        weight error PARALLEL to the vector (which biases inner products)
        ``eta``x more than perpendicular error — the same trade the
        anisotropic PQ encoder makes (``pq.encode_anisotropic``), reused
        verbatim via :meth:`level_codebooks`.  Use for MIPS/dot corpora
        (BASELINE config 3); euclidean corpora gain nothing.
        """
        from jvector_tpu.quantization.kmeans import (
            compute_parallel_cost_multiplier,
        )
        from jvector_tpu.quantization.pq import encode_anisotropic

        vectors = jnp.asarray(vectors, jnp.float32)
        d = vectors.shape[1]
        eta = compute_parallel_cost_multiplier(threshold, d)
        cbs = self.level_codebooks()
        outs = []
        for i in range(0, vectors.shape[0], block):
            x = self._pad(vectors[i : i + block])
            levels = encode_anisotropic(x, cbs, eta)  # [B, D_pad] uint8
            outs.append(pack_nibble_rows(levels))
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    def encode(
        self, vectors: jax.Array | np.ndarray, block: int = 262_144
    ) -> jax.Array:
        """Encode to packed ``uint8 [N, D_pad/2]``."""
        vectors = jnp.asarray(vectors, jnp.float32)
        outs = [
            self._encode_block(vectors[i : i + block])
            for i in range(0, vectors.shape[0], block)
        ]
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    @partial(jax.jit, static_argnames=())
    def decode(self, packed: jax.Array) -> jax.Array:
        k = unpack_nibble_rows(packed).astype(jnp.float32)
        return (k * self.scale + self.offset)[..., : self.original_dim]

    @partial(jax.jit, static_argnames=())
    def node_constants(self, packed: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Per-node scalars baked at encode time:

        - ``w2``:    ``sum_m (a_m k_m)^2``        (euclidean third term)
        - ``norm2``: ``sum_m (a_m k_m + b_m)^2``  (cosine denominator)
        """
        k = unpack_nibble_rows(packed).astype(jnp.float32)
        ak = k * self.scale
        w2 = jnp.sum(ak * ak, axis=-1)
        v = ak + self.offset
        norm2 = jnp.sum(v * v, axis=-1)
        return w2, norm2

    def reconstruction_error(self, vectors: jax.Array | np.ndarray) -> float:
        vectors = jnp.asarray(vectors, jnp.float32)
        dec = self.decode(self.encode(vectors))
        return float(jnp.mean(jnp.sum((dec - vectors) ** 2, axis=1)))

    def provider_for_graph(self, codes_packed, neighbors, sim):
        """Full fused provider for a graph: builds the fused tables too.

        ``codes_packed`` must already be padded to the graph capacity.
        """
        from jvector_tpu.graph.score import (
            SQ4ScoreProvider,
            build_fused_sq4,
            sq4_aug_rows,
        )
        from jvector_tpu.ops.similarity import SimilarityFunction

        sim = SimilarityFunction.parse(sim)
        w2, norm2 = self.node_constants(codes_packed)
        const = norm2 if sim == SimilarityFunction.COSINE else w2
        fused_packed, fused_w2 = build_fused_sq4(neighbors, codes_packed, const)
        return SQ4ScoreProvider(
            codes_packed=codes_packed,
            node_w2=w2,
            node_norm2=norm2,
            fused_packed=fused_packed,
            fused_w2=fused_w2,
            scale=self.scale,
            offset=self.offset,
            codes_aug=sq4_aug_rows(codes_packed, const),
            sim=sim,
        )
