"""Product quantization: codebook training, encode/decode, score providers.

Reference: ``jv/quantization/ProductQuantization.java`` — ``compute()``
(sample <=128k, optional global centering, per-subspace k-means, 256
clusters), ``encode``/``decode``, ``refine()``, anisotropic variant
(``encodeAnisotropic:269-347``), and ``PQVectors`` score factories.

TPU redesign decisions:

- Uneven subspace splits (``getSubvectorSizesAndOffsets``) are replaced by
  zero-padding D up to ``M * S``: padded dims contribute nothing to dot/L2,
  and every subspace trains/encodes with identical shapes so the whole PQ
  trains as ONE vmapped k-means over ``[M, n, S]``.
- Codes are a dense ``uint8 [N, M]`` device array (the reference chunks
  byte arrays to dodge Java's 2GB limit — not a thing here).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.score import ADCScoreProvider
from jvector_tpu.ops.similarity import SimilarityFunction
from jvector_tpu.quantization.kmeans import (
    assign_clusters,
    assign_clusters_anisotropic,
    compute_parallel_cost_multiplier,
    kmeans,
    kmeans_anisotropic,
)

MAX_TRAINING_SET_SIZE = 131_072  # reference MAX_PQ_TRAINING_SET_SIZE (128k)
DEFAULT_CLUSTERS = 256


def _register(cls, data_fields, meta_fields):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=data_fields,
        meta_fields=meta_fields,
    )(cls)


@partial(
    _register,
    data_fields=["codebooks", "center"],
    meta_fields=["original_dim", "anisotropic_threshold"],
)
@dataclasses.dataclass(frozen=True)
class ProductQuantization:
    """Trained PQ: ``codebooks [M, K, S]`` + optional global centering vector."""

    codebooks: jax.Array  # [M, K, S] float32
    center: jax.Array | None  # [M*S] float32 or None
    original_dim: int
    anisotropic_threshold: float = -1.0  # <=0 -> plain PQ

    # -- construction -------------------------------------------------------

    @staticmethod
    def compute(
        vectors: jax.Array | np.ndarray,
        m: int,
        clusters: int = DEFAULT_CLUSTERS,
        globally_center: bool = True,
        anisotropic_threshold: float = -1.0,
        iters: int = 6,
        seed: int = 0,
    ) -> "ProductQuantization":
        """Train codebooks (reference ``ProductQuantization.compute:109-139``)."""
        vectors = jnp.asarray(vectors, jnp.float32)
        n, d = vectors.shape
        if n > MAX_TRAINING_SET_SIZE:
            idx = np.random.default_rng(seed).choice(
                n, MAX_TRAINING_SET_SIZE, replace=False
            )
            sample = vectors[jnp.asarray(np.sort(idx))]
        else:
            sample = vectors

        s = -(-d // m)  # ceil
        d_pad = m * s
        sample = _pad_to(sample, d_pad)

        center = None
        if globally_center:
            center = jnp.mean(sample, axis=0)
            sample = sample - center

        sub = sample.reshape(-1, m, s).transpose(1, 0, 2)  # [M, n, S]
        keys = jax.random.split(jax.random.PRNGKey(seed), m)
        if anisotropic_threshold > 0:
            eta = compute_parallel_cost_multiplier(anisotropic_threshold, d)
            codebooks = jax.vmap(
                lambda data, key: kmeans_anisotropic(data, clusters, key, eta, iters)
            )(sub, keys)
        else:
            codebooks = jax.vmap(lambda data, key: kmeans(data, clusters, key, iters))(
                sub, keys
            )
        return ProductQuantization(
            codebooks=codebooks,
            center=center,
            original_dim=d,
            anisotropic_threshold=float(anisotropic_threshold),
        )

    def refine(
        self, vectors: jax.Array | np.ndarray, iters: int = 6, seed: int = 1
    ) -> "ProductQuantization":
        """Extra Lloyd rounds from the current codebooks on (new) data.

        Reference: ``ProductQuantization.refine:184-221`` (used by compaction's
        ``PQRetrainer``).
        """
        from jvector_tpu.quantization.kmeans import _sq_dists  # local reuse

        vectors = jnp.asarray(vectors, jnp.float32)
        n = vectors.shape[0]
        if n > MAX_TRAINING_SET_SIZE:
            idx = np.random.default_rng(seed).choice(
                n, MAX_TRAINING_SET_SIZE, replace=False
            )
            vectors = vectors[jnp.asarray(np.sort(idx))]
        x = _pad_to(vectors, self.padded_dim)
        if self.center is not None:
            x = x - self.center
        sub = x.reshape(-1, self.m, self.subspace_dim).transpose(1, 0, 2)

        def lloyd_m(data, cb):
            def body(_, cb):
                assign = jnp.argmin(_sq_dists(data, cb), axis=1)
                sums = jax.ops.segment_sum(data, assign, num_segments=cb.shape[0])
                counts = jax.ops.segment_sum(
                    jnp.ones(data.shape[0], data.dtype), assign, num_segments=cb.shape[0]
                )
                new = sums / jnp.maximum(counts, 1.0)[:, None]
                return jnp.where(counts[:, None] > 0, new, cb)

            return jax.lax.fori_loop(0, iters, body, cb)

        codebooks = jax.vmap(lloyd_m)(sub, self.codebooks)
        return dataclasses.replace(self, codebooks=codebooks)

    # -- properties ----------------------------------------------------------

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def clusters(self) -> int:
        return self.codebooks.shape[1]

    @property
    def subspace_dim(self) -> int:
        return self.codebooks.shape[2]

    @property
    def padded_dim(self) -> int:
        return self.m * self.subspace_dim

    @property
    def compressed_size(self) -> int:
        """Bytes per encoded vector (``compressedVectorSize``)."""
        return self.m

    # -- encode / decode ------------------------------------------------------

    def encode(self, vectors: jax.Array | np.ndarray, block: int = 262_144) -> jax.Array:
        """Encode to ``uint8 [N, M]`` (argmin over centroids, one matmul per subspace)."""
        vectors = jnp.asarray(vectors, jnp.float32)
        outs = []
        for i in range(0, vectors.shape[0], block):
            outs.append(self._encode_block(vectors[i : i + block]))
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    @partial(jax.jit, static_argnames=())
    def _encode_block(self, vectors: jax.Array) -> jax.Array:
        x = _pad_to(vectors, self.padded_dim)
        if self.center is not None:
            x = x - self.center
        sub = x.reshape(-1, self.m, self.subspace_dim).transpose(1, 0, 2)  # [M,n,S]
        if self.anisotropic_threshold > 0:
            eta = compute_parallel_cost_multiplier(
                self.anisotropic_threshold, self.original_dim
            )
            assign = jax.vmap(
                lambda d, c: assign_clusters_anisotropic(d, c, eta)
            )(sub, self.codebooks)
        else:
            assign = jax.vmap(assign_clusters)(sub, self.codebooks)  # [M, n]
        return assign.T.astype(jnp.uint8)

    @partial(jax.jit, static_argnames=())
    def decode(self, codes: jax.Array) -> jax.Array:
        """Decode ``[N, M]`` codes to ``[N, original_dim]`` float32."""
        c = codes.astype(jnp.int32)
        parts = [self.codebooks[i][c[:, i]] for i in range(self.m)]
        out = jnp.concatenate(parts, axis=-1)
        if self.center is not None:
            out = out + self.center
        return out[:, : self.original_dim]

    def reconstruction_error(self, vectors: jax.Array | np.ndarray) -> float:
        """Mean squared reconstruction error (``VectorCompressor.reconstructionError``)."""
        vectors = jnp.asarray(vectors, jnp.float32)
        dec = self.decode(self.encode(vectors))
        return float(jnp.mean(jnp.sum((dec - vectors) ** 2, axis=1)))

    # -- score provider --------------------------------------------------------

    def provider(
        self, codes: jax.Array, sim: SimilarityFunction | str
    ) -> ADCScoreProvider:
        """The ``CompressedVectors.precomputedScoreFunctionFor`` equivalent."""
        return ADCScoreProvider(
            codes=codes,
            codebooks=self.codebooks,
            center=self.center,
            sim=SimilarityFunction.parse(sim),
        )


def _pad_to(x: jax.Array, d_pad: int) -> jax.Array:
    d = x.shape[-1]
    if d == d_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (d_pad - d,), x.dtype)], axis=-1
    )
