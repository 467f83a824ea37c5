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
        """Encode to ``uint8 [N, M]`` (argmin over centroids, one matmul per subspace).

        Anisotropic encoding materializes two ``[B, M, K]`` float32 residual
        tables per block, so its block size is capped to bound device memory.
        """
        if self.anisotropic_threshold > 0:
            block = min(block, max(1024, (1 << 27) // (self.m * self.clusters)))
        # numpy inputs (incl. memmaps) stay on host; one block uploads at a
        # time, so encoding never needs the full f32 corpus in device memory
        host = isinstance(vectors, np.ndarray)
        if not host:
            vectors = jnp.asarray(vectors, jnp.float32)
        outs = []
        for i in range(0, vectors.shape[0], block):
            blk = vectors[i : i + block]
            if host:
                blk = jnp.asarray(np.asarray(blk), jnp.float32)
            outs.append(self._encode_block(blk))
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    @partial(jax.jit, static_argnames=())
    def _encode_block(self, vectors: jax.Array) -> jax.Array:
        x = _pad_to(vectors, self.padded_dim)
        if self.center is not None:
            x = x - self.center
        if self.anisotropic_threshold > 0:
            eta = compute_parallel_cost_multiplier(
                self.anisotropic_threshold, self.original_dim
            )
            return encode_anisotropic(x, self.codebooks, eta)
        sub = x.reshape(-1, self.m, self.subspace_dim).transpose(1, 0, 2)  # [M,n,S]
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


@partial(jax.jit, static_argnames=("max_sweeps",))
def encode_anisotropic(
    x: jax.Array,  # [N, M*S] centered, padded vectors
    codebooks: jax.Array,  # [M, K, S]
    eta: float,  # parallel-cost multiplier (computeParallelCostMultiplier)
    max_sweeps: int = 10,
) -> jax.Array:
    """Per-vector anisotropic code optimization, batched over all vectors.

    Reference: ``ProductQuantization.encodeAnisotropic:269-347`` (SCANN §3.2
    coordinate descent).  Per (vector, subspace, centroid):

    - ``rn2 = ||c - x_m||^2``            (residualNormSquared)
    - ``lin = <c, x_m> - ||x_m||^2``     (signed parallel residual term)

    The parallel residual of the FULL vector is
    ``par = (sum_m lin_m)^2 / ||x||^2`` (the residual's projection onto x),
    and the anisotropic cost is ``eta * par + (||r||^2 - par)``.  Codes
    start at the plain L2 argmin; each sweep walks the M subspaces in order,
    swapping a subspace's centroid to the one with the most negative cost
    delta.  A converged vector self-stabilizes (every delta >= 0 keeps the
    old index), so the fixed ``max_sweeps`` loop is exact, not approximate.

    Deliberate deviation: the reference sums per-subspace SQUARED parallel
    components (``computeResidual:414-420``) and squares that sum again,
    which drops the sign cancellation across subspaces in SCANN's
    definition; measured on clustered normalized MIPS corpora the signed
    form improves recall over plain PQ (+0.05-0.06 at T=0.3) while the
    squared form does not, so the signed form is used here.
    """
    m, k, s = codebooks.shape
    n = x.shape[0]
    xs = x.reshape(n, m, s)
    cdotx = jnp.einsum(
        "nms,mks->nmk", xs, codebooks, preferred_element_type=jnp.float32
    )
    xn2 = jnp.sum(xs * xs, axis=2)  # [N, M]
    c2 = jnp.sum(codebooks * codebooks, axis=2)[None]  # [1, M, K]
    xnorm2 = jnp.maximum(jnp.sum(x * x, axis=1), 1e-30)  # [N]
    rn2 = c2 - 2.0 * cdotx + xn2[:, :, None]  # [N, M, K]
    lin = cdotx - xn2[:, :, None]  # [N, M, K] signed <c - x_m, x_m>

    codes = jnp.argmin(rn2, axis=2).astype(jnp.int32)  # [N, M]
    S = jnp.sum(jnp.take_along_axis(lin, codes[:, :, None], axis=2)[..., 0], axis=1)

    def step(i, carry):
        codes, S = carry
        mi = i % m
        lin_m = jax.lax.dynamic_index_in_dim(lin, mi, axis=1, keepdims=False)
        rn2_m = jax.lax.dynamic_index_in_dim(rn2, mi, axis=1, keepdims=False)
        old_idx = jax.lax.dynamic_index_in_dim(codes, mi, axis=1, keepdims=False)
        old_lin = jnp.take_along_axis(lin_m, old_idx[:, None], axis=1)[:, 0]
        old_rn2 = jnp.take_along_axis(rn2_m, old_idx[:, None], axis=1)[:, 0]

        S_k = S[:, None] - old_lin[:, None] + lin_m  # [N, K]
        pnd = (jnp.square(S_k) - jnp.square(S)[:, None]) / xnorm2[:, None]
        rnd = rn2_m - old_rn2[:, None]
        cost = eta * pnd + (rnd - pnd)
        best_cost = jnp.min(cost, axis=1)
        best_idx = jnp.argmin(cost, axis=1).astype(jnp.int32)
        take = best_cost < -1e-9
        new_idx = jnp.where(take, best_idx, old_idx)
        new_S = jnp.where(
            take, jnp.take_along_axis(S_k, best_idx[:, None], axis=1)[:, 0], S
        )
        codes = jax.lax.dynamic_update_index_in_dim(
            codes, new_idx, mi, axis=1
        )
        return codes, new_S

    codes, _ = jax.lax.fori_loop(0, max_sweeps * m, step, (codes, S))
    return codes.astype(jnp.uint8)


def _pad_to(x: jax.Array, d_pad: int) -> jax.Array:
    d = x.shape[-1]
    if d == d_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (d_pad - d,), x.dtype)], axis=-1
    )
