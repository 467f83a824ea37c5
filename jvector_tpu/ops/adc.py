"""PQ asymmetric-distance-computation (ADC) kernels.

TPU-native equivalent of the reference's two hottest quantization kernels
(``jv/vector/VectorUtil.calculatePartialSums`` + ``assembleAndSum``, consumed
by ``jv/quantization/PQDecoder.java:38-59``):

1. ``build_partial_sums`` — per query, a ``[M, K]`` lookup table where entry
   ``(m, k)`` is the contribution of codebook centroid ``k`` of subspace ``m``
   to the query's raw measure.  One einsum over all queries in a wave.
2. ``adc_score`` — given LUTs ``[Q, M, K]`` and candidate codes, assemble the
   raw measure by gathering one LUT entry per subspace and summing.

Reference normalizations (``PQDecoder.java:83-136``) are applied by the
caller via ``normalize_score``; for COSINE the extra ``partialSquaredMagnitudes``
table (sum of squared centroid norms) is produced here too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jvector_tpu.ops.similarity import SimilarityFunction


@partial(jax.jit, static_argnames=("sim",))
def build_partial_sums(
    queries: jax.Array,  # [Q, D_pad]  (D_pad = M * S)
    codebooks: jax.Array,  # [M, K, S]
    sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN,
) -> jax.Array:
    """Build per-query ADC lookup tables ``[Q, M, K]`` of raw partial measures.

    - DOT_PRODUCT / COSINE: ``lut[q,m,k] = dot(q_m, c_{m,k})``
    - EUCLIDEAN: ``lut[q,m,k] = ||q_m - c_{m,k}||^2``
    """
    sim = SimilarityFunction.parse(sim)
    M, K, S = codebooks.shape
    Q = queries.shape[0]
    qs = queries.reshape(Q, M, S)
    dots = jnp.einsum(
        "qms,mks->qmk", qs, codebooks, preferred_element_type=jnp.float32
    )
    if sim in (SimilarityFunction.DOT_PRODUCT, SimilarityFunction.COSINE):
        return dots
    q2 = jnp.sum(qs * qs, axis=-1)[:, :, None]
    c2 = jnp.sum(codebooks * codebooks, axis=-1)[None, :, :]
    return jnp.maximum(q2 + c2 - 2.0 * dots, 0.0)


@jax.jit
def partial_squared_magnitudes(codebooks: jax.Array) -> jax.Array:
    """``[M, K]`` squared norms of each centroid (cosine denominator table).

    Reference: ``PQDecoder`` cosine variant's ``partialSquaredMagnitudes``.
    """
    return jnp.sum(codebooks * codebooks, axis=-1)


@jax.jit
def adc_score(luts: jax.Array, codes: jax.Array) -> jax.Array:
    """Assemble-and-sum: gather one LUT entry per subspace and reduce.

    luts:  ``[Q, M, K]`` per-query tables from :func:`build_partial_sums`.
    codes: ``[Q, C, M]`` uint8/int32 candidate codes (per-query candidates).
    Returns raw measures ``[Q, C]`` (same convention as the LUT's measure).
    """
    codes = codes.astype(jnp.int32)
    # luts[q, m, codes[q, c, m]] for all (q, c, m) -> sum over m.
    gathered = jnp.take_along_axis(
        luts[:, None, :, :],  # [Q, 1, M, K]
        codes[:, :, :, None],  # [Q, C, M, 1]
        axis=3,
    )[..., 0]
    return jnp.sum(gathered, axis=-1)


@jax.jit
def adc_score_shared(luts: jax.Array, codes: jax.Array) -> jax.Array:
    """ADC where all queries score the SAME candidate block.

    luts: ``[Q, M, K]``; codes: ``[C, M]`` -> raw measures ``[Q, C]``.
    Used for brute-force compressed scans and build-time scoring pools.
    """
    codes = codes.astype(jnp.int32)
    gathered = jnp.take_along_axis(
        luts[:, :, :],  # [Q, M, K]
        codes.T[None, :, :],  # [1, M, C] -> gather along K
        axis=2,
    )  # [Q, M, C]
    return jnp.sum(gathered, axis=1)


@jax.jit
def adc_score_onehot(luts: jax.Array, codes_onehot: jax.Array) -> jax.Array:
    """MXU formulation: ``codes_onehot`` is ``[C, M, K]`` {0,1}; pure matmul.

    Trades memory for MXU utilization — useful when the same candidate block
    is scored by many query waves (the codes one-hot is built once).
    """
    return jnp.einsum(
        "qmk,cmk->qc", luts, codes_onehot, preferred_element_type=jnp.float32
    )
