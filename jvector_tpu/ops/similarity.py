"""Batched similarity kernels.

TPU-native equivalent of the reference's ``VectorUtil`` facade
(``jvector-base/.../vector/VectorUtil.java``) and its per-pair SIMD kernels.
On TPU the only shape that matters is the *batched* one: score a wave of
queries ``[Q, D]`` against a block of candidates ``[C, D]`` in one MXU matmul.
Single-pair helpers exist for tests and small host-side work only.

Score normalization matches the reference exactly
(``jv/quantization/PQDecoder.java:83-136`` and ``VectorSimilarityFunction``):

- DOT_PRODUCT: ``(1 + dot) / 2``
- EUCLIDEAN:   ``1 / (1 + ||a-b||^2)``
- COSINE:      ``(1 + cos) / 2``

Higher is always better, and scores live in [0, 1] for normalized inputs.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp


class SimilarityFunction(str, enum.Enum):
    """Mirror of the reference's ``VectorSimilarityFunction`` enum."""

    DOT_PRODUCT = "dot_product"
    EUCLIDEAN = "euclidean"
    COSINE = "cosine"

    @classmethod
    def parse(cls, v: "SimilarityFunction | str") -> "SimilarityFunction":
        if isinstance(v, cls):
            return v
        return cls(str(v).lower())


# ---------------------------------------------------------------------------
# Raw (unnormalized) measures
# ---------------------------------------------------------------------------


def dot_product(a: jax.Array, b: jax.Array) -> jax.Array:
    """Dot product over the last axis (broadcasts leading axes)."""
    return jnp.sum(a * b, axis=-1)


def squared_l2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared L2 distance over the last axis."""
    d = a - b
    return jnp.sum(d * d, axis=-1)


def cosine(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine similarity over the last axis."""
    num = jnp.sum(a * b, axis=-1)
    den = jnp.sqrt(jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1))
    return num / jnp.maximum(den, 1e-30)


def l2_normalize(a: jax.Array, axis: int = -1) -> jax.Array:
    """Reference: ``VectorUtil.l2normalize``."""
    n = jnp.sqrt(jnp.sum(a * a, axis=axis, keepdims=True))
    return a / jnp.maximum(n, 1e-30)


# ---------------------------------------------------------------------------
# Normalization raw -> score (higher is better)
# ---------------------------------------------------------------------------


def normalize_score(raw: jax.Array, sim: SimilarityFunction) -> jax.Array:
    sim = SimilarityFunction.parse(sim)
    if sim == SimilarityFunction.DOT_PRODUCT:
        return (1.0 + raw) / 2.0
    if sim == SimilarityFunction.COSINE:
        return (1.0 + raw) / 2.0
    # EUCLIDEAN: raw is a squared distance
    return 1.0 / (1.0 + raw)


# ---------------------------------------------------------------------------
# Batched scoring (the hot path)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("sim",))
def pairwise_raw(
    queries: jax.Array, base: jax.Array, sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN
) -> jax.Array:
    """Raw measure between every query and every base vector.

    queries: ``[..., Q, D]``; base: ``[..., C, D]`` -> ``[..., Q, C]``.
    All three measures ride one MXU matmul; L2 uses the
    ``||a-b||^2 = ||a||^2 + ||b||^2 - 2ab`` expansion.
    """
    sim = SimilarityFunction.parse(sim)
    dots = jnp.einsum(
        "...qd,...cd->...qc", queries, base, preferred_element_type=jnp.float32
    )
    if sim == SimilarityFunction.DOT_PRODUCT:
        return dots
    if sim == SimilarityFunction.COSINE:
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))[..., :, None]
        bn = jnp.sqrt(jnp.sum(base * base, axis=-1))[..., None, :]
        return dots / jnp.maximum(qn * bn, 1e-30)
    q2 = jnp.sum(queries * queries, axis=-1)[..., :, None]
    b2 = jnp.sum(base * base, axis=-1)[..., None, :]
    return jnp.maximum(q2 + b2 - 2.0 * dots, 0.0)


@partial(jax.jit, static_argnames=("sim",))
def pairwise_scores(
    queries: jax.Array, base: jax.Array, sim: SimilarityFunction | str = SimilarityFunction.EUCLIDEAN
) -> jax.Array:
    """Normalized similarity scores ``[..., Q, C]``, higher = closer."""
    sim = SimilarityFunction.parse(sim)
    return normalize_score(pairwise_raw(queries, base, sim), sim)


def score_vectors(
    query: jax.Array, vectors: jax.Array, sim: SimilarityFunction | str
) -> jax.Array:
    """Score one query ``[D]`` against vectors ``[..., D]`` (normalized)."""
    sim = SimilarityFunction.parse(sim)
    if sim == SimilarityFunction.DOT_PRODUCT:
        raw = jnp.einsum("...d,d->...", vectors, query)
    elif sim == SimilarityFunction.COSINE:
        raw = cosine(vectors, query)
    else:
        raw = squared_l2(vectors, query)
    return normalize_score(raw, sim)
