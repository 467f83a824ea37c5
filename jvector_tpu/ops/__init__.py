"""Vector math kernels (TPU-first equivalents of the reference's L2 SIMD tier).

The reference dispatches scalar Java -> Panama SIMD -> native C++ Highway
(``jv/vector/VectorizationProvider.java:79-177``).  Here there is exactly one
tier: jnp ops compiled by XLA for the current device, with Pallas kernels for
the fused hot paths.  Everything is *batched* — the unit of work is a query
wave / candidate block, never a single vector pair.
"""

from jvector_tpu.ops.similarity import (
    SimilarityFunction,
    dot_product,
    cosine,
    squared_l2,
    pairwise_scores,
    pairwise_raw,
    normalize_score,
    l2_normalize,
)
from jvector_tpu.ops.adc import (
    build_partial_sums,
    adc_score,
)
from jvector_tpu.ops.hamming import hamming_distance, pack_bits, bq_similarity

__all__ = [
    "SimilarityFunction",
    "dot_product",
    "cosine",
    "squared_l2",
    "pairwise_scores",
    "pairwise_raw",
    "normalize_score",
    "l2_normalize",
    "build_partial_sums",
    "adc_score",
    "hamming_distance",
    "pack_bits",
    "bq_similarity",
]
