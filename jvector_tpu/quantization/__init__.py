"""Quantization: PQ (plain + anisotropic), BQ, NVQ (TPU-native L3).

Reference: ``jv/quantization/`` — ``ProductQuantization`` (k-means++ codebook
training, anisotropic SCANN variant), ``BinaryQuantization``,
``NVQuantization``, and their ``CompressedVectors`` score-function factories.
Here training runs as vmapped ``lax`` loops over subspaces on device and the
score factories produce the provider pytrees in ``jvector_tpu.graph.score``.
"""

from jvector_tpu.quantization.kmeans import kmeans, kmeans_pp_init
from jvector_tpu.quantization.pq import ProductQuantization
from jvector_tpu.quantization.bq import BinaryQuantization
from jvector_tpu.quantization.nvq import NVQuantization, NVQVectors
from jvector_tpu.quantization.sq import ScalarQuantization4
from jvector_tpu.quantization.serialize import (
    CompressorCache,
    load_compressor,
    save_compressor,
)

__all__ = [
    "kmeans",
    "kmeans_pp_init",
    "ProductQuantization",
    "BinaryQuantization",
    "NVQuantization",
    "NVQVectors",
    "ScalarQuantization4",
    "CompressorCache",
    "load_compressor",
    "save_compressor",
]
