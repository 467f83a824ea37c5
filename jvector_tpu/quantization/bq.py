"""Binary quantization (1 bit/dim).

Reference: ``jv/quantization/BinaryQuantization.java:88-110`` (sign bits
around the dataset centroid) + ``BQVectors`` hamming scoring.  Packing and
scoring kernels live in ``jvector_tpu.ops.hamming``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.score import BQScoreProvider
from jvector_tpu.ops.hamming import pack_bits


def _register(cls, data_fields, meta_fields):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=data_fields,
        meta_fields=meta_fields,
    )(cls)


@partial(_register, data_fields=["center"], meta_fields=["original_dim"])
@dataclasses.dataclass(frozen=True)
class BinaryQuantization:
    """Sign quantizer around the dataset centroid."""

    center: jax.Array  # [D]
    original_dim: int

    @staticmethod
    def compute(vectors: jax.Array | np.ndarray) -> "BinaryQuantization":
        vectors = jnp.asarray(vectors, jnp.float32)
        return BinaryQuantization(
            center=jnp.mean(vectors, axis=0), original_dim=vectors.shape[1]
        )

    @property
    def compressed_size(self) -> int:
        """Bytes per encoded vector."""
        return 4 * ((self.original_dim + 31) // 32)

    def encode(self, vectors: jax.Array | np.ndarray) -> jax.Array:
        """Pack sign bits of the centered vectors into uint32 words."""
        vectors = jnp.asarray(vectors, jnp.float32)
        return pack_bits(vectors - self.center)

    def provider(self, codes: jax.Array) -> BQScoreProvider:
        return BQScoreProvider(codes=codes, center=self.center, dim=self.original_dim)
