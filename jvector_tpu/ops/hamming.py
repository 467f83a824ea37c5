"""Binary-quantization (BQ) kernels: bit packing + hamming similarity.

TPU-native equivalent of the reference's 1-bit sign quantization
(``jv/quantization/BinaryQuantization.java:88-110``) and hamming scoring
(``BQVectors.java:116-118``: ``similarity = 1 - hamming / d``).

Bits are packed into uint32 words, 32 dims per word, little-endian within a
word (bit j of word w covers dim ``32*w + j``).  Popcount is computed with a
SWAR reduction, which lowers to plain VPU integer ops on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def packed_words(dim: int) -> int:
    return (dim + 31) // 32


@jax.jit
def pack_bits(vectors: jax.Array) -> jax.Array:
    """Sign-quantize ``[..., D]`` float vectors into ``[..., ceil(D/32)]`` uint32.

    A dim contributes a 1 bit iff its value > 0 (matches the reference's
    sign test on centered data).
    """
    d = vectors.shape[-1]
    w = packed_words(d)
    pad = w * 32 - d
    bits = (vectors > 0).astype(jnp.uint32)
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(vectors.shape[:-1] + (pad,), jnp.uint32)], axis=-1
        )
    bits = bits.reshape(vectors.shape[:-1] + (w, 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts, axis=-1).astype(jnp.uint32)


def _popcount32(x: jax.Array) -> jax.Array:
    """SWAR popcount of a uint32 array."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


@jax.jit
def hamming_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamming distance between packed codes, reduced over the last axis."""
    return jnp.sum(_popcount32(jnp.bitwise_xor(a, b)), axis=-1)


@partial(jax.jit, static_argnames=("dim",))
def bq_similarity(query_codes: jax.Array, base_codes: jax.Array, dim: int | None = None) -> jax.Array:
    """``1 - hamming/d`` between queries ``[Q, W]`` and base ``[C, W]`` -> ``[Q, C]``.

    ``dim`` defaults to ``W * 32``; pass the true dimension when D % 32 != 0.
    """
    q = query_codes[:, None, :]
    b = base_codes[None, :, :]
    h = jnp.sum(_popcount32(jnp.bitwise_xor(q, b)), axis=-1)
    d = dim if dim is not None else base_codes.shape[-1] * 32
    return 1.0 - h.astype(jnp.float32) / float(d)
