"""NVQ: non-uniform per-vector 8-bit quantization.

Reference: ``jv/quantization/NVQuantization.java`` — subtract the global
mean, split each vector into sub-vectors (default 2), and per sub-vector
store 8-bit codes under a learned logistic warp: the growth rate is found by
1-D grid search (coarse integer sweep then fine 0.1 steps,
``:524-578,677-702``), choosing the warp that minimizes quantization loss
relative to uniform quantization.  Scoring dequantizes on the fly
(``NVQScorer.java``).

TPU redesign: the grid search evaluates ALL candidate growth rates for ALL
vectors at once (one ``[n, candidates]`` loss matrix per sweep); there is no
per-vector scalar loop.  Codes are ``uint8 [N, D_pad]`` + per-(vector,
sub-vector) params ``{bias, scale, growth, midpoint}``.

The warp: with ``t = (x - lo) / (hi - lo)`` in [0,1],
``w(t) = (s(t) - s(0)) / (s(1) - s(0))`` where ``s(t) = 1/(1+exp(-a(t-m)))``;
``a -> 0`` recovers uniform quantization.  Quantized code = round(255 * w).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.ops.similarity import SimilarityFunction, normalize_score


def _register(cls, data_fields, meta_fields):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=data_fields,
        meta_fields=meta_fields,
    )(cls)


def _warp(t: jax.Array, a: jax.Array, m: jax.Array) -> jax.Array:
    """Logistic warp normalized to [0,1]; ``a`` ~ 0 degenerates to identity."""
    s = lambda u: jax.nn.sigmoid(a * (u - m))
    s0 = s(0.0)
    s1 = s(1.0)
    lin = t  # a == 0 limit
    den = jnp.maximum(s1 - s0, 1e-12)
    return jnp.where(jnp.abs(a) < 1e-3, lin, (s(t) - s0) / den)


def _unwarp(w: jax.Array, a: jax.Array, m: jax.Array) -> jax.Array:
    """Inverse of :func:`_warp` (logit)."""
    s0 = jax.nn.sigmoid(a * (0.0 - m))
    s1 = jax.nn.sigmoid(a * (1.0 - m))
    sv = jnp.clip(s0 + w * (s1 - s0), 1e-9, 1.0 - 1e-9)
    t = m + jnp.log(sv / (1.0 - sv)) / jnp.where(jnp.abs(a) < 1e-3, 1.0, a)
    return jnp.where(jnp.abs(a) < 1e-3, w, t)


@partial(
    _register,
    data_fields=["mean"],
    meta_fields=["original_dim", "num_subvectors", "bits"],
)
@dataclasses.dataclass(frozen=True)
class NVQuantization:
    """NVQ trainer/encoder; stateless apart from the global mean."""

    mean: jax.Array  # [D]
    original_dim: int
    num_subvectors: int = 2
    bits: int = 8

    @staticmethod
    def compute(
        vectors: jax.Array | np.ndarray, num_subvectors: int = 2
    ) -> "NVQuantization":
        vectors = jnp.asarray(vectors, jnp.float32)
        return NVQuantization(
            mean=jnp.mean(vectors, axis=0),
            original_dim=vectors.shape[1],
            num_subvectors=num_subvectors,
        )

    @property
    def sub_dim(self) -> int:
        return -(-self.original_dim // self.num_subvectors)

    @property
    def padded_dim(self) -> int:
        return self.sub_dim * self.num_subvectors

    def encode(self, vectors: jax.Array | np.ndarray) -> "NVQVectors":
        """Quantize: returns codes ``uint8 [N, V, S]`` + params ``[N, V, 4]``."""
        vectors = jnp.asarray(vectors, jnp.float32)
        return NVQVectors(
            *self._encode_impl(vectors), nvq=self
        )

    @partial(jax.jit, static_argnames=())
    def _encode_impl(self, vectors: jax.Array):
        n, d = vectors.shape
        x = vectors - self.mean
        dp = self.padded_dim
        if d < dp:
            x = jnp.concatenate([x, jnp.zeros((n, dp - d), x.dtype)], axis=1)
        xs = x.reshape(n, self.num_subvectors, self.sub_dim)  # [n, V, S]

        lo = jnp.min(xs, axis=2)  # [n, V]
        hi = jnp.max(xs, axis=2)
        scale = jnp.maximum(hi - lo, 1e-12)
        t = (xs - lo[..., None]) / scale[..., None]  # in [0,1]
        midpoint = jnp.mean(t, axis=2)  # [n, V]

        levels = float(2**self.bits - 1)

        def loss_for(a):  # a: [n, V] or scalar broadcast
            w = _warp(t, a[..., None], midpoint[..., None])
            q = jnp.round(w * levels) / levels
            deq = _unwarp(q, a[..., None], midpoint[..., None])
            return jnp.sum((deq - t) ** 2, axis=2)  # [n, V]

        # coarse sweep a in {0, 1..20} (0 == uniform), then fine +-0.9 @ 0.1
        coarse = jnp.concatenate([jnp.zeros((1,)), jnp.arange(1.0, 21.0)])
        losses = jax.vmap(
            lambda a: loss_for(jnp.full(midpoint.shape, a))
        )(coarse)  # [21, n, V]
        best = coarse[jnp.argmin(losses, axis=0)]  # [n, V]

        fine_offsets = jnp.arange(-0.9, 0.91, 0.1)
        fine_losses = jax.vmap(
            lambda off: loss_for(jnp.maximum(best + off, 0.0))
        )(fine_offsets)  # [19, n, V]
        growth = jnp.maximum(
            best + fine_offsets[jnp.argmin(fine_losses, axis=0)], 0.0
        )  # [n, V]

        w = _warp(t, growth[..., None], midpoint[..., None])
        codes = jnp.round(w * levels).astype(jnp.uint8)  # [n, V, S]
        params = jnp.stack([lo, scale, growth, midpoint], axis=-1)  # [n, V, 4]
        return codes, params


@partial(_register, data_fields=["codes", "params", "nvq"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class NVQVectors:
    """Encoded NVQ corpus + scorer (reference ``NVQVectors``/``NVQScorer``)."""

    codes: jax.Array  # uint8 [N, V, S]
    params: jax.Array  # float32 [N, V, 4] = {lo, scale, growth, midpoint}
    nvq: NVQuantization

    @property
    def compressed_size(self) -> int:
        """Bytes per vector: codes + 4 fp32 params per sub-vector."""
        v, s = self.codes.shape[1], self.codes.shape[2]
        return v * s + v * 16

    def dequantize(self, ids: jax.Array) -> jax.Array:
        """Reconstruct (mean-added) vectors for node ids ``[...]`` -> ``[..., D]``."""
        codes = self.codes[ids].astype(jnp.float32)  # [..., V, S]
        p = self.params[ids]  # [..., V, 4]
        levels = float(2**self.nvq.bits - 1)
        w = codes / levels
        t = _unwarp(w, p[..., 2:3], p[..., 3:4])
        xs = p[..., 0:1] + t * p[..., 1:2]
        flat = xs.reshape(xs.shape[:-2] + (self.nvq.padded_dim,))
        return flat[..., : self.nvq.original_dim] + self.nvq.mean

    def provider(self, sim: SimilarityFunction | str) -> "NVQScoreProvider":
        return NVQScoreProvider(vectors=self, sim=SimilarityFunction.parse(sim))

    # -- on-disk feature round trip (reference ``NVQ.java:36-110``: the
    #    NVQ_VECTORS feature stores codes+params inline and reconstructs
    #    the reranker from the loaded index via ``NVQ.rerankerFor``) -------

    def feature_arrays(self) -> dict[str, "np.ndarray"]:
        """Arrays for ``write_index(features={FeatureId.NVQ_VECTORS: ...})``."""
        return {
            "codes": np.asarray(self.codes),
            "params": np.asarray(self.params),
            "mean": np.asarray(self.nvq.mean),
            "dims": np.asarray(
                [self.nvq.original_dim, self.nvq.num_subvectors, self.nvq.bits],
                np.int32,
            ),
        }

    @staticmethod
    def from_feature_arrays(arrays: dict) -> "NVQVectors":
        """Rebuild from a loaded index's NVQ_VECTORS feature dict."""
        dims = np.asarray(arrays["dims"])
        nvq = NVQuantization(
            mean=jnp.asarray(np.asarray(arrays["mean"])),
            original_dim=int(dims[0]),
            num_subvectors=int(dims[1]),
            bits=int(dims[2]),
        )
        return NVQVectors(
            codes=jnp.asarray(np.asarray(arrays["codes"])),
            params=jnp.asarray(np.asarray(arrays["params"])),
            nvq=nvq,
        )


@partial(_register, data_fields=["vectors"], meta_fields=["sim"])
@dataclasses.dataclass(frozen=True)
class NVQScoreProvider:
    """Scores queries against dequantized-on-the-fly NVQ codes.

    Used as the high-accuracy reranker (reference ``NVQ.rerankerFor``) and
    usable as a primary provider.
    """

    vectors: NVQVectors
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    @property
    def exact(self) -> bool:
        return True  # "exact-class" accuracy tier, like the reference's NVQ rerank

    def prepare(self, queries: jax.Array) -> jax.Array:
        if self.sim == SimilarityFunction.COSINE:
            n = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
            return queries / jnp.maximum(n, 1e-30)
        return queries

    def score(self, qstate: jax.Array, ids: jax.Array) -> jax.Array:
        vecs = self.vectors.dequantize(ids)  # [Q, R, D]
        dots = jnp.einsum("qd,qrd->qr", qstate, vecs, preferred_element_type=jnp.float32)
        if self.sim == SimilarityFunction.DOT_PRODUCT:
            raw = dots
        elif self.sim == SimilarityFunction.COSINE:
            vn = jnp.sqrt(jnp.sum(vecs * vecs, axis=-1))
            raw = dots / jnp.maximum(vn, 1e-30)
        else:
            q2 = jnp.sum(qstate * qstate, axis=-1)[:, None]
            v2 = jnp.sum(vecs * vecs, axis=-1)
            raw = jnp.maximum(q2 + v2 - 2.0 * dots, 0.0)
        return normalize_score(raw, self.sim)
