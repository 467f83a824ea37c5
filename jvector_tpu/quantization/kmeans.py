"""k-means++ and Lloyd iterations, batched over PQ subspaces.

Reference: ``jv/quantization/KMeansPlusPlusClusterer.java`` — D^2-sampled
init (``:171-226``), unweighted Lloyd with incremental centroid updates
(``:251-270``), anisotropic assignment/update (``:278-431``).  TPU version:
everything is one ``lax`` loop over a dense ``[n, d]`` block; the PQ trainer
vmaps these functions over the M subspaces so all M codebooks train
simultaneously.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sq_dists(data: jax.Array, centroids: jax.Array) -> jax.Array:
    """[n, d] x [k, d] -> [n, k] squared distances via the matmul expansion."""
    d2 = (
        jnp.sum(data * data, axis=1)[:, None]
        + jnp.sum(centroids * centroids, axis=1)[None, :]
        - 2.0 * jnp.dot(data, centroids.T, preferred_element_type=jnp.float32)
    )
    return jnp.maximum(d2, 0.0)


@partial(jax.jit, static_argnames=("k",))
def kmeans_pp_init(data: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """D^2-weighted k-means++ seeding (``KMeansPlusPlusClusterer.java:171-226``)."""
    n, d = data.shape
    key, k0 = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centroids = jnp.zeros((k, d), data.dtype).at[0].set(data[first])
    min_d2 = jnp.sum((data - data[first]) ** 2, axis=1)

    def step(i, carry):
        centroids, min_d2, key = carry
        key, kc = jax.random.split(key)
        # sample proportional to min_d2 (log-weights; -inf for zero mass)
        logits = jnp.where(min_d2 > 0, jnp.log(jnp.maximum(min_d2, 1e-30)), -jnp.inf)
        all_zero = ~jnp.any(min_d2 > 0)
        idx = jnp.where(
            all_zero,
            jax.random.randint(kc, (), 0, n),
            jax.random.categorical(kc, logits),
        )
        c = data[idx]
        centroids = jax.lax.dynamic_update_index_in_dim(centroids, c, i, axis=0)
        min_d2 = jnp.minimum(min_d2, jnp.sum((data - c) ** 2, axis=1))
        return centroids, min_d2, key

    centroids, _, _ = jax.lax.fori_loop(1, k, step, (centroids, min_d2, key))
    return centroids


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    data: jax.Array,  # [n, d]
    k: int,
    key: jax.Array,
    iters: int = 6,
) -> jax.Array:
    """k-means++ init + ``iters`` Lloyd rounds; returns centroids ``[k, d]``.

    6 rounds matches the reference default (``ProductQuantization.K_MEANS_ITERATIONS``).
    Empty clusters keep their previous centroid (reference keeps them too).
    """
    n, d = data.shape
    centroids = kmeans_pp_init(data, k, key)

    def lloyd(_, centroids):
        assign = jnp.argmin(_sq_dists(data, centroids), axis=1)  # [n]
        sums = jax.ops.segment_sum(data, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), data.dtype), assign, num_segments=k)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centroids)

    return jax.lax.fori_loop(0, iters, lloyd, centroids)


@jax.jit
def assign_clusters(data: jax.Array, centroids: jax.Array) -> jax.Array:
    """Nearest-centroid assignment ``[n] int32`` (the encode kernel)."""
    return jnp.argmin(_sq_dists(data, centroids), axis=1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Anisotropic (SCANN / AVQ) variant
# ---------------------------------------------------------------------------


def compute_parallel_cost_multiplier(threshold: float, dim: int) -> float:
    """Reference: ``KMeansPlusPlusClusterer.computeParallelCostMultiplier:116-124``.

    Converts the anisotropic threshold T into the weight eta on
    parallel residual error (SCANN eq. 9 with squared threshold).
    """
    t2 = threshold * threshold
    return float((dim - 1.0) * t2 / max(1.0 - t2, 1e-12))


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_anisotropic(
    data: jax.Array,  # [n, d] residual-space training vectors
    k: int,
    key: jax.Array,
    eta: float,
    iters: int = 6,
) -> jax.Array:
    """Anisotropic Lloyd: weighted parallel/perpendicular assignment + AVQ update.

    Assignment (``KMeansPlusPlusClusterer.java:278-324``): cost of assigning
    x to c is ``eta * ||r_par||^2 + ||r_perp||^2`` where ``r = x - c`` is
    split along the direction of x.

    Update (``:378-431``, AVQ appendix 7.5): each centroid solves
    ``(sum_i w_i x_i x_i^T / ||x_i||^2 + perp terms) c = sum of scaled x_i``;
    here implemented with the same per-cluster d x d solve.
    """
    n, d = data.shape
    centroids = kmeans_pp_init(data, k, key)
    x_norm2 = jnp.maximum(jnp.sum(data * data, axis=1), 1e-12)  # [n]

    def cost(centroids):
        # r = x - c;  r_par = (r.x / |x|^2) x
        dots_xc = jnp.dot(data, centroids.T, preferred_element_type=jnp.float32)  # [n,k]
        # ||r_par||^2 = (x.(x - c))^2 / |x|^2 = (|x|^2 - x.c)^2 / |x|^2
        par = (x_norm2[:, None] - dots_xc) ** 2 / x_norm2[:, None]
        r2 = (
            x_norm2[:, None]
            + jnp.sum(centroids * centroids, axis=1)[None, :]
            - 2.0 * dots_xc
        )
        perp = jnp.maximum(r2 - par, 0.0)
        return eta * par + perp

    def lloyd(_, centroids):
        assign = jnp.argmin(cost(centroids), axis=1)  # [n]
        # AVQ update: per cluster solve (eta-1)/|x|^2 xx^T + I-ish system.
        # outer = sum_i (eta - 1) x_i x_i^T / ||x_i||^2 + count * I
        w = (eta - 1.0) / x_norm2  # [n]
        onehot = jax.nn.one_hot(assign, k, dtype=data.dtype)  # [n, k]
        xs = data * w[:, None]
        outer = jnp.einsum("nk,ni,nj->kij", onehot, xs, data)  # [k, d, d]
        counts = jnp.sum(onehot, axis=0)  # [k]
        eye = jnp.eye(d, dtype=data.dtype)[None]
        A = outer + counts[:, None, None] * eye
        # rhs = sum_i eta * x_i  (per cluster)
        rhs = eta * (onehot.T @ data)  # [k, d]
        new = jnp.linalg.solve(
            A + 1e-6 * eye, rhs[..., None]
        )[..., 0]
        return jnp.where(counts[:, None] > 0, new, centroids)

    return jax.lax.fori_loop(0, iters, lloyd, centroids)


@partial(jax.jit, static_argnames=())
def assign_clusters_anisotropic(
    data: jax.Array, centroids: jax.Array, eta: float | jax.Array
) -> jax.Array:
    x_norm2 = jnp.maximum(jnp.sum(data * data, axis=1), 1e-12)
    dots_xc = jnp.dot(data, centroids.T, preferred_element_type=jnp.float32)
    par = (x_norm2[:, None] - dots_xc) ** 2 / x_norm2[:, None]
    r2 = (
        x_norm2[:, None]
        + jnp.sum(centroids * centroids, axis=1)[None, :]
        - 2.0 * dots_xc
    )
    perp = jnp.maximum(r2 - par, 0.0)
    return jnp.argmin(eta * par + perp, axis=1).astype(jnp.int32)
