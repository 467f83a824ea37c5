"""HNSW-style hierarchy on top of the Vamana base layer.

Reference: ``GraphIndexBuilder.getRandomGraphLevel`` (geometric levels with
ml = 1/ln(maxDegree), rng seeded 0, ``GraphIndexBuilder.java:562-575``) and
``OnHeapGraphIndex`` sparse upper layers; search descends upper layers with
beam 1 (``GraphSearcher.internalSearch:263-282``).

TPU redesign:

- Levels are assigned up front (host rng, seed 0) instead of per-insert —
  the wave builder then builds each level's subgraph as an ordinary batched
  Vamana build over the level's node subset, top-down order irrelevant.
- Upper-layer adjacency lives in *slot space* (compact per-level arrays);
  slot -> base ordinal via ``level_node_ids``, base -> slot via
  ``searchsorted`` (ids are sorted), so no N-sized per-level maps.
- The descent seeds from ALL top-level nodes scored in one batched gather
  (strictly better than the reference's single entry point and free on TPU).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def assign_levels(n: int, max_degree: int, seed: int = 0) -> np.ndarray:
    """Geometric level per node; P(level >= l) = (1/maxDegree)^l."""
    ml = 1.0 / np.log(max_degree)
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    levels = np.floor(-np.log(np.maximum(u, 1e-300)) * ml).astype(np.int32)
    return levels


def _register(cls, data_fields, meta_fields):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=data_fields,
        meta_fields=meta_fields,
    )(cls)


@partial(_register, data_fields=["inner", "node_ids"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class LevelProvider:
    """Scores slot-space ids of an upper layer via the base provider."""

    inner: object
    node_ids: jax.Array  # [n_l] slot -> base ordinal

    @property
    def exact(self) -> bool:
        return self.inner.exact

    def prepare(self, queries):
        return self.inner.prepare(queries)

    def score(self, qstate, slot_ids):
        return self.inner.score(qstate, self.node_ids[slot_ids])


def slots_for(node_ids: jax.Array, base_ids: jax.Array) -> jax.Array:
    """base ordinal -> slot in a sorted level id array (must be present)."""
    return jnp.searchsorted(node_ids, base_ids).astype(jnp.int32)
