"""Host-memory tier for rerank vectors (the larger-than-memory serving mode).

Reference behavior: on-disk indexes keep full-resolution vectors OUT of the
search working set — the beam runs on compressed codes and only the topK
rerank touches the big payload, via OS page cache (``OnDiskGraphIndex.View
.getVectorInto`` seek+read per candidate).

TPU equivalent: full vectors stay in HOST RAM (numpy, optionally memmapped
straight from the index file); the first pass runs entirely on-device from
PQ/fused codes, then the rerank gathers just ``[Q, rerank_k]`` rows on the
host and ships one dense block to the device for exact scoring.  HBM holds
codes + adjacency only — the 100M x 128d corpus needs ~6 GB of HBM
(graph + fused codes) while 51 GB of vectors stay on host.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jvector_tpu.graph.searcher import NEG_INF, SearchResult, search
from jvector_tpu.ops.similarity import SimilarityFunction, pairwise_raw, normalize_score


@dataclasses.dataclass
class HostVectorStore:
    """Full-resolution vectors resident in host RAM (or memmapped)."""

    vectors: np.ndarray  # [N, D], np.memmap welcome
    sim: SimilarityFunction = SimilarityFunction.EUCLIDEAN

    @staticmethod
    def from_index_file(reader, name: str, sim) -> "HostVectorStore":
        """Memmap the inline-vectors feature straight off the index file."""
        return HostVectorStore(
            vectors=reader.read(name, mmap=True), sim=SimilarityFunction.parse(sim)
        )

    def rerank(
        self, queries: jax.Array, approx: SearchResult, top_k: int
    ) -> SearchResult:
        """Exact-rescore the approximate results via a host gather.

        One fancy-index gather on host + one [Q, K, D] transfer + one
        batched device matmul — the bounded-IO equivalent of the
        reference's per-candidate disk reads.
        """
        ids = np.asarray(approx.ids)
        q, k = ids.shape
        safe = np.maximum(ids, 0)
        from jvector_tpu.util.native import gather_rows

        block = gather_rows(self.vectors, safe.reshape(-1)).reshape(q, k, -1)
        dev = jnp.asarray(block)

        def _score(queries, dev):
            raw = pairwise_raw(queries[:, None, :], dev, self.sim)[:, 0, :]
            return normalize_score(raw, self.sim)

        exact = jax.jit(_score, static_argnums=())(queries, dev)
        exact = jnp.where(jnp.asarray(ids >= 0), exact, NEG_INF)
        order = jnp.argsort(-exact, axis=1)
        out_ids = jnp.take_along_axis(jnp.asarray(ids), order, axis=1)[:, :top_k]
        out_scores = jnp.take_along_axis(exact, order, axis=1)[:, :top_k]
        # approx scores ride the SAME permutation so they correspond to the
        # returned ids (the worstApproximateScoreInTopK contract that the
        # multi-index rerank-floor merge depends on)
        out_approx = jnp.take_along_axis(approx.scores[:, :k], order, axis=1)[
            :, :top_k
        ]
        return SearchResult(
            ids=out_ids,
            scores=out_scores,
            visited_count=approx.visited_count,
            expanded_count=approx.expanded_count,
            reranked_count=jnp.sum(jnp.asarray(ids >= 0), axis=1).astype(jnp.int32),
            approx_scores=out_approx,
        )


def search_with_host_rerank(
    graph,
    compressed_provider,
    host_store: HostVectorStore,
    queries: jax.Array,
    top_k: int,
    beam_width: int | None = None,
    rerank_k: int | None = None,
    **search_kwargs,
) -> SearchResult:
    """Two-pass search with the rerank payload on the host tier."""
    rerank_k = rerank_k or (beam_width or max(top_k, 100))
    approx = search(
        graph,
        compressed_provider,
        queries,
        top_k=rerank_k,
        beam_width=beam_width,
        **search_kwargs,
    )
    return host_store.rerank(queries, approx, top_k)
