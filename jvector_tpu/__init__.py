"""jvector_tpu — a TPU-native approximate-nearest-neighbor index & query engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of datastax/jvector
(reference layout documented in SURVEY.md):

- ``ops``           — similarity / ADC / hamming / NVQ kernels (jnp reference + Pallas)
- ``quantization``  — PQ (plain + anisotropic), BQ, NVQ; k-means++ training
- ``graph``         — batched Vamana graph build + query-wave beam search
- ``disk``          — versioned persistent index format, features, compaction
- ``parallel``      — mesh sharding: data-parallel query waves, node-sharded scoring
- ``bench``         — dataset loading, recall/QPS harness
"""

from jvector_tpu.ops.similarity import SimilarityFunction

__version__ = "0.1.0"

__all__ = ["SimilarityFunction", "__version__"]
