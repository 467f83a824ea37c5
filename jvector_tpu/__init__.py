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

import os as _os


def _enable_persistent_compile_cache() -> None:
    """Point JAX at an on-disk executable cache (opt out: JVTPU_NO_CACHE=1).

    TPU compiles here are remote and expensive (tens of seconds per jitted
    shape, per process); the persistent cache makes every process after the
    first start warm — the framework equivalent of the reference shipping
    prebuilt native kernels.
    """
    if _os.environ.get("JVTPU_NO_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.environ.get(
                "JVTPU_CACHE_DIR",
                _os.path.join(_os.path.expanduser("~"), ".jvector_tpu_cache"),
            )
            # Partition the cache by host CPU fingerprint: XLA:CPU cache
            # entries embed AOT-compiled kernels, and loading entries built
            # on a host with different CPU features SIGSEGVs/SIGILLs inside
            # the compiler (observed when a cache written by a previous
            # avx512-variant VM was reused — cpu_aot_loader warns about
            # exactly this).  TPU entries are target-keyed by XLA already,
            # but the subdirectory costs nothing and is always safe.
            try:
                import hashlib
                import platform

                flags = ""
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            flags = " ".join(sorted(line.split(":")[1].split()))
                            break
                fp = hashlib.sha256(
                    (platform.machine() + flags).encode()
                ).hexdigest()[:12]
                cache = _os.path.join(cache, f"host-{fp}")
            except OSError:
                pass
            _os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from jvector_tpu.ops.similarity import SimilarityFunction  # noqa: E402
from jvector_tpu.graph import (  # noqa: E402
    GraphConfig,
    GraphIndex,
    SearchResult,
    build_graph,
    resume,
    search,
)
from jvector_tpu.quantization import (  # noqa: E402
    BinaryQuantization,
    NVQuantization,
    ProductQuantization,
    ScalarQuantization4,
)

__version__ = "0.2.0"

__all__ = [
    "SimilarityFunction",
    "GraphConfig",
    "GraphIndex",
    "SearchResult",
    "build_graph",
    "search",
    "resume",
    "ProductQuantization",
    "ScalarQuantization4",
    "BinaryQuantization",
    "NVQuantization",
    "__version__",
]
