"""Pallas TPU kernels for the hot paths.

Each kernel has a jnp reference implementation in ``jvector_tpu.ops``; tests
compare kernel vs reference (the pattern of the reference repo's
``TestVectorizationProvider``).  On non-TPU backends the kernels fall back to
the jnp reference automatically.
"""

from jvector_tpu.ops.pallas.adc_kernel import adc_score_pallas

__all__ = ["adc_score_pallas"]
