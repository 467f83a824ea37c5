"""Pallas kernels vs jnp reference (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from jvector_tpu.ops.adc import adc_score
from jvector_tpu.ops.pallas.adc_kernel import adc_score_pallas

RNG = np.random.default_rng(3)


def test_adc_kernel_matches_reference():
    Q, C, M, K = 12, 18, 4, 32  # deliberately unaligned sizes
    luts = jnp.asarray(RNG.normal(size=(Q, M, K)).astype(np.float32))
    codes = jnp.asarray(RNG.integers(0, K, size=(Q, C, M)).astype(np.int32))
    ref = np.asarray(adc_score(luts, codes))
    got = np.asarray(adc_score_pallas(luts, codes, query_block=8, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_adc_kernel_single_query():
    Q, C, M, K = 1, 5, 2, 16
    luts = jnp.asarray(RNG.normal(size=(Q, M, K)).astype(np.float32))
    codes = jnp.asarray(RNG.integers(0, K, size=(Q, C, M)).astype(np.int32))
    ref = np.asarray(adc_score(luts, codes))
    got = np.asarray(adc_score_pallas(luts, codes, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
