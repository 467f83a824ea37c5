"""Fused ADC (assemble-and-sum) Pallas kernel.

The reference's hottest kernel pair is ``calculatePartialSums`` (LUT build)
+ ``assembleAndSum`` (per-candidate LUT gather+sum); on CPU the gather is a
SIMD shuffle (``PanamaVectorUtilSupport`` gather paths, Highway kernels).

On TPU, XLA lowers the per-(query, candidate, subspace) LUT gather inside the
search ``while_loop`` to a slow generic gather (~8 ms per iteration for a
1024-query wave).  This kernel replaces the gather with an in-VMEM one-hot
compare + reduce, processed per query block:

    score[q, c] = sum_m lut[q, m, codes[q, c, m]]
                = sum_m sum_k [codes[q, c, m] == k] * lut[q, m, k]

The one-hot never touches HBM — it lives per (m) slice in registers/VMEM —
and the compare+multiply+reduce runs on the VPU at full rate.  ~25x faster
than the XLA gather path in the search loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adc_kernel(luts_ref, codes_ref, out_ref):
    """One query block: luts [QB, M, K], codes [QB, M, C] -> out [QB, C].

    The subspace loop is a fori_loop with ref-level dynamic slices (NOT a
    Python unroll: Mosaic allocates the one-hot scratch per unrolled step
    and blows the scoped-VMEM budget for M >= 32).  Codes arrive transposed
    to [QB, M, C] so the dynamic index lands on a sublane dimension (Mosaic
    cannot dynamically slice the 128-lane minor dimension).
    """
    qb, m_sub, k = luts_ref.shape
    c = codes_ref.shape[2]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (qb, c, k), 2)

    def body(m, acc):
        code_m = codes_ref[:, pl.ds(m, 1), :][:, 0, :]  # [QB, C]
        onehot = (k_iota == code_m[:, :, None]).astype(jnp.float32)  # [QB, C, K]
        lut_m = luts_ref[:, pl.ds(m, 1), :][:, 0, :]  # [QB, K]
        return acc + jnp.sum(onehot * lut_m[:, None, :], axis=2)

    if m_sub <= 16:  # unroll fits the scoped-VMEM budget and runs ~1.8x faster
        acc = jnp.zeros((qb, c), jnp.float32)
        for m in range(m_sub):
            acc = body(m, acc)
        out_ref[:] = acc
    else:
        out_ref[:] = jax.lax.fori_loop(
            0, m_sub, body, jnp.zeros((qb, c), jnp.float32)
        )


@functools.partial(
    jax.jit, static_argnames=("query_block", "cand_block", "interpret")
)
def adc_score_pallas(
    luts: jax.Array,  # [Q, M, K] float32
    codes: jax.Array,  # [Q, C, M] int (any int dtype)
    query_block: int = 8,
    cand_block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for :func:`jvector_tpu.ops.adc.adc_score`.

    Blocks over both queries and candidates so VMEM stays bounded even for
    brute-force compressed scans (large C): per program the one-hot slice is
    ``[QB, CB, K]`` (~4 MB at defaults).
    """
    q, m_sub, k = luts.shape
    c = codes.shape[1]
    codes = codes.astype(jnp.int32).transpose(0, 2, 1)  # [Q, M, C]

    qb = min(query_block, q)
    cb = min(cand_block, c)
    pad_q = (-q) % qb
    pad_c = (-c) % cb
    if pad_q:
        luts = jnp.concatenate(
            [luts, jnp.zeros((pad_q, m_sub, k), luts.dtype)], axis=0
        )
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad_q, m_sub, c), codes.dtype)], axis=0
        )
    if pad_c:
        codes = jnp.concatenate(
            [codes, jnp.zeros((q + pad_q, m_sub, pad_c), codes.dtype)], axis=2
        )
    qp, cp = q + pad_q, c + pad_c

    out = pl.pallas_call(
        _adc_kernel,
        grid=(qp // qb, cp // cb),
        in_specs=[
            pl.BlockSpec(
                (qb, m_sub, k), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (qb, m_sub, cb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((qb, cb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, cp), jnp.float32),
        interpret=interpret,
    )(luts, codes)
    return out[:q, :c]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def adc_score_auto(luts: jax.Array, codes: jax.Array) -> jax.Array:
    """Pallas on TPU, jnp reference elsewhere.

    The decision is static (trace-time backend check) — the TPU analog of the
    reference's ``VectorizationProvider`` tier dispatch, except there is only
    one "ISA" per process so no runtime vtable is needed.
    """
    from jvector_tpu.ops.adc import adc_score

    if _on_tpu():
        return adc_score_pallas(luts, codes)
    return adc_score(luts, codes)
