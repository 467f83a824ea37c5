"""LUT16 (4-bit PQ) assemble-and-sum Pallas kernel.

TPU-native analog of the reference's Quicker-ADC idea (``FusedPQ`` +
``FusedPQDecoder``, which require 256 clusters and lean on AVX shuffles):
with K=16 clusters per subspace the per-candidate LUT gather becomes a
16-way one-hot select that runs at full VPU rate — no gather unit needed.
Two 4-bit codes pack per byte, so a candidate's code row is ``M/2`` bytes,
halving the HBM traffic of the fused-row gather on top of the 16x-smaller
LUT.

Layouts (chosen so every in-kernel dynamic slice lands on a sublane dim —
Mosaic cannot dynamically slice the 128-lane minor dim):

- ``luts  [Q, MP, 2K]`` float32: subspace pair ``j`` holds the K entries of
  subspace ``2j`` then the K entries of subspace ``2j+1``.
- ``codes [Q, MP, C]`` uint8: packed byte ``j`` of candidate ``c`` =
  ``code[2j] | code[2j+1] << 4``.

``scores[q, c] = sum_j lut[q, j, lo(codes[q,j,c])] + lut[q, j, K + hi(...)]``
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K16 = 16


def pack_nibbles(codes: jax.Array) -> jax.Array:
    """``[N, M]`` 4-bit codes (values < 16) -> packed ``[N, M/2]`` uint8."""
    n, m = codes.shape
    assert m % 2 == 0, "subspace count must be even to pack nibbles"
    c = codes.astype(jnp.uint8)
    return (c[:, 0::2] | (c[:, 1::2] << 4)).astype(jnp.uint8)


def unpack_nibbles(packed: jax.Array) -> jax.Array:
    """Packed ``[..., MP]`` uint8 -> ``[..., 2*MP]`` 4-bit codes."""
    lo = packed & 0xF
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def lut_pairs(luts: jax.Array) -> jax.Array:
    """``[Q, M, 16]`` LUT -> paired ``[Q, M/2, 32]`` kernel layout."""
    q, m, k = luts.shape
    assert k == K16 and m % 2 == 0
    return luts.reshape(q, m // 2, 2 * K16)


def adc16_ref(luts_paired: jax.Array, codes_packed: jax.Array) -> jax.Array:
    """jnp reference: luts ``[Q, MP, 2K]``, codes ``[Q, MP, C]`` -> ``[Q, C]``."""
    lo = (codes_packed & 0xF).astype(jnp.int32)  # [Q, MP, C]
    hi = (codes_packed >> 4).astype(jnp.int32)
    lut_lo = luts_paired[:, :, :K16]  # [Q, MP, K]
    lut_hi = luts_paired[:, :, K16:]
    g_lo = jnp.take_along_axis(lut_lo, lo, axis=2)  # codes index into K slots
    g_hi = jnp.take_along_axis(lut_hi, hi, axis=2)
    return jnp.sum(g_lo + g_hi, axis=1)


def _adc16_kernel(luts_ref, codes_ref, out_ref):
    """One block: luts [QB, MP, 2K] f32, codes [QB, MP, CB] u8 -> out [QB, CB].

    MP is padded to a multiple of 8 by the caller (zero LUT entries make the
    padding contribute nothing); the subspace loop walks 8-sublane groups so
    every dynamic slice start is provably 8-aligned for Mosaic, with the
    group statically unrolled.
    """
    qb, mp, _ = luts_ref.shape
    cb = codes_ref.shape[2]

    def jbody(jj, acc):
        j0 = pl.multiple_of(jj * 8, 8)
        cs8 = codes_ref[:, pl.ds(j0, 8), :].astype(jnp.int32)  # [QB, 8, CB]
        lut8 = luts_ref[:, pl.ds(j0, 8), :]  # [QB, 8, 2K]

        def tbody(t, acc):
            # dynamic sublane pick from the loaded group (values are SSA, so
            # select rather than index; 8 selects keep the per-step unroll —
            # and thus Mosaic's scoped-VMEM stack — small)
            cs = cs8[:, 0, :]
            lut = lut8[:, 0, :]
            for tt in range(1, 8):
                cs = jnp.where(t == tt, cs8[:, tt, :], cs)
                lut = jnp.where(t == tt, lut8[:, tt, :], lut)
            lo = cs & 0xF
            hi = cs >> 4
            for k in range(K16):
                acc = acc + jnp.where(lo == k, lut[:, k][:, None], 0.0)
                acc = acc + jnp.where(hi == k, lut[:, K16 + k][:, None], 0.0)
            return acc

        return jax.lax.fori_loop(0, 8, tbody, acc)

    out_ref[:] = jax.lax.fori_loop(
        0, mp // 8, jbody, jnp.zeros((qb, cb), jnp.float32)
    )


@functools.partial(
    jax.jit, static_argnames=("query_block", "cand_block", "interpret")
)
def adc16_pallas(
    luts_paired: jax.Array,  # [Q, MP, 2K] float32
    codes_packed: jax.Array,  # [Q, MP, C] uint8
    query_block: int = 64,
    cand_block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Blocked LUT16 ADC: returns raw measures ``[Q, C]``."""
    q, mp, k2 = luts_paired.shape
    c = codes_packed.shape[2]

    pad_m = (-mp) % 8  # 8-sublane groups; zero LUT rows contribute nothing
    if pad_m:
        luts_paired = jnp.concatenate(
            [luts_paired, jnp.zeros((q, pad_m, k2), luts_paired.dtype)], axis=1
        )
        codes_packed = jnp.concatenate(
            [codes_packed, jnp.zeros((q, pad_m, c), codes_packed.dtype)], axis=1
        )
        mp += pad_m

    qb = min(query_block, q)
    cb = min(cand_block, c)
    pad_q = (-q) % qb
    pad_c = (-c) % cb
    if pad_q:
        luts_paired = jnp.concatenate(
            [luts_paired, jnp.zeros((pad_q, mp, k2), luts_paired.dtype)], axis=0
        )
        codes_packed = jnp.concatenate(
            [codes_packed, jnp.zeros((pad_q, mp, c), codes_packed.dtype)], axis=0
        )
    if pad_c:
        codes_packed = jnp.concatenate(
            [
                codes_packed,
                jnp.zeros((q + pad_q, mp, pad_c), codes_packed.dtype),
            ],
            axis=2,
        )
    qp, cp = q + pad_q, c + pad_c

    out = pl.pallas_call(
        _adc16_kernel,
        grid=(qp // qb, cp // cb),
        in_specs=[
            pl.BlockSpec(
                (qb, mp, k2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (qb, mp, cb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (qb, cb), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, cp), jnp.float32),
        interpret=interpret,
    )(luts_paired, codes_packed)
    return out[:q, :c]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def adc16_auto(luts_paired: jax.Array, codes_packed: jax.Array) -> jax.Array:
    """Pallas on TPU, jnp reference elsewhere (VectorizationProvider analog)."""
    if _on_tpu():
        return adc16_pallas(luts_paired, codes_packed)
    return adc16_ref(luts_paired, codes_packed)
