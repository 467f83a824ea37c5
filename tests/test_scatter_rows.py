"""In-place row/slot scatter kernel tests (interpret mode vs jnp reference)."""

import jax.numpy as jnp
import numpy as np

from jvector_tpu.ops.pallas.scatter_rows import (
    scatter_rows_inplace,
    scatter_rows_ref,
    scatter_slots_inplace,
    scatter_slots_ref,
)


def test_scatter_rows_matches_ref():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 255, (64, 32), dtype=np.uint8))
    idx = jnp.asarray([3, -1, 10, 64, 3, 0], jnp.int32)  # dup + 2 drops
    payload = jnp.asarray(
        rng.integers(0, 255, (6, 32), dtype=np.uint8)
    )
    expect = scatter_rows_ref(table, idx, payload)
    got = scatter_rows_inplace(table.copy(), idx, payload, interpret=True)
    # duplicate index 3: either write may win in the kernel; make them equal
    assert (np.asarray(payload[0]) != np.asarray(payload[4])).any()
    ok = np.asarray(got) == np.asarray(expect)
    # all rows except the duplicated one must match exactly
    assert ok[np.arange(64) != 3].all()
    got3 = np.asarray(got)[3]
    assert (got3 == np.asarray(payload[0])).all() or (
        got3 == np.asarray(payload[4])
    ).all()


def test_scatter_slots_matches_ref():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(40, 24)).astype(np.float32))
    idx = jnp.asarray([5, 7, -1, 39], jnp.int32)
    off = jnp.asarray([0, 8, 4, 16], jnp.int32)
    payload = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    expect = scatter_slots_ref(table, idx, off, payload)
    got = scatter_slots_inplace(table.copy(), idx, off, payload, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_scatter_flat_rows_auto_matches_ref():
    """Rank-3 tiled row scatter (the fused-table in-place path) must match
    the XLA reference, including dropped out-of-range rows."""
    import numpy as np
    import jax.numpy as jnp

    from jvector_tpu.ops.pallas.scatter_rows import (
        scatter_flat_rows_auto,
        scatter_rows_ref,
    )

    rng = np.random.default_rng(11)
    n, k, b = 64, 1024, 12
    table = jnp.asarray(rng.integers(0, 255, (n, k)).astype(np.uint8))
    idx = jnp.asarray(
        np.array([0, 5, 5, 63, -1, 64, 7, 8, 9, 10, 11, 12], np.int32)
    )
    payload = jnp.asarray(rng.integers(0, 255, (b, k)).astype(np.uint8))
    out = scatter_flat_rows_auto(table, idx, payload)
    ref = scatter_rows_ref(table, idx, payload)
    assert (np.asarray(out) == np.asarray(ref)).all()


def _meta_for(rows, slots, src, mp, t):
    from jvector_tpu.ops.pallas.scatter_rows import fused_update_patch_meta

    return fused_update_patch_meta(
        jnp.asarray(rows, jnp.int32), jnp.asarray(slots, jnp.int32),
        jnp.asarray(src), mp, 512, t
    )


def test_fused_update_kernel_matches_ref():
    """Combined wave/patch/enforce kernel (interpret) vs the XLA reference:
    duplicates patches to one row, patches on a wave row, er priority."""
    from jvector_tpu.ops.pallas.scatter_rows import (
        fused_update_inplace,
        fused_update_ref,
    )

    rng = np.random.default_rng(3)
    n, t, mp = 48, 8, 64  # rows of 8*128=1024 bytes, 16 slots of 64
    table = jnp.asarray(rng.integers(0, 255, (n, t, 128), dtype=np.uint8))
    wave_rows = jnp.asarray([2, 7, -1, 48], jnp.int32)
    wave_img = jnp.asarray(rng.integers(0, 255, (4, t, 128), dtype=np.uint8))
    # sorted patch stream: two patches to row 2 (a wave row), three to row
    # 11 (distinct slots), one dropped (-1), one to er row 30 is EXCLUDED
    # by the caller contract so not present here
    p_rows = [2, 2, 11, 11, 11, -1]
    p_slots = [3, 9, 0, 1, 15, 0]
    src = rng.integers(0, 255, (6, mp), dtype=np.uint8)
    er_rows = jnp.asarray([30, -1, 30], jnp.int32)
    er_img = jnp.asarray(rng.integers(0, 255, (3, t, 128), dtype=np.uint8))
    er_img = er_img.at[2].set(er_img[0])  # duplicate er rows carry same img
    q, lo, hi, last, img = _meta_for(p_rows, p_slots, src, mp, t)
    got = fused_update_inplace(
        table.copy(), wave_rows, wave_img,
        jnp.asarray(p_rows, jnp.int32), q, lo, hi, last, img,
        er_rows, er_img, interpret=True,
    )
    expect = fused_update_ref(
        table, wave_rows, wave_img,
        jnp.asarray(p_rows, jnp.int32), lo, hi, jnp.asarray(src),
        er_rows, er_img,
    )
    assert (np.asarray(got) == np.asarray(expect)).all()


def test_fused_update_kernel_chunk_straddling_run():
    """A run of patches to one row straddling the chunk boundary must
    accumulate across chunks (write drains before the next chunk reads)."""
    from jvector_tpu.ops.pallas.scatter_rows import (
        fused_update_inplace,
        fused_update_ref,
        fused_update_patch_meta,
    )

    rng = np.random.default_rng(4)
    n, t, mp = 8, 8, 64
    p = 80  # with chunk forced small below, runs straddle boundaries
    table = jnp.asarray(rng.integers(0, 255, (n, t, 128), dtype=np.uint8))
    rows = np.sort(rng.integers(0, n, p)).astype(np.int32)
    # distinct slots per row occurrence: rank within run
    slots = np.zeros(p, np.int32)
    for r in np.unique(rows):
        idx = np.where(rows == r)[0]
        slots[idx] = np.arange(len(idx)) % 16
    src = rng.integers(0, 255, (p, mp), dtype=np.uint8)
    empty_rows = jnp.full((1,), -1, jnp.int32)
    empty_img = jnp.zeros((1, t, 128), jnp.uint8)
    q, lo, hi, last, img = fused_update_patch_meta(
        jnp.asarray(rows), jnp.asarray(slots), jnp.asarray(src), mp, 64, t
    )
    got = fused_update_inplace(
        table.copy(), empty_rows, empty_img,
        jnp.asarray(rows), q, lo, hi, last, img,
        empty_rows, empty_img, interpret=True, chunk_hint=64,
    )
    # reference: later patches to the same (row, slot) win; distinct slots
    # per run here so order is irrelevant
    expect = fused_update_ref(
        table, empty_rows, empty_img,
        jnp.asarray(rows), lo, hi, jnp.asarray(src),
        empty_rows, empty_img,
    )
    assert (np.asarray(got) == np.asarray(expect)).all()
