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
