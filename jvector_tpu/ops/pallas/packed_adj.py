"""In-place packed-adjacency update (Pallas, aliased custom call).

The builder's per-wave writes to ``neighbors``/``scores``/``fused_w2`` as
XLA scatters defensively COPY each multi-hundred-MB table every wave
(measured r4: three ~7.8 ms chunked-copy while-loops per wave at 1M — 22 ms
of an 83 ms wave).  This module is the write-only "apply" program that
replaces them:

- **Layout**: neighbors + edge scores pack into ONE ``[N, 128]`` int32
  table (``adj``): lanes ``[0:R]`` hold neighbor ids (-1 padded), lanes
  ``[64:64+R]`` hold the f32 edge scores bit-cast to int32.  The fused
  per-slot constants pack into a second ``[N, 128]`` int32 table (``w2t``,
  f32 bits in lanes ``[0:R]``).  A ``[N, 128]`` int32 array tiles exactly
  like ``[N/8, 8, 128]`` (int32 HBM tile = (8, 128)), so the rank-3 view is
  layout-free and every 8-logical-row group is a whole-tile DMA target.
- **Phase A** (wave rows): wave ids are a contiguous, 8-aligned block, so
  the W wave-row images collapse into W/8 whole-tile row DMAs — pure
  writes, no read-modify-write.
- **Phase B** (backlink appends + enforce rewrites): a single patch stream
  sorted by physical row; each patch either sets two lanes of one sublane
  (an append: id lane ``slot``, score-bits lane ``64+slot``, w2 lane
  ``slot``) or replaces a whole sublane (an enforce row image).  Runs of
  patches to one physical row share a single VMEM read-modify-write
  (``last``-occurrence chunking, same contract as
  ``scatter_rows.fused_update_inplace``).

Reference relationship: this is the TPU materialization of the reference's
in-place ``ConcurrentNeighborMap`` row updates (``ConcurrentNeighborMap.java``
CAS inserts) — mutation without copying the graph.

Correctness contract (mirrors the builder's XLA phrasing):
- callers exclude appends into enforce rows from the patch stream (the
  enforce image already contains every surviving slot);
- wave rows may also be enforce rows: phase B lands after phase A drains,
  so the enforce image wins;
- dropped patches carry ``prow`` outside ``[0, n_prows)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# RMW chunk: VMEM cost is 2 tables x chunk x (8, 128) i32 = chunk * 8 KB.
_CHUNK = 256


def _packed_update_kernel(n_prows: int, chunk: int, n_chunks: int, n_a: int):
    def kernel(
        a_rows_ref,  # [Wa] i32 phase-A physical rows (drop if out of range)
        p_prow_ref,  # [P] i32 sorted physical rows (big = drop)
        p_sub_ref,  # [P] i32 sublane 0..7
        p_slot_ref,  # [P] i32 lane of the id / w2 value (score at 64+slot)
        p_id_ref,  # [P] i32 neighbor id value
        p_sc_ref,  # [P] i32 f32 score bits
        p_w2_ref,  # [P] i32 f32 w2 bits
        p_img_ref,  # [P] i32 index into er images (-1 = scalar append patch)
        p_last_ref,  # [P] i32 chunk-local index of the run's last patch
        a_adj_ref,  # [Wa, 8, 128] i32 (HBM) wave adj images
        a_w2_ref,  # [Wa, 8, 128] i32 (HBM) wave w2 images
        e_adj_ref,  # [E, 128] i32 (VMEM) enforce sublane images
        e_w2_ref,  # [E, 128] i32 (VMEM)
        adj_ref,  # [N/8, 8, 128] i32 (HBM, aliased) — written via out refs
        w2_ref,  # [N/8, 8, 128] i32 (HBM, aliased)
        out_adj_ref,
        out_w2_ref,
        abuf,  # VMEM [chunk, 8, 128] i32
        wbuf,  # VMEM [chunk, 8, 128] i32
        sem_a,
        sem_r,
        sem_w,
    ):
        # -- phase A: whole-tile wave-row writes ---------------------------
        def issue_a(i, started):
            r = a_rows_ref[i]
            ok = (r >= 0) & (r < n_prows)

            def do():
                pltpu.make_async_copy(a_adj_ref.at[i], out_adj_ref.at[r], sem_a).start()
                pltpu.make_async_copy(a_w2_ref.at[i], out_w2_ref.at[r], sem_a).start()
                return started + 1

            return jax.lax.cond(ok, do, lambda: started)

        started = jax.lax.fori_loop(0, n_a, issue_a, jnp.int32(0))

        def drain_a(i, _):
            pltpu.make_async_copy(a_adj_ref.at[0], out_adj_ref.at[0], sem_a).wait()
            pltpu.make_async_copy(a_w2_ref.at[0], out_w2_ref.at[0], sem_a).wait()
            return 0

        jax.lax.fori_loop(0, started, drain_a, 0)

        # -- phase B: chunked RMW patch stream -----------------------------
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def chunk_body(c, _):
            base = c * chunk

            def issue_read(i, started):
                gi = base + i
                r = p_prow_ref[gi]
                ok = (r >= 0) & (r < n_prows) & (p_last_ref[gi] == i)

                def do():
                    pltpu.make_async_copy(out_adj_ref.at[r], abuf.at[i], sem_r).start()
                    pltpu.make_async_copy(out_w2_ref.at[r], wbuf.at[i], sem_r).start()
                    return started + 1

                return jax.lax.cond(ok, do, lambda: started)

            nreads = jax.lax.fori_loop(0, chunk, issue_read, jnp.int32(0))

            def drain_r(i, _):
                pltpu.make_async_copy(out_adj_ref.at[0], abuf.at[0], sem_r).wait()
                pltpu.make_async_copy(out_w2_ref.at[0], wbuf.at[0], sem_r).wait()
                return 0

            jax.lax.fori_loop(0, nreads, drain_r, 0)

            def patch(i, _):
                gi = base + i
                r = p_prow_ref[gi]
                ok = (r >= 0) & (r < n_prows)

                def do():
                    b = p_last_ref[gi]
                    sub = p_sub_ref[gi]
                    img = p_img_ref[gi]
                    in_sub = sub_iota == sub
                    cur_a = abuf[b]
                    cur_w = wbuf[b]

                    def apply_img():
                        # whole-sublane replace from the er image row.
                        # Mosaic only vector-loads VMEM at sublane offsets
                        # provably % 8 == 0: load the aligned 8-row block
                        # and sum-select the row (one-hot, so sum == select)
                        base8 = (img // 8) * 8
                        blk_a = e_adj_ref[pl.ds(base8, 8), :]
                        blk_w = e_w2_ref[pl.ds(base8, 8), :]
                        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                        onehot = (iota8 == img - base8).astype(jnp.int32)
                        row_a = jnp.sum(blk_a * onehot, axis=0, keepdims=True)
                        row_w = jnp.sum(blk_w * onehot, axis=0, keepdims=True)
                        return (
                            jnp.where(in_sub, row_a, cur_a),
                            jnp.where(in_sub, row_w, cur_w),
                        )

                    def apply_scalar():
                        slot = p_slot_ref[gi]
                        na = jnp.where(
                            in_sub & (lane_iota == slot),
                            p_id_ref[gi],
                            jnp.where(
                                in_sub & (lane_iota == 64 + slot),
                                p_sc_ref[gi],
                                cur_a,
                            ),
                        )
                        nw = jnp.where(
                            in_sub & (lane_iota == slot), p_w2_ref[gi], cur_w
                        )
                        return na, nw

                    na, nw = jax.lax.cond(img >= 0, apply_img, apply_scalar)
                    abuf[b] = na
                    wbuf[b] = nw
                    return 0

                jax.lax.cond(ok, do, lambda: 0)
                return 0

            jax.lax.fori_loop(0, chunk, patch, 0)

            def issue_write(i, started):
                gi = base + i
                r = p_prow_ref[gi]
                ok = (r >= 0) & (r < n_prows) & (p_last_ref[gi] == i)

                def do():
                    pltpu.make_async_copy(abuf.at[i], out_adj_ref.at[r], sem_w).start()
                    pltpu.make_async_copy(wbuf.at[i], out_w2_ref.at[r], sem_w).start()
                    return started + 1

                return jax.lax.cond(ok, do, lambda: started)

            nw = jax.lax.fori_loop(0, chunk, issue_write, jnp.int32(0))

            def drain_w(i, _):
                pltpu.make_async_copy(abuf.at[0], out_adj_ref.at[0], sem_w).wait()
                pltpu.make_async_copy(wbuf.at[0], out_w2_ref.at[0], sem_w).wait()
                return 0

            # full drain before the next chunk's reads: a run straddling the
            # chunk boundary re-reads the row to continue it
            jax.lax.fori_loop(0, nw, drain_w, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    return kernel


def _packed_update_kernel_now2(n_prows: int, chunk: int, n_chunks: int, n_a: int):
    """Adjacency-only twin of :func:`_packed_update_kernel` (no w2 table).

    The LTM non-fused build (the 100M regime, codes served from augmented
    rows) has no fused per-slot constants — carrying a dummy ``w2t`` would
    cost another N*512 B of HBM (5.1 GB at 10M) for writes nobody reads."""

    def kernel(
        a_rows_ref,
        p_prow_ref,
        p_sub_ref,
        p_slot_ref,
        p_id_ref,
        p_sc_ref,
        p_img_ref,
        p_last_ref,
        a_adj_ref,
        e_adj_ref,
        adj_ref,
        out_adj_ref,
        abuf,
        sem_a,
        sem_r,
        sem_w,
    ):
        def issue_a(i, started):
            r = a_rows_ref[i]
            ok = (r >= 0) & (r < n_prows)

            def do():
                pltpu.make_async_copy(a_adj_ref.at[i], out_adj_ref.at[r], sem_a).start()
                return started + 1

            return jax.lax.cond(ok, do, lambda: started)

        started = jax.lax.fori_loop(0, n_a, issue_a, jnp.int32(0))

        def drain_a(i, _):
            pltpu.make_async_copy(a_adj_ref.at[0], out_adj_ref.at[0], sem_a).wait()
            return 0

        jax.lax.fori_loop(0, started, drain_a, 0)

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def chunk_body(c, _):
            base = c * chunk

            def issue_read(i, started):
                gi = base + i
                r = p_prow_ref[gi]
                ok = (r >= 0) & (r < n_prows) & (p_last_ref[gi] == i)

                def do():
                    pltpu.make_async_copy(out_adj_ref.at[r], abuf.at[i], sem_r).start()
                    return started + 1

                return jax.lax.cond(ok, do, lambda: started)

            nreads = jax.lax.fori_loop(0, chunk, issue_read, jnp.int32(0))

            def drain_r(i, _):
                pltpu.make_async_copy(out_adj_ref.at[0], abuf.at[0], sem_r).wait()
                return 0

            jax.lax.fori_loop(0, nreads, drain_r, 0)

            def patch(i, _):
                gi = base + i
                r = p_prow_ref[gi]
                ok = (r >= 0) & (r < n_prows)

                def do():
                    b = p_last_ref[gi]
                    sub = p_sub_ref[gi]
                    img = p_img_ref[gi]
                    in_sub = sub_iota == sub
                    cur_a = abuf[b]

                    def apply_img():
                        base8 = (img // 8) * 8
                        blk_a = e_adj_ref[pl.ds(base8, 8), :]
                        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                        onehot = (iota8 == img - base8).astype(jnp.int32)
                        row_a = jnp.sum(blk_a * onehot, axis=0, keepdims=True)
                        return jnp.where(in_sub, row_a, cur_a)

                    def apply_scalar():
                        slot = p_slot_ref[gi]
                        return jnp.where(
                            in_sub & (lane_iota == slot),
                            p_id_ref[gi],
                            jnp.where(
                                in_sub & (lane_iota == 64 + slot),
                                p_sc_ref[gi],
                                cur_a,
                            ),
                        )

                    abuf[b] = jax.lax.cond(img >= 0, apply_img, apply_scalar)
                    return 0

                jax.lax.cond(ok, do, lambda: 0)
                return 0

            jax.lax.fori_loop(0, chunk, patch, 0)

            def issue_write(i, started):
                gi = base + i
                r = p_prow_ref[gi]
                ok = (r >= 0) & (r < n_prows) & (p_last_ref[gi] == i)

                def do():
                    pltpu.make_async_copy(abuf.at[i], out_adj_ref.at[r], sem_w).start()
                    return started + 1

                return jax.lax.cond(ok, do, lambda: started)

            nw = jax.lax.fori_loop(0, chunk, issue_write, jnp.int32(0))

            def drain_w(i, _):
                pltpu.make_async_copy(abuf.at[0], out_adj_ref.at[0], sem_w).wait()
                return 0

            jax.lax.fori_loop(0, nw, drain_w, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    return kernel


_BIG = jnp.int32(2**30)


def packed_patch_meta(p_prow: jax.Array, chunk: int = _CHUNK):
    """Chunk-local last-occurrence index for a prow-sorted patch stream.

    Computed as a per-chunk equality matrix, NOT a scan:
    ``associative_scan``/``cummin`` over a computed input lowers to a
    sequential while-loop on TPU — measured 22 ms per call at P=256 (!),
    the entire cost of the r4 copy-kill undone by its own metadata.  The
    [P/chunk, chunk, chunk] compare is a few MB of VPU work.  Requires
    ``P % chunk == 0`` (callers pad first).
    """
    x = p_prow.reshape(-1, chunk)
    j = jnp.arange(chunk, dtype=jnp.int32)
    eq = x[:, :, None] == x[:, None, :]
    return jnp.max(jnp.where(eq, j[None, None, :], -1), axis=2).reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1))
def packed_adj_update_inplace(
    adj: jax.Array,  # [N/8, 8, 128] i32 — DONATED, updated in place.  MUST
    #   be STORED rank-3 by the caller across the whole build loop: a 2-D
    #   [N, 128] table reshaped per call relayout-copies ~22 ms/wave at 1M
    #   once the Pallas call pins the rank-3 layout (measured r4; same trap
    #   as the u8 fused tables, see scatter_rows.scatter_flat_rows_auto)
    w2t: jax.Array,  # [N/8, 8, 128] i32 — DONATED
    a_rows: jax.Array,  # [Wa] i32 physical (8-row-group) indices
    a_adj: jax.Array,  # [Wa, 8, 128] i32 wave images
    a_w2: jax.Array,  # [Wa, 8, 128] i32
    p_prow: jax.Array,  # [P] i32 SORTED (big = drop)
    p_sub: jax.Array,  # [P] i32
    p_slot: jax.Array,  # [P] i32
    p_id: jax.Array,  # [P] i32
    p_sc: jax.Array,  # [P] i32
    p_w2: jax.Array,  # [P] i32
    p_img: jax.Array,  # [P] i32 er-image index or -1
    e_adj: jax.Array,  # [E, 128] i32 enforce sublane images (E % 8 == 0)
    e_w2: jax.Array,  # [E, 128] i32
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Apply one build wave's adjacency writes fully in place.

    ``P`` (the patch-stream length) MUST be a multiple of ``_CHUNK`` and the
    caller pads with ``prow = 2**30`` entries itself: an earlier revision
    padded here with runtime ``jnp.concatenate`` and that specific program
    shape left the whole PROCESS in a degraded synchronous-dispatch mode —
    every subsequent table update (any executable) cost a flat ~26 ms
    (measured r4; the clean path is 0.05 ms).  Static padding in the
    producing program avoids the trap entirely.
    """
    n_pr = adj.shape[0]
    assert adj.shape[1:] == (8, 128)
    assert e_adj.shape[0] % 8 == 0
    chunk = _CHUNK
    p = p_prow.shape[0]
    if p % chunk:
        raise ValueError(
            f"patch stream length {p} must be a multiple of {chunk}; pad "
            "with prow=2**30 entries in the producing program"
        )
    n_chunks = p // chunk
    p_last = packed_patch_meta(p_prow, chunk)
    out_adj, out_w2 = pl.pallas_call(
        _packed_update_kernel(n_pr, chunk, n_chunks, a_rows.shape[0]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # a_adj
                pl.BlockSpec(memory_space=pl.ANY),  # a_w2
                pl.BlockSpec(memory_space=pltpu.VMEM),  # e_adj
                pl.BlockSpec(memory_space=pltpu.VMEM),  # e_w2
                pl.BlockSpec(memory_space=pl.ANY),  # adj (aliased)
                pl.BlockSpec(memory_space=pl.ANY),  # w2t (aliased)
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((chunk, 8, 128), jnp.int32),
                pltpu.VMEM((chunk, 8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pr, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_pr, 8, 128), jnp.int32),
        ],
        input_output_aliases={13: 0, 14: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        a_rows,
        p_prow,
        p_sub,
        p_slot,
        p_id,
        p_sc,
        p_w2,
        p_img,
        p_last,
        a_adj,
        a_w2,
        e_adj,
        e_w2,
        adj,
        w2t,
    )
    return out_adj, out_w2


def packed_adj_update_ref(
    adj, w2t, a_rows, a_adj, a_w2, p_prow, p_sub, p_slot, p_id, p_sc, p_w2,
    p_img, e_adj, e_w2,
):
    """jnp reference (copying) with identical phase semantics, for tests and
    non-TPU backends.  Takes rank-3 ``[N/8, 8, 128]`` tables like the kernel."""
    n_pr = adj.shape[0]
    a3 = adj
    w3 = w2t
    a_ok = (a_rows >= 0) & (a_rows < n_pr)
    a3 = a3.at[jnp.where(a_ok, a_rows, n_pr)].set(a_adj, mode="drop")
    w3 = w3.at[jnp.where(a_ok, a_rows, n_pr)].set(a_w2, mode="drop")
    # patch stream, in order (mode=drop on bad rows)
    ok = (p_prow >= 0) & (p_prow < n_pr)
    r = jnp.where(ok, p_prow, n_pr)
    is_img = p_img >= 0
    # scalar appends
    app = ok & ~is_img
    ra = jnp.where(app, r, n_pr)
    a3 = a3.at[ra, p_sub, p_slot].set(p_id, mode="drop")
    a3 = a3.at[ra, p_sub, 64 + p_slot].set(p_sc, mode="drop")
    w3 = w3.at[ra, p_sub, p_slot].set(p_w2, mode="drop")
    # sublane images (er rows — disjoint from appends by contract)
    im = ok & is_img
    ri = jnp.where(im, r, n_pr)
    safe_img = jnp.maximum(p_img, 0)
    a3 = a3.at[ri, p_sub].set(e_adj[safe_img], mode="drop")
    w3 = w3.at[ri, p_sub].set(e_w2[safe_img], mode="drop")
    return a3, w3


def packed_adj_update_auto(adj, w2t, *args):
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        return packed_adj_update_inplace(adj, w2t, *args)
    return packed_adj_update_ref(adj, w2t, *args)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def packed_adj_only_update_inplace(
    adj: jax.Array,  # [N/8, 8, 128] i32 — DONATED (STORED rank-3, see above)
    a_rows: jax.Array,  # [Wa] i32
    a_adj: jax.Array,  # [Wa, 8, 128] i32
    p_prow: jax.Array,  # [P] i32 SORTED (big = drop), P % _CHUNK == 0
    p_sub: jax.Array,  # [P] i32
    p_slot: jax.Array,  # [P] i32
    p_id: jax.Array,  # [P] i32
    p_sc: jax.Array,  # [P] i32 f32 score bits
    p_img: jax.Array,  # [P] i32 er-image index or -1
    e_adj: jax.Array,  # [E, 128] i32 (E % 8 == 0)
    interpret: bool = False,
) -> jax.Array:
    """Adjacency-only in-place wave apply (no fused-w2 table) — the LTM
    non-fused build path.  Same contract as
    :func:`packed_adj_update_inplace` minus the w2 streams."""
    n_pr = adj.shape[0]
    assert adj.shape[1:] == (8, 128)
    assert e_adj.shape[0] % 8 == 0
    chunk = _CHUNK
    p = p_prow.shape[0]
    if p % chunk:
        raise ValueError(
            f"patch stream length {p} must be a multiple of {chunk}; pad "
            "with prow=2**30 entries in the producing program"
        )
    n_chunks = p // chunk
    p_last = packed_patch_meta(p_prow, chunk)
    (out_adj,) = pl.pallas_call(
        _packed_update_kernel_now2(n_pr, chunk, n_chunks, a_rows.shape[0]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # a_adj
                pl.BlockSpec(memory_space=pltpu.VMEM),  # e_adj
                pl.BlockSpec(memory_space=pl.ANY),  # adj (aliased)
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((chunk, 8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_pr, 8, 128), jnp.int32)],
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        a_rows,
        p_prow,
        p_sub,
        p_slot,
        p_id,
        p_sc,
        p_img,
        p_last,
        a_adj,
        e_adj,
        adj,
    )
    return out_adj


def packed_adj_only_update_ref(
    adj, a_rows, a_adj, p_prow, p_sub, p_slot, p_id, p_sc, p_img, e_adj
):
    """jnp reference (copying) for the adj-only apply — tests / non-TPU."""
    n_pr = adj.shape[0]
    a3 = adj
    a_ok = (a_rows >= 0) & (a_rows < n_pr)
    a3 = a3.at[jnp.where(a_ok, a_rows, n_pr)].set(a_adj, mode="drop")
    ok = (p_prow >= 0) & (p_prow < n_pr)
    r = jnp.where(ok, p_prow, n_pr)
    is_img = p_img >= 0
    app = ok & ~is_img
    ra = jnp.where(app, r, n_pr)
    a3 = a3.at[ra, p_sub, p_slot].set(p_id, mode="drop")
    a3 = a3.at[ra, p_sub, 64 + p_slot].set(p_sc, mode="drop")
    im = ok & is_img
    ri = jnp.where(im, r, n_pr)
    safe_img = jnp.maximum(p_img, 0)
    a3 = a3.at[ri, p_sub].set(e_adj[safe_img], mode="drop")
    return a3


def packed_adj_only_update_auto(adj, *args):
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        return packed_adj_only_update_inplace(adj, *args)
    return packed_adj_only_update_ref(adj, *args)
