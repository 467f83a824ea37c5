"""Guaranteed-in-place row scatter (Pallas custom call with aliasing).

XLA's ``.at[rows].set(...)`` scatter is only *sometimes* lowered in place:
donated buffers that are also captured by a ``while_loop`` in the same
program get defensively copied — measured as 1.5 GB copies per scatter on
the build's fused SQ4 tables.  A Pallas call with ``input_output_aliases``
is a hard aliasing constraint the compiler must honor, so this kernel is
the primitive for "update K-byte rows of a huge HBM table in place": each
row update is one HBM->HBM DMA, issued back-to-back and drained at the end.

Rows with index < 0 or >= N are dropped (the ``mode="drop"`` contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(n_rows: int):
    def kernel(idx_ref, payload_ref, table_ref, out_ref, sem):
        b = payload_ref.shape[0]

        def issue(i, started):
            r = idx_ref[i]
            ok = (r >= 0) & (r < n_rows)

            def do():
                pltpu.make_async_copy(
                    payload_ref.at[i], out_ref.at[r], sem
                ).start()
                return started + 1

            return jax.lax.cond(ok, do, lambda: started)

        started = jax.lax.fori_loop(0, b, issue, jnp.int32(0))

        def drain(i, _):
            pltpu.make_async_copy(
                payload_ref.at[0], out_ref.at[0], sem
            ).wait()
            return 0

        jax.lax.fori_loop(0, started, drain, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scatter_rows_inplace(
    table: jax.Array,  # [N, K]
    idx: jax.Array,  # [B] int32
    payload: jax.Array,  # [B, K] same dtype as table
    interpret: bool = False,
) -> jax.Array:
    """Write ``payload[i]`` into ``table[idx[i]]`` in place; drop bad rows."""
    n, k = table.shape
    return pl.pallas_call(
        _scatter_kernel(n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # payload
                pl.BlockSpec(memory_space=pltpu.HBM),  # table (aliased)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((n, k), table.dtype),
        input_output_aliases={2: 0},  # table input buffer IS the output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, payload, table)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scatter_rows3_inplace(
    table: jax.Array,  # [N, T, 128] — T % (tile sublanes) == 0 so each row
    idx: jax.Array,  # [B] int32      is whole HBM tiles (u8: T % 32... see
    payload: jax.Array,  # [B, T, 128] scatter_rows3_auto for the contract)
    interpret: bool = False,
) -> jax.Array:
    """Rank-3 sibling of :func:`scatter_rows_inplace`.

    A row of a 2-D ``[N, K]`` u8 table spans fractional HBM tiles, which
    Mosaic rejects for single-row DMA ("slice shape must be aligned to
    tiling").  Viewing the table as ``[N, K/128, 128]`` with ``K`` a
    multiple of 1024 bytes makes every row a whole number of tiles; the
    reshape is layout-free (measured 0.03 ms round-trip on a 4 GB table)
    and the scatter is then a true in-place HBM DMA per row (0.03 ms for
    17k x 4 KB rows vs ~7 ms for XLA's copy-on-scatter at the same shape).
    """
    n = table.shape[0]
    return pl.pallas_call(
        _scatter_kernel(n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # payload
                pl.BlockSpec(memory_space=pl.ANY),  # table (aliased)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, payload, table)


def scatter_flat_rows_auto(table2d, idx, payload2d):
    """In-place row scatter on a ``[N, K]`` table via the rank-3 view.

    NOTE: a 2-D table that round-trips through the rank-3 view at every
    call pays a physical relayout copy per reshape once a Pallas call
    pins the rank-3 layout (measured 2 x 13 ms/wave at 1M) — callers that
    update the same table repeatedly should STORE it rank-3 and use
    :func:`scatter_rows_nd_auto` instead.  Falls back to the XLA scatter
    off-TPU or when ``K % 1024 != 0``.
    """
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    n, k = table2d.shape
    b = payload2d.shape[0]
    if not on_tpu or k % 1024 != 0:
        return scatter_rows_ref(table2d, idx, payload2d)
    t = k // 128
    out = scatter_rows3_inplace(
        table2d.reshape(n, t, 128), idx, payload2d.reshape(b, t, 128)
    )
    return out.reshape(n, k)


def scatter_rows_nd_auto(table, idx, payload):
    """In-place first-dim row scatter for rank-3 ``[N, T, 128]`` tables
    (u8 fused code tables kept rank-3 across the whole build loop so no
    layout round-trips ever materialize).  XLA fallback off-TPU."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        return scatter_rows3_inplace(table, idx, payload)
    n = table.shape[0]
    safe = jnp.where((idx >= 0) & (idx < n), idx, n)
    return table.at[safe].set(payload, mode="drop")


def _scatter_slots_kernel(n_rows: int, kp: int):
    def kernel(idx_ref, off_ref, payload_ref, table_ref, out_ref, sem):
        b = payload_ref.shape[0]

        def issue(i, started):
            r = idx_ref[i]
            o = off_ref[i]
            ok = (r >= 0) & (r < n_rows)

            def do():
                pltpu.make_async_copy(
                    payload_ref.at[i], out_ref.at[r, pl.ds(o, kp)], sem
                ).start()
                return started + 1

            return jax.lax.cond(ok, do, lambda: started)

        started = jax.lax.fori_loop(0, b, issue, jnp.int32(0))

        def drain(i, _):
            pltpu.make_async_copy(
                payload_ref.at[0], out_ref.at[0, pl.ds(0, kp)], sem
            ).wait()
            return 0

        jax.lax.fori_loop(0, started, drain, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scatter_slots_inplace(
    table: jax.Array,  # [N, K]
    idx: jax.Array,  # [B] int32 row index
    off: jax.Array,  # [B] int32 element offset within the row
    payload: jax.Array,  # [B, Kp] same dtype as table (Kp <= K)
    interpret: bool = False,
) -> jax.Array:
    """Write ``payload[i]`` into ``table[idx[i], off[i]:off[i]+Kp]`` in place.

    The slot-granular sibling of :func:`scatter_rows_inplace` (used for the
    builder's backlink appends into fused rows); bad row indices drop.
    """
    n, k = table.shape
    kp = payload.shape[1]
    return pl.pallas_call(
        _scatter_slots_kernel(n, kp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # payload
                pl.BlockSpec(memory_space=pltpu.HBM),  # table (aliased)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((n, k), table.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, off, payload, table)


def scatter_slots_ref(table, idx, off, payload):
    """jnp reference (copying) for tests / non-TPU backends."""
    n, k = table.shape
    b, kp = payload.shape
    cols = off[:, None] + jnp.arange(kp, dtype=jnp.int32)[None, :]
    rows = jnp.where((idx >= 0) & (idx < n), idx, n)[:, None]
    return table.at[jnp.broadcast_to(rows, (b, kp)), cols].set(
        payload, mode="drop"
    )


def scatter_slots_auto(table, idx, off, payload):
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        return scatter_slots_inplace(table, idx, off, payload)
    return scatter_slots_ref(table, idx, off, payload)


def _patch_chunk(p: int, t: int, hint: int = 512) -> int:
    """RMW chunk size for the fused-update patch phase — the ONE place this
    is computed: :func:`fused_update_patch_meta`'s chunk-local last indices
    must agree with the kernel's chunking or cross-chunk runs corrupt.

    Always a multiple of 32 so the per-chunk payload DMA ([chunk*R128, 128]
    u8) is whole (32, 128) tiles; small ``p`` pads up to one full chunk
    rather than shrinking below a tile."""
    del p
    chunk = min(hint, max(64, (4 << 20) // (t * 128)))
    return max(32, chunk - chunk % 32)


def _fused_update_kernel(n_rows: int, chunk: int, n_chunks: int):
    """Combined fused-table update: wave row writes, backlink slot RMW
    patches, enforce row writes — one aliased call (see
    :func:`fused_update_inplace` for the phase contract)."""

    def kernel(
        wave_rows_ref,  # [W] i32 scalar prefetch
        patch_rows_ref,  # [P] i32 sorted by row; -1/big = skip
        patch_q_ref,  # [P] i32 first sublane row of the slot
        patch_lo_ref,  # [P] i32 slot start byte within the row
        patch_hi_ref,  # [P] i32 slot end byte (exclusive)
        patch_last_ref,  # [P] i32 chunk-local index of the run's last item
        er_rows_ref,  # [E] i32
        wave_img_ref,  # [W, T, 128] u8 (HBM)
        patch_img_ref,  # [n_chunks, chunk*R128, 128] u8 slot payloads —
        #   chunked on the UNTILED leading dim: a rank-3 [P, R128, 128]
        #   layout has a sub-tile sublane dim when R128 < the u8 tile (32),
        #   and Mosaic rejects DMA slices of it ("slice shape along
        #   dimension 1 must be aligned to tiling"); one whole chunk per
        #   leading index is always whole (32, 128) tiles
        er_img_ref,  # [E, T, 128] u8 (HBM)
        table_ref,  # [N, T, 128] u8 (HBM, aliased) — unused; rows read
        out_ref,  # [N, T, 128] u8 == table buffer      via out_ref
        buf,  # VMEM [chunk, T, 128] u8
        pbuf,  # VMEM [chunk*R128, 128] u8
        sem_row,
        sem_r,
        sem_w,
        sem_p,
    ):
        T = out_ref.shape[1]
        r128 = patch_img_ref.shape[1] // chunk
        P = patch_rows_ref.shape[0]

        def row_phase(rows_ref, img_ref, count):
            def issue(i, started):
                r = rows_ref[i]
                ok = (r >= 0) & (r < n_rows)

                def do():
                    pltpu.make_async_copy(
                        img_ref.at[i], out_ref.at[r], sem_row
                    ).start()
                    return started + 1

                return jax.lax.cond(ok, do, lambda: started)

            started = jax.lax.fori_loop(0, count, issue, jnp.int32(0))

            def drain(i, _):
                pltpu.make_async_copy(
                    img_ref.at[0], out_ref.at[0], sem_row
                ).wait()
                return 0

            jax.lax.fori_loop(0, started, drain, 0)

        # -- phase 1: wave rows (full images) -----------------------------
        row_phase(wave_rows_ref, wave_img_ref, wave_img_ref.shape[0])

        # -- phase 2: backlink slot patches (chunked RMW) -----------------
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
        byte_iota = sub_iota * 128 + jax.lax.broadcasted_iota(
            jnp.int32, (T, 128), 1
        )

        def chunk_body(c, _):
            base = c * chunk
            pltpu.make_async_copy(patch_img_ref.at[c], pbuf, sem_p).start()

            def issue_read(i, started):
                gi = base + i
                r = patch_rows_ref[gi]
                ok = (r >= 0) & (r < n_rows) & (patch_last_ref[gi] == i)

                def do():
                    pltpu.make_async_copy(
                        out_ref.at[r], buf.at[i], sem_r
                    ).start()
                    return started + 1

                return jax.lax.cond(ok, do, lambda: started)

            nreads = jax.lax.fori_loop(0, chunk, issue_read, jnp.int32(0))
            pltpu.make_async_copy(patch_img_ref.at[c], pbuf, sem_p).wait()

            def drain_r(i, _):
                pltpu.make_async_copy(
                    out_ref.at[0], buf.at[0], sem_r
                ).wait()
                return 0

            jax.lax.fori_loop(0, nreads, drain_r, 0)

            def patch(i, _):
                gi = base + i
                r = patch_rows_ref[gi]
                ok = (r >= 0) & (r < n_rows)

                def do():
                    b = patch_last_ref[gi]
                    q0 = patch_q_ref[gi]
                    lo = patch_lo_ref[gi]
                    hi = patch_hi_ref[gi]
                    cur = buf[b]  # [T, 128]
                    in_slot = (byte_iota >= lo) & (byte_iota < hi)
                    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                    for k in range(r128):
                        mask = in_slot & (sub_iota == q0 + k)
                        # Mosaic only vector-loads VMEM at sublane offsets
                        # provably % 8 == 0: load the aligned 8-row block
                        # holding payload row i*r128+k, mask-select it
                        idx = i * r128 + k
                        base8 = (idx // 8) * 8
                        blk = pbuf[pl.ds(base8, 8), :].astype(jnp.int32)
                        row = jnp.max(
                            jnp.where(iota8 == idx - base8, blk, 0),
                            axis=0,
                            keepdims=True,
                        ).astype(
                            jnp.uint8
                        )  # [1, 128] — max-select works because u8 >= 0
                        cur = jnp.where(mask, row, cur)
                    buf[b] = cur
                    return 0

                jax.lax.cond(ok, do, lambda: 0)
                return 0

            jax.lax.fori_loop(0, chunk, patch, 0)

            def issue_write(i, started):
                gi = base + i
                r = patch_rows_ref[gi]
                ok = (r >= 0) & (r < n_rows) & (patch_last_ref[gi] == i)

                def do():
                    pltpu.make_async_copy(
                        buf.at[i], out_ref.at[r], sem_w
                    ).start()
                    return started + 1

                return jax.lax.cond(ok, do, lambda: started)

            nw = jax.lax.fori_loop(0, chunk, issue_write, jnp.int32(0))

            def drain_w(i, _):
                pltpu.make_async_copy(
                    buf.at[0], out_ref.at[0], sem_w
                ).wait()
                return 0

            # full drain before the next chunk's reads: a run of patches to
            # one row may straddle the chunk boundary, and the next chunk
            # re-reads the row to continue it
            jax.lax.fori_loop(0, nw, drain_w, 0)
            return 0

        if P:
            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        # -- phase 3: enforce rows (full images, highest priority) --------
        row_phase(er_rows_ref, er_img_ref, er_img_ref.shape[0])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "chunk_hint"), donate_argnums=(0,)
)
def fused_update_inplace(
    table: jax.Array,  # [N, T, 128] u8 — DONATED, updated in place
    wave_rows: jax.Array,  # [W] i32 (-1/N = drop)
    wave_img: jax.Array,  # [W, T, 128] u8
    patch_rows: jax.Array,  # [P] i32 SORTED by row (-1/big = drop)
    patch_q: jax.Array,  # [P] i32 first sublane row of each slot
    patch_lo: jax.Array,  # [P] i32 slot start byte offset within the row
    patch_hi: jax.Array,  # [P] i32 slot end byte offset (exclusive)
    patch_last: jax.Array,  # [P] i32 chunk-local last-occurrence index
    patch_img: jax.Array,  # [P, R128, 128] u8 slot payload, lane-positioned
    er_rows: jax.Array,  # [E] i32
    er_img: jax.Array,  # [E, T, 128] u8
    interpret: bool = False,
    chunk_hint: int = 512,
) -> jax.Array:
    """One-call fused-table wave update, fully in place.

    Phase order = write priority: wave row images land first, backlink slot
    patches RMW on top of them (so a wave member that also receives
    backlinks ends up with both), enforce-rewritten rows land last and win
    outright (callers must exclude er rows from ``patch_rows``).  Backlink
    patches to one row within a chunk share a single read-modify-write via
    ``patch_last`` (the chunk-local index of the run's last occurrence —
    runs are contiguous because ``patch_rows`` is sorted); runs straddling
    a chunk boundary are correct because writes drain before the next
    chunk's reads.
    """
    n, t, _ = table.shape
    p = patch_rows.shape[0]
    chunk = _patch_chunk(p, t, chunk_hint)
    n_chunks = -(-p // chunk) if p else 0
    if p and p % chunk:  # pad patch arrays so every chunk is full
        pad = n_chunks * chunk - p
        neg = jnp.full((pad,), -1, jnp.int32)
        patch_rows = jnp.concatenate([patch_rows, neg])
        patch_q = jnp.concatenate([patch_q, neg])
        patch_lo = jnp.concatenate([patch_lo, neg])
        patch_hi = jnp.concatenate([patch_hi, neg])
        patch_last = jnp.concatenate([patch_last, neg])
        patch_img = jnp.concatenate(
            [patch_img, jnp.zeros((pad,) + patch_img.shape[1:], patch_img.dtype)]
        )
    r128 = patch_img.shape[1]
    # chunk payloads on an untiled leading dim (see kernel docstring): the
    # per-patch [R128, 128] images have a sub-tile sublane dim for small
    # R128, which Mosaic cannot slice — [n_chunks, chunk*R128, 128] makes
    # every chunk whole (32, 128) u8 tiles (chunk >= 64 from _patch_chunk)
    patch_img = patch_img.reshape(n_chunks, chunk * r128, 128)
    return pl.pallas_call(
        _fused_update_kernel(n, chunk, n_chunks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # wave_img
                pl.BlockSpec(memory_space=pl.ANY),  # patch_img
                pl.BlockSpec(memory_space=pl.ANY),  # er_img
                pl.BlockSpec(memory_space=pl.ANY),  # table (aliased)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((chunk, t, 128), table.dtype),
                pltpu.VMEM((chunk * r128, 128), patch_img.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        wave_rows,
        patch_rows,
        patch_q,
        patch_lo,
        patch_hi,
        patch_last,
        er_rows,
        wave_img,
        patch_img,
        er_img,
        table,
    )


def fused_update_ref(
    table,
    wave_rows,
    wave_img,
    patch_rows,
    patch_lo,
    patch_hi,
    patch_src,  # [P, MP] raw slot codes (NOT lane-positioned)
    er_rows,
    er_img,
):
    """jnp reference (copying) with the same phase priority, for tests and
    non-TPU backends.  Takes raw ``[P, MP]`` slot codes; the flat byte
    range ``[patch_lo, patch_hi)`` of each row is overwritten."""
    n, t, lanes = table.shape
    k = t * lanes
    flat = table.reshape(n, k)
    w_ok = (wave_rows >= 0) & (wave_rows < n)
    flat = flat.at[jnp.where(w_ok, wave_rows, n)].set(
        wave_img.reshape(wave_img.shape[0], k), mode="drop"
    )
    p_ok = (patch_rows >= 0) & (patch_rows < n)
    mp = patch_src.shape[1]
    cols = patch_lo[:, None] + jnp.arange(mp, dtype=jnp.int32)[None, :]
    rows_b = jnp.broadcast_to(
        jnp.where(p_ok, patch_rows, n)[:, None], cols.shape
    )
    flat = flat.at[rows_b, cols].set(patch_src, mode="drop")
    e_ok = (er_rows >= 0) & (er_rows < n)
    flat = flat.at[jnp.where(e_ok, er_rows, n)].set(
        er_img.reshape(er_img.shape[0], k), mode="drop"
    )
    return flat.reshape(n, t, lanes)


def fused_update_patch_meta(
    patch_rows: jax.Array,  # [P] i32 sorted by row
    patch_slots: jax.Array,  # [P] i32 slot index within the row
    patch_src: jax.Array,  # [P, MP] u8 raw slot codes
    mp: int,
    chunk_hint: int,
    t: int,
):
    """Derive the kernel's per-patch metadata from (row, slot, code).

    Returns ``(patch_q, patch_lo, patch_hi, patch_last, patch_img)`` for
    :func:`fused_update_inplace`.  Requires ``mp % 128 == 0`` or
    ``128 % mp == 0`` (lane-positionable without byte scatters) — callers
    fall back to full row images otherwise.
    """
    p = patch_rows.shape[0]
    lo = patch_slots * mp
    hi = lo + mp
    q = lo // 128
    chunk = _patch_chunk(p, t, chunk_hint)
    # chunk-local last-occurrence via a per-chunk equality matrix — NOT a
    # scan: associative_scan/cummin over a computed input lowers to a
    # sequential TPU while-loop (measured 22 ms at P=256 in the packed-adj
    # twin of this meta, r4; the r3 "chunked-copy while loops" in the wave
    # update were partly THIS).  Pad to a chunk multiple first; padded
    # entries form their own run at the end so the slice back is exact.
    pad = (-p) % chunk
    rows_p = (
        jnp.concatenate([patch_rows, jnp.full((pad,), jnp.int32(2**30))])
        if pad
        else patch_rows
    )
    x = rows_p.reshape(-1, chunk)
    j = jnp.arange(chunk, dtype=jnp.int32)
    eq = x[:, :, None] == x[:, None, :]
    patch_last = jnp.max(
        jnp.where(eq, j[None, None, :], -1), axis=2
    ).reshape(-1)[:p]
    if mp % 128 == 0:
        img = patch_src.reshape(p, mp // 128, 128)
    else:
        # mp divides 128: tile the code to a full lane row, then keep only
        # the slot's lanes (slot offsets are multiples of mp, so the tiled
        # copy is already positioned)
        reps = 128 // mp
        tiled = jnp.tile(patch_src, (1, reps))
        lane = jnp.arange(128, dtype=jnp.int32)[None, :]
        lane_lo = lo[:, None] % 128
        img = jnp.where(
            (lane >= lane_lo) & (lane < lane_lo + mp), tiled, 0
        )[:, None, :]
    return q, lo, hi, patch_last, img


def fused_update_supported(table_ndim: int, mp: int) -> bool:
    """Whether the slot-patch fused update applies to this table/code shape."""
    return table_ndim == 3 and (mp % 128 == 0 or 128 % mp == 0)


def fused_update_auto(
    table,  # [N, T, 128] u8 (rank-3 aligned build tables only)
    wave_rows,  # [W] i32
    wave_img,  # [W, T, 128] u8
    patch_rows,  # [P] i32 sorted by row (-1 = drop; run-contiguous)
    patch_slots,  # [P] i32 slot index within the row
    patch_src,  # [P, MP] u8 raw slot codes
    er_rows,  # [E] i32
    er_img,  # [E, T, 128] u8
    mp: int,
):
    """Combined wave/patch/enforce fused-table update; in-place Pallas on
    TPU, copying XLA reference elsewhere.  See :func:`fused_update_inplace`
    for the phase-priority contract."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    t = table.shape[1]
    q, lo, hi, last, img = fused_update_patch_meta(
        patch_rows, patch_slots, patch_src, mp, 512, t
    )
    if on_tpu:
        return fused_update_inplace(
            table, wave_rows, wave_img, patch_rows, q, lo, hi, last, img,
            er_rows, er_img,
        )
    return fused_update_ref(
        table, wave_rows, wave_img, patch_rows, lo, hi, patch_src,
        er_rows, er_img,
    )


def scatter_rows_ref(table, idx, payload):
    """jnp reference (copying) for tests / non-TPU backends."""
    n = table.shape[0]
    safe = jnp.where((idx >= 0) & (idx < n), idx, n)
    return table.at[safe].set(payload, mode="drop")


def scatter_rows_auto(table, idx, payload):
    """In-place Pallas on TPU, XLA scatter elsewhere."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        return scatter_rows_inplace(table, idx, payload)
    return scatter_rows_ref(table, idx, payload)
