"""Versioned single-file index container.

Layout (little-endian)::

    [8B  magic "JVTPU\\x00" + u16 version]
    [array blobs, each 64-byte aligned]
    [JSON header]
    [u64 header offset][u32 header length][4B footer magic "JVBD"]

The footer magic matches the spirit of the reference's ``FOOTER_MAGIC``
(``AbstractGraphIndexWriter.java:46-53``); the header is JSON instead of a
binary struct because it is read once per open, never per query.  Every blob
carries a CRC32 (reference ``RandomAccessWriter.checksum``).

Writers may *reserve* an array extent up front and fill rows positionally
later — that is the larger-than-memory incremental path
(``RandomAccessOnDiskGraphIndexWriter.writeFeaturesInline:101-133``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct
import zlib

import numpy as np

MAGIC = b"JVTPU\x00"
FOOTER_MAGIC = b"JVBD"
# Version history (reference keeps V0-V6 back-compat reads,
# OnDiskGraphIndex.java:71-72; every version here must keep loading):
#   1 — initial container (frozen fixture: tests/fixtures/v1_frozen.jvtpu)
#   2 — hierarchical LTM saves add per-level "graph/L{l}/node_ids" arrays
#       and the "num_levels" meta key (ADDITIVE: the v1 parse handles both;
#       v1 files simply have num_levels == 1).
#       Frozen fixture: tests/fixtures/v2_frozen.jvtpu.
#   3 — BREAKING (layout dispatch): the L0 adjacency may be stored in the
#       PAIRED device layout instead of "graph/L0/neighbors" — array
#       "graph/L0/neighbors_paired" int32 [N/2, 2*Rp] (two nodes per
#       physical row, -1 padded; meta "l0_layout" = "paired", "l0_row_cap"
#       = the logical row width R).  Device tiers upload the blob as-is
#       (no host repack); plain-layout consumers reconstruct [N, R] via
#       ``unpack_paired_neighbors``.  Files using the paired layout stamp
#       version 3 so v<=2 readers refuse them; files without it keep
#       stamping 2 (the minimum version that can read them — the
#       reference's writer ``withVersion`` contract).
VERSION = 3
WRITE_VERSION_DEFAULT = 2
_ALIGN = 64


class FeatureId:
    """Feature names (reference ``FeatureId`` enum, ``FeatureId.java:31-63``)."""

    INLINE_VECTORS = "inline_vectors"
    FUSED_PQ = "fused_pq"
    NVQ_VECTORS = "nvq_vectors"
    SEPARATED_VECTORS = "separated_vectors"
    SEPARATED_NVQ = "separated_nvq"
    PQ_CODES = "pq_codes"  # sidecar compressed vectors (reference PQVectors file)
    BQ_CODES = "bq_codes"
    FUSED_SQ4 = "fused_sq4"  # TPU-native 4-bit scalar-quantized fused codes

    ALL = (
        INLINE_VECTORS,
        FUSED_PQ,
        NVQ_VECTORS,
        SEPARATED_VECTORS,
        SEPARATED_NVQ,
        PQ_CODES,
        BQ_CODES,
        FUSED_SQ4,
    )


@dataclasses.dataclass
class _ArrayEntry:
    dtype: str
    shape: tuple[int, ...]
    offset: int
    nbytes: int
    crc32: int | None


class IndexFileWriter:
    """Streaming writer: add arrays (whole or reserved+row-filled), then close.

    Reference analog: ``OnDiskGraphIndexWriter`` (random-access, incremental)
    + ``OnDiskSequentialGraphIndexWriter`` (append-only) in one — appends are
    sequential, reserved extents are written positionally.
    """

    def __init__(self, path: str | os.PathLike, version: int | None = None):
        self.path = str(path)
        # a file stamps the MINIMUM version able to read it (reference
        # writer Builder.withVersion): plain layouts stay at 2 so older
        # readers keep working; the v3 paired-L0 layout stamps 3
        self.version = WRITE_VERSION_DEFAULT if version is None else version
        if not (1 <= self.version <= VERSION):
            raise ValueError(f"unsupported write version {version}")
        self._f = open(self.path, "wb+")
        self._f.write(MAGIC + struct.pack("<H", self.version))
        self._arrays: dict[str, _ArrayEntry] = {}
        self._meta: dict = {}
        self._closed = False

    def _align(self) -> int:
        pos = self._f.seek(0, os.SEEK_END)
        pad = (-pos) % _ALIGN
        if pad:
            self._f.write(b"\x00" * pad)
        return pos + pad

    def add_array(self, name: str, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        off = self._align()
        data = arr.tobytes()
        self._f.write(data)
        self._arrays[name] = _ArrayEntry(
            dtype=arr.dtype.str,
            shape=tuple(arr.shape),
            offset=off,
            nbytes=len(data),
            crc32=zlib.crc32(data) & 0xFFFFFFFF,
        )

    def reserve_array(self, name: str, shape: tuple[int, ...], dtype) -> None:
        """Reserve a zero-filled extent to be row-filled with :meth:`write_rows`."""
        dt = np.dtype(dtype)
        off = self._align()
        nbytes = int(np.prod(shape)) * dt.itemsize
        self._f.truncate(off + nbytes)
        self._f.seek(off + nbytes)
        self._arrays[name] = _ArrayEntry(
            dtype=dt.str, shape=tuple(shape), offset=off, nbytes=nbytes, crc32=None
        )

    def write_rows(self, name: str, start_row: int, rows: np.ndarray) -> None:
        """Positionally fill rows of a reserved array (the LTM inline path)."""
        e = self._arrays[name]
        dt = np.dtype(e.dtype)
        rows = np.ascontiguousarray(rows, dtype=dt)
        row_elems = int(np.prod(e.shape[1:])) if len(e.shape) > 1 else 1
        assert rows.shape[1:] == e.shape[1:], f"row shape mismatch for {name}"
        end = self._f.tell()
        self._f.seek(e.offset + start_row * row_elems * dt.itemsize)
        self._f.write(rows.tobytes())
        self._f.seek(max(end, self._f.tell()))

    def set_meta(self, **kv) -> None:
        self._meta.update(kv)

    def state_dict(self) -> dict:
        """JSON-able snapshot of the writer (for build checkpoint/resume).

        Captures the arrays written/reserved so far, pending metadata and the
        current file size, so an interrupted incremental build (the LTM wave
        loop) can :meth:`resume` the same file after a crash.  Analogous to
        the reference's durable incremental-write contract
        (``RandomAccessOnDiskGraphIndexWriter`` positional writes + the
        footer-last commit discipline).
        """
        self._f.flush()
        os.fsync(self._f.fileno())
        return {
            "arrays": {k: dataclasses.asdict(v) for k, v in self._arrays.items()},
            "meta": dict(self._meta),
            "file_size": self._f.seek(0, os.SEEK_END),
        }

    @classmethod
    def resume(cls, path: str | os.PathLike, state: dict) -> "IndexFileWriter":
        """Reopen a partially written (footer-less) file from :meth:`state_dict`.

        Truncates past ``file_size`` — bytes appended after the snapshot
        (e.g. a crash mid-save) are discarded; positional row writes inside
        reserved extents are idempotent and need no rollback.  A file that
        SHRANK below the snapshot size is rejected (zero-extending it would
        silently blank committed rows), as is a missing file.
        """
        if not os.path.exists(path):
            raise ValueError(f"{path}: missing (cannot resume a deleted file)")
        if os.path.getsize(path) < state["file_size"]:
            raise ValueError(
                f"{path}: shorter than the snapshot "
                f"({os.path.getsize(path)} < {state['file_size']} bytes); "
                "refusing to zero-extend"
            )
        w = cls.__new__(cls)
        w.path = str(path)
        w._f = open(w.path, "rb+")
        if w._f.read(6) != MAGIC:
            w._f.close()
            raise ValueError(f"{path}: bad magic (not a jvtpu file)")
        w.version = struct.unpack("<H", w._f.read(2))[0]
        w._f.truncate(state["file_size"])
        w._f.seek(0, os.SEEK_END)
        w._arrays = {
            k: _ArrayEntry(
                dtype=v["dtype"],
                shape=tuple(v["shape"]),
                offset=v["offset"],
                nbytes=v["nbytes"],
                crc32=v["crc32"],
            )
            for k, v in state["arrays"].items()
        }
        w._meta = dict(state["meta"])
        w._closed = False
        return w

    def close(self) -> None:
        if self._closed:
            return
        header = {
            "version": self.version,
            "meta": self._meta,
            "arrays": {
                k: dataclasses.asdict(v) for k, v in self._arrays.items()
            },
        }
        hoff = self._align()
        hbytes = json.dumps(header).encode()
        self._f.write(hbytes)
        self._f.write(struct.pack("<QI", hoff, len(hbytes)))
        self._f.write(FOOTER_MAGIC)
        self._f.flush()
        os.fsync(self._f.fileno())
        self._f.close()
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class IndexFileReader:
    """Memmap-backed reader (reference ``ReaderSupplier`` + mmap chain)."""

    def __init__(self, path: str | os.PathLike):
        self.path = str(path)
        size = os.path.getsize(self.path)
        with open(self.path, "rb") as f:
            head = f.read(8)
            if head[:6] != MAGIC:
                raise ValueError(f"{path}: bad magic")
            self.version = struct.unpack("<H", head[6:8])[0]
            if self.version > VERSION:
                raise ValueError(f"{path}: unsupported version {self.version}")
            f.seek(size - 16)
            tail = f.read(16)
            if tail[12:] != FOOTER_MAGIC:
                raise ValueError(f"{path}: bad footer (truncated file?)")
            hoff, hlen = struct.unpack("<QI", tail[:12])
            f.seek(hoff)
            header = json.loads(f.read(hlen))
        self.meta: dict = header["meta"]
        self._arrays = {
            k: _ArrayEntry(
                dtype=v["dtype"],
                shape=tuple(v["shape"]),
                offset=v["offset"],
                nbytes=v["nbytes"],
                crc32=v["crc32"],
            )
            for k, v in header["arrays"].items()
        }

    def array_names(self) -> list[str]:
        return list(self._arrays)

    def has_array(self, name: str) -> bool:
        return name in self._arrays

    def read(self, name: str, mmap: bool = True, verify: bool = False) -> np.ndarray:
        e = self._arrays[name]
        if mmap and not verify:
            return np.memmap(
                self.path, dtype=np.dtype(e.dtype), mode="r", offset=e.offset,
                shape=e.shape,
            )
        if verify and e.crc32 is not None:
            from jvector_tpu.util.native import crc32_file

            got = crc32_file(self.path, e.offset, e.nbytes)
            if got != e.crc32:
                raise ValueError(f"{self.path}:{name}: CRC mismatch")
        with open(self.path, "rb") as f:
            f.seek(e.offset)
            data = f.read(e.nbytes)
        return np.frombuffer(data, dtype=np.dtype(e.dtype)).reshape(e.shape)


# ---------------------------------------------------------------------------
# Graph-level save / load
# ---------------------------------------------------------------------------


def unpack_paired_neighbors(paired: np.ndarray, n_cap: int, r: int) -> np.ndarray:
    """v3 paired ``[N/2, 2*Rp]`` blob -> plain ``[N_cap, R]`` (host)."""
    n2, lanes = paired.shape
    rp = lanes // 2
    return np.ascontiguousarray(
        np.asarray(paired).reshape(n2 * 2, rp)[:n_cap, :r]
    )


def _read_l0_neighbors(reader: "IndexFileReader", mmap: bool = False) -> np.ndarray:
    """Version-dispatching L0 adjacency read (plain [N, R] either way).

    The v3 paired layout is the rehearsed breaking change (see the version
    history): v1/v2 files carry ``graph/L0/neighbors``; v3 files MAY carry
    only ``graph/L0/neighbors_paired``.  ``mmap=True`` keeps the zero-copy
    memmap for plain files (paired files must unpack, so they materialize).
    """
    if reader.has_array("graph/L0/neighbors"):
        out = reader.read("graph/L0/neighbors", mmap=mmap)
        return out if mmap else np.asarray(out)
    if reader.meta.get("l0_layout") == "paired":
        paired = reader.read("graph/L0/neighbors_paired")
        n_cap = reader.read("graph/L0/counts").shape[0]
        return unpack_paired_neighbors(
            paired, n_cap, reader.meta["l0_row_cap"]
        )
    raise ValueError(f"{reader.path}: no L0 adjacency array")


@dataclasses.dataclass
class OnDiskIndex:
    """A loaded index: graph arrays + feature arrays + metadata.

    ``to_device()`` uploads the searchable pieces and returns
    ``(GraphIndex, features-on-device)``.
    """

    reader: IndexFileReader

    @property
    def meta(self) -> dict:
        return self.reader.meta

    @property
    def features(self) -> list[str]:
        return self.meta.get("features", [])

    def graph_to_device(self):
        """Upload ONLY the graph arrays (no features) — segment-lifecycle
        consumers (compaction sources) keep the big feature payloads on
        host and stream them."""
        import jax.numpy as jnp

        from jvector_tpu.graph.index import NEG_INF, GraphIndex, GraphLayer

        r = self.reader
        levels = self.meta["num_levels"]
        layers = []
        level_ids = []
        for l in range(levels):
            if l == 0:
                nbrs = jnp.asarray(_read_l0_neighbors(r))
            else:
                nbrs = jnp.asarray(np.asarray(r.read(f"graph/L{l}/neighbors")))
            counts = jnp.asarray(np.asarray(r.read(f"graph/L{l}/counts")))
            name = f"graph/L{l}/scores"
            if r.has_array(name):
                scores = jnp.asarray(np.asarray(r.read(name)))
            else:
                scores = jnp.where(nbrs >= 0, 0.0, NEG_INF)
            layers.append(GraphLayer(neighbors=nbrs, scores=scores, counts=counts))
            if l >= 1:
                level_ids.append(
                    jnp.asarray(np.asarray(r.read(f"graph/L{l}/node_ids")))
                )
        n_cap = layers[0].neighbors.shape[0]
        if r.has_array("graph/deleted"):
            deleted = jnp.asarray(np.asarray(r.read("graph/deleted")))
        else:
            deleted = jnp.zeros((n_cap,), bool)
        return GraphIndex(
            layers=tuple(layers),
            level_node_ids=tuple(level_ids),
            entry_node=jnp.int32(self.meta["entry_node"]),
            num_nodes=jnp.int32(self.meta["num_nodes"]),
            deleted=deleted,
        )

    def to_device(self):
        import jax.numpy as jnp

        graph = self.graph_to_device()
        r = self.reader
        feats = {}
        for name in self.features:
            feats[name] = {
                key.split("/", 2)[2]: jnp.asarray(np.asarray(r.read(key)))
                for key in r.array_names()
                if key.startswith(f"feature/{name}/")
            }
        return graph, feats


def sequential_renumbering(graph) -> "np.ndarray | None":
    """Old->new ordinal map that compacts deleted holes (reference
    ``AbstractGraphIndexWriter.sequentialRenumbering:146-159`` /
    ``OrdinalMapper.MapMapper``).  Returns None when there are no holes."""
    deleted = np.asarray(graph.deleted)
    n = int(graph.num_nodes)
    live = ~deleted[:n]
    if live.all():
        return None
    mapper = np.full(deleted.shape[0], -1, np.int32)
    mapper[:n][live] = np.arange(int(live.sum()), dtype=np.int32)
    return mapper


def _remap_layer(neighbors, scores, counts, mapper, row_select):
    """Gather live rows and remap their edge ids through ``mapper``."""
    nbrs = neighbors[row_select]
    sc = scores[row_select]
    cnt = counts[row_select]
    remapped = np.where(nbrs >= 0, mapper[np.maximum(nbrs, 0)], -1)
    # dropped (deleted) neighbors lose their slot; compact each row
    out_n = np.full_like(remapped, -1)
    out_s = np.full_like(sc, -np.inf)
    out_c = np.zeros_like(cnt)
    for i in range(remapped.shape[0]):
        keep = remapped[i] >= 0
        k = int(keep.sum())
        out_n[i, :k] = remapped[i][keep]
        out_s[i, :k] = sc[i][keep]
        out_c[i] = k
    return out_n, out_s, out_c


def write_index(
    path: str | os.PathLike,
    graph,
    features: dict[str, dict[str, np.ndarray]] | None = None,
    save_scores: bool = False,
    renumber: bool = True,
    paired_adjacency: bool = False,
    **meta,
) -> None:
    """Persist a :class:`GraphIndex` (+ feature arrays) to ``path``.

    ``features`` maps FeatureId -> {array name -> array}; e.g.
    ``{FeatureId.INLINE_VECTORS: {"vectors": base}}``.  Edge scores are
    dropped by default (the reference's on-disk graphs store only adjacency).

    When the graph has deleted holes and ``renumber`` is True, ordinals are
    compacted on save (reference ``sequentialRenumbering``): per-node feature
    arrays whose first dimension equals the graph capacity (or num_nodes)
    are re-gathered through the same mapper, and the mapper itself is stored
    as array ``"ordinal_mapper"`` (old -> new, -1 for dropped).

    ``paired_adjacency=True`` writes the v3 PAIRED L0 layout (see the
    version-history note): the blob uploads into the device tier with no
    host repack and the file stamps version 3 (v<=2 readers refuse it —
    the rehearsed breaking format bump).  Implies ``save_scores=False``.
    """
    features = features or {}
    mapper = sequential_renumbering(graph) if renumber else None
    if mapper is not None:
        if paired_adjacency:
            # silent fallback to the plain layout would hand the caller a
            # v2 file when they asked for the v3 device layout — refuse
            # loudly; compact the holes first, then save paired
            raise ValueError(
                "paired_adjacency=True is not supported for graphs with "
                "deleted holes (save-time renumbering): call remove_deleted "
                "+ save without holes, or pass renumber=False"
            )
        _write_index_renumbered(path, graph, features, save_scores, mapper, meta)
        return
    with IndexFileWriter(path, version=3 if paired_adjacency else None) as w:
        num_levels = graph.num_levels
        for l, layer in enumerate(graph.layers):
            if l == 0 and paired_adjacency:
                from jvector_tpu.disk.device_tier import (
                    pack_adjacency_pairs_host,
                )

                nbrs = np.asarray(layer.neighbors)
                r = nbrs.shape[1]
                r_pad = ((max(r, 1) + 63) // 64) * 64
                w.add_array(
                    "graph/L0/neighbors_paired",
                    pack_adjacency_pairs_host(nbrs, r_pad),
                )
                w.add_array("graph/L0/counts", np.asarray(layer.counts))
                w.set_meta(l0_layout="paired", l0_row_cap=r)
                continue
            w.add_array(f"graph/L{l}/neighbors", np.asarray(layer.neighbors))
            w.add_array(f"graph/L{l}/counts", np.asarray(layer.counts))
            if save_scores:
                w.add_array(f"graph/L{l}/scores", np.asarray(layer.scores))
            if l >= 1:
                w.add_array(
                    f"graph/L{l}/node_ids", np.asarray(graph.level_node_ids[l - 1])
                )
        for fname, arrays in features.items():
            for aname, arr in arrays.items():
                w.add_array(f"feature/{fname}/{aname}", np.asarray(arr))
        # renumber=False with holes: tombstones must survive the round-trip,
        # or deleted-but-still-linked nodes reappear in results after reload
        deleted = np.asarray(graph.deleted)
        if deleted.any():
            w.add_array("graph/deleted", deleted)
        w.set_meta(
            num_levels=num_levels,
            entry_node=int(graph.entry_node),
            num_nodes=int(graph.num_nodes),
            features=list(features),
            **meta,
        )


def _write_index_renumbered(path, graph, features, save_scores, mapper, meta):
    """Save with hole-compacting ordinal remap (the OrdinalMapper path)."""
    n = int(graph.num_nodes)
    deleted = np.asarray(graph.deleted)
    live_rows = np.where(~deleted[:n])[0]
    n_new = len(live_rows)

    with IndexFileWriter(path) as w:
        # base layer
        out_n, out_s, out_c = _remap_layer(
            np.asarray(graph.base.neighbors),
            np.asarray(graph.base.scores),
            np.asarray(graph.base.counts),
            mapper,
            live_rows,
        )
        w.add_array("graph/L0/neighbors", out_n)
        w.add_array("graph/L0/counts", out_c)
        if save_scores:
            w.add_array("graph/L0/scores", out_s.astype(np.float32))
        num_levels = 1
        for l in range(1, graph.num_levels):
            ids_l = np.asarray(graph.level_node_ids[l - 1])
            live_slots = np.where(mapper[ids_l] >= 0)[0]
            if len(live_slots) == 0:
                break
            # remap slot-space adjacency to the compacted slot space
            slot_map = np.full(len(ids_l), -1, np.int32)
            slot_map[live_slots] = np.arange(len(live_slots), dtype=np.int32)
            layer = graph.layers[l]
            ln, ls, lc = _remap_layer(
                np.asarray(layer.neighbors),
                np.asarray(layer.scores),
                np.asarray(layer.counts),
                slot_map,
                live_slots,
            )
            w.add_array(f"graph/L{num_levels}/neighbors", ln)
            w.add_array(f"graph/L{num_levels}/counts", lc)
            if save_scores:
                w.add_array(f"graph/L{num_levels}/scores", ls.astype(np.float32))
            w.add_array(
                f"graph/L{num_levels}/node_ids", mapper[ids_l[live_slots]]
            )
            num_levels += 1

        for fname, arrays in features.items():
            for aname, arr in arrays.items():
                arr = np.asarray(arr)
                if arr.ndim >= 1 and arr.shape[0] in (n, deleted.shape[0]):
                    arr = arr[live_rows]  # per-node payload follows the remap
                w.add_array(f"feature/{fname}/{aname}", arr)
        w.add_array("ordinal_mapper", mapper)

        entry = int(graph.entry_node)
        new_entry = int(mapper[entry]) if entry >= 0 and mapper[entry] >= 0 else 0
        w.set_meta(
            num_levels=num_levels,
            entry_node=new_entry,
            num_nodes=n_new,
            features=list(features),
            renumbered=True,
            **meta,
        )


def load_index(path: str | os.PathLike) -> OnDiskIndex:
    return OnDiskIndex(reader=IndexFileReader(path))
