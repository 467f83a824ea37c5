"""Persistent index format (TPU-native L5).

Reference: ``jv/graph/disk/`` — ``OnDiskGraphIndex`` (versioned format, MAGIC
+ footer-pointed header, inline/separated feature regions),
``OnDiskGraphIndexWriter`` hierarchy, ``Feature``/``FeatureId`` plug-ins,
``OnDiskGraphIndexCompactor``.

TPU redesign: records are not interleaved per node (pointer-chased via seek)
but stored as whole arrays — adjacency ``int32[N, R]``, features as named
array blobs — because device gathers want contiguous, uniformly-strided
layouts.  The fused layout (neighbor PQ codes alongside adjacency rows,
reference ``FusedPQ``) survives as its own array ``[N, R, M]``.  The file is
written arrays-first with a JSON header at the end and a footer pointing at
it (the reference's V5+ footer design), so writers can stream arrays without
knowing sizes up front and readers memmap lazily.
"""

from jvector_tpu.disk.format import (
    FeatureId,
    IndexFileReader,
    IndexFileWriter,
    load_index,
    write_index,
    OnDiskIndex,
)
from jvector_tpu.disk.compaction import (
    CompactionSource,
    compact_indexes,
    compact_on_disk,
)
from jvector_tpu.disk.device_tier import DeviceTierIndex
from jvector_tpu.disk.host_graph import HostGraphIndex, ShardedHostIndex
from jvector_tpu.disk.host_tier import HostVectorStore
from jvector_tpu.disk.ltm import build_on_disk_ltm

__all__ = [
    "DeviceTierIndex",
    "FeatureId",
    "IndexFileReader",
    "IndexFileWriter",
    "load_index",
    "write_index",
    "OnDiskIndex",
    "CompactionSource",
    "compact_indexes",
    "compact_on_disk",
    "HostGraphIndex",
    "ShardedHostIndex",
    "HostVectorStore",
    "build_on_disk_ltm",
]
