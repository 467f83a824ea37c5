"""Standalone compressor serialization + the compressor cache.

Reference: ``ProductQuantization.write/load`` versions PQ codebooks
independently of any index (``ProductQuantization.java:560-693``), and
``Grid.java``'s pqCacheDir caches trained compressors across bench rows
with atomic commit.  Here every trained compressor (PQ / SQ4 / BQ / NVQ)
round-trips through the same container format the indexes use
(``disk/format.py``: magic + version + CRC32 per blob + footer-last), and
:class:`CompressorCache` provides the keyed cache with atomic rename.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np

_KIND_KEY = "compressor_kind"


def save_compressor(path: str | os.PathLike, comp) -> None:
    """Persist a trained compressor to ``path`` (container format)."""
    from jvector_tpu.disk.format import IndexFileWriter
    from jvector_tpu.quantization.bq import BinaryQuantization
    from jvector_tpu.quantization.nvq import NVQuantization
    from jvector_tpu.quantization.pq import ProductQuantization
    from jvector_tpu.quantization.sq import ScalarQuantization4

    with IndexFileWriter(path) as w:
        if isinstance(comp, ProductQuantization):
            w.add_array("codebooks", np.asarray(comp.codebooks))
            if comp.center is not None:
                w.add_array("center", np.asarray(comp.center))
            w.set_meta(
                **{_KIND_KEY: "pq"},
                original_dim=comp.original_dim,
                anisotropic_threshold=comp.anisotropic_threshold,
            )
        elif isinstance(comp, ScalarQuantization4):
            w.add_array("scale", np.asarray(comp.scale))
            w.add_array("offset", np.asarray(comp.offset))
            w.set_meta(**{_KIND_KEY: "sq4"}, original_dim=comp.original_dim)
        elif isinstance(comp, BinaryQuantization):
            w.add_array("center", np.asarray(comp.center))
            w.set_meta(**{_KIND_KEY: "bq"}, original_dim=comp.original_dim)
        elif isinstance(comp, NVQuantization):
            w.add_array("mean", np.asarray(comp.mean))
            w.set_meta(
                **{_KIND_KEY: "nvq"},
                original_dim=comp.original_dim,
                num_subvectors=comp.num_subvectors,
                bits=comp.bits,
            )
        else:
            raise TypeError(f"unknown compressor type {type(comp)!r}")


def load_compressor(path: str | os.PathLike):
    """Load any compressor saved by :func:`save_compressor`."""
    from jvector_tpu.disk.format import IndexFileReader
    from jvector_tpu.quantization.bq import BinaryQuantization
    from jvector_tpu.quantization.nvq import NVQuantization
    from jvector_tpu.quantization.pq import ProductQuantization
    from jvector_tpu.quantization.sq import ScalarQuantization4

    r = IndexFileReader(path)
    kind = r.meta.get(_KIND_KEY)
    if kind == "pq":
        return ProductQuantization(
            codebooks=jnp.asarray(np.asarray(r.read("codebooks"))),
            center=(
                jnp.asarray(np.asarray(r.read("center")))
                if r.has_array("center")
                else None
            ),
            original_dim=int(r.meta["original_dim"]),
            anisotropic_threshold=float(r.meta["anisotropic_threshold"]),
        )
    if kind == "sq4":
        return ScalarQuantization4(
            scale=jnp.asarray(np.asarray(r.read("scale"))),
            offset=jnp.asarray(np.asarray(r.read("offset"))),
            original_dim=int(r.meta["original_dim"]),
        )
    if kind == "bq":
        return BinaryQuantization(
            center=jnp.asarray(np.asarray(r.read("center"))),
            original_dim=int(r.meta["original_dim"]),
        )
    if kind == "nvq":
        return NVQuantization(
            mean=jnp.asarray(np.asarray(r.read("mean"))),
            original_dim=int(r.meta["original_dim"]),
            num_subvectors=int(r.meta["num_subvectors"]),
            bits=int(r.meta["bits"]),
        )
    raise ValueError(f"not a compressor file (kind={kind!r}): {path}")


class CompressorCache:
    """Keyed on-disk cache of trained compressors (Grid pqCacheDir analog).

    Keys are hashes of (dataset identity, compressor config); writes are
    atomic (tmp file + ``os.replace``) so concurrent grid rows can share a
    directory, matching ``Grid.java``'s cache commit discipline.
    """

    def __init__(self, directory: str | os.PathLike):
        self.directory = os.fspath(directory)
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, key: dict) -> str:
        blob = json.dumps(key, sort_keys=True, default=str).encode()
        h = hashlib.sha256(blob).hexdigest()[:24]
        return os.path.join(self.directory, f"compressor-{h}.jvtpu")

    def get_or_train(self, key: dict, train):
        """Return the cached compressor for ``key`` or train+commit one.

        ``train`` is a zero-arg callable returning the compressor.
        """
        path = self._path(key)
        if os.path.exists(path):
            return load_compressor(path)
        comp = train()
        tmp = f"{path}.tmp.{os.getpid()}"
        save_compressor(tmp, comp)
        os.replace(tmp, path)
        return comp
