"""LTM build checkpoint/resume durability.

A multi-hour 10M stream build must survive process/device loss: the wave
loop periodically persists its full state to ``path + ".ckpt"`` and a
re-run of the same call resumes at the last checkpoint.  Resumed builds
must be BIT-IDENTICAL to uninterrupted ones (deterministic wave order +
checkpointed RNG) — that is the invariant these tests pin.

Reference durability analog: footer-last commit + atomic rename
(``OnDiskGraphIndexWriter`` / ``OnDiskGraphIndexCache``).
"""

import numpy as np
import pytest

import jvector_tpu.disk.ltm as ltm_mod
from jvector_tpu.disk.format import load_index
from jvector_tpu.disk.ltm import build_on_disk_ltm
from jvector_tpu.graph import GraphConfig


N, D = 1_600, 32


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    return rng.normal(size=(N, D)).astype(np.float32)


class _FailingLoader:
    """Chunk loader that dies after ``fail_after`` calls (simulated crash)."""

    def __init__(self, base, fail_after):
        self.base, self.calls, self.fail_after = base, 0, fail_after

    def __call__(self, a, b):
        self.calls += 1
        if self.calls > self.fail_after:
            raise RuntimeError("simulated crash (tunnel loss)")
        return self.base[a:b]


def _build(path, corpus, loader=None, **kw):
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)
    return build_on_disk_ltm(
        str(path),
        loader if loader is not None else corpus,
        n=N,
        dim=D,
        config=cfg,
        compression="sq4",
        checkpoint_every=2,
        **kw,
    )


@pytest.mark.parametrize("fused", [True, False], ids=["fused", "aug-backed"])
def test_resume_bit_identical(tmp_path, corpus, monkeypatch, fused):
    if not fused:  # force the big-corpus (aug-backed, no fused table) regime
        monkeypatch.setattr(ltm_mod, "_FUSED_BUILD_BUDGET", 0)

    ref, _ = _build(tmp_path / "clean.jvtpu", corpus)
    assert not (tmp_path / "clean.jvtpu.ckpt").exists()  # removed on commit

    # crash mid-build: the sample fit takes 1 load call, waves take 1 each;
    # die after ~4 waves (past the 2nd checkpoint at wave 4)
    p = tmp_path / "crashy.jvtpu"
    with pytest.raises(RuntimeError, match="simulated crash"):
        _build(p, corpus, loader=_FailingLoader(corpus, fail_after=5))
    assert (tmp_path / "crashy.jvtpu.ckpt").exists()

    resumed, _ = _build(p, corpus)  # same call again -> resumes
    assert not (tmp_path / "crashy.jvtpu.ckpt").exists()

    np.testing.assert_array_equal(
        np.asarray(resumed.base.neighbors), np.asarray(ref.base.neighbors)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.base.counts), np.asarray(ref.base.counts)
    )
    assert int(resumed.entry_node) == int(ref.entry_node)

    # the committed container round-trips, and every inline vector row is
    # present and exact (positional writes across the crash/resume seam)
    idx = load_index(str(p))
    vecs = idx.reader.read("feature/inline_vectors/vectors", mmap=False)
    np.testing.assert_array_equal(vecs, corpus)


def test_resume_bit_identical_pq(tmp_path, corpus):
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=256)

    def build(p, loader=None):
        return build_on_disk_ltm(
            str(p), loader if loader is not None else corpus, n=N, dim=D,
            config=cfg, compression="pq", pq_m=8, checkpoint_every=2,
        )

    ref, _ = build(tmp_path / "clean.jvtpu")
    p = tmp_path / "crashy.jvtpu"
    with pytest.raises(RuntimeError, match="simulated crash"):
        build(p, loader=_FailingLoader(corpus, fail_after=5))
    assert (tmp_path / "crashy.jvtpu.ckpt").exists()
    resumed, _ = build(p)
    assert not (tmp_path / "crashy.jvtpu.ckpt").exists()
    np.testing.assert_array_equal(
        np.asarray(resumed.base.neighbors), np.asarray(ref.base.neighbors)
    )
    idx = load_index(str(p))
    np.testing.assert_array_equal(
        idx.reader.read("feature/inline_vectors/vectors", mmap=False), corpus
    )


def test_stale_checkpoint_never_clobbers_committed_index(tmp_path, corpus):
    """A .ckpt left behind next to a COMMITTED index must be ignored —
    resuming over it would truncate a good index back to mid-build."""
    import shutil

    p = tmp_path / "x.jvtpu"
    with pytest.raises(RuntimeError):
        _build(p, corpus, loader=_FailingLoader(corpus, fail_after=5))
    stale = (p.parent / "stale.ckpt")
    shutil.copy(str(p) + ".ckpt", stale)

    _build(p, corpus)  # commits the index, removes its own ckpt
    committed = (tmp_path / "x.jvtpu").read_bytes()
    shutil.copy(stale, str(p) + ".ckpt")  # simulate the stale leftover

    graph, _ = _build(p, corpus)  # must REBUILD (ignore stale), not resume
    assert int(graph.num_nodes) == N
    idx = load_index(str(p))
    np.testing.assert_array_equal(
        idx.reader.read("feature/inline_vectors/vectors", mmap=False), corpus
    )
    assert (tmp_path / "x.jvtpu").read_bytes() == committed


def test_checkpoint_with_deleted_index_file_rebuilds(tmp_path, corpus):
    """Deleting the partial .jvtpu but not the .ckpt must rebuild cleanly."""
    p = tmp_path / "x.jvtpu"
    with pytest.raises(RuntimeError):
        _build(p, corpus, loader=_FailingLoader(corpus, fail_after=5))
    p.unlink()  # operator frees disk, misses the .ckpt
    graph, _ = _build(p, corpus)
    assert int(graph.num_nodes) == N
    np.testing.assert_array_equal(
        load_index(str(p)).reader.read("feature/inline_vectors/vectors", mmap=False),
        corpus,
    )


def test_changed_build_knobs_rebuild_not_splice(tmp_path, corpus):
    """Resuming under different build knobs (ef) would splice two
    differently-built halves; it must rebuild from scratch instead."""
    p = tmp_path / "x.jvtpu"
    with pytest.raises(RuntimeError):
        _build(p, corpus, loader=_FailingLoader(corpus, fail_after=5))
    cfg2 = GraphConfig(max_degree=16, ef_construction=80, wave_size=256)
    graph, _ = build_on_disk_ltm(
        str(p), corpus, n=N, dim=D, config=cfg2, compression="sq4",
        checkpoint_every=2,
    )
    # equal to a clean cfg2 build (proves no checkpointed waves were kept)
    ref, _ = build_on_disk_ltm(
        str(tmp_path / "ref.jvtpu"), corpus, n=N, dim=D, config=cfg2,
        compression="sq4", checkpoint_every=2,
    )
    np.testing.assert_array_equal(
        np.asarray(graph.base.neighbors), np.asarray(ref.base.neighbors)
    )


def test_mismatched_checkpoint_rebuilds(tmp_path, corpus):
    p = tmp_path / "x.jvtpu"
    with pytest.raises(RuntimeError):
        _build(p, corpus, loader=_FailingLoader(corpus, fail_after=4))
    # different build knobs -> the checkpoint must be ignored, not misapplied
    cfg = GraphConfig(max_degree=16, ef_construction=40, wave_size=128)
    graph, _ = build_on_disk_ltm(
        str(p), corpus, n=N, dim=D, config=cfg, compression="sq4",
        checkpoint_every=3,
    )
    assert int(graph.num_nodes) == N
    idx = load_index(str(p))
    vecs = idx.reader.read("feature/inline_vectors/vectors", mmap=False)
    np.testing.assert_array_equal(vecs, corpus)
