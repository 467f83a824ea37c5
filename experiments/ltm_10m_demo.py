"""10M SQ4-LTM demo: stream-build + bounded-memory host serving (VERDICT r3 #4).

10M x 128d: SQ4 working set ~640 MB on device during build; full-precision
vectors only ever visit HBM one wave at a time.  Serving: HostGraphIndex
(adjacency + fused codes memmapped on host, streamed per expansion) + host
full-precision rerank.  Writes ~43 GB to /tmp.
"""
import logging, os, time
import numpy as np

logging.basicConfig(level=logging.INFO)
# sitecustomize may have configured the root logger (basicConfig no-ops)
logging.getLogger().setLevel(logging.INFO)
import jax, jax.numpy as jnp
from jvector_tpu.disk.host_graph import HostGraphIndex
from jvector_tpu.disk.host_tier import HostVectorStore
from jvector_tpu.disk.ltm import build_on_disk_ltm
from jvector_tpu.graph import GraphConfig
from jvector_tpu.util.datasets import recall_at_k

N, D = 10_000_000, 128
t0 = time.time()
if os.path.exists("/tmp/synth10m_base.npy"):
    base_np = np.load("/tmp/synth10m_base.npy", mmap_mode="r")
    queries_np = np.load("/tmp/synth10m_queries.npy")
else:
    # inline corpus generation (synthetic_dataset computes its own full
    # ground truth, which at 10M is a redundant second device pass)
    rng = np.random.default_rng(5)
    ld = 32
    proj = rng.normal(size=(ld, D)).astype(np.float32)
    proj /= np.linalg.norm(proj, axis=1, keepdims=True)
    n_clusters = max(64, N // 500)
    centers_z = rng.normal(0.0, 1.0, size=(n_clusters, ld)).astype(np.float32)

    def sample(count):
        z = centers_z[rng.integers(0, n_clusters, size=count)] + rng.normal(
            0.0, 0.35, size=(count, ld)
        ).astype(np.float32)
        return (z @ proj + rng.normal(0.0, 0.03, size=(count, D))).astype(np.float32)

    base_np = sample(N)
    queries_np = sample(512)
    np.save("/tmp/synth10m_base.npy", base_np)
    np.save("/tmp/synth10m_queries.npy", queries_np)
queries = jnp.asarray(queries_np)
print(f"synth {time.time()-t0:.1f}s ({base_np.nbytes/1e9:.1f} GB host)", flush=True)

# exact GT by chunked brute force on device
t0 = time.time()
if os.path.exists("/tmp/synth10m_gt.npy"):
    gt = np.load("/tmp/synth10m_gt.npy")
else:
    CH, top = 125_000, 10
    gt_parts = []
    for a in range(0, N, CH):
        blk = jnp.asarray(np.asarray(base_np[a:a + CH]))
        d2 = jnp.sum(queries * queries, 1)[:, None] + jnp.sum(blk * blk, 1)[None, :] - 2 * queries @ blk.T
        vals, idx = jax.lax.top_k(-d2, top)
        gt_parts.append((np.asarray(-vals), np.asarray(idx) + a))
        del blk, d2, vals, idx
    allv = np.concatenate([p[0] for p in gt_parts], 1)
    alli = np.concatenate([p[1] for p in gt_parts], 1)
    order = np.argsort(allv, 1)[:, :10]
    gt = np.take_along_axis(alli, order, 1)
    np.save("/tmp/synth10m_gt.npy", gt)
print(f"gt {time.time()-t0:.1f}s", flush=True)

# LTM10M_PATH lets a rebuild target a fresh file (the default short-circuits
# to serve-only once a complete index exists at the path)
path = os.environ.get("LTM10M_PATH", "/tmp/ltm_10m_sq4.jvtpu")
# add_hierarchy: upper levels are built AFTER L0 from the sampled nodes'
# vectors (one source pass), so the SAME file serves both hierarchically
# and flat (strip upper levels) — the flat-vs-hierarchy decision record
# at 10M rides this run for free (VERDICT r3 #5).
cfg = GraphConfig(max_degree=32, ef_construction=100, add_hierarchy=True)


def _index_complete(p):
    try:
        from jvector_tpu.disk.format import IndexFileReader
        return IndexFileReader(p).meta.get("ltm", False)
    except Exception:
        return False


t0 = time.time()
if _index_complete(path):
    print("index already built; skipping to serve", flush=True)
else:
    # one mid-run checkpoint: each checkpoint downloads ~5.9 GB of device
    # state over the ~18 MB/s tunnel (7.5 min measured r4) while steady-state
    # waves run ~0.1 s, so frequent checkpoints would dominate the build; a
    # tunnel outage loses at most half the wave loop and resumes automatically
    build_on_disk_ltm(path, lambda a, b: base_np[a:b], n=N, dim=D,
                      config=cfg, compression="sq4", capacity=N,
                      checkpoint_every=9800)
    build_s = time.time() - t0
    print(f"LTM build 10M: {build_s:.1f}s  file={os.path.getsize(path)/1e9:.2f} GB",
          flush=True)

hg = HostGraphIndex.load(path)
import dataclasses as _dc
from jvector_tpu.disk.format import load_index
store = HostVectorStore.from_index_file(load_index(path).reader,
                                        "feature/inline_vectors/vectors", "euclidean")
budget = hg.hbm_bytes(n_queries=512, beam_width=48, expand=4)
host_bytes = hg.fused_packed.size + hg.neighbors.size * 4 + hg.fused_w2.size * 4 + base_np.nbytes
print(f"levels={1 + len(hg.upper_node_ids)} device_ws={budget/1e6:.0f} MB "
      f"vs host {host_bytes/1e9:.1f} GB", flush=True)
# flat serving = the SAME index with upper levels stripped (identical L0):
# the 10M flat-vs-hierarchy decision record, plus pipeline and E sweeps
hg_flat = _dc.replace(hg, upper_neighbors=(), upper_node_ids=())
runs = [
    ("hier  p2 E4", hg, dict(beam_width=48, expand=4, pipeline=2)),
    ("flat  p2 E4", hg_flat, dict(beam_width=48, expand=4, pipeline=2)),
    ("hier  p1 E4", hg, dict(beam_width=48, expand=4, pipeline=1)),
    ("hier  p2 E8", hg, dict(beam_width=48, expand=8, pipeline=2)),
]
for name, h, kw in runs:
    t0 = time.time()
    res = h.search(queries, top_k=10, rerank=store, **kw)
    dt = time.time() - t0
    r = recall_at_k(np.asarray(res.ids), gt, 10)
    print(f"host-serve 512q {name}: {dt:.1f}s ({512/dt:.0f} QPS) "
          f"recall@10={r:.4f}", flush=True)
