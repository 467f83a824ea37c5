"""Trace hierarchical vs flat host-tier serving (VERDICT r4 item 5).

The r4 10M run measured hier host serving 6.6x slower than flat at the
same E (77.2 s vs 11.7 s per 512 queries).  This script re-serves the same
index with per-phase attribution — descent (compile vs warm), host-loop
iteration count, per-iteration wall — for hier and flat, warm and cold,
so the committed decision record rests on numbers instead of guesses.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/host_hier_trace.py --index /tmp/ltm_10m_sq4.jvtpu
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", default="/tmp/ltm_10m_sq4.jvtpu")
    p.add_argument("--queries", default="/tmp/synth10m_queries.npy")
    p.add_argument("--gt", default="/tmp/synth10m_gt.npy")
    p.add_argument("--beam", type=int, default=64)
    p.add_argument("--expand", type=int, default=4)
    p.add_argument("--pipeline", type=int, default=2)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from jvector_tpu.disk.host_graph import HostGraphIndex
    from jvector_tpu.util.datasets import recall_at_k

    print(f"device={jax.devices()[0]}", flush=True)
    queries = jnp.asarray(np.load(args.queries).astype(np.float32))
    gt = np.load(args.gt)

    h = HostGraphIndex.load(args.index)
    print(f"levels={len(h.upper_node_ids) + 1}", flush=True)

    # instrument the descent and the host loop
    import jvector_tpu.disk.host_graph as hg

    stats = {}
    orig_descend = HostGraphIndex._descend

    def timed_descend(self, scorer, q, hb):
        t0 = time.time()
        out = orig_descend(self, scorer, q, hb)
        stats["descend_s"] = round(time.time() - t0, 2)
        return out

    HostGraphIndex._descend = timed_descend

    rows = []

    def serve(name, use_hier):
        saved = h.upper_node_ids
        if not use_hier:
            h.upper_node_ids = []
        try:
            for attempt in ("cold", "warm"):
                stats.clear()
                t0 = time.time()
                res = h.search(
                    queries, top_k=10, beam_width=args.beam,
                    expand=args.expand, pipeline=args.pipeline,
                )
                wall = time.time() - t0
                ex = np.asarray(res.expanded_count)
                rec = recall_at_k(np.asarray(res.ids), gt, 10)
                row = {
                    "config": name, "attempt": attempt,
                    "wall_s": round(wall, 1),
                    "descend_s": stats.get("descend_s", 0.0),
                    "loop_s": round(wall - stats.get("descend_s", 0.0), 1),
                    "recall_at_10": round(float(rec), 4),
                    "pops_mean": round(float(ex.mean()), 1),
                    "pops_max": int(ex.max()),
                    "host_iters_est": int(ex.max() / args.expand + 1),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
        finally:
            h.upper_node_ids = saved

    serve("hier", True)
    serve("flat", False)
    out = {
        "metric": "host-tier hier vs flat serve trace (10M)",
        "beam": args.beam, "expand": args.expand,
        "pipeline": args.pipeline, "rows": rows,
    }
    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
