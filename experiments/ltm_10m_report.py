"""Summarize a ltm_10m_demo.py log into a BENCH-style JSON artifact.

Stage-attributed: build compute (wave loop), checkpoint tunnel time,
unpack round-trip, hierarchy, save, and the serve sweep rows.

Run: python experiments/ltm_10m_report.py /tmp/ltm10m_r4.log > bench_results/ltm_10m_r4.json
"""

from __future__ import annotations

import json
import re
import sys


def main(path: str) -> None:
    txt = open(path).read()

    def f(pat, cast=float):
        m = re.search(pat, txt)
        return cast(m.group(1)) if m else None

    waves = re.findall(r"ltm build wave (\d+)/(\d+) \((\d+\.\d+)s\)", txt)
    ckpts = re.findall(r"ltm checkpoint at wave (\d+)", txt)
    ckpt_waves = {int(c) for c in ckpts}
    # steady-state wave rate: median of inter-log deltas excluding
    # checkpoint-straddling gaps (a gap whose wave range contains a logged
    # checkpoint wave includes the ~minutes-long checkpoint download)
    deltas = []
    for (w0, _, t0), (w1, _, t1) in zip(waves, waves[1:]):
        dw, dt = int(w1) - int(w0), float(t1) - float(t0)
        straddles = any(int(w0) < c <= int(w1) for c in ckpt_waves)
        if dw > 0 and not straddles:
            deltas.append(dt / dw * 1000)
    deltas.sort()
    wave_ms = deltas[len(deltas) // 2] if deltas else None

    out = {
        "metric": "10M x 128d larger-than-memory pipeline (build + bounded-memory serve)",
        "n": 10_000_000,
        "dim": 128,
        "synth_seconds": f(r"synth (\d+\.\d+)s"),
        "gt_seconds": f(r"gt (\d+\.\d+)s"),
        "waves_done_seconds": f(r"ltm packed waves done \((\d+\.\d+)s\)"),
        "cleanup_done_seconds": f(r"ltm packed cleanup done \((\d+\.\d+)s\)"),
        "unpack_done_seconds": f(r"ltm build waves done \((\d+\.\d+)s\)"),
        "hierarchy": re.search(r"ltm hierarchy: .*", txt).group(0)
        if "ltm hierarchy" in txt else None,
        "build_total_seconds": f(r"LTM build 10M: (\d+\.\d+)s"),
        "index_gb": f(r"file=(\d+\.\d+) GB"),
        "steady_wave_ms": round(wave_ms, 1) if wave_ms else None,
        "n_checkpoints": len(ckpts),
        "levels": f(r"levels=(\d+)", int),
        "device_working_set_mb": f(r"device_ws=(\d+) MB", int),
        "host_bytes_gb": f(r"vs host (\d+\.\d+) GB"),
        "serve": [
            {
                "config": name.strip(),
                "seconds": float(s),
                "qps": float(q),
                "recall_at_10": float(r),
            }
            for name, s, q, r in re.findall(
                r"host-serve 512q (.+?): (\d+\.\d+)s \((\d+) QPS\) "
                r"recall@10=(\d+\.\d+)",
                txt,
            )
        ],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ltm10m_r4.log")
