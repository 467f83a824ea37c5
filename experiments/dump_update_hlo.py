"""Dump optimized HLO of the two build wave programs at a given scale.

Identifies unattributable trace ops (while loops, fusions) by name: compiles
``_wave_search`` and ``_wave_update_fused`` at the same shapes the build
uses and writes ``compiled.as_text()`` to files, then prints a summary of
every while loop (body instruction count + the biggest ops inside).

Usage: python experiments/dump_update_hlo.py [--n 1000000] [--wave 512]
NOTE: misses the persistent jit cache (explicit .lower().compile()); budget
the full remote compile time (~10-25 min per program at the 1M bucket).
"""

from __future__ import annotations

import argparse
import re
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--wave", type=int, default=512)
    p.add_argument("--expand", type=int, default=2)
    p.add_argument("--ef", type=int, default=100)
    p.add_argument("--out", default="/tmp/hlo")
    p.add_argument("--program", default="both", choices=["both", "search", "update"])
    args = p.parse_args()

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jvector_tpu.graph.builder import (
        GraphIndexBuilder,
        _fused_aligned_config,
        _wave_search,
        _wave_update_fused,
    )
    from jvector_tpu.graph.index import GraphConfig, bucket_capacity, empty_graph
    from jvector_tpu.graph.score import ExactScoreProvider
    from jvector_tpu.ops.similarity import SimilarityFunction

    os.makedirs(args.out, exist_ok=True)
    print(f"device={jax.devices()[0]}", flush=True)

    n, d = args.n, args.dim
    cfg = _fused_aligned_config(
        GraphConfig(
            max_degree=32,
            ef_construction=args.ef,
            wave_size=args.wave,
            build_expand=args.expand,
        ),
        (d + 1) // 2,
    )
    n_cap = bucket_capacity(n)
    rng = np.random.default_rng(0)
    vectors = jnp.asarray(rng.normal(size=(1024, d)).astype(np.float32))
    pv = jnp.zeros((n_cap, d), jnp.float32)
    exact = ExactScoreProvider(vectors=pv, sim=SimilarityFunction.EUCLIDEAN)
    builder = GraphIndexBuilder(cfg)
    bp = builder._sq4_build_provider(
        jnp.zeros((n, d), jnp.float32), n_cap, SimilarityFunction.EUCLIDEAN
    )
    import dataclasses

    mp = bp.codes_packed.shape[1]
    k_row = cfg.row_cap * mp
    fused_packed = jnp.zeros((n_cap, k_row // 128, 128), jnp.uint8)
    fused_w2 = jnp.zeros((n_cap, cfg.row_cap), jnp.float32)
    bpf = dataclasses.replace(bp, fused_packed=fused_packed, fused_w2=fused_w2)
    graph = empty_graph(n_cap, cfg)
    ids = jnp.arange(args.wave, dtype=jnp.int32)
    wv = jnp.zeros((args.wave, d), jnp.float32)
    beam_ids = jnp.zeros((args.wave, args.ef), jnp.int32)
    beam_scores = jnp.zeros((args.wave, args.ef), jnp.float32)

    def summarize(name: str, text: str) -> None:
        path = os.path.join(args.out, f"{name}.hlo.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"== {name}: {len(text) / 1e6:.1f} MB HLO -> {path}", flush=True)
        # while-loop bodies: name + instruction count + top shapes
        for m in re.finditer(r"^%?([\w.-]*body[\w.-]*) .*?\{$", text, re.M):
            body = text[m.start() :]
            end = body.find("\n}\n")
            body = body[: end if end > 0 else 5000]
            n_instr = body.count("\n  ")
            big = re.findall(r"(fusion[\w.]*|gather[\w.]*|scatter[\w.]*|sort[\w.]*|while[\w.]*)\s*=", body)
            print(
                f"  loop-body {m.group(1)}: {n_instr} instrs; "
                f"ops: {sorted(set(big))[:12]}",
                flush=True,
            )
        whiles = re.findall(r"= [\w\[\],{}() ]* while\(", text)
        print(f"  while ops: {len(whiles)}", flush=True)

    if args.program in ("both", "search"):
        t0 = time.time()
        lowered = jax.jit(
            _wave_search, static_argnames=("config",)
        ).lower(graph.base.neighbors, bpf, graph.entry_node, ids, wv, cfg)
        compiled = lowered.compile()
        print(f"search compile {time.time() - t0:.0f}s", flush=True)
        summarize("wave_search", compiled.as_text())

    if args.program in ("both", "update"):
        t0 = time.time()
        lowered = jax.jit(
            _wave_update_fused,
            static_argnames=("config",),
            donate_argnums=(0, 1, 2),
        ).lower(
            graph, fused_packed, fused_w2, exact, bp.codes_packed,
            bp.node_w2, ids, wv, beam_ids, beam_scores, cfg,
        )
        compiled = lowered.compile()
        print(f"update compile {time.time() - t0:.0f}s", flush=True)
        summarize("wave_update", compiled.as_text())


if __name__ == "__main__":
    main()
