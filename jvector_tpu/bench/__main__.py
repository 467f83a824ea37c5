"""Bench CLI: grid-run YAML configs over catalog-selected datasets.

Reference entry point parity: ``Bench.java`` (jvector-examples) takes
dataset-name regexes plus a YAML parameter file and writes CSV/JSONL
reports.  Here::

    python -m jvector_tpu.bench 'synth.*' \
        --config yaml-configs/sq4.yml \
        --catalog yaml-configs/dataset-catalogs/local.yml \
        --output bench_results/

- positional args: regexes matched against catalog entry names
  (default ``.*`` = every entry, like the reference's no-arg run)
- ``--config``: reference-schema YAML (construction/search blocks); may be
  given multiple times — each config runs over each selected dataset
- ``--catalog``: dataset catalog YAML (named fvecs/hdf5/synthetic corpora);
  may be given multiple times
- ``--output``: directory for timestamped CSV + JSONL reports (one pair
  per dataset x config, with run metadata on every row)
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m jvector_tpu.bench", description=__doc__
    )
    p.add_argument("patterns", nargs="*", default=[], help="dataset regexes")
    p.add_argument("--config", action="append", default=[])
    p.add_argument("--catalog", action="append", default=[])
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    from jvector_tpu.bench.grid import run_yaml
    from jvector_tpu.util.catalog import Catalog

    def _default(*rel: str) -> str:
        """Resolve yaml-configs/ against cwd, then the repo checkout."""
        roots = [
            os.getcwd(),
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ]
        tried = [os.path.join(r, *rel) for r in roots]
        for p in tried:
            if os.path.exists(p):
                return p
        raise SystemExit(f"no default {'/'.join(rel)} found; tried {tried}")

    configs = args.config or [_default("yaml-configs", "default.yml")]
    catalogs = args.catalog or [
        _default("yaml-configs", "dataset-catalogs", "local.yml")
    ]
    patterns = args.patterns or [".*"]

    selected: list[tuple[str, Catalog]] = []
    for cpath in catalogs:
        cat = Catalog.load(cpath)
        names = sorted({n for pat in patterns for n in cat.select(pat)})
        selected.extend((n, cat) for n in names)
    if not selected:
        print(f"no datasets match {patterns} in {catalogs}", file=sys.stderr)
        return 2

    for name, cat in selected:
        ds = cat.open(name)
        for cfg in configs:
            print(f"=== {name} x {os.path.basename(cfg)} ===", flush=True)
            rows = run_yaml(cfg, ds, out_dir=args.output)
            for row in rows:
                print(row, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
