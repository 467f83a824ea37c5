"""Memory accounting (reference ``Accountable`` / ``RamUsageEstimator``).

Every major structure reports its device-memory footprint in bytes; the
bench harness reports them like the reference's ``max_heap_mb`` metrics.
On TPU the interesting number is HBM residency, which for a pytree is just
the sum of array buffer sizes.
"""

from __future__ import annotations

import jax
import numpy as np


def bytes_used(tree) -> int:
    """Total buffer bytes of every array leaf in a pytree."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
        elif isinstance(leaf, (np.ndarray, np.generic)):
            total += int(leaf.nbytes)
    return total


def format_bytes(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if n < 1024 or unit == "TB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n}TB"


def graph_ram_report(graph, providers: dict | None = None) -> dict:
    """Accountable-style breakdown for an index + its score providers."""
    report = {"graph_bytes": bytes_used(graph)}
    for l, layer in enumerate(graph.layers):
        report[f"layer{l}_bytes"] = bytes_used(layer)
    for name, p in (providers or {}).items():
        report[f"{name}_bytes"] = bytes_used(p)
    report["total_bytes"] = report["graph_bytes"] + sum(
        v for k, v in report.items() if k.endswith("_bytes") and not k.startswith(("graph", "layer", "total"))
    )
    return report
