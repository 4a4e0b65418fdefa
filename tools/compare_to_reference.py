"""Compare one or more solo bench artifacts against ANY reference
series file — the dual-adjudication line of VERDICT r13 item 2 (the
bench's own sidecar always compares against the committed
docs/artifacts/bench_reference.json; this tool produces the second
line, e.g. against the pre-optimization reference extracted from git
history, so an epoch-flattered reference cannot masquerade as a win).

Usage:
    python tools/compare_to_reference.py REF.json RUN.json [RUN2.json ...]

Prints per-run and pooled fleet-median ratios over the common queries
(per-query median across runs when several are given).
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    ref_path, run_paths = sys.argv[1], sys.argv[2:]
    ref = json.load(open(ref_path))["queries"]
    runs = []
    for p in run_paths:
        with open(p) as fh:
            first = fh.readline()
        runs.append(json.loads(first)["queries"])

    pooled: dict[str, float] = {}
    for name in ref:
        vals = [r[name] for r in runs if name in r]
        if vals:
            pooled[name] = statistics.median(vals)

    for p, r in zip(run_paths, runs):
        ratios = sorted(
            r[n] / ref[n] for n in ref if n in r and ref[n] > 0
        )
        print(
            f"{p}: n={len(ratios)} fleet-median ratio "
            f"{ratios[len(ratios) // 2]:.3f}"
        )
    ratios = sorted(
        pooled[n] / ref[n] for n in pooled if ref[n] > 0
    )
    total = sum(pooled.values())
    ref_total = sum(ref[n] for n in pooled)
    print(
        f"POOLED vs {ref_path}: n={len(ratios)} fleet-median ratio "
        f"{ratios[len(ratios) // 2]:.3f}  total {total:.1f}s vs ref "
        f"{ref_total:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
