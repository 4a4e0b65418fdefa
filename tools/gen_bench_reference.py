"""Regenerate docs/artifacts/bench_reference.json — the committed
reference series bench.py self-adjudicates against (VERDICT r10 item
1) — from MULTIPLE solo bench artifacts (VERDICT r11 item 1: the r11
reference came from ONE solo run and its stream_vocab_incremental
point was a lucky draw, producing a false plan_drift_suspected flag
on the official BENCH_r11; a per-query MEDIAN across >=3 independent
solo runs is robust to any single run's draw). Run as part of the
closing-state discipline after the round's solo benches:

    python tools/gen_bench_reference.py r12_solo run1.json run2.json run3.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_reference(round_name: str, artifacts: list[dict]) -> dict:
    """Per-query median across the given solo bench artifacts (every
    artifact must carry the same sf). Queries present in only SOME
    artifacts (headline-set growth mid-series) take the median of the
    runs that have them. The staged-replay ``setup_floor_sec`` is
    median'd the same way when present."""
    if not artifacts:
        raise ValueError("need at least one solo bench artifact")
    sfs = {a.get("sf") for a in artifacts}
    if len(sfs) != 1:
        raise ValueError(f"artifacts disagree on sf: {sorted(map(str, sfs))}")
    names: list[str] = []
    for a in artifacts:
        for n in a.get("queries", {}):
            if n not in names:
                names.append(n)
    queries = {
        n: round(
            statistics.median(
                a["queries"][n] for a in artifacts if n in a.get("queries", {})
            ),
            3,
        )
        for n in names
    }
    ref = {
        "round": round_name,
        "sf": artifacts[0]["sf"],
        "stat": f"per_query_median_of_{len(artifacts)}_solo_runs",
        "n_runs": len(artifacts),
        "note": (
            "Committed reference series for bench.py's self-adjudication "
            "(VERDICT r10 item 1). Per-query MEDIAN across the round's "
            "independent solo bench runs (VERDICT r11 item 1: a single-"
            "run reference point is one draw from a +/-30% distribution "
            "and produced a false plan_drift flag in BENCH_r11). "
            "Regenerated each round from >=3 solo runs as the last act "
            "(tools/gen_bench_reference.py)."
        ),
        "queries": queries,
    }
    # Explicit presence check, not truthiness: a measured floor of 0.0
    # is a legitimate value and must count toward the median (ADVICE
    # r12 — truthiness silently dropped it).
    floors = [
        a["setup_floor_sec"] for a in artifacts if "setup_floor_sec" in a
    ]
    if floors and len(floors) < len(artifacts):
        # Mixing pre-floor-era artifacts with floor-carrying ones would
        # silently median over a subset (possibly ONE run) — the exact
        # single-draw fragility this tool was rewritten to fix (ADVICE
        # r12). Warn like the <3-runs case.
        print(
            f"WARNING: only {len(floors)} of {len(artifacts)} artifacts "
            "carry setup_floor_sec; the floor median covers a subset of "
            "the runs",
            file=sys.stderr,
        )
    if floors:
        ref["setup_floor_sec"] = round(statistics.median(floors), 3)
    return ref


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    round_name = sys.argv[1]
    artifacts = []
    for p in sys.argv[2:]:
        a = json.load(open(p))
        if "queries" not in a or "sf" not in a:
            print(f"{p} is not a bench artifact", file=sys.stderr)
            return 2
        artifacts.append(a)
    if len(artifacts) < 3:
        print(
            f"WARNING: only {len(artifacts)} solo run(s) given; the "
            "reference is meant to be a median across >=3 (VERDICT r11 "
            "item 1)",
            file=sys.stderr,
        )
    ref = build_reference(round_name, artifacts)
    out = os.path.join(REPO, "docs", "artifacts", "bench_reference.json")
    json.dump(ref, open(out, "w"), indent=1)
    print(
        f"wrote {out}: {len(ref['queries'])} queries, "
        f"median of {ref['n_runs']} solo runs from {round_name}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
