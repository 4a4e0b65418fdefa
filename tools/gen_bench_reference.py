"""Regenerate docs/artifacts/bench_reference.json from a solo bench
artifact — the committed reference series bench.py self-adjudicates
against (VERDICT r10 item 1). Run as part of the closing-state
discipline after the round's solo bench:

    python tools/gen_bench_reference.py bench_r11_solo.json r11_solo
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    src_path, round_name = sys.argv[1], sys.argv[2]
    src = json.load(open(src_path))
    if "queries" not in src or "sf" not in src:
        print(f"{src_path} is not a bench artifact", file=sys.stderr)
        return 2
    ref = {
        "round": round_name,
        "sf": src["sf"],
        "stat": src.get("stat", "median_of_3"),
        "note": (
            "Committed reference series for bench.py's self-adjudication "
            "(VERDICT r10 item 1): per-query medians from the named solo "
            "bench. Regenerated each round from that round's solo run as "
            "the last act (tools/gen_bench_reference.py)."
        ),
        "queries": src["queries"],
    }
    out = os.path.join(REPO, "docs", "artifacts", "bench_reference.json")
    json.dump(ref, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(ref['queries'])} queries from {round_name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
