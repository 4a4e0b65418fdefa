"""Regenerate the committed CORRECTNESS_full.json artifact.

Runs the full oracle harness (tools/check_oracle.py) at sf0.01 and
sf0.1 in separate subprocesses (one fresh Spark session each) and
merges the per-query records into one JSON file keyed by scale factor.
Exits non-zero if either run has a failure — wire this into any
pre-commit/CI flow to catch a broken query the moment it breaks.

Usage:  python tools/gen_correctness_full.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def code_fingerprint() -> str:
    """sha256 over every file that defines query semantics — the
    package sources, the driver contract, and the checker itself.

    The round-6 lesson: the committed artifact predated three later
    commits, so it was not evidence about HEAD, and nothing could
    tell. A raw git SHA can't be asserted in a test (regenerating as
    part of the final commit would always stamp the PREVIOUS commit's
    SHA), so the staleness contract is content-addressed instead:
    tests/test_driver_contract.py recomputes this fingerprint and
    fails whenever query-defining code changed after the artifact was
    generated — i.e. exactly when the artifact stopped being evidence.
    """
    import glob as _glob
    import hashlib

    h = hashlib.sha256()
    files = sorted(
        _glob.glob(
            os.path.join(
                REPO,
                "prioritizing_event_processing_with_apache_kafka_spark",
                "**",
                "*.py",
            ),
            recursive=True,
        )
    ) + [
        os.path.join(REPO, "__spark_entry__.py"),
        os.path.join(REPO, "tools", "check_oracle.py"),
    ]
    for path in files:
        h.update(os.path.relpath(path, REPO).encode())
        with open(path, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def git_head() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=REPO,
                capture_output=True,
                text=True,
                check=True,
            ).stdout.strip()
        )
    except Exception:  # noqa: BLE001 — best-effort provenance note
        return "unknown"


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "CORRECTNESS_full.json")
    merged: dict[str, dict] = {}
    rc = 0
    for sf_dir in SF_DIRS:
        sf = "sf" + sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tmp:
            tmp_path = tmp.name
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "check_oracle.py"),
                "--json",
                tmp_path,
                sf_dir,
            ],
            cwd=REPO,
        )
        rc = rc or proc.returncode
        with open(tmp_path) as fh:
            merged[sf] = json.load(fh)
        os.unlink(tmp_path)
        merged[sf]["meta"]["git_head_at_generation"] = git_head()
        merged[sf]["meta"]["code_fingerprint"] = code_fingerprint()
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1)
    counts = {
        sf: {
            "green": sum(
                1
                for r in payload["queries"].values()
                if r.get("hash_match") or r.get("self_audit") == "pass"
            ),
            "rows_only": sum(
                1 for r in payload["queries"].values() if r.get("err") == "no_oracle"
            ),
            "failed": sum(
                1
                for r in payload["queries"].values()
                if (r.get("err") not in (None, "no_oracle") or r.get("hash_match") is False)
                and r.get("self_audit") != "pass"
            ),
            "events_ts_physical": payload["meta"]["events_ts_physical"],
        }
        for sf, payload in merged.items()
    }
    print(json.dumps({"wrote": out_path, "summary": counts}))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
