"""Driver-contract invariants: the rotation must never break the
queries()/oracle_sql() surface the per-round gate consumes."""

from __future__ import annotations

import __spark_entry__ as entry


def test_driver_head_names_exist():
    qs = entry.queries()
    missing = [n for n in entry._DRIVER_HEAD if n not in qs]
    assert not missing, f"_DRIVER_HEAD typos (not in queries()): {missing}"


def test_rotation_preserves_the_full_surface():
    qs = entry.queries()
    assert len(qs) >= 131
    # a duplicated name in _DRIVER_HEAD would silently shrink the
    # head-50 window's coverage (dicts dedupe, so check the LIST)
    assert len(entry._DRIVER_HEAD) == len(set(entry._DRIVER_HEAD))
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)


def test_head_50_is_oracle_backed_or_self_audited():
    # The gate's sample must be fully machine-checkable: every head-50
    # query needs a DuckDB oracle or a SELF_AUDITS entry (the latter
    # get a rows-only driver record but a hard local audit — used only
    # when a new audit query needs its declaration draw).
    from tools.check_oracle import SELF_AUDITS

    qs = list(entry.queries())[:50]
    oracles = entry.oracle_sql()
    missing = [n for n in qs if n not in oracles and n not in SELF_AUDITS]
    assert not missing, f"head-50 queries with no oracle/self-audit: {missing}"


def test_correctness_full_artifact_is_not_stale():
    """The committed CORRECTNESS_full.json must be generated from the
    code it sits next to. The artifact stamps a content fingerprint of
    every query-defining file at generation time; if this fails, run
    ``python tools/gen_correctness_full.py`` as the LAST act before
    committing (round-6 lesson: a stale artifact is not evidence)."""
    import json
    import os

    from tools.gen_correctness_full import code_fingerprint

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_full.json")
    artifact = json.load(open(path))
    current = code_fingerprint()
    for sf, payload in artifact.items():
        stamped = payload["meta"].get("code_fingerprint")
        assert stamped == current, (
            f"CORRECTNESS_full.json[{sf}] was generated from different "
            "query-defining code than this tree — regenerate it "
            "(python tools/gen_correctness_full.py) as the last act of "
            "the round"
        )


def test_pinned_core_leads_every_round():
    core = [
        "route_events_exact",
        "route_distribution",
        "bucket_extract",
        "layout_golden",
        "starved_discard_audit",
        "assignment_golden",
        "bucket_allocation_vs_load",
    ]
    assert list(entry.queries())[: len(core)] == core
