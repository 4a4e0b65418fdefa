"""Corpus version diffing: status classification and edge cases."""

from __future__ import annotations

from prioritizing_event_processing_with_apache_kafka_spark.operators.diffing import (
    corpus_diff,
    corpus_diff_summary,
)


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "charlie"), (4, "delta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo EDITED"), (4, "delta"), (5, "echo")],
        "doc_id long, text string",
    )
    return old, new


def test_statuses(spark):
    old, new = _frames(spark)
    got = {
        r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",
        5: "added",
    }


def test_summary_counts(spark):
    old, new = _frames(spark)
    got = {
        r["status"]: r["n_docs"]
        for r in corpus_diff_summary(old, new).collect()
    }
    assert got == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_identical_versions_all_unchanged(spark):
    old, _ = _frames(spark)
    got = {
        r["status"]: r["n_docs"]
        for r in corpus_diff_summary(old, old).collect()
    }
    assert got == {"unchanged": 4}


def test_empty_old_all_added(spark):
    old, new = _frames(spark)
    got = {
        r["status"]: r["n_docs"]
        for r in corpus_diff_summary(old.limit(0), new).collect()
    }
    assert got == {"added": 4}
