"""Misra-Gries heavy hitters: exactness, bounds, merge correctness,
partitioning invariance, and the decrement path the fixtures never
exercise (their key spaces are smaller than any sane capacity)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.heavyhitters import (
    heavy_hitters_audit,
    heavy_hitters_topk,
    misra_gries_partial,
)


def _zipf_df(spark, n_rows=20_000, n_keys=2_000, seed=7, parts=8):
    """Skewed key stream: key i drawn with weight ~ 1/(i+1)."""
    rng = random.Random(seed)
    weights = [1.0 / (i + 1) for i in range(n_keys)]
    keys = rng.choices(range(n_keys), weights=weights, k=n_rows)
    return spark.createDataFrame(
        [(k,) for k in keys], "key long"
    ).repartition(parts)


def _exact_topk(df, k):
    return [
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
        .collect()
    ]


def test_topk_matches_exact_on_zipf_with_decrements(spark):
    df = _zipf_df(spark)
    # capacity far below #distinct (2000) forces the decrement path
    got = [
        (r["key"], r["n_rows"])
        for r in heavy_hitters_topk(df, "key", k=10, capacity=64).collect()
    ]
    audit = heavy_hitters_audit(df, "key", k=10, capacity=64).collect()[0]
    assert audit["err_bound"] > 0, "capacity 64 << 2000 keys must decrement"
    assert audit["guaranteed"], (
        "Zipf head must clear the bound; got kth_count="
        f"{audit['kth_count']} err_bound={audit['err_bound']}"
    )
    assert got == _exact_topk(df, 10)


def test_audit_guarantee_is_honest_on_uniform_keys(spark):
    # Uniform keys with a tiny capacity: the bound must NOT claim a
    # guarantee (kth frequency ~ n/#keys is below the decrement total).
    df = spark.range(10_000).select(
        (F.col("id") % 1000).alias("key")
    ).repartition(4)
    audit = heavy_hitters_audit(df, "key", k=10, capacity=16).collect()[0]
    assert audit["err_bound"] > 0
    assert not audit["guaranteed"]


def test_exact_path_when_capacity_exceeds_distinct(spark):
    df = spark.range(5_000).select((F.col("id") % 100).alias("key"))
    audit = heavy_hitters_audit(df, "key", k=5, capacity=256).collect()[0]
    assert audit["err_bound"] == 0
    assert audit["n_candidates"] == 100
    assert audit["guaranteed"]
    got = [
        (r["key"], r["n_rows"])
        for r in heavy_hitters_topk(df, "key", k=5, capacity=256).collect()
    ]
    assert got == _exact_topk(df, 5)


def test_partitioning_invariance_when_guaranteed(spark):
    base = _zipf_df(spark, parts=1)
    for parts in (1, 3, 16):
        df = base.repartition(parts)
        got = [
            (r["key"], r["n_rows"])
            for r in heavy_hitters_topk(df, "key", k=8, capacity=128).collect()
        ]
        assert got == _exact_topk(base, 8), f"parts={parts}"


def test_partial_summaries_respect_capacity_and_bound(spark):
    df = _zipf_df(spark, parts=6)
    parts = misra_gries_partial(df, "key", capacity=32).collect()
    by_pid: dict = {}
    for r in parts:
        by_pid.setdefault(r["mg_pid"], []).append(r)
    assert len(by_pid) <= 6
    total_rows = 0
    for rows in by_pid.values():
        markers = [r for r in rows if r["key"] is None]
        kept = [r for r in rows if r["key"] is not None]
        # exactly one NULL-key marker row carries the accounting
        assert len(markers) == 1 and markers[0]["mg_weight"] == 0
        assert len(kept) <= 32
        # per-partition invariant: offset and row count constant per pid
        assert len({r["mg_offset"] for r in rows}) == 1
        assert len({r["mg_rows"] for r in rows}) == 1
        total_rows += rows[0]["mg_rows"]
        # weights are positive lower bounds
        assert all(r["mg_weight"] >= 1 for r in kept)
        # classic MG invariant: every truncation event subtracts its
        # delta from >= capacity+1 keys, so kept weight plus
        # offset*(capacity+1) cannot exceed rows processed
        assert (
            sum(r["mg_weight"] for r in kept)
            + rows[0]["mg_offset"] * (32 + 1)
            <= rows[0]["mg_rows"]
        )
    assert total_rows == 20_000


def test_short_candidate_pool_not_guaranteed(spark):
    # k larger than the candidate pool under heavy decrements: the
    # audit must refuse the guarantee even if every candidate's exact
    # count clears the bound (the missing ranks may be non-candidates).
    df = _zipf_df(spark, n_rows=5_000, n_keys=3_000, parts=2)
    audit = heavy_hitters_audit(df, "key", k=200, capacity=8).collect()[0]
    assert audit["err_bound"] > 0
    assert audit["n_topk"] < 200
    assert not audit["guaranteed"]


def test_short_topk_guaranteed_when_summary_exact(spark):
    # fewer distinct keys than k, zero decrements: complete by
    # construction, the audit should say so
    df = spark.range(1_000).select((F.col("id") % 7).alias("key"))
    audit = heavy_hitters_audit(df, "key", k=50, capacity=64).collect()[0]
    assert audit["err_bound"] == 0
    assert audit["n_topk"] == 7
    assert audit["guaranteed"]


def test_null_keys_dropped(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (None,), (2,), (None,)], "key long"
    )
    got = heavy_hitters_topk(df, "key", k=5, capacity=8).collect()
    assert [(r["key"], r["n_rows"]) for r in got] == [(1, 2), (2, 1)]


def test_capacity_validation():
    with pytest.raises(ValueError):
        misra_gries_partial(None, "key", capacity=0)
