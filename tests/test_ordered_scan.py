"""Distributed global ordered scan (operators/ordered.py): the
two-pass range-partitioned rank/cumsum that replaces unpartitioned
``Window.orderBy`` in the Pareto/Gini census queries.

Guards three things: (1) bit-exact agreement with the naive
single-task semantics (rank, inclusive running sum, grand total) on
arbitrary data, including duplicates in the value column broken by a
unique tie-breaker; (2) the plan funnels NOTHING row-scaled through
one task — every window in the plan is partitioned by the range
partition id; (3) ordering direction (desc) works, since the ABC
census ranks by revenue descending.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.ordered import (
    global_ordered_scan,
)


def _reference(rows, key=lambda r: (r[1], r[0]), reverse=False):
    """(id, value) rows -> {id: (rank, cum, tot)} by sorted order."""
    srt = sorted(rows, key=key, reverse=reverse)
    tot = sum(v for _, v in rows)
    out = {}
    cum = 0
    for i, (rid, v) in enumerate(srt, start=1):
        cum += v
        out[rid] = (i, cum, tot)
    return out


class TestGlobalOrderedScan:
    def test_matches_reference_ascending(self, spark):
        rows = [(i, (i * 37) % 11) for i in range(100)]  # duplicate values
        df = spark.createDataFrame(rows, "id bigint, v bigint")
        got = global_ordered_scan(
            df,
            [F.col("v").asc(), F.col("id").asc()],
            "v",
            num_partitions=7,
        ).collect()
        want = _reference(rows, key=lambda r: (r[1], r[0]))
        assert len(got) == 100
        for r in got:
            rank, cum, tot = want[r.id]
            assert r["__gos_rank"] == rank
            assert int(r["__gos_cum"]) == cum
            assert int(r["__gos_tot"]) == tot

    def test_matches_reference_descending(self, spark):
        rows = [(i, ((i * 13) % 29) * 1_000_000_007) for i in range(64)]
        df = spark.createDataFrame(rows, "id bigint, v bigint")
        got = global_ordered_scan(
            df,
            [F.col("v").desc(), F.col("id").asc()],
            "v",
            rank_col="rnk",
            cum_col="cum",
            total_col="tot",
            num_partitions=5,
        ).collect()
        srt = sorted(rows, key=lambda r: (-r[1], r[0]))
        tot = sum(v for _, v in rows)
        want, cum = {}, 0
        for i, (rid, v) in enumerate(srt, start=1):
            cum += v
            want[rid] = (i, cum)
        for r in got:
            rank, c = want[r.id]
            assert (r.rnk, int(r.cum), int(r.tot)) == (rank, c, tot)

    def test_partition_count_invariance(self, spark):
        rows = [(i, (i * 7919) % 97) for i in range(60)]
        df = spark.createDataFrame(rows, "id bigint, v bigint")
        outs = []
        for parts in (1, 3, 13):
            got = global_ordered_scan(
                df,
                [F.col("v").asc(), F.col("id").asc()],
                "v",
                num_partitions=parts,
            ).collect()
            outs.append(
                sorted((r.id, r["__gos_rank"], int(r["__gos_cum"])) for r in got)
            )
        assert outs[0] == outs[1] == outs[2]

    def test_no_unpartitioned_window_in_plan(self, spark):
        df = spark.createDataFrame(
            [(i, i % 5) for i in range(20)], "id bigint, v bigint"
        )
        out = global_ordered_scan(
            df, [F.col("v").asc(), F.col("id").asc()], "v", num_partitions=4
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        win_lines = [
            ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
        ]
        assert win_lines, "expected a window in the plan"
        for ln in win_lines:
            assert "__gos_pid" in ln, f"unpartitioned window: {ln.strip()[:160]}"
        # The only legal SinglePartition exchange is the partial->final
        # scalar totals aggregate — never one feeding a Sort/Window.
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" in ln:
                above = "".join(lines[max(0, i - 3) : i])
                assert "Sort" not in above and "Window" not in above, (
                    "row-scaled funnel: Sort/Window fed by SinglePartition"
                )

    def test_decimal_lattice_survives_big_sums(self, spark):
        # int64-overflow regime: values near 2^62, 8 of them — the
        # running sum must ride decimal(38,0), not wrap.
        big = 4_611_686_018_427_387_904  # 2^62
        rows = [(i, big) for i in range(8)]
        df = spark.createDataFrame(rows, "id bigint, v bigint")
        got = global_ordered_scan(
            df, [F.col("id").asc()], "v", num_partitions=3
        ).orderBy("id").collect()
        assert int(got[-1]["__gos_cum"]) == big * 8
        assert int(got[-1]["__gos_tot"]) == big * 8
        assert isinstance(got[-1]["__gos_cum"], Decimal)

    def test_empty_frame(self, spark):
        df = spark.createDataFrame([], "id bigint, v bigint")
        got = global_ordered_scan(
            df, [F.col("v").asc(), F.col("id").asc()], "v", num_partitions=4
        ).collect()
        assert got == []


def _assert_no_single_partition_funnel(df):
    """No Sort/Window may sit beneath an Exchange SinglePartition — the
    only legal SinglePartitions are partial->final scalar aggregates."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        # the operator a SinglePartition exchange FEEDS is above it
        above = "".join(lines[max(0, i - 3) : i])
        assert "Sort " not in above and "Window" not in above, (
            f"single-task funnel at plan line {i}: {ln.strip()[:140]}"
        )
        assert "windowspecdefinition" not in above


class TestReplannedCensusQueries:
    """part_abc_analysis / customer_revenue_gini must never regress to
    the unpartitioned Window.orderBy single-reducer shape (VERDICT r8
    item 1): their rank/cumsum rides the distributed ordered scan."""

    def test_abc_plan_has_no_global_window_funnel(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        df = entrymod.queries()["part_abc_analysis"](spark, sf_dir)
        _assert_no_single_partition_funnel(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for ln in plan.splitlines():
            if "windowspecdefinition(" in ln:
                assert "__gos_pid" in ln

    def test_gini_plan_has_no_global_window_funnel(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        df = entrymod.queries()["customer_revenue_gini"](spark, sf_dir)
        _assert_no_single_partition_funnel(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for ln in plan.splitlines():
            if "windowspecdefinition(" in ln:
                assert "__gos_pid" in ln


class TestOrderedScanProperties:
    def test_hypothesis_matches_reference(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        rows_st = st.lists(
            st.integers(min_value=-1_000_000, max_value=1_000_000),
            min_size=1,
            max_size=40,
        )

        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(rows_st, st.integers(min_value=1, max_value=9),
               st.booleans())
        def run(values, parts, desc):
            rows = list(enumerate(values))
            df = spark.createDataFrame(rows, "id bigint, v bigint")
            order = [
                F.col("v").desc() if desc else F.col("v").asc(),
                F.col("id").asc(),
            ]
            got = global_ordered_scan(
                df, order, "v", num_partitions=parts
            ).collect()
            srt = sorted(rows, key=lambda r: (-r[1] if desc else r[1], r[0]))
            tot = sum(values)
            want, cum = {}, 0
            for i, (rid, v) in enumerate(srt, start=1):
                cum += v
                want[rid] = (i, cum, tot)
            for r in got:
                assert (
                    r["__gos_rank"], int(r["__gos_cum"]), int(r["__gos_tot"])
                ) == want[r.id]

        run()

    def test_rank_only_mode_matches_and_slims_plan(self, spark):
        rows = [(i, (i * 17) % 23) for i in range(50)]
        df = spark.createDataFrame(rows, "id bigint, v bigint")
        order = [F.col("v").asc(), F.col("id").asc()]
        full = global_ordered_scan(df, order, "v", num_partitions=4)
        slim = global_ordered_scan(
            df, order, "v", num_partitions=4, with_cum=False
        )
        assert "__gos_cum" not in slim.columns
        assert "__gos_tot" not in slim.columns
        got_full = {r.id: r["__gos_rank"] for r in full.collect()}
        got_slim = {r.id: r["__gos_rank"] for r in slim.collect()}
        assert got_full == got_slim
        # the rank-only plan drops the totals aggregate's join entirely
        slim_plan = slim._jdf.queryExecution().executedPlan().toString()
        assert "__gos_tot" not in slim_plan

    def test_rank_only_with_count(self, spark):
        df = spark.createDataFrame([(i, i) for i in range(10)], "id bigint, v bigint")
        got = global_ordered_scan(
            df, [F.col("v").asc(), F.col("id").asc()], "v",
            num_partitions=3, with_cum=False, count_col="n",
        ).collect()
        assert all(r.n == 10 for r in got)
