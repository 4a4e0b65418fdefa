"""Dump the per-batch plan shapes of the LOCF and transitions streaming
operators (the two join-shaped state merges of VERDICT r13 item 8) —
the steady-state micro-batch (batch 1 against the state batch 0 would
have committed), mirroring `q_stream_locf_fill` /
`q_stream_transition_counts` exactly.

Usage: python tools/dump_seam_plans.py <out_suffix> [sf_dir]

Writes plans/r14/{locf_enrich,locf_state,transitions_counts,
transitions_state}_<out_suffix>.txt.  Run at the pre-change commit with
suffix `before` and at the changed tree with suffix `after`; the tool
calls the module's own pure-plan functions, so each dump reflects the
code as checked out (for the pre-r14 `transitions` code, which had no
pure-plan functions, the per-batch plan is reconstructed verbatim from
the old `transitions_apply_batch` body — flag `--legacy-transitions`).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    legacy = "--legacy-transitions" in sys.argv
    suffix = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-seam-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from prioritizing_event_processing_with_apache_kafka_spark.sources.tables import (
        load_table,
    )
    from prioritizing_event_processing_with_apache_kafka_spark.streaming.locf import (
        locf_enrich,
        locf_next_state,
    )

    cutoff = F.lit("2024-01-16").cast("timestamp")

    # --- LOCF: q_stream_locf_fill's batch 1 + committed batch-0 state
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    obs = F.when(F.col("value") >= 19.0, F.col("value"))
    batch = events.filter(F.col("ts") >= cutoff)
    prior = events.filter(F.col("ts") < cutoff)
    locf_state = locf_next_state(
        prior,
        None,
        key_col="event_type",
        order_cols=("ts", "event_id"),
        obs_col=obs,
    ).select("event_type", F.col("__locf_obs").alias("__locf_seed"))
    frames = {
        "locf_enrich": locf_enrich(
            batch,
            locf_state,
            key_col="event_type",
            order_cols=("ts", "event_id"),
            obs_col=obs,
        ),
        "locf_state": locf_next_state(
            batch,
            locf_state,
            key_col="event_type",
            order_cols=("ts", "event_id"),
            obs_col=obs,
        ),
    }

    # --- transitions: q_stream_transition_counts' batch 1 + batch-0 state
    tev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    tbatch = tev.filter(F.col("ts") >= cutoff)
    tprior = tev.filter(F.col("ts") < cutoff)
    key_col, state_col, order_cols = "user_id", "event_type", ("ts", "event_id")

    if legacy:
        # Verbatim reconstruction of the pre-r14 transitions_apply_batch
        # per-batch plans (broadcast seed join + anti-join carry-over).
        ordered0 = F.struct(
            *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
            F.col(state_col).alias("__v"),
        )
        tstate = (
            tprior.groupBy(key_col)
            .agg(F.max(ordered0).alias("__s"))
            .select(key_col, F.col("__s.__v").alias("__last_state"))
        )
        w = Window.partitionBy(key_col).orderBy(
            *[F.asc(c) for c in order_cols]
        )
        lagged = tbatch.withColumn(
            "__prev_in_batch", F.lag(F.col(state_col)).over(w)
        ).join(F.broadcast(tstate), key_col, "left")
        frames["transitions_counts"] = (
            lagged.select(
                F.coalesce(
                    F.col("__prev_in_batch"), F.col("__last_state")
                ).alias("prev_state"),
                F.col(state_col).alias("next_state"),
            )
            .filter(F.col("prev_state").isNotNull())
            .groupBy("prev_state", "next_state")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        batch_state = (
            tbatch.groupBy(key_col)
            .agg(F.max(ordered0).alias("__s"))
            .select(key_col, F.col("__s.__v").alias("__last_state"))
        )
        carried = tstate.join(
            batch_state.select(key_col), key_col, "left_anti"
        )
        frames["transitions_state"] = batch_state.unionByName(carried)
    else:
        from prioritizing_event_processing_with_apache_kafka_spark.streaming.transitions import (
            transitions_count_plan,
            transitions_next_state,
        )

        tstate = transitions_next_state(
            tprior,
            None,
            key_col=key_col,
            state_col=state_col,
            order_cols=order_cols,
        )
        frames["transitions_counts"] = transitions_count_plan(
            tbatch,
            tstate,
            key_col=key_col,
            state_col=state_col,
            order_cols=order_cols,
        )
        frames["transitions_state"] = transitions_next_state(
            tbatch,
            tstate,
            key_col=key_col,
            state_col=state_col,
            order_cols=order_cols,
        )

    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name, df in frames.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
