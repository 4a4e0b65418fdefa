"""Dump the formatted plan of the lifetime router's per-batch core
(the fingerprint module's steady-state mirror) for plans/r<N>/ dumps.

Usage: python tools/dump_lifetime_plan.py OUT.txt [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("peps-lifetime-plan")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from prioritizing_event_processing_with_apache_kafka_spark.inventory import (
        EVENTS_CONFIG,
        EVENTS_NUM_PARTITIONS,
        load_table,
        with_routing_key,
    )
    from prioritizing_event_processing_with_apache_kafka_spark.streaming.lifetime import (
        route_batch_lifetime,
    )

    events = with_routing_key(load_table(spark, sf_dir, "events")).select(
        "event_id", "key"
    )
    batch = events.filter(F.col("event_id") % 2 == 1)
    routed, _ = route_batch_lifetime(
        batch,
        EVENTS_CONFIG,
        EVENTS_NUM_PARTITIONS,
        {"Platinum": 1000, "Gold": 500, "Standard": 250},
    )
    plan = routed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    with open(out_path, "w") as f:
        f.write(plan)
    print(f"wrote {out_path} ({len(plan)} chars)")
    getattr(routed, "_peps_exact_cache").unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
