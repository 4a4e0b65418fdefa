"""Phase-bracketed timing of route_batch_lifetime WITHOUT the stream
engine: isolates rank-shuffle+stats, offsets-frame build, sink write.

Usage: SPARK_GRAFT_CPUS=N python tools/profile_lifetime_phases.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("peps-profile-lifetime-phases")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
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
    from prioritizing_event_processing_with_apache_kafka_spark.streaming import (
        lifetime as LT,
    )

    spark.range(1_000_000).selectExpr("sum(id) AS s").collect()

    events = with_routing_key(load_table(spark, sf_dir, "events")).select(
        "event_id", "key"
    )
    lo_hi = events.agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi")).collect()[0]
    mid = (lo_hi["lo"] + lo_hi["hi"]) // 2
    batches = [
        events.filter(F.col("event_id") <= mid),
        events.filter(F.col("event_id") > mid),
    ]

    # Instrument by monkeypatching time brackets around the phases.
    orig_create = spark.createDataFrame

    for rep in range(reps):
        spark.catalog.clearCache()
        counters = {}
        out_root = tempfile.mkdtemp(prefix="peps-lt-phase-")
        try:
            for bi, b in enumerate(batches):
                t0 = time.time()
                nparts = LT._range_partitions(b)
                t_np = time.time()
                routed, counters = LT.route_batch_lifetime(
                    b, EVENTS_CONFIG, EVENTS_NUM_PARTITIONS, counters,
                    key_col="key", order_col="event_id",
                )
                t_route = time.time()
                routed.select("event_id", "bucket", "partition").write.mode(
                    "append"
                ).parquet(os.path.join(out_root, "out"))
                t_sink = time.time()
                cached = getattr(routed, "_peps_exact_cache", None)
                if cached is not None:
                    cached.unpersist()
                print(
                    f"rep{rep} batch{bi}: nparts={nparts} "
                    f"[stats probe {t_np - t0:.2f}s] "
                    f"route(plan+stats collect) {t_route - t_np:.2f}s, "
                    f"sink write {t_sink - t_route:.2f}s"
                )
        finally:
            shutil.rmtree(out_root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
