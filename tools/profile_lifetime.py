"""Per-job decomposition of q_stream_route_lifetime (VERDICT r13 item 1).

Runs the query N times on the bench session config and prints every
Spark job's (description, duration, task count) from the status store,
plus phase wall-clock brackets — the evidence for WHERE the 32-core
run spends its time vs the 8-core run.

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_lifetime.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("peps-profile-lifetime")
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
        q_stream_route_lifetime,
    )

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    materialize(spark.range(1_000_000).selectExpr("sum(id) AS s"))

    store = spark.sparkContext._jsc.sc().statusStore()

    for rep in range(reps):
        spark.catalog.clearCache()
        empty = spark._jvm.java.util.ArrayList()
        _s = store.jobsList(empty)
        jobs_before = {_s.apply(i).jobId() for i in range(_s.size())}
        t0 = time.time()
        out = q_stream_route_lifetime(spark, sf_dir)
        t1 = time.time()
        materialize(out)
        t2 = time.time()
        print(
            f"\n=== rep {rep}: cpus={cpus} query={t1 - t0:.2f}s "
            f"noop-readout={t2 - t1:.2f}s ==="
        )
        total = 0.0
        _s2 = store.jobsList(empty)
        for j in [_s2.apply(i) for i in range(_s2.size())][::-1]:
            if j.jobId() in jobs_before:
                continue
            dur = (
                (j.completionTime().get().getTime() - j.submissionTime().get().getTime())
                / 1000.0
                if j.completionTime().isDefined()
                else float("nan")
            )
            total += dur
            print(
                f"  job {j.jobId():>4}  {dur:6.2f}s  tasks={j.numTasks():>5}  "
                f"{(j.description().isDefined() and j.description().get() or j.name())[:110]}"
            )
        print(f"  (sum of job durations: {total:.2f}s; gaps = driver/planning time)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
