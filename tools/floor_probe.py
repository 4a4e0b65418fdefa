"""Decompose the staged-replay setup floor into its components.

The bench's setup_floor_query (~1.3 s) is charged to every streaming
twin; before optimizing it, measure WHERE the time goes (guide §1):
staging writes, stream start/drain, per-micro-batch foreachBatch work
(rollup aggregate + versioned-parquet state write), and the readout.

Usage: python tools/floor_probe.py [reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("peps-floor-probe")
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

    from prioritizing_event_processing_with_apache_kafka_spark.streaming.rollup import (
        rollup_apply_batch,
        rollup_foreach_batch,
        rollup_state_result,
    )
    from prioritizing_event_processing_with_apache_kafka_spark.streaming.staging import (
        stage_two_batch_stream,
    )

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    materialize(spark.range(1_000_000).selectExpr("sum(id) AS s"))

    def one(spark):
        return spark.range(1).select(
            F.lit(0).cast("bigint").alias("k"),
            F.lit(1).cast("bigint").alias("v"),
        )

    # -- component A: the two staged parquet drops ---------------------
    # -- component B: direct foreachBatch body (no stream machinery) ---
    # -- component C: full floor query (stream) minus A/B = machinery --
    rows = []
    for rep in range(reps):
        t = {}
        root = tempfile.mkdtemp(prefix="peps-floorprobe-")
        try:
            t0 = time.time()
            src_dir, schema = stage_two_batch_stream(root, [one(spark), one(spark)])
            t["stage_writes"] = time.time() - t0

            # Apply the two rollup batches DIRECTLY (same work the
            # foreachBatch does), without the streaming engine.
            state_direct = os.path.join(root, "state-direct")
            t0 = time.time()
            for bid in range(2):
                rollup_apply_batch(
                    spark.read.schema(schema).parquet(
                        os.path.join(src_dir, f"batch-{bid}-0000.parquet")
                    ),
                    state_path=state_direct,
                    key_col="k",
                    specs=[("v_sum", "sum", "v")],
                    batch_id=bid,
                )
            t["direct_batches"] = time.time() - t0

            t0 = time.time()
            materialize(rollup_state_result(spark, state_direct))
            t["readout"] = time.time() - t0

            # Full streaming drain over the same staged files.
            state_path = os.path.join(root, "state")
            chk = os.path.join(root, "chk")
            t0 = time.time()
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
                .writeStream.foreachBatch(
                    rollup_foreach_batch(
                        state_path=state_path,
                        key_col="k",
                        specs=[("v_sum", "sum", "v")],
                    )
                )
                .option("checkpointLocation", chk)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            t["stream_drain"] = time.time() - t0
            t["stream_overhead"] = t["stream_drain"] - t["direct_batches"]
        finally:
            shutil.rmtree(root, ignore_errors=True)
        spark.catalog.clearCache()
        rows.append(t)
        print(
            f"rep{rep}: "
            + "  ".join(f"{k}={v:.3f}" for k, v in t.items()),
            flush=True,
        )

    keys = rows[0].keys()
    print("--- medians over", len(rows), "reps ---")
    for k in keys:
        vals = sorted(r[k] for r in rows)
        print(f"{k}: {vals[len(vals) // 2]:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
