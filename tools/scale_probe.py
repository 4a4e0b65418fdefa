"""Scale-factor probe: does each headline plan scale linearly?

sf0.1 is scheduler/JIT-bound (docs/SCALE.md), so the per-round bench
cannot distinguish an O(n) plan from an O(n log n) or skew-bound one.
This probe manufactures a 10× replica of the events/documents/
embeddings tables (ids shifted per copy so keys stay distinct and
cardinalities scale honestly), times a subset of headline queries at
1× and 10×, and reports the scaling ratio per query. A ratio near 10
(or below, where fixed overhead amortizes) means the plan is
throughput-bound and should survive the next 100×; a super-linear
ratio is a red flag the fixture bench can't see.

The replica lives under /tmp and is rebuilt only when missing or
stale (fixture mtime tag). Usage:

    python tools/scale_probe.py [--json OUT] [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries with meaningfully different plan shapes: narrow map
# (fingerprint), one-shuffle agg (token stats), distributed
# zip-with-index (routing), window (top-k), banded LSH join chain,
# as-of union-window join, sketch rollup.
PROBED = [
    "doc_fingerprint",
    "text_token_stats",
    "route_events_exact",
    "top_events_per_user",
    "dedup_minhash_lsh",
    "events_asof_last_purchase",
    "bucket_user_reach_hll",
]

COPIES = 10
TABLES = ("events", "documents", "embeddings")
# Tables the probed queries need but that aren't replicated (TPC-H
# dims etc.) are symlink-copied as-is.
PASSTHROUGH = (
    "region nation customer supplier part orders lineitem".split()
)


def replica_dir(sf_dir: str) -> str:
    src = f"{sf_dir.rstrip('/')}/events.parquet"
    stat = os.stat(src)
    tag = hashlib.md5(
        f"{src}:{stat.st_mtime_ns}:{stat.st_size}:{COPIES}".encode()
    ).hexdigest()[:12]
    return os.path.join("/tmp", f"peps-scale-{COPIES}x-{tag}")


def build_replica(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = f"{sf_dir.rstrip('/')}/{t}.parquet"
        df = spark.read.parquet(src)
        # Shift every id-like column per copy so keys stay distinct:
        # unioned copies with disjoint id spaces scale group/join
        # cardinality the way real growth does.
        id_cols = [c for c in df.columns if c in ("event_id", "user_id", "doc_id", "vec_id")]
        span = {c: df.agg(F.max(c)).first()[0] + 1 for c in id_cols}
        copies = []
        for k in range(COPIES):
            c = df
            for col in id_cols:
                c = c.withColumn(col, F.col(col) + F.lit(k * span[col]))
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t in PASSTHROUGH:
        src = f"{sf_dir.rstrip('/')}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("peps-scale-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = replica_dir(sf_dir)
    if not os.path.exists(os.path.join(big_dir, TABLES[-1] + ".parquet")):
        t0 = time.time()
        build_replica(spark, sf_dir, big_dir)
        print(f"built {COPIES}x replica at {big_dir} in {time.time()-t0:.1f}s")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm up the session (JIT, codegen, footers) before any timing.
    materialize(queries["route_distribution"](spark, sf_dir))

    def best_of_two(name: str, d: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            materialize(queries[name](spark, d))
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        return best

    results = {}
    for name in PROBED:
        t1 = best_of_two(name, sf_dir)
        t10 = best_of_two(name, big_dir)
        ratio = t10 / t1 if t1 > 0 else float("inf")
        results[name] = {
            "sec_1x": round(t1, 3),
            "sec_10x": round(t10, 3),
            "ratio": round(ratio, 2),
        }
        print(
            f"{name:28s} 1x={t1:6.2f}s {COPIES}x={t10:7.2f}s "
            f"ratio={ratio:5.2f}", flush=True,
        )

    out = {"copies": COPIES, "base_sf_dir": sf_dir, "queries": results}
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
