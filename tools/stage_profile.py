"""Per-stage duration profile of one inventory query via the UI REST API.

Usage: python tools/stage_profile.py [sf_dir] name

Runs the query twice (cold, warm) on the bench session config with the
UI enabled, then prints every completed stage's wall duration, task
count, and max task time from the /api/v1 endpoint — the quickest way
to see WHICH stage regresses when the core count changes (straggler vs
per-task-overhead shapes look identical in job totals but opposite
here).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    if argv and os.path.isdir(argv[0]):
        sf_dir, names = argv[0], argv[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", argv

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("peps-stageprof")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", os.environ.get("SPARK_GRAFT_UI_PORT", "4040"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    name = names[0]
    fn = queries[name]

    def run(tag: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{name} {tag}: {dt:.2f}s", flush=True)
        return dt

    run("cold")
    run("warm")

    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    url = f"http://127.0.0.1:{port}/api/v1/applications/{app}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    stages.sort(key=lambda s: s["stageId"])
    print(f"{'id':>4} {'dur_ms':>8} {'tasks':>6} {'maxTask':>8} {'in_MB':>7} "
          f"{'sh_r_MB':>8} {'sh_w_MB':>8}  name")
    for s in stages:
        dur = s.get("executorRunTime", 0)
        first = s.get("firstTaskLaunchedTime")
        sub, comp = s.get("submissionTime"), s.get("completionTime")
        wall = "?"
        if sub and comp:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                wall = int(
                    (
                        datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
                    ).total_seconds()
                    * 1000
                )
            except Exception:
                wall = "?"
        print(
            f"{s['stageId']:>4} {wall:>8} {s['numCompleteTasks']:>6} "
            f"{s.get('executorRunTime',0)//max(1,s['numCompleteTasks']):>8} "
            f"{s.get('inputBytes',0)//2**20:>7} "
            f"{s.get('shuffleReadBytes',0)//2**20:>8} "
            f"{s.get('shuffleWriteBytes',0)//2**20:>8}  {s['name'][:60]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
