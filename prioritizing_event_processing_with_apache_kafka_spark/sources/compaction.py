"""Small-file compaction for parquet directories.

Streaming sinks, per-batch writes, and over-parallel jobs leave table
directories with thousands of KB-scale files; at 100 TB the resulting
file-listing and task-scheduling overhead (one scan task per tiny
file) dominates query startup. Compaction rewrites a directory into
``ceil(total_bytes / target_file_bytes)`` right-sized files.

Sizing comes from a driver-side recursive listing through the Hadoop
FileSystem API — the same metadata walk Spark's own scan planning
performs, so it works on any supported scheme (file://, hdfs://,
s3a://) and costs no data read. The rewrite itself is one shuffle:

- default: ``repartition(n)`` — round-robin, perfectly even output
  files;
- with ``order_by``: ``repartitionByRange(n, *cols)`` + a sort within
  partitions — preserves (or establishes) clustering so min/max file
  stats stay tight and downstream range predicates keep pruning
  (pair with ``sources/zorder.py`` for multi-column locality).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

__all__ = ["directory_bytes", "compact_parquet"]


def directory_bytes(spark: SparkSession, path: str, *, suffix: str = ".parquet") -> int:
    """Total size of ``suffix`` files under ``path`` (recursive,
    metadata-only — no data is read)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(suffix):
            total += status.getLen()
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    order_by: list[str] | None = None,
) -> int:
    """Rewrite ``in_path`` into right-sized parquet files at
    ``out_path``; returns the number of output files written."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    total = directory_bytes(spark, in_path)
    n = max(1, math.ceil(total / target_file_bytes))
    df: DataFrame = spark.read.parquet(in_path)
    if order_by:
        df = df.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    return n
