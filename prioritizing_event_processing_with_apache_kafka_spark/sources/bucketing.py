"""Bucketed-table helpers: delete the fact-⋈-fact shuffle at write time.

At 100 TB the lineitem⋈orders sort-merge exchange is the single biggest
cost in the relational surface. Writing both tables bucketed (and
sorted) by the join key lets Spark's bucketed scan satisfy the join's
distribution requirement from disk layout: the join plan has **no
Exchange on either side** (verified in tests/test_bucketing.py).

Bucketing is Spark's table-format feature (requires ``saveAsTable``);
these helpers wrap the DDL so pipelines can co-locate their hot join
keys once per table lifetime and every subsequent join rides it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table on
    ``bucket_col`` — subsequent equi-joins/groupBys on that column need
    no shuffle. ``num_buckets`` should match the downstream
    parallelism target (it caps join task count)."""
    writer = df.write.bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.mode(mode).format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a previously-bucketed table (bucket metadata rides the
    catalog, so the bucketed scan engages automatically)."""
    return spark.table(table_name)
