"""Bucketed/partitioned-table helpers: delete shuffles and scans at write time.

At 100 TB the lineitem⋈orders sort-merge exchange is the single biggest
cost in the relational surface. Writing both tables bucketed (and
sorted) by the join key lets Spark's bucketed scan satisfy the join's
distribution requirement from disk layout: the join plan has **no
Exchange on either side** (verified in tests/test_bucketing.py).

Bucketing is Spark's table-format feature (requires ``saveAsTable``);
these helpers wrap the DDL so pipelines can co-locate their hot join
keys once per table lifetime and every subsequent join rides it.

``write_ivf_partitioned`` is the ANN counterpart: the embedding corpus
is laid out as one directory per IVF cell, so a query probing
``nprobe`` cells triggers Catalyst partition pruning and never opens
the other cells' files — the inverted file *is* the directory tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from prioritizing_event_processing_with_apache_kafka_spark.operators.similarity import (
    with_ivf_cell,
)

__all__ = ["write_bucketed", "read_table", "write_ivf_partitioned"]


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


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    *,
    vec_col: str = "embedding",
    num_cells: int = 8,
    dim: int = 64,
    seed: int = 11,
    mode: str = "overwrite",
) -> None:
    """Persist an embedding corpus partitioned by IVF cell
    (``path/ivf_cell=N/...``).

    The cell assignment is the same seeded-centroid function the
    query-side probe uses (``operators/similarity.py::with_ivf_cell``),
    so ``spark.read.parquet(path).filter(col('ivf_cell').isin(probes))``
    prunes to exactly the probed cells' directories — the scan cost of
    an ANN query drops by ~``num_cells/nprobe`` *at the file-listing
    level*, before a single row is read. This is the write-time half of
    the IVF index; tests/test_sinks_and_ann.py verifies pruning via
    the plan's partition filters."""
    cells = with_ivf_cell(
        df, vec_col=vec_col, num_cells=num_cells, dim=dim, seed=seed, nprobe=1
    )
    cells.write.partitionBy("ivf_cell").mode(mode).parquet(path)
