"""Interchange formats: schema-preserving CSV / JSON-lines round trips.

The fixture corpus is parquet, but a pipeline's edges rarely are:
upstream drops land as CSV or JSON-lines. These helpers make the
format conversion explicit and *lossless with respect to the declared
schema* — reads always apply the known StructType (never
``inferSchema``, which samples the data, types by luck, and at 100 TB
costs an extra full scan before the real one).

Format notes encoded here rather than rediscovered per pipeline:

- **CSV** holds flat scalars only; timestamps round-trip through an
  explicit ISO-8601 microsecond ``timestampFormat`` (writer and reader
  must agree — the default writer pattern drops sub-second digits);
  embedded quotes/newlines are handled by Spark's quoting, but array /
  struct / binary columns are rejected here rather than silently
  stringified.
- **JSON-lines** additionally carries arrays and structs (the
  ``embeddings`` table round-trips); binary still needs parquet.
- Both formats are splittable line formats (uncompressed or with a
  splittable codec), so read parallelism survives; schema-on-read
  keeps the scan single-pass.
- **XML** (built into Spark 4; the former spark-xml package) covers
  the enterprise-feed edge: one element per record under ``rowTag``,
  explicit microsecond ``timestampFormat`` both directions, values
  XML-escaped so embedded JSON strings survive bit-exact.
- **ORC** is the columnar alternative when a downstream consumer is
  Hive/Trino-shaped: full type fidelity (arrays, structs, binary,
  timestamps), predicate pushdown and column pruning like parquet, so
  the round trip carries the schema itself and needs no format notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "write_csv",
    "read_csv",
    "write_jsonl",
    "read_jsonl",
    "write_orc",
    "read_orc",
    "write_xml",
    "read_xml",
]

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_CSV_OK = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
)


def _check_csv_schema(schema: T.StructType) -> None:
    for f in schema.fields:
        if not isinstance(f.dataType, _CSV_OK):
            raise TypeError(
                f"column {f.name!r} has type {f.dataType.simpleString()}, which CSV "
                f"cannot carry faithfully — use write_jsonl (arrays/structs) or "
                f"parquet (binary) instead"
            )


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    """Write a flat-scalar DataFrame as CSV, microsecond timestamps."""
    _check_csv_schema(df.schema)
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, *, header: bool = True
) -> DataFrame:
    """Read CSV with an explicit schema (never inferSchema)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write as JSON-lines (arrays/structs supported), microsecond ts."""
    df.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Read JSON-lines with an explicit schema (never sampled inference)."""
    return (
        spark.read.schema(schema).option("timestampFormat", _TS_FMT).json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """Write as ORC (columnar; full type fidelity incl. binary)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC (self-describing — schema travels with the files)."""
    return spark.read.orc(path)


_XML_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_xml(df: DataFrame, path: str, *, row_tag: str = "row") -> None:
    """Write as XML (Spark 4's built-in data source, the former
    spark-xml package): one ``<row_tag>`` element per record.

    Timestamps use an explicit ISO-8601 microsecond pattern — writer
    and reader must agree, same contract as the CSV helpers (the
    default pattern drops sub-second digits and the round trip stops
    being bit-exact)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("timestampFormat", _XML_TS_FMT)
        .mode("overwrite")
        .save(path)
    )


def read_xml(
    spark: SparkSession, path: str, schema: T.StructType, *, row_tag: str = "row"
) -> DataFrame:
    """Read XML with schema-on-read (never inference — sampling types
    by luck costs an extra full scan at 100 TB, same rule as CSV/JSONL)."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("timestampFormat", _XML_TS_FMT)
        .schema(schema)
        .load(path)
    )
