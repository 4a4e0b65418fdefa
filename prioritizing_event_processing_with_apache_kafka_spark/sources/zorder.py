"""Z-order (Morton) write layout: multi-dimensional data skipping.

Sorting a table by one column makes parquet row-group min/max stats
selective for THAT column only; predicates on a second column still
scan everything. Interleaving the bits of two columns into one Morton
key and sorting by it bounds every row group in BOTH dimensions —
2-D range predicates then skip most row groups at footer-read time,
with zero runtime cost (the key is write-time only).

The key is a chain of shift/mask/or expressions — whole-stage codegen,
no UDF — and the write is an ordinary sorted parquet write, so the
technique needs no table format beyond parquet itself (this is the
core of what lakehouse OPTIMIZE ZORDER does).

At 100 TB: z-order within each partition-pruned directory (e.g. by
date), not across the whole table — the sort is a range shuffle, and
per-partition sorts parallelize embarrassingly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def zorder_key(x: str | Column, y: str | Column, *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    Values are masked to ``bits`` (callers bucket/scale real domains
    into that range first)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    mask = (1 << bits) - 1
    xs = (F.col(x) if isinstance(x, str) else x).cast("long").bitwiseAND(F.lit(mask))
    ys = (F.col(y) if isinstance(y, str) else y).cast("long").bitwiseAND(F.lit(mask))
    parts = []
    for i in range(bits):
        xbit = F.shiftrightunsigned(xs, i).bitwiseAND(F.lit(1))
        ybit = F.shiftrightunsigned(ys, i).bitwiseAND(F.lit(1))
        parts.append(F.shiftleft(xbit, 2 * i))
        parts.append(F.shiftleft(ybit, 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the (x, y) Morton key:
    range-partitioned into ``num_files`` files, each locally sorted, so
    every file owns one contiguous z-curve segment. File- and
    row-group-level min/max stats on x and y are then tight in BOTH
    dimensions — 2-D predicates skip whole files at footer-read time."""
    (
        df.withColumn("__z", zorder_key(x, y, bits=bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
