"""Grouped pandas operators: ``applyInPandas`` for per-group Python.

The engine's slot for per-group logic that built-in aggregates can't
express (model scoring, curve fitting, complex resampling): groups ship
to Python as Arrow-backed pandas frames, one task per shuffle
partition, many groups per task — scales with the number of *groups*
(here: users), not with a single Python process.

``grouped_percent_rank`` is deliberately also SQL-expressible
(``percent_rank()`` window) so the pandas path itself is
oracle-checkable: identical rank semantics (ties → min rank), exact
integer arithmetic ``(rank-1)/(n-1)``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["grouped_percent_rank"]


def grouped_percent_rank(
    df: DataFrame,
    *,
    group_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group percent rank of ``value_col`` via ``applyInPandas``.

    Output: (group, id, value, pct_rank) with
    ``pct_rank = (min_rank - 1) / (n - 1)`` (0 for singleton groups) —
    exactly SQL's ``percent_rank()``, including NULL placement: SQL
    window ordering sorts NULLs FIRST ascending, so NULL values take
    the lowest ranks (pandas' default would emit NaN ranks instead,
    silently diverging from the oracle).
    """
    narrow = df.select(group_col, id_col, value_col)
    # schema derived from the input dtypes — hardcoding long/long/
    # double would break (Arrow conversion error) for e.g. a string
    # group column, despite the configurable column names
    in_types = dict(narrow.dtypes)
    schema = (
        f"{group_col} {in_types[group_col]}, {id_col} {in_types[id_col]}, "
        f"{value_col} {in_types[value_col]}, pct_rank double"
    )

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        ranks = pdf[value_col].rank(method="min", ascending=True, na_option="top")
        pdf = pdf.copy()
        pdf["pct_rank"] = 0.0 if n == 1 else (ranks - 1.0) / (n - 1.0)
        return pdf

    return narrow.groupBy(group_col).applyInPandas(rank_group, schema)
