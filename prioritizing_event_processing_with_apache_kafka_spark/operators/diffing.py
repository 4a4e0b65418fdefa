"""Corpus version diffing: added / removed / changed / unchanged
between two dataset versions, without comparing content bytes.

Training corpora are rebuilt continuously (new crawls, re-filters,
dedup re-runs); downstream consumers need the DELTA — which documents
appeared, vanished, or changed — not a full re-read. The diff is a
single full-outer join on the document key over content HASHES:

- each side is reduced to ``(key, xxhash64(content))`` first, so the
  join shuffles 16 bytes per doc instead of the document bytes;
- hash inequality decides ``changed`` (64-bit collisions would call a
  changed doc unchanged at ~2^-64 per pair — the standard trade every
  content-addressed store makes);
- at 100 TB both sides would be bucketed by ``key`` at write time,
  deleting the shuffle entirely; the operator itself is one join
  either way.

The per-doc frame feeds incremental consumers (re-embed only
``added``/``changed``); the summary is the monitoring number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_diff", "corpus_diff_summary"]


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Per-document diff status between two corpus versions.

    Returns ``(key_col, status)`` with status in
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (both, content hash differs), ``unchanged``.
    """
    o = old.select(
        F.col(key_col), F.xxhash64(F.col(content_col)).alias("__h_old")
    )
    n = new.select(
        F.col(key_col), F.xxhash64(F.col(content_col)).alias("__h_new")
    )
    joined = o.join(n, key_col, "full_outer")
    return joined.select(
        key_col,
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Counts per diff status — one map-side-combinable aggregate over
    the per-doc diff."""
    return (
        corpus_diff(old, new, key_col=key_col, content_col=content_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
