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

__all__ = ["corpus_diff", "corpus_diff_summary", "merkle_bucket_checksums"]


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


def merkle_bucket_checksums(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
    num_buckets: int = 64,
) -> DataFrame:
    """Key-range bucket checksums for anti-entropy comparison — the
    Merkle-tree leaf level, as a query.

    Two replicas of a 100 TB corpus (two regions, engine vs a
    migration target) cannot diff row-by-row across the wire; the
    standard protocol (Dynamo/Cassandra anti-entropy) exchanges a
    BUCKET digest table first and re-syncs only buckets whose digests
    differ. Each row digests to ``md5(key '|' content...)`` truncated
    to 56 bits, and a bucket's checksum is the SUM of its row digests
    modulo 1e9+7 — commutative and associative, so it reduces
    map-side, never materializes row order, and is engine-portable
    (``conv(hex,16,10)`` here, ``CAST('0x'||hex AS BIGINT)`` in the
    DuckDB oracle — verified to agree byte-for-byte on md5).

    A corrupted/missing/extra row flips its bucket's checksum with
    probability ≈ 1 − 1/p where p = 1e9+7 (≈ 1 − 1e-9): although each
    row digest carries 56 bits, the per-row term is reduced mod p
    before summing, so a single-row delta escapes detection exactly
    when it is ≡ 0 mod p — probability ≈ 1/p for a random digest, NOT
    the 2⁻⁵⁶ the raw digest width would suggest. 1e-9 per divergent
    bucket is ample for anti-entropy (a missed bucket is re-caught on
    the next sweep); if a stronger bound is ever needed, sum the full
    56-bit digests mod 2⁶³ instead. Overflow envelope: the mod-p
    terms are < 2³⁰, so int64 SUM is safe to ~8.6e9 rows per bucket —
    size ``num_buckets`` so buckets stay under that (and under the
    re-sync transfer unit you can afford).

    One hash aggregate; output is ``num_buckets`` rows:
    ``(bucket, n_rows, checksum)``.
    """
    digest = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col(key_col).cast("string"), *content_cols)),
            1,
            14,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.select(
            F.pmod(F.col(key_col), F.lit(num_buckets)).cast("bigint").alias("bucket"),
            (digest % F.lit(1_000_000_007)).alias("__d"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.sum("__d") % F.lit(1_000_000_007)).cast("bigint").alias("checksum"),
        )
    )
