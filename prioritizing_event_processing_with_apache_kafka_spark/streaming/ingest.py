"""Streaming corpus ingestion with incremental near-dup filtering.

The end-to-end shape of a production training-data intake: documents
arrive in micro-batches; each batch is deduplicated against the whole
history *through its MinHash signature store* (never by re-reading
historical text), survivors are appended to the corpus, and their
signatures are appended to the store so the next batch sees them.

Composition of already-tested pieces, wired into ``foreachBatch``:

- :func:`..operators.dedup.with_minhash_signature` — sign the batch
  (linear in batch size);
- :func:`..operators.dedup.incremental_minhash_pairs` — band-join the
  batch's signatures against the store, exact-verify the few
  collisions against the corpus text fetched by semi-join;
- within-batch duplicates are removed first with the same banded
  search (batch × batch), so a batch containing its own near-dups
  contributes one survivor.

Scale: per batch the store is scanned once (signature rows — a few
hundred bytes per historical doc), the corpus is touched only for
candidate ids, and appends are partitioned parquet writes. State
lives entirely in the two directories — restarts resume from the
files, no in-memory state to rebuild.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.dedup import (
    incremental_minhash_pairs,
    ngram_jaccard_pairs,
    with_minhash_signature,
)

__all__ = ["dedup_ingest_batch", "dedup_ingest_foreach_batch"]


def _store_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def dedup_ingest_batch(
    batch: DataFrame,
    *,
    corpus_path: str,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> int:
    """Ingest one batch: drop near-dups (within batch, then vs
    history), append survivors to ``corpus_path`` and their signatures
    to ``store_path``. Returns the number of surviving documents."""
    spark = batch.sparkSession
    batch = batch.select(id_col, text_col)

    # 1. within-batch near-dups: keep the min-id representative.
    self_pairs = ngram_jaccard_pairs(
        batch, id_col=id_col, text_col=text_col, k=k, threshold=threshold
    )
    batch = batch.join(
        self_pairs.select(F.col("y").alias(id_col)).distinct(), id_col, "left_anti"
    )

    # 2. history near-dups through the signature store.
    if _store_exists(spark, store_path):
        store = spark.read.parquet(store_path)
        corpus = spark.read.parquet(corpus_path)
        dup_new = incremental_minhash_pairs(
            batch, store, corpus,
            id_col=id_col, text_col=text_col, k=k,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
        ).select(F.col("new_id").alias(id_col)).distinct()
        batch = batch.join(dup_new, id_col, "left_anti")

    # 3. append survivors + their signatures. The batch is tiny
    # relative to history; persist so the dedup work above isn't
    # replayed by the two writes.
    batch = batch.persist()
    n = batch.count()
    if n:
        batch.write.mode("append").parquet(corpus_path)
        (
            with_minhash_signature(
                batch, id_col=id_col, text_col=text_col, k=k, num_hashes=num_hashes
            )
            .select(id_col, "minhash")
            .write.mode("append")
            .parquet(store_path)
        )
    batch.unpersist()
    return n


def dedup_ingest_foreach_batch(
    *,
    corpus_path: str,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` wrapper around :func:`dedup_ingest_batch`."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        dedup_ingest_batch(
            batch_df,
            corpus_path=corpus_path,
            store_path=store_path,
            id_col=id_col,
            text_col=text_col,
            k=k,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
        )

    return ingest
