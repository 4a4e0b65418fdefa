"""Streaming corpus ingestion with incremental near-dup filtering.

The end-to-end shape of a production training-data intake: documents
arrive in micro-batches; each batch is deduplicated against the whole
history *through its MinHash signature store* (never by re-reading
historical text), survivors are appended to the corpus, and their
signatures are appended to the store so the next batch sees them.

Composition of already-tested pieces, wired into ``foreachBatch``:

- :func:`..operators.dedup.with_shingles` — tokenize the batch ONCE;
  the within-batch exact pass, the MinHash signing, and the store
  append all reuse that frame (one split/zip per batch, not three);
- :func:`..operators.dedup.ngram_jaccard_pairs` — within-batch
  duplicates removed first via the exact shared-shingle path (batch ×
  batch is small), so a batch containing its own near-dups
  contributes one survivor;
- :func:`..operators.dedup.incremental_minhash_pairs` — band-join the
  batch's signatures against the store, exact-verify the few
  collisions against the corpus text fetched by semi-join.

Exactly-once: ``foreachBatch`` is at-least-once, so both appends are
idempotent on ``batch_id`` — each batch lands in its own
``__batch_id=N`` partition with dynamic partition overwrite (the same
pattern as :mod:`.sinks`), so a replayed batch atomically replaces
its own previous (possibly partial) corpus AND store output instead
of duplicating rows or leaving signatures missing. Batch-mode callers
that pass no ``batch_id`` get plain appends and own idempotency.

Scale: per batch the store is scanned once (signature rows — a few
hundred bytes per historical doc), the corpus is touched only for
candidate ids, and appends are partitioned parquet writes. State
lives entirely in the two directories — restarts resume from the
files, no in-memory state to rebuild. Per-batch caches are released
deterministically via :func:`..operators.caching.cache_scope` (a
long-lived ingest query would otherwise accrete one persisted frame
set per micro-batch).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.caching import (
    cache_scope,
    scoped_persist,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.dedup import (
    SIGNATURE_STORE_VERSION,
    incremental_minhash_pairs,
    ngram_jaccard_pairs,
    with_minhash_signature,
    with_shingles,
)

__all__ = ["dedup_ingest_batch", "dedup_ingest_foreach_batch"]

_BATCH_COL = "__batch_id"


def _store_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _write(df: DataFrame, path: str, batch_id: int | None) -> None:
    if batch_id is None:
        df.write.mode("append").parquet(path)
    else:
        (
            df.withColumn(_BATCH_COL, F.lit(int(batch_id)))
            .write.mode("overwrite")
            # per-write option — never mutate the session conf (two
            # concurrent queries racing a session toggle can flip an
            # overwrite to static mode and truncate the whole path)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BATCH_COL)
            .parquet(path)
        )


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
    batch_id: int | None = None,
) -> int:
    """Ingest one batch: drop near-dups (within batch, then vs
    history), append survivors to ``corpus_path`` and their signatures
    to ``store_path``. Returns the number of surviving documents.

    With ``batch_id`` set (the ``foreachBatch`` path), both writes are
    idempotent per-batch-partition overwrites — see module docstring.
    """
    spark = batch.sparkSession
    batch = batch.select(id_col, text_col)

    with cache_scope():
        # 0. one tokenization for the whole batch lifecycle: the cached
        # frame carries the token array so the signature hash stream
        # windows it instead of re-splitting the text.
        toks_col = "__peps_batch_toks"
        sh = scoped_persist(
            with_shingles(batch, text_col=text_col, k=k, keep_tokens=toks_col)
        )

        # 1. within-batch near-dups: keep the min-id representative.
        self_pairs = ngram_jaccard_pairs(
            batch, id_col=id_col, text_col=text_col, k=k,
            threshold=threshold, shingled=sh.drop(toks_col),
        )
        dup_ids = self_pairs.select(F.col("y").alias(id_col)).distinct()
        survivors_sh = sh.join(dup_ids, id_col, "left_anti")

        # sign once — the history band-join and the store append both
        # read this frame.
        sigs = scoped_persist(
            with_minhash_signature(
                survivors_sh, id_col=id_col, text_col=text_col, k=k,
                num_hashes=num_hashes, shingled=survivors_sh.drop(toks_col),
                tokens_col=toks_col,
            )
        )

        # 2. history near-dups through the signature store.
        if _store_exists(spark, store_path):
            store = spark.read.parquet(store_path)
            corpus = spark.read.parquet(corpus_path)
            dup_new = incremental_minhash_pairs(
                survivors_sh.select(id_col, text_col), store, corpus,
                id_col=id_col, text_col=text_col, k=k,
                num_hashes=num_hashes, bands=bands, threshold=threshold,
                new_signatures=sigs,
            ).select(F.col("new_id").alias(id_col)).distinct()
            sigs = sigs.join(dup_new, id_col, "left_anti")

        # 3. survivors + their (already computed) signatures.
        final = scoped_persist(sigs)
        n = final.count()
        if n:
            _write(final.select(id_col, text_col), corpus_path, batch_id)
            # sig_version stamps the hash basis into the persisted store
            # so a probe by a different code revision fails fast instead
            # of silently band-matching nothing (constant column —
            # RLE-compressed to bytes per file).
            _write(
                final.select(id_col, "minhash").withColumn(
                    "sig_version", F.lit(SIGNATURE_STORE_VERSION)
                ),
                store_path,
                batch_id,
            )
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
    """``foreachBatch`` wrapper around :func:`dedup_ingest_batch` —
    passes the engine's ``batch_id`` through so replayed batches
    overwrite their own output (exactly-once, see module docstring)."""

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
            batch_id=batch_id,
        )

    return ingest
