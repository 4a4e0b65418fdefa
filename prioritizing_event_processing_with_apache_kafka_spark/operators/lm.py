"""Statistical language-model scoring: bigram LM quality + DSIR weights.

Two data-selection operators every large-scale pretraining pipeline
runs between raw crawl and tokenizer:

- **Bigram-LM scoring** (:func:`bigram_lm_score`): fit an add-one-
  smoothed bigram model on the corpus itself and score every document
  by its mean log2 bigram probability — the cheap perplexity proxy for
  "does this document look like natural corpus text". Gibberish,
  boilerplate and template spam sit far below the corpus mode; the
  score is the classic filter feature (CCNet / Gopher use a KenLM for
  the same purpose; a self-fit bigram model is the dependency-free,
  fully-deterministic variant).
- **DSIR importance weights** (:func:`dsir_importance`): Data Selection
  via Importance Resampling (Xie et al., NeurIPS 2023): weight each
  corpus document by the log-likelihood ratio of a *target*-domain
  n-gram LM vs the corpus n-gram LM. Documents that look like the
  target domain get high weight; resampling by weight shifts the
  pretraining mixture toward the target without hand-written rules.

Scale design:

- The bigram stream is a narrow O(tokens) explode (zip of two shifted
  token-array views — same trick as ``dedup.with_shingles``, without
  the dedup since the LM needs occurrence counts).
- Count tables are map-side-combinable hash aggregates; the score join
  is a plain shuffle equi-join on the bigram key (AQE broadcasts the
  count table while it fits). Nothing is quadratic, nothing collects.
- **Bit-reproducibility**: per-bigram log2 values are rounded to 6
  decimals and carried as exact integer MICROS (``round(log2,6) →
  decimal(28,6) → ×1e6 → bigint``) — integer addition is exact and
  order-independent, so the per-document sum is identical regardless
  of partitioning, and the mean is one IEEE division of two exact
  integers (correctly rounded, hence bit-identical cross-engine; no
  round-after-divide boundary). Cross-engine round(log2, 6) parity
  verified over a 143k-value grid.

Reference parity note: the reference implements no text analytics
(SURVEY.md §2.B) — these are engine extensions on the ``documents``
fixture table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.caching import (
    scoped_persist,
)

__all__ = ["bigram_rows", "bigram_lm_score", "dsir_importance"]


def bigram_rows(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per bigram OCCURRENCE (not distinct).

    Zip of two shifted views of the token array: element i pairs
    token_i with token_{i+1}; one O(tokens) slice each, no per-position
    re-tokenization. Documents with < 2 tokens contribute no rows.
    """
    toks = "__peps_toks"
    n1 = f"greatest(size({toks}) - 1, 0)"
    pairs = (
        f"arrays_zip(slice({toks}, 1, {n1}), slice({toks}, 2, {n1}))"
    )
    return (
        df.withColumn(toks, F.split(F.col(text_col), " "))
        .select(id_col, F.explode(F.expr(pairs)).alias("__bg"))
        .select(
            id_col,
            F.col("__bg.`0`").alias("w1"),
            F.col("__bg.`1`").alias("w2"),
        )
    )


def _log2_micros(col) -> F.Column:
    """round(log2(x), 6) on the exact integer-micros lattice: the
    6-decimal value times 1e6 as a BIGINT. Integer summation is exact
    and order-independent (the bit-reproducibility contract of this
    module), and — unlike the earlier DECIMAL-sum + round-after-divide
    formulation — the per-document mean becomes ONE IEEE division of
    two exactly-representable integers, which is correctly rounded and
    therefore bit-identical in every engine. The old final
    ``round(sum/n, 6)`` sat on rounding boundaries that Spark
    (HALF_UP on the decimal rendering) and other engines resolve
    differently: measured 1 divergent row in 50k at 10× volume, gone
    under this lattice. Per-bigram ``round(log2, 6)`` cross-engine
    parity is separately verified over a 143k-value grid; the
    decimal hop ``round → decimal(28,6) → ×1e6 → long`` is exact at
    every step."""
    return (
        F.round(F.log2(col), 6).cast("decimal(28,6)") * F.lit(1000000)
    ).cast("long")


def bigram_lm_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean log2 probability under an add-one-smoothed
    bigram LM fit on the corpus itself.

    ``P(w2|w1) = (C(w1,w2) + 1) / (C(w1·) + V)`` where ``C(w1·)`` is
    the count of bigrams starting with ``w1`` and ``V`` the corpus
    vocabulary size (distinct tokens, all positions). Returns
    ``(id, n_bigrams, lm_score)`` for documents with ≥ 1 bigram;
    ``lm_score`` is the mean of per-bigram ``round(log2 P, 6)`` —
    higher = more corpus-typical text.
    """
    # The bigram stream feeds the score join AND both count tables —
    # persist so tokenization/explode runs once, not three times (same
    # shared-subtree pattern as the near-dup operators; release via
    # caching.cache_scope or clearCache).
    bg = scoped_persist(bigram_rows(df, id_col=id_col, text_col=text_col))
    # c_w1 rolls up from c_bg (C(w1·) = Σ_w2 C(w1,w2)) instead of
    # re-aggregating the full occurrence stream — one fewer scan, and
    # the rollup input is the (much smaller) count table. Persisted:
    # c_bg feeds both the score join and this rollup.
    c_bg = scoped_persist(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__cbg"))
    )
    c_w1 = c_bg.groupBy("w1").agg(F.sum("__cbg").alias("__cw1"))
    vocab = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("__t"))
        .agg(F.countDistinct("__t").alias("__v"))
    )
    p = (F.col("__cbg") + F.lit(1)).cast("double") / (
        F.col("__cw1") + F.col("__v")
    ).cast("double")
    return (
        bg.join(c_bg, ["w1", "w2"])
        .join(c_w1, "w1")
        .join(F.broadcast(vocab))
        .withColumn("__lp", _log2_micros(p))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__lp").alias("__s"),
        )
        .withColumn(
            "lm_score",
            F.col("__s").cast("double")
            / (F.col("n_bigrams") * F.lit(1000000)).cast("double"),
        )
        .select(id_col, "n_bigrams", "lm_score")
    )


def dsir_importance(
    df: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """DSIR log importance weight per corpus document.

    ``w(doc) = (Σ log2 P_target(bg) - Σ log2 P_corpus(bg)) / n_bigrams``
    over the document's bigram occurrences, both LMs add-one-smoothed
    over the **bigram** event space: ``P(bg) = (C(bg)+1) / (N + B)``
    with ``N`` = total bigram occurrences in that corpus and ``B`` =
    distinct bigram types in the *union* vocabulary (shared smoothing
    support, so unseen-in-target bigrams are penalized, not undefined).

    The target side (an in-domain sample — benchmarks, curated docs) is
    small by nature; its count table broadcasts. The corpus is scanned
    twice (once to count, once to score) — both linear, shuffle keyed
    on the bigram. Positive weight = more target-like than
    corpus-typical; resample ∝ exp weight for DSIR selection.

    Returns ``(id, n_bigrams, dsir_logratio)``.

    ``target_ids`` — when the target is a SUBSET of ``df`` (the usual
    DSIR setup: an in-domain slice of the corpus), pass its id frame so
    the target's bigrams are carved out of the already-tokenized corpus
    stream by a semi-join instead of re-tokenizing ``target``; bigrams
    are per-document, so the result is identical.
    """
    # Corpus bigrams feed the score join + count table; both totals
    # and the smoothing support roll up from the count tables (exact:
    # N = Σ counts, support = distinct keys of the union), so the
    # occurrence streams are each scanned once.
    bg_c = scoped_persist(bigram_rows(df, id_col=id_col, text_col=text_col))
    if target_ids is not None:
        bg_t = bg_c.join(target_ids.select(id_col), id_col, "left_semi")
    else:
        bg_t = bigram_rows(target, id_col=id_col, text_col=text_col)
    c_corpus = scoped_persist(
        bg_c.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__cc"))
    )
    c_target = scoped_persist(
        bg_t.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__ct"))
    )
    # shared smoothing support: distinct bigram types of the union
    support = (
        c_corpus.select("w1", "w2")
        .unionByName(c_target.select("w1", "w2"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("__b"))
    )
    # coalesce: SUM over an empty count table is NULL, and an empty
    # target (or one with only sub-2-token docs) must yield finite
    # penalized ratios, not NULL-poison every output row.
    n_corpus = c_corpus.agg(F.coalesce(F.sum("__cc"), F.lit(0)).alias("__nc"))
    n_target = c_target.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__nt"))
    p_t = (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("__nt") + F.col("__b")
    ).cast("double")
    p_c = (F.col("__cc") + F.lit(1)).cast("double") / (
        F.col("__nc") + F.col("__b")
    ).cast("double")
    return (
        bg_c.join(c_corpus, ["w1", "w2"])
        .join(F.broadcast(c_target), ["w1", "w2"], "left")
        .join(F.broadcast(support))
        .join(F.broadcast(n_corpus))
        .join(F.broadcast(n_target))
        .withColumn("__lr", _log2_micros(p_t) - _log2_micros(p_c))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__lr").alias("__s"),
        )
        .withColumn(
            "dsir_logratio",
            F.col("__s").cast("double")
            / (F.col("n_bigrams") * F.lit(1000000)).cast("double"),
        )
        .select(id_col, "n_bigrams", "dsir_logratio")
    )
