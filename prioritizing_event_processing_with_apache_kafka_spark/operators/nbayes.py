"""Multinomial naive-Bayes text classifier — distributed train AND
apply, expressed entirely in relational operators.

The missing "model" surface of the LLM-pipeline inventory: corpus
curation stacks run fasttext-style linear classifiers for language ID
and quality filtering (CCNet, GPT-3's quality classifier, the
RedPajama/FineWeb pipelines). A multinomial NB with add-one smoothing
is the canonical relational formulation of that surface: training is
two `groupBy` counts, the model is a small (vocab × label) grid, and
scoring is a broadcast join + one integer aggregation — every step
SQL-expressible, so unlike a learned-weights classifier the whole
train+apply pipeline is hash-oracled against DuckDB, not just
self-audited.

Determinism contract: every likelihood lives on the integer-micros
log2 lattice (`lm._log2_micros` — per-value `round(log2, 6)` exactly
representable as BIGINT micros), so per-document scores are exact
integer sums: order-independent, engine-independent, tie-broken
lexicographically. No float accumulates anywhere.

Scale shape (100 TB corpus):

- **Vocabulary cap bounds the model.** `vocab_size` keeps the top-V
  tokens by corpus frequency (ties broken by token asc — fully
  deterministic); the model grid is V × L rows (L = #labels), which
  broadcasts. An uncapped vocabulary would make the model grow with
  the corpus; V is the knob that keeps it a broadcast join forever.
- **Training = two map-side-combinable counts** over the exploded
  token stream (token×label occurrences; per-label totals roll up
  from the count table, not the stream — same rollup trick as
  `lm.bigram_lm_score`).
- **Scoring shuffles docs × L tiny rows, never tokens.** Token
  occurrences join the BROADCAST model grid, partial-sum map-side,
  and the only shuffle carries (doc, label, int64) rows; the argmax
  is the same map-side `min(struct)` used by the k-means assignment
  (`clustering._argmin_per_id`) — no per-doc window sort.
- **Out-of-vocabulary tokens are ignored** (the standard multinomial
  treatment) and a document with NO in-vocab tokens falls back to the
  prior argmax — handled structurally by scoring every (doc, label)
  pair of the docs × labels grid with `coalesce(token_sum, 0)`.

Reference basis: public naive-Bayes formulation (Manning, Raghavan &
Schütze, "Introduction to Information Retrieval", ch. 13). The
reference library (`/root/reference`) has no classifier surface; this
belongs to the engine's pipeline extensions mandated by the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.caching import (
    scoped_persist,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.lm import (
    _log2_micros,
)

__all__ = ["nb_train", "nb_classify"]


def _token_stream(
    df: DataFrame, *, id_col: str, text_col: str, label_col: str | None
) -> DataFrame:
    cols = [id_col] + ([label_col] if label_col else [])
    return df.select(
        *cols, F.explode(F.split(F.col(text_col), " ")).alias("__t")
    )


def nb_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str,
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Fit add-one-smoothed multinomial NB. Returns ``(priors,
    grid)``:

    - ``priors``: one row per label — ``(label, n_docs,
      prior_micros)`` with ``prior_micros = round(log2(n_docs /
      total_docs), 6)`` on the integer lattice;
    - ``grid``: the dense (vocab × label) likelihood table —
      ``(token, label, ll_micros)`` with ``ll_micros =
      round(log2((count + 1) / (label_total + V)), 6)`` micros, where
      ``label_total`` counts the label's IN-VOCAB token occurrences
      and ``V`` is the realized vocabulary size (≤ ``vocab_size``).

    Both are unresolved DataFrames; ``nb_classify`` broadcasts them.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    toks = _token_stream(
        df, id_col=id_col, text_col=text_col, label_col=label_col
    )
    # Top-V tokens by corpus frequency, ties by token asc: a total
    # deterministic order, so the cap is reproducible cross-engine.
    vocab = (
        toks.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__t").asc())
        .limit(vocab_size)
        .select(F.col("__t"))
    )
    vtoks = toks.join(F.broadcast(vocab), "__t")
    # (token, label) occurrence counts; per-label totals ROLL UP from
    # the count table (not the stream), and V comes from the same
    # table — one aggregation pass over the occurrence stream total.
    counts = scoped_persist(
        vtoks.groupBy("__t", label_col).agg(
            F.count(F.lit(1)).alias("__cnt")
        )
    )
    label_tot = counts.groupBy(label_col).agg(
        F.sum("__cnt").alias("__tot")
    )
    vocab_realized = counts.select("__t").distinct()
    v_realized = vocab_realized.agg(F.count(F.lit(1)).alias("__v"))
    label_docs = df.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # Prior denominator stays in-plan (a 1-row broadcast), no eager
    # driver-side count.
    total_docs = label_docs.agg(F.sum("n_docs").alias("__n_total"))
    priors = label_docs.join(F.broadcast(total_docs)).withColumn(
        "prior_micros",
        _log2_micros(
            F.col("n_docs").cast("double")
            / F.col("__n_total").cast("double")
        ),
    )
    # Dense grid: every (vocab token, label) pair gets a smoothed
    # likelihood, including zero-count pairs — that's what makes the
    # model a self-contained broadcast table. The label dimension MUST
    # come from the corpus labels (label_docs), not from the count
    # table: a label whose every token fell outside the vocab cap has
    # no count rows, and deriving labels from counts would silently
    # drop it from the model — scoring would then give it implicit
    # likelihood 1 per token (prior-only) instead of the smoothed
    # 1/(0+V) the multinomial model prescribes (hypothesis-found edge).
    # ``__v`` rides on the label_support broadcast (an L-row × 1-row
    # cross of two counts-derived aggregates) instead of a broadcast of
    # its own: every broadcast subtree is a sequential build round for
    # the driver, and this model needs the deepest chain in the repo
    # (grid ← support ← counts ← vocab) — one fewer round per train.
    label_support = (
        label_docs.select(label_col)
        .join(label_tot, label_col, "left")
        .select(
            label_col, F.coalesce(F.col("__tot"), F.lit(0)).alias("__tot")
        )
        .crossJoin(v_realized)
    )
    grid = (
        vocab_realized
        .crossJoin(F.broadcast(label_support))
        .join(counts, ["__t", label_col], "left")
        .select(
            F.col("__t").alias("token"),
            F.col(label_col),
            _log2_micros(
                (F.coalesce(F.col("__cnt"), F.lit(0)) + F.lit(1)).cast(
                    "double"
                )
                / (F.col("__tot") + F.col("__v")).cast("double")
            ).alias("ll_micros"),
        )
    )
    return priors.select(label_col, "n_docs", "prior_micros"), grid


def nb_classify(
    df: DataFrame,
    priors: DataFrame,
    grid: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Score every document against every label and keep the argmax:
    ``(id, pred_<label>, score_micros)`` where ``score_micros`` =
    prior + Σ in-vocab token likelihoods (exact BIGINT). Ties break
    to the lexicographically smallest label. Documents with no
    in-vocab tokens score on the prior alone (docs × labels grid with
    ``coalesce``)."""
    toks = _token_stream(df, id_col=id_col, text_col=text_col, label_col=None)
    occ = (
        toks.join(
            F.broadcast(grid), toks["__t"] == grid["token"]
        )
        .groupBy(id_col, label_col)
        .agg(F.sum("ll_micros").alias("__tok_sum"))
    )
    scored = (
        df.select(id_col)
        .crossJoin(F.broadcast(priors.select(label_col, "prior_micros")))
        .join(occ, [id_col, label_col], "left")
        .select(
            id_col,
            F.col(label_col),
            (
                F.col("prior_micros")
                + F.coalesce(F.col("__tok_sum"), F.lit(0))
            ).alias("__score"),
        )
    )
    # Map-side-combinable argmax: min(struct(-score, label)) == max
    # score with smallest-label tie-break (clustering.py's pattern).
    best = (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("__score")).alias("__neg"),
                    F.col(label_col).alias("__lbl"),
                )
            ).alias("__best")
        )
        .select(
            id_col,
            F.col("__best.__lbl").alias(f"pred_{label_col}"),
            (-F.col("__best.__neg")).alias("score_micros"),
        )
    )
    return best
