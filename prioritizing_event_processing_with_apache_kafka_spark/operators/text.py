"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is native Column expressions (split / transform /
aggregate lambdas run inside whole-stage codegen) — no Python UDFs, so
the operators scale linearly with input partitions and never serialize
rows across the JVM/Python boundary.

Operators:

- tokenization + token counting (whitespace and regex "BPE-ish" word
  pieces);
- quality scoring (length, mean word length, stopword ratio);
- language identification (stopword-hit heuristic, deterministic);
- document fingerprinting (polynomial rolling hash over tokens —
  order-sensitive, unlike a bag-of-words hash).

Every operator has an exact ANSI-SQL twin (see ``inventory.py``), which
keeps them oracle-checkable: the fingerprint, for instance, folds
``acc = (acc*31 + tokenValue) % 1_000_000_007`` sequentially, which both
Spark's ``aggregate`` and DuckDB's ``list_reduce`` reproduce bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.caching import (
    scoped_persist,
)

__all__ = [
    "STOPWORDS",
    "tokens",
    "token_counts",
    "quality_features",
    "language_guess",
    "fingerprint",
    "repetition_stats",
    "corpus_bigram_stats",
    "chunk_documents",
    "vocab_coverage",
    "redact_pii",
    "PII_PATTERNS",
    "bpe_pair_counts",
    "vocab_drift",
]

# Tiny deterministic stopword list (intersects the fixture vocabulary).
STOPWORDS = ("the", "a", "of", "to", "and")

FP_MOD = 1_000_000_007
FP_MULT = 31


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokens (single-space split, matching the oracle)."""
    return F.split(F.col(text_col), " ")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_tokens`` (whitespace) and ``n_tokens_re`` (regex word
    pieces ``[a-z0-9]+`` — a BPE-ish lower bound on subword count)."""
    return df.withColumn("n_tokens", F.size(tokens(text_col))).withColumn(
        "n_tokens_re",
        F.size(F.expr(f"regexp_extract_all({text_col}, '[a-z0-9]+', 0)")),
    )


def _stopword_hits(text_col: str) -> Column:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(f"size(filter(split({text_col}, ' '), t -> t IN ({stop_list})))")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features per document:

    - ``n_chars_m``   — measured character length;
    - ``n_tokens``    — whitespace token count;
    - ``mean_word_len`` — avg token length (chars-without-spaces / tokens);
    - ``stopword_ratio`` — stopword hits / tokens;
    - ``alnum_ratio``  — [a-z0-9] characters / characters (the
      punctuation/garbage detector: low values flag boilerplate,
      markup, or binary-ish text);
    - ``digit_ratio``  — [0-9] characters / characters (tables and
      serial-number dumps score high).

    Ratios are exact integer divisions cast to double (deterministic
    across engines).
    """
    tok = tokens(text_col)
    n_tokens = F.size(tok)
    n_chars = F.length(F.col(text_col))
    non_space = n_chars - (n_tokens - F.lit(1))  # single-space separated
    n_alnum = n_chars - F.length(F.regexp_replace(F.col(text_col), "[a-z0-9]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    return (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "mean_word_len", non_space.cast("double") / n_tokens.cast("double")
        )
        .withColumn(
            "stopword_ratio",
            _stopword_hits(text_col).cast("double") / n_tokens.cast("double"),
        )
        # empty document -> NULL ratios (not DIVIDE_BY_ZERO under ANSI
        # sessions / NaN elsewhere; DuckDB's x/0 is NULL, so the oracle
        # agrees). n_tokens needs no guard: split('') yields [''], so
        # it is always >= 1.
        .withColumn(
            "alnum_ratio",
            F.when(n_chars > 0, n_alnum.cast("double") / n_chars.cast("double")),
        )
        .withColumn(
            "digit_ratio",
            F.when(n_chars > 0, n_digit.cast("double") / n_chars.cast("double")),
        )
    )


def language_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stopword-hit language heuristic.

    Predicts ``en`` when at least two English stopword token hits occur,
    else ``und`` (undetermined). Deliberately simple — the point is a
    deterministic, SQL-expressible language-ID *operator* slot; swap the
    wordlists for real per-language tables in production.
    """
    return df.withColumn(
        "lang_pred",
        F.when(_stopword_hits(text_col) >= 2, F.lit("en")).otherwise(F.lit("und")),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition ratios, zero-shuffle.

    - ``dup_token_ratio``  — fraction of tokens that are repeats of an
      earlier token: ``(n - n_distinct) / n``;
    - ``dup_bigram_ratio`` — same over consecutive token bigrams;
    - ``dup_trigram_ratio`` — same over trigrams.

    High values flag degenerate repetition (keyboard mash, scraped
    boilerplate loops) that length/stopword features miss. Rather than
    the mode-frequency variant (which needs a per-ngram count), the
    duplicate-excess form is pure array arithmetic — ``size`` minus
    ``size ∘ array_distinct`` — so each document is scored in a single
    narrow pass inside whole-stage codegen: no explode, no shuffle, and
    the operator composes with any scan without changing partitioning.
    """
    toks = "__peps_toks"

    def ngrams(n: int) -> str:
        parts = [
            f"slice({toks}, {i + 1}, greatest(size({toks}) - {n - 1}, 0))"
            for i in range(n)
        ]
        fields = ", ".join(f"s.`{i}`" for i in range(n))
        return f"transform(arrays_zip({', '.join(parts)}), s -> concat_ws(' ', {fields}))"

    def dup_ratio(arr: str) -> Column:
        return F.expr(
            f"CASE WHEN size({arr}) > 0 THEN "
            f"CAST(size({arr}) - size(array_distinct({arr})) AS DOUBLE) / size({arr}) "
            f"ELSE 0.0 END"
        )

    return (
        df.withColumn(toks, tokens(text_col))
        .withColumn("n_tokens", F.size(F.col(toks)))
        .withColumn("dup_token_ratio", dup_ratio(toks))
        .withColumn("dup_bigram_ratio", dup_ratio(ngrams(2)))
        .withColumn("dup_trigram_ratio", dup_ratio(ngrams(3)))
        .drop(toks)
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over tokens, ``acc = (acc*31 + len(t)*31 + ascii(t[0])) % 1e9+7``.

    Sequential left fold — content moves ⇒ fingerprint moves; cheap
    (single pass, no shuffle) and identical in any engine with a
    sequential list fold.
    """
    return df.withColumn(
        "fingerprint",
        F.expr(
            f"aggregate(split({text_col}, ' '), 0L, "
            f"(acc, t) -> (acc * {FP_MULT} + (length(t) * {FP_MULT} + ascii(substring(t, 1, 1)))) % {FP_MOD})"
        ),
    )


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Sliding-window token chunking — the context-window splitter every
    LLM training pipeline runs before tokenized packing.

    Emits one row per chunk: ``(id, chunk_id, chunk_text,
    n_chunk_tokens)``. Chunk *i* covers tokens ``[i·stride, i·stride +
    chunk_size)``; with ``stride < chunk_size`` consecutive chunks
    overlap by ``chunk_size - stride`` tokens so no boundary context is
    lost. The chunk count is exact integer arithmetic
    (``1 + ⌈max(n - chunk_size, 0) / stride⌉``), the last chunk may be
    short but never empty, and a document shorter than one window yields
    exactly one chunk.

    Pure narrow explode — no shuffle, scales with input splits; output
    row count is ~``n_tokens / stride`` per document, the fan-out any
    downstream tokenizer pays anyway.
    """
    if stride < 1 or chunk_size < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    toks = "__peps_toks"
    n_chunks = (
        f"1 + (greatest(size({toks}) - {chunk_size}, 0) + {stride - 1}) div {stride}"
    )
    return (
        df.withColumn(toks, tokens(text_col))
        .withColumn("chunk_id", F.explode(F.expr(f"sequence(0, ({n_chunks}) - 1)")))
        .withColumn(
            "chunk_text",
            F.expr(f"array_join(slice({toks}, chunk_id * {stride} + 1, {chunk_size}), ' ')"),
        )
        .withColumn(
            "n_chunk_tokens",
            F.expr(f"size(slice({toks}, chunk_id * {stride} + 1, {chunk_size}))"),
        )
        .select(id_col, "chunk_id", "chunk_text", "n_chunk_tokens")
    )


def vocab_coverage(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary head: the ``top_k`` most frequent tokens with
    their corpus counts and the cumulative coverage fraction — the
    standard first look when sizing a tokenizer vocabulary ("how many
    types cover 90% of tokens?").

    One explode + map-side-combinable count builds the frequency table.
    The head is taken with ``orderBy(...).limit(top_k)`` — a
    distributed per-partition top-k (TakeOrderedAndProject), never a
    global sort: web-scale vocabularies run to 10⁸+ distinct
    whitespace tokens (URLs, typos, numbers), far too many for the
    single-task unpartitioned window the naive formulation implies.
    Only the ``top_k``-row head flows into the rank/cumulative-sum
    window, so its global sort is bounded by ``top_k`` regardless of
    corpus or vocabulary size; the corpus-wide token total comes from a
    separate scalar aggregate. The head rows and their order are
    exactly the first ``top_k`` rows of the full-frame ordering, so
    rank and cumulative coverage are unchanged.
    """
    freq = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    total = freq.agg(F.sum("occurrences").cast("double").alias("__total"))
    head = freq.orderBy(F.desc("occurrences"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("occurrences"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        head.join(F.broadcast(total))
        .withColumn("vocab_rank", F.row_number().over(w))
        .withColumn(
            "coverage", F.sum("occurrences").over(w).cast("double") / F.col("__total")
        )
        .select("vocab_rank", "token", "occurrences", F.round("coverage", 6).alias("coverage"))
    )


def bpe_pair_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies within tokens —
    the first merge iteration of BPE tokenizer training ("which symbol
    pair occurs most often?"). Returns the ``top_k`` pairs with counts
    and rank.

    Shape: one explode to tokens, one explode to the O(chars) pair
    stream (``substring(token, i, 2)`` per in-token position — pairs
    never cross token boundaries, matching BPE's word-boundary rule),
    then a map-side-combinable count and a bounded
    ``orderBy().limit()`` head — the same scale discipline as
    :func:`vocab_coverage` (never a global sort over the pair space).
    """
    pair_stream = (
        df.select(F.explode(tokens(text_col)).alias("__t"))
        .filter(F.length("__t") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(__t) - 1), i -> substring(__t, i, 2))")
            ).alias("pair")
        )
    )
    head = (
        pair_stream.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("pair"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("occurrences"), F.asc("pair"))
    return head.withColumn("pair_rank", F.row_number().over(w)).select(
        "pair_rank", "pair", "occurrences"
    )


# PII patterns kept deliberately RE2-and-Java-compatible (no backrefs,
# no lookaround) so the same regex runs identically in Spark and any
# RE2-based oracle engine. Replacement order matters only in that each
# class's token must not re-match a later pattern — the literal tokens
# contain no digits or '@', so any order is safe.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Scrub personally-identifiable substrings (emails, SSN-shaped
    ids, IPv4 addresses) from a text column — the compliance pass that
    runs before any corpus leaves the ingestion boundary.

    Adds ``out_col`` (the scrubbed text) plus one ``n_<class>`` count
    per pattern class, counted on the *original* text so downstream
    audits can aggregate PII density per source. All regexes execute
    JVM-side (``regexp_replace`` / ``regexp_count``) — single narrow
    pass, no shuffle, no Python.

    The patterns are recall-oriented screens, not validators (e.g. the
    IPv4 screen matches out-of-range octets like ``999.0.0.1`` —
    over-redaction is the safe failure mode for PII).
    """
    out = df
    redacted = F.col(text_col)
    for name, pattern, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pattern))
        )
        redacted = F.regexp_replace(redacted, pattern, token)
    return out.withColumn(out_col, redacted)


def corpus_bigram_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_threshold: int = 2,
) -> DataFrame:
    """Corpus-frequency quality signal per document — the exact-
    arithmetic stand-in for an n-gram-LM perplexity filter.

    A language-model perplexity score needs float log-sums whose value
    depends on summation order — unusable for a bit-reproducible,
    oracle-checkable gate at 1000-way parallelism. The same filtering
    signal survives in integer form: score each document by how common
    its token bigrams are in the whole corpus.

    - ``n_bigrams``         — bigrams in the document;
    - ``avg_bigram_freq``   — mean corpus occurrence count of them
      (integer sum ÷ count, one exact division — high for templated/
      boilerplate text, low for unusual text);
    - ``rare_bigram_ratio`` — fraction whose corpus count ≤
      ``rare_threshold`` (the "likely garbage or very novel" flag).

    Shape: one corpus pass builds the bigram frequency table
    (map-side-combinable count), one shuffle join scores documents
    against it, one groupBy(doc) reassembles — the span-dedup shape,
    linear at any corpus size.
    """
    toks = "__peps_toks"
    bigram = (
        f"transform(arrays_zip("
        f"slice({toks}, 1, greatest(size({toks}) - 1, 0)), "
        f"slice({toks}, 2, greatest(size({toks}) - 1, 0))), "
        f"s -> concat_ws(' ', s.`0`, s.`1`))"
    )
    # persisted: bg feeds the frequency aggregate AND the score join
    # (the lm.py bigram_lm_score pattern) — without the cache the
    # tokenize+explode runs twice per action
    bg = scoped_persist(
        df.withColumn(toks, tokens(text_col)).select(
            id_col, F.explode(F.expr(bigram)).alias("__bg")
        )
    )
    freq = bg.groupBy("__bg").agg(F.count(F.lit(1)).alias("__freq"))
    return (
        bg.join(freq, "__bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum("__freq").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_bigram_freq"),
            (
                F.sum(
                    F.when(F.col("__freq") <= rare_threshold, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("rare_bigram_ratio"),
        )
    )


def vocab_drift(
    docs: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """Per-source vocabulary drift between the EARLY and LATE halves of
    a corpus — the monitoring query a continuously-ingested training
    corpus runs to catch a source changing under the pipeline (new
    crawl template, language shift, spam infiltration): compare each
    half's top-``top_k`` term set and report the overlap.

    Halves split at the per-source midpoint ``(min_id + max_id) DIV 2``
    (deterministic; corpus ids are ingestion-ordered, so the halves
    are 'then' vs 'now'). Terms are lowercased whitespace tokens
    (repo convention); each half's top-k ranks by
    ``(count DESC, term ASC)`` — fully deterministic. The top-k sets
    meet in a single term-level aggregate (membership flags summed),
    NOT a self-join, so the plan is: explode → two hash aggregates →
    one window over (source, half) groups → two tiny folds.

    Returns per source: ``n_early``/``n_late`` (actual top-set sizes,
    < top_k only for tiny vocabularies), ``overlap``, and
    ``jaccard_ppm = overlap·10⁶ DIV (n_early + n_late − overlap)``.
    Low Jaccard = the source drifted. At 100 TB everything after the
    term-count aggregate is vocabulary-sized.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pyspark.sql import Window

    bounds = docs.groupBy(source_col).agg(
        F.expr(f"(min({id_col}) + max({id_col})) DIV 2").alias("__mid")
    )
    halves = (
        docs.join(F.broadcast(bounds), source_col)
        .withColumn(
            "__half",
            F.when(F.col(id_col) <= F.col("__mid"), F.lit("early")).otherwise(
                F.lit("late")
            ),
        )
        .select(
            source_col,
            "__half",
            F.explode(F.split(F.col(text_col), " ")).alias("__t"),
        )
        .withColumn("__term", F.lower(F.col("__t")))
        .filter(F.col("__term") != "")
    )
    counts = halves.groupBy(source_col, "__half", "__term").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    rank = F.row_number().over(
        Window.partitionBy(source_col, "__half").orderBy(
            F.col("__cnt").desc(), F.col("__term").asc()
        )
    )
    tops = counts.withColumn("__rn", rank).filter(F.col("__rn") <= top_k)
    flags = tops.groupBy(source_col, "__term").agg(
        F.max(F.when(F.col("__half") == "early", 1).otherwise(0)).alias("__e"),
        F.max(F.when(F.col("__half") == "late", 1).otherwise(0)).alias("__l"),
    )
    return (
        flags.groupBy(source_col)
        .agg(
            F.sum("__e").cast("bigint").alias("n_early"),
            F.sum("__l").cast("bigint").alias("n_late"),
            F.sum(F.col("__e") * F.col("__l")).cast("bigint").alias("overlap"),
        )
        .withColumn(
            "jaccard_ppm",
            F.expr(
                "overlap * 1000000 DIV (n_early + n_late - overlap)"
            ).cast("bigint"),
        )
    )
