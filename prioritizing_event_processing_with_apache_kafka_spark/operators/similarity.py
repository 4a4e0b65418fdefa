"""Embedding similarity search: exact cosine top-k and LSH-bucketed ANN.

Scale design:

- **Exact top-k** broadcast-joins the (small) query set against the
  corpus — one scan, no corpus shuffle, per-partition partial top-k via
  window rank after a broadcast cross join. Right for "few queries ×
  huge corpus".
- **ANN path** buckets vectors by random-hyperplane LSH (sign bits of
  ``v·plane``): corpus is bucketed once (shuffle on a small int key),
  queries probe only their own bucket — the 100 TB-side answer when the
  query set is itself large. Planes are deterministic literals (seeded),
  so results are reproducible run-to-run.
- The dot product is a native ``zip_with``/``aggregate`` fold in float64
  with a **fixed sequential order**, making values bit-reproducible and
  oracle-checkable (DuckDB's ``list_reduce`` replays the same fold).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.caching import (
    scoped_persist,
)

__all__ = [
    "dot",
    "norm",
    "cosine",
    "cosine_pandas",
    "cosine_topk",
    "with_lsh_bucket",
    "lsh_ann_topk",
    "with_ivf_cell",
    "ivf_ann_topk",
    "semantic_neardup_pairs",
    "quantize_vectors",
    "quantized_ann_topk",
    "pq_train_encode",
    "pq_ann_topk",
]


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold float64 dot product (bit-reproducible)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    ``queries`` (small) is broadcast; the corpus is scanned once. Ties
    broken by ascending corpus id → fully deterministic ranking.
    Self-matches (same id) are excluded.

    Each side's squared norm is precomputed *before* the join, so a
    scored pair costs one dot-product fold instead of three. The score
    ``dot / (sqrt(n2a)·sqrt(n2b))`` is arithmetic-identical to
    :func:`cosine` (same fold order, same sqrt), so rankings and oracle
    hashes are unchanged.
    """
    # Zero-norm guard (both sides): cosine with a zero vector is
    # 0/0 = NaN, and Spark sorts NaN *above* every real double — one
    # all-zero corpus row would rank #1 for every query. Same policy as
    # quantized_ann_topk: a zero vector has no cosine neighbors, drop it.
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        dot(vec_col, vec_col).alias("__n2q"),
    ).filter(F.col("__n2q") > 0)
    c = corpus.withColumn("__n2c", dot(vec_col, vec_col)).filter(F.col("__n2c") > 0)
    cos = dot("__qvec", vec_col) / (F.sqrt(F.col("__n2c")) * F.sqrt(F.col("__n2q")))
    scored = (
        c.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col))
        .withColumn("cos_sim", F.round(cos, 6))
    )
    return _topk_per_query(scored, query_id_col, id_col, k, "cos_sim")



def _topk_per_query(
    scored, query_id_col: str, id_col: str, k: int, score_col: str
):
    """Shared rank-and-trim epilogue for every top-k variant: best k
    rows per query by (score desc, id asc) — one place to change
    tie-break or rounding policy for all four operators."""
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", score_col)
    )


def _random_planes(num_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(num_planes)
    ]


def _plane_literal(plane: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in plane) + ")"



def _dim_checked(expr_sql: str, vec_col: str, dim: int) -> str:
    """Wrap a bucketing expression so a vector whose length differs
    from the configured ``dim`` fails loudly. Without this,
    ``zip_with`` pads the shorter side with NULLs, the dot products go
    NULL, every sign test reads false, and ALL rows silently collapse
    into bucket/cell 0 — an ANN index that degrades to a full scan
    with no error anywhere.

    Folded into the OUTPUT expression as ``nvl(assert_true(...), e)``
    — one size comparison per row. (Wrapping the vector column itself
    in a when/raise_error was measured 40x slower on the LSH query:
    the conditional re-evaluates per plane reference and defeats
    common-subexpression elimination.)"""
    check = (
        f"assert_true(size({vec_col}) = {dim}, "
        f"concat('{vec_col}: vector length != configured dim {dim}: got ', "
        f"CAST(size({vec_col}) AS STRING)))"
    )
    return f"nvl({check}, {expr_sql})"


def with_lsh_bucket(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (int in [0, 2^num_planes)).

    ``bit_j = sign(v · plane_j)``; planes are deterministic seeded
    literals folded into the plan (broadcast-free — they're constants).
    """
    planes = _random_planes(num_planes, dim, seed)
    bits = " + ".join(
        f"if(aggregate(zip_with({vec_col}, {_plane_literal(p)}, "
        f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0, "
        f"{1 << j}, 0)"
        for j, p in enumerate(planes)
    )
    return df.withColumn(out_col, F.expr(_dim_checked(bits, vec_col, dim)))


def cosine_pandas(a: str | Column, b: str | Column) -> Column:
    """Arrow-vectorized cosine via a pandas UDF.

    The native ``zip_with``/``aggregate`` fold (``cosine``) runs as an
    *interpreted* higher-order expression — fine per-pair, but on a wide
    fan-out (every corpus row × every query) the per-element lambda
    overhead dominates. This variant ships Arrow batches to NumPy and
    does one ``einsum`` per batch — the documented ~10-100× path for
    Python-side math. Results differ from the sequential fold only in
    float summation order, so use the native fold when bit-reproducible
    oracle parity matters and this one for throughput.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: no type annotations on the UDF — this module uses
    # `from __future__ import annotations`, which stringifies hints and
    # breaks pandas_udf's type-hint inference (pd is function-local);
    # an unannotated function takes the plain SCALAR eval path.
    @pandas_udf("double")
    def _cos(xs, ys):
        xm = np.stack(xs.to_numpy()).astype("float64")
        ym = np.stack(ys.to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", xm, ym)
        norms = np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1)
        return pd.Series(dots / norms)

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)


def _random_centroids(num_cells: int, dim: int, seed: int = 11) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(num_cells)
    ]


def with_ivf_cell(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    num_cells: int = 8,
    dim: int = 64,
    seed: int = 11,
    out_col: str = "ivf_cell",
    nprobe: int = 1,
) -> DataFrame:
    """IVF cell assignment: nearest (by cosine) of ``num_cells`` seeded
    literal centroids; with ``nprobe > 1`` emits the n nearest cells as
    an array (query-side multi-probe). Deterministic run-to-run."""
    centroids = _random_centroids(num_cells, dim, seed)
    norms = [math.sqrt(sum(x * x for x in c)) for c in centroids]
    sims = ", ".join(
        f"aggregate(zip_with({vec_col}, {_plane_literal(c)}, "
        f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / {n}"
        for c, n in zip(centroids, norms)
    )
    ranked = (
        f"transform(array_sort(transform(array({sims}), (s, i) -> struct(-s AS negs, i AS cell))), "
        f"x -> x.cell)"
    )
    if nprobe == 1:
        return df.withColumn(
            out_col, F.expr(_dim_checked(f"element_at({ranked}, 1)", vec_col, dim))
        )
    return df.withColumn(
        out_col, F.expr(_dim_checked(f"slice({ranked}, 1, {nprobe})", vec_col, dim))
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_cells: int = 8,
    nprobe: int = 2,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """IVF approximate top-k: corpus is partitioned into centroid cells
    once (the inverted file); each query scores only the ``nprobe``
    nearest cells. The scale path when both corpus *and* query set are
    large: candidate volume drops by ~num_cells/nprobe, and the cell
    assignment is a one-off linear pass that persists with the table."""
    # Zero-norm guard on both sides — see cosine_topk.
    cells = (
        with_ivf_cell(
            corpus, vec_col=vec_col, num_cells=num_cells, dim=dim, seed=seed, nprobe=1
        )
        .withColumn("__n2c", dot(vec_col, vec_col))
        .filter(F.col("__n2c") > 0)
    )
    probes = (
        with_ivf_cell(
            queries.select(query_id_col, vec_col),
            vec_col=vec_col,
            num_cells=num_cells,
            dim=dim,
            seed=seed,
            nprobe=nprobe,
            out_col="__probe_cells",
        )
        .select(
            query_id_col,
            F.col(vec_col).alias("__qvec"),
            dot(vec_col, vec_col).alias("__n2q"),
            F.explode("__probe_cells").alias("ivf_cell"),
        )
        .filter(F.col("__n2q") > 0)
    )
    # Norms precomputed per side (see cosine_topk): one fold per pair.
    cos = dot("__qvec", vec_col) / (F.sqrt(F.col("__n2c")) * F.sqrt(F.col("__n2q")))
    scored = (
        cells.join(F.broadcast(probes), "ivf_cell")
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("cos_sim", F.round(cos, 6))
    )
    return _topk_per_query(scored, query_id_col, id_col, k, "cos_sim")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    num_tables: int = 1,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: only candidates sharing the query's LSH bucket
    in at least one of ``num_tables`` independent hash tables are
    scored. Single-table recall for a true neighbor at angle θ is
    ``(1 - θ/π)^num_planes``; L independent tables lift it to
    ``1 - (1 - p)^L`` at L× the bucketing cost (candidate volume still
    ~``L · n / 2^num_planes`` per query — far below a corpus scan).
    Table t uses plane seed ``seed + t``, so results stay deterministic.
    The exact `cosine_topk` is the quality baseline; recall against it
    is asserted in ``tests/test_sinks_and_ann.py``."""
    c_bucketed = corpus
    q_bucketed = queries.select(query_id_col, vec_col)
    buckets = []
    for t in range(num_tables):
        col = f"__lsh_{t}"
        kwargs = dict(
            vec_col=vec_col, num_planes=num_planes, dim=dim, seed=seed + t,
            out_col=col,
        )
        c_bucketed = with_lsh_bucket(c_bucketed, **kwargs)
        q_bucketed = with_lsh_bucket(q_bucketed, **kwargs)
        buckets.append(col)
    # One row per (row, table): posexplode keeps the table index so
    # bucket ids from different plane sets never collide.
    # Zero-norm guard on both sides — see cosine_topk.
    c_exploded = c_bucketed.select(
        F.col(id_col),
        F.col(vec_col),
        dot(vec_col, vec_col).alias("__n2c"),
        F.posexplode(F.array(*buckets)).alias("__table", "lsh_bucket"),
    ).filter(F.col("__n2c") > 0)
    q_exploded = q_bucketed.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        dot(vec_col, vec_col).alias("__n2q"),
        F.posexplode(F.array(*buckets)).alias("__table", "lsh_bucket"),
    ).filter(F.col("__n2q") > 0)
    cands = (
        c_exploded.join(F.broadcast(q_exploded), ["__table", "lsh_bucket"])
        .filter(F.col(query_id_col) != F.col(id_col))
        # a pair matching in several tables must be scored once
        .dropDuplicates([query_id_col, id_col])
    )
    # Norms precomputed per side (see cosine_topk): one fold per pair.
    cos = dot("__qvec", vec_col) / (F.sqrt(F.col("__n2c")) * F.sqrt(F.col("__n2q")))
    scored = cands.withColumn("cos_sim", F.round(cos, 6))
    return _topk_per_query(scored, query_id_col, id_col, k, "cos_sim")


def quantize_vectors(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    out_col: str = "qvec",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = 127/max|v|``,
    ``q_i = round(v_i * scale)`` — codes are materialized as
    ``array<tinyint>`` (|q_i| ≤ 127 by construction), realizing the 4×
    (fp32) / 8× (fp64) footprint cut used to keep billion-vector
    indexes in memory.

    Everything is native expressions in a fixed evaluation order
    (float32 → float64 promotion is exact, one double division, one
    HALF_UP round), so quantized vectors are bit-identical across
    engines and the operator is oracle-checkable. Zero vectors get
    ``scale = 0`` and an all-zero code (not NaN).
    """
    max_abs = f"array_max(transform({vec_col}, x -> abs(CAST(x AS DOUBLE))))"
    scale = f"(CASE WHEN {max_abs} = 0.0 THEN 0.0 ELSE 127.0 / {max_abs} END)"
    qvec = f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS TINYINT))"
    return df.withColumn(scale_col, F.expr(scale)).withColumn(out_col, F.expr(qvec))


def quantized_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors.

    Scoring uses the quantized cosine ``dot(qa, qb) / (|qa| |qb|)`` —
    the per-vector scales cancel, so the whole ranking runs on exact
    integer dot products plus one double division per pair. Unlike
    LSH/IVF this is *deterministically* approximate: the score drifts
    from true cosine only by quantization error, the computation itself
    is reproducible bit-for-bit (full DuckDB oracle; recall vs the
    exact ranking is asserted in tests).

    Scale shape: same as :func:`cosine_topk` (broadcast queries, one
    corpus scan) but each pair costs an int32 multiply-add fold instead
    of double arithmetic, and a quantized corpus column read is ~4×
    less I/O than the fp32 original.
    """
    # Zero vectors quantize to all-zero codes (__n2 = 0), which would
    # score 0/0 = NaN — and Spark sorts NaN *above* every real double,
    # so one zero vector would rank #1 for every query. Drop zero-norm
    # rows from both sides instead: a zero vector has no meaningful
    # cosine neighbors in the first place.
    qc = (
        quantize_vectors(corpus, vec_col=vec_col)
        .withColumn(
            "__n2c",
            F.expr("aggregate(qvec, 0L, (acc, v) -> acc + CAST(v AS BIGINT) * v)"),
        )
        .filter(F.col("__n2c") > 0)
    )
    qq = (
        quantize_vectors(queries.select(query_id_col, vec_col), vec_col=vec_col)
        .withColumn(
            "__n2q",
            F.expr("aggregate(qvec, 0L, (acc, v) -> acc + CAST(v AS BIGINT) * v)"),
        )
        .filter(F.col("__n2q") > 0)
        .select(
            query_id_col, F.col("qvec").alias("__qq"), F.col("__n2q")
        )
    )
    int_dot = F.expr(
        "aggregate(zip_with(qvec, __qq, (x, y) -> CAST(x AS BIGINT) * y), "
        "0L, (acc, v) -> acc + v)"
    )
    scored = (
        qc.join(F.broadcast(qq), F.col(query_id_col) != F.col(id_col))
        .withColumn(
            "qcos_sim",
            F.round(
                int_dot.cast("double")
                / (F.sqrt(F.col("__n2c").cast("double") * F.col("__n2q"))),
                6,
            ),
        )
    )
    return _topk_per_query(scored, query_id_col, id_col, k, "qcos_sim")


def _pq_subvectors(
    df: DataFrame, *, id_col: str, vec_col: str, m: int, dsub: int
) -> DataFrame:
    """Explode each L2-normalized vector into its ``m`` subvectors:
    ``(id, __j, __sub)`` with ``__sub`` a float64 array of ``dsub``
    components. Zero-norm vectors are dropped (no meaningful cosine
    neighbors), mirroring the int8 path."""
    n2 = (
        f"aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) * x),"
        " 0.0D, (acc, v) -> acc + v)"
    )
    normed = (
        df.withColumn("__n2", F.expr(n2))
        .filter(F.col("__n2") > 0)
        .withColumn(
            "__nvec",
            F.expr(
                f"transform({vec_col}, x -> CAST(x AS DOUBLE) / sqrt(__n2))"
            ),
        )
    )
    return normed.select(
        id_col,
        "__nvec",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("__j"),
    ).withColumn(
        "__sub", F.expr(f"slice(__nvec, __j * {dsub} + 1, {dsub})")
    ).select(id_col, "__j", "__sub")


def pq_train_encode(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization training + encoding (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    L2-normalized vector into ``m`` subvectors, learn a ``ksub``-entry
    codebook per subspace with Lloyd's iterations, and encode every
    vector as ``m`` sub-centroid ids — the billion-scale ANN memory
    bargain (dim×8 bytes → m bytes per vector; 64-dim float64 at
    m=8/ksub=16 is a 64× footprint cut).

    Deterministic throughout (the clustering.py discipline): codebooks
    initialize to the first ``ksub`` vectors' subvectors by ``id_col``,
    distances round to 6 decimals with sub-centroid-id tie-breaks, and
    centroid updates average on a fixed lattice — so training,
    encoding, and every downstream score are reproducible run-to-run.

    Scale shape: ALL ``m`` subspaces train in the same passes — the
    subvector frame carries a subspace index, so one assignment join
    (codebooks broadcast: m·ksub rows) plus one ``posexplode``
    map-combined average per iteration covers every subspace; nothing
    driver-side, no per-subspace jobs. Encoding is the final
    assignment, one scan. Returns ``(codes, codebooks)``: ``codes`` =
    ``(id, __j, __cid)``, ``codebooks`` = ``(__j, __cid, __cvec)``.
    """
    if m < 1 or ksub < 1 or n_iter < 1:
        raise ValueError("m, ksub and n_iter must be >= 1")
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    sub = scoped_persist(
        _pq_subvectors(corpus, id_col=id_col, vec_col=vec_col, m=m, dsub=dsub)
    )
    seed_ids = (
        sub.select(id_col).distinct().orderBy(id_col).limit(ksub)
    )
    codebooks = (
        sub.join(F.broadcast(seed_ids), id_col)
        .withColumn(
            "__cid",
            F.row_number().over(
                Window.partitionBy("__j").orderBy(id_col)
            )
            - 1,
        )
        .select("__j", "__cid", F.col("__sub").alias("__cvec"))
    )

    def assign(books: DataFrame) -> DataFrame:
        scored = sub.join(F.broadcast(books), "__j").withColumn(
            "__d2",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "__sub",
                        "__cvec",
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0).cast("double"),
                    lambda acc, v: acc + v,
                ),
                6,
            ),
        )
        return (
            scored.groupBy(id_col, "__j")
            .agg(F.min(F.struct("__d2", "__cid")).alias("__best"))
            .select(id_col, "__j", F.col("__best.__cid").alias("__cid"))
        )

    for _ in range(n_iter):
        assigned = assign(codebooks)
        comps = (
            assigned.join(sub, [id_col, "__j"])
            .select("__j", "__cid", F.posexplode("__sub").alias("pos", "v"))
            .groupBy("__j", "__cid", "pos")
            .agg(F.round(F.avg("v"), 6).alias("c"))
        )
        new_books = comps.groupBy("__j", "__cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("__new")
        )
        # empty sub-clusters keep their previous centroid
        codebooks = (
            codebooks.join(new_books, ["__j", "__cid"], "left")
            .select(
                "__j",
                "__cid",
                F.coalesce("__new", "__cvec").alias("__cvec"),
            )
        ).localCheckpoint(eager=True)
    return assign(codebooks), codebooks


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 3,
    rerank: int = 8,
) -> DataFrame:
    """Asymmetric-distance PQ top-k with exact re-ranking: corpus
    encoded to ``m``-code PQ vectors, each query scored against every
    code through a per-query lookup table of exact query-subvector ·
    sub-centroid inner products (ADC — on unit vectors the summed
    table entries approximate cosine, and the error is pure codebook
    quantization: PQ scans ALL codes, so unlike LSH/IVF nothing is
    missed by bucketing). The ADC pass keeps a ``k·rerank`` shortlist
    per query; the shortlist alone is re-scored with exact cosine on
    the full vectors — the standard two-stage ANN deployment (compact
    codes in memory for the scan, full vectors fetched only for the
    shortlist), so the returned scores are EXACT cosines and recall is
    governed by whether the true top-k survives into the shortlist.

    Scale shape: the LUT is (queries × m × ksub) rows — broadcast —
    the ADC pass is one map-side join over the code table plus a
    ``(query, id)``-keyed combine, and the exact stage touches only
    ``queries × k·rerank`` full vectors via a broadcast semi-join:
    the classic IVFADC+rerank loop, minus the IVF cell routing that
    ``ivf_ann_topk`` already covers.
    """
    codes, codebooks = pq_train_encode(
        corpus, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub,
        n_iter=n_iter,
    )
    dim = len(queries.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    qsub = _pq_subvectors(
        queries.select(query_id_col, vec_col),
        id_col=query_id_col,
        vec_col=vec_col,
        m=m,
        dsub=dim // m,
    )
    lut = qsub.join(F.broadcast(codebooks), "__j").select(
        query_id_col,
        "__j",
        "__cid",
        F.aggregate(
            F.zip_with("__sub", "__cvec", lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ).alias("__pdot"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["__j", "__cid"])
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("__pdot"), 6).alias("pq_score"))
        .filter(F.col(query_id_col) != F.col(id_col))
    )
    shortlist = _topk_per_query(
        scored, query_id_col, id_col, k * rerank, "pq_score"
    ).select(query_id_col, id_col)
    full = corpus.select(id_col, F.col(vec_col).alias("__cv"))
    qfull = queries.select(query_id_col, F.col(vec_col).alias("__qv"))
    exact = (
        shortlist.join(full, id_col)
        .join(F.broadcast(qfull), query_id_col)
        .withColumn("cos_sim", F.round(cosine("__cv", "__qv"), 6))
    )
    return _topk_per_query(exact, query_id_col, id_col, k, "cos_sim")


def semantic_neardup_pairs(
    vecs: DataFrame,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    k: int | str = 8,
    n_iter: int = 2,
    threshold: float = 0.4,
    target_cluster_size: int = 5000,
    assignment: str = "exact",
    probes: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means the
    embedding space, then score exact cosine only *within* each cluster.

    All-pairs cosine over a 100 TB corpus is O(n²) and off the table;
    the SemDeDup observation is that semantic duplicates land in the
    same k-means cluster, so clustering first turns the search into
    Σ cluster² — with k sized so clusters average ~1k-10k vectors
    (k ≈ n/5000 in practice; the default 8 matches the fixture scale),
    that is linear-ish work distributed across ordinary hash-join
    tasks. Recall is bounded by assignment: a pair split across two
    clusters is missed, which is the accepted SemDeDup trade-off.

    A FIXED k is quadratic under growth (10× vectors with the same k
    → 100× in-cluster pairs; measured 7.2× wall at 10× volume,
    ``docs/artifacts/scale_probe_r05d_10x.json``). Pass ``k="auto"``
    to size ``k = max(8, ceil(n / target_cluster_size))`` from a
    count of the input, which pins the average cluster size — and
    therefore per-cluster pair cost — as the corpus grows. The
    oracle-checked registry query keeps the fixture-pinned k=8 so its
    DuckDB k-means replay stays static; auto-k is the production
    configuration.

    Clustering reuses :func:`..clustering.kmeans_assignments`
    (deterministic seeding, rounded distances), so the full output —
    cluster ids included — is reproducible and oracle-checkable.

    Returns ``(cluster, x, y, cos_sim)`` pairs with ``x < y`` and
    cosine ≥ ``threshold``.
    """
    from prioritizing_event_processing_with_apache_kafka_spark.operators.clustering import (
        kmeans_assignments,
    )

    if isinstance(k, str):
        if k != "auto":
            raise ValueError(
                f"k must be an int or the literal 'auto', got {k!r}"
            )
        import math

        # One eager count of the input — acceptable: auto-k exists
        # precisely because n is unknown, and the count is a
        # column-pruned scan, not a shuffle.
        k = max(8, math.ceil(vecs.count() / target_cluster_size))
    # assignment="pruned" forwards the two-level coarse-quantized
    # assignment (clustering.py) — the configuration for n ≳ 10⁷
    # vectors where auto-k makes exact assignment's n×k stage the
    # bottleneck (docs/SCALE.md round-6 note). Oracle-checked queries
    # pin the default exact path.
    assigned = kmeans_assignments(
        vecs,
        vector_col=vector_col,
        id_col=id_col,
        k=k,
        n_iter=n_iter,
        assignment=assignment,
        probes=probes,
    ).select(id_col, "cluster")
    # Persisted: both sides of the in-cluster self-join read this frame
    # (without the cache each side would replay the full k-means).
    # The squared norm is precomputed per member so each PAIR costs one
    # dot-product fold instead of three — the expression
    # dot/(sqrt(n2x)·sqrt(n2y)) is arithmetic-identical to cosine(),
    # so results (and oracle hashes) are unchanged.
    # Zero-norm guard — see cosine_topk (a zero vector would NaN every
    # pair it appears in, and NaN ≥ threshold is true in Spark's sort).
    members = (
        vecs.select(id_col, vector_col)
        .join(assigned, id_col)
        .withColumn("__n2", dot(vector_col, vector_col))
        .filter(F.col("__n2") > 0)
    )
    members = scoped_persist(members)
    a = members.select(
        "cluster",
        F.col(id_col).alias("x"),
        F.col(vector_col).alias("__va"),
        F.col("__n2").alias("__n2x"),
    )
    b = members.select(
        "cluster",
        F.col(id_col).alias("y"),
        F.col(vector_col).alias("__vb"),
        F.col("__n2").alias("__n2y"),
    )
    cos = dot("__va", "__vb") / (F.sqrt(F.col("__n2x")) * F.sqrt(F.col("__n2y")))
    return (
        a.join(b, "cluster")
        .filter(F.col("x") < F.col("y"))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("cluster", "x", "y", "cos_sim")
    )
