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

__all__ = [
    "dot",
    "norm",
    "cosine",
    "cosine_topk",
    "with_lsh_bucket",
    "lsh_ann_topk",
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
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = (
        corpus.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col))
        .withColumn("cos_sim", F.round(cosine("__qvec", vec_col), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cos_sim")
    )


def _random_planes(num_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(num_planes)
    ]


def _plane_literal(plane: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in plane) + ")"


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
    return df.withColumn(out_col, F.expr(bits))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Trades recall for a ~2^num_planes candidate reduction; the
    exact `cosine_topk` is the quality baseline."""
    bucketed = with_lsh_bucket(
        corpus, vec_col=vec_col, num_planes=num_planes, dim=dim, seed=seed
    )
    q = with_lsh_bucket(
        queries.select(query_id_col, vec_col),
        vec_col=vec_col,
        num_planes=num_planes,
        dim=dim,
        seed=seed,
    ).select(query_id_col, F.col(vec_col).alias("__qvec"), "lsh_bucket")
    scored = (
        bucketed.join(F.broadcast(q), "lsh_bucket")
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("cos_sim", F.round(cosine("__qvec", vec_col), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cos_sim")
    )
