"""Market-basket co-occurrence mining: frequent item pairs with lift.

The first rung of association-rule mining (the pair-counting core of
Apriori/FP-growth): which items appear together in the same basket
more often than chance? Retail uses it for cross-sell; a curation
pipeline uses the same operator for tag/source co-occurrence and
feature crosses.

Scale shape: ONE shuffle of the fact table (group items into per-
basket arrays), then pairs are generated BASKET-LOCALLY by an array
comprehension inside the exploding projection — no self-join, so the
only non-linear cost is C(basket_size, 2) rows out of the explode,
bounded by the largest basket (order baskets are single digits; a
degenerate mega-basket should be capped upstream). Pair counts,
item supports, and the basket total all derive from the same cached
basket frame — one fact scan total. Lift is computed on the integer
ppm lattice so the result is hash-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.caching import (
    scoped_persist,
)

__all__ = ["cooccurrence_lift"]


def cooccurrence_lift(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Frequent item pairs with integer-ppm lift.

    Multiplicity inside a basket is ignored (classic basket semantics:
    an order containing a part twice still supports each pair once),
    so the operator first reduces to DISTINCT (basket, item). For each
    unordered pair ``a < b`` seen in ``>= min_pair_count`` baskets:

        ``lift_ppm = pair_count * n_baskets * 1e6 DIV (cnt_a * cnt_b)``

    — the observed co-occurrence rate over the rate expected if the
    items were independent, in parts-per-million (1e6 = independent,
    above = attractive, below = repulsive), computed entirely in
    BIGINT arithmetic.

    Returns ``(item_a, item_b, pair_count, count_a, count_b,
    lift_ppm)``.
    """
    # ONE shuffle: baskets become sorted distinct-item arrays
    # (collect_set dedups multiplicity; sort_array fixes pair order so
    # a < b holds by construction). Cached because pairs, supports,
    # and the total all read it — one fact scan, not three.
    baskets = scoped_persist(
        df.groupBy(F.col(basket_col).alias("__b")).agg(
            F.sort_array(F.collect_set(F.col(item_col))).alias("__items")
        )
    )
    # Basket-local pair comprehension: for the i-th item, partner with
    # every later item (1-based slice from i+2). Explode fan-out is
    # C(|basket|, 2) — the algorithm's floor — with zero join.
    pair_rows = F.explode(
        F.expr(
            "flatten(transform(__items, (x, i) -> "
            "transform(slice(__items, i + 2, size(__items)), "
            "y -> struct(x AS item_a, y AS item_b))))"
        )
    )
    pairs = (
        baskets.select(pair_rows.alias("__p"))
        .select("__p.item_a", "__p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .filter(F.col("pair_count") >= F.lit(min_pair_count))
    )
    supports = (
        baskets.select(F.explode("__items").alias("__i"))
        .groupBy("__i")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    # One-row basket total, broadcast-cross-joined so the whole plan
    # stays lazy (no driver-side action at construction time).
    totals = baskets.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_baskets")
    )
    sa = supports.select(F.col("__i").alias("item_a"), F.col("__cnt").alias("count_a"))
    sb = supports.select(F.col("__i").alias("item_b"), F.col("__cnt").alias("count_b"))
    # Integer-overflow envelope: pair_count * n_baskets * 1e6 must fit
    # int64, i.e. pair_count * n_baskets < 9.2e12 — comfortable for any
    # realistic support threshold (hot pairs are capped by n_baskets;
    # beyond that, pre-divide supports by a common scale upstream).
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .join(F.broadcast(totals))
        .withColumn(
            "lift_ppm",
            F.expr("pair_count * __n_baskets * 1000000L DIV (count_a * count_b)"),
        )
        .select(
            "item_a", "item_b", "pair_count", "count_a", "count_b", "lift_ppm"
        )
    )
