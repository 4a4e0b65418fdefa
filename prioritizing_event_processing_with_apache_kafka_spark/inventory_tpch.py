"""Query inventory, part 3: wider TPC-H-shape relational coverage.

Adapted to the driver's fixture schema where the classic columns are
absent (no ``partsupp`` table, no ``l_commitdate``/``l_receiptdate``/
``l_shipmode``, no ``o_comment``, no ``c_phone`` — see TESTDATA.md):

- Q4's late-delivery EXISTS becomes "shipped more than 60 days after
  the order date".
- Q9 drops the ``ps_supplycost`` term (profit = discounted revenue).
- Q13 drops the comment filter.
- Q19 keeps the disjunctive brand/size/quantity predicate but loses the
  container/shipmode legs.
- Q22 groups by nation key instead of phone country code.

Every query follows the oracle bit-exactness conventions established in
``inventory.py``: DECIMAL(18,2) casts before money sums with a final
CAST AS DOUBLE, averages as CAST(SUM AS DOUBLE)/COUNT, and a
deterministic tie-breaker on every ranked/limited result.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.sources.tables import load_table

__all__ = ["TPCH_QUERIES", "TPCH_ORACLES"]


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _one() -> F.Column:
    # built lazily — F.lit needs an active SparkContext, which doesn't
    # exist at import time
    return F.lit(1).cast("decimal(18,2)")

_SQL_REVENUE = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))"
)


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted): priority mix of orders with at least
    one line shipped > 60 days after the order date. Semi join keeps the
    aggregate on the orders side — lineitem is probed, never widened."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year, both
    directions. Nation dims are explicitly broadcast (constant-size);
    customer/supplier are deliberately UNHINTED — they grow with scale
    factor, so a hard F.broadcast would OOM at 100 TB, while AQE
    broadcasts them at runtime exactly while they fit."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    volume = (_dec("l_extendedprice") * (_one() - _dec("l_discount")))
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(volume).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       CAST({_SQL_REVENUE} AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part order volume into
    the ASIA region, by year. The share is a conditional-sum ratio over
    one aggregation — no second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_nk"), F.col("n_regionkey").alias("cn_rk")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_nk"), F.col("n_name").alias("supp_nation")
    )
    volume = (_dec("l_extendedprice") * (_one() - _dec("l_discount")))
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n_cust), cust["c_nationkey"] == F.col("cn_nk"))
        .join(F.broadcast(region), F.col("cn_rk") == region["r_regionkey"])
        .join(F.broadcast(n_supp), supp["s_nationkey"] == F.col("sn_nk"))
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    total_vol = F.sum(volume).cast("double")
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((nation_vol / total_vol).alias("mkt_share"))
        .orderBy("o_year")
    )


SQL_Q8 = """
SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO'
  AND r_name = 'ASIA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1
ORDER BY 1
"""


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no ps_supplycost in the fixtures, so
    profit = discounted revenue): profit by supplier nation and year for
    STANDARD-type parts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = (_dec("l_extendedprice") * (_one() - _dec("l_discount")))
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


SQL_Q9 = f"""
SELECT n_name AS nation, CAST(YEAR(l_shipdate) AS BIGINT) AS o_year,
       CAST({_SQL_REVENUE} AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. Deterministic: revenue desc, then customer key asc."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).cast(
        "double"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST({_SQL_REVENUE} AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (adapted: no comment filter): distribution of
    customers by order count, including zero-order customers via the
    left join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_customer = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum 3-month revenue.
    The max is a one-row scalar aggregate broadcast back onto the
    per-supplier frame (the q22 avg_bal pattern) — an unpartitioned
    ``dense_rank`` window would shuffle the whole per-supplier frame
    (scale-proportional: sf × 10k rows) onto ONE task just to find a
    scalar."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).cast(
        "double"
    )
    per_supp = li.groupBy("l_suppkey").agg(revenue.alias("total_revenue"))
    best = per_supp.agg(F.max("total_revenue").alias("__best"))
    top = (
        per_supp.join(
            F.broadcast(best), F.col("total_revenue") == F.col("__best")
        )
        .drop("__best")
    )
    return (
        top.join(supp, top["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_Q15 = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, CAST({_SQL_REVENUE} AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
"""


def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: no container/shipmode columns):
    disjunctive brand × size-range × quantity-range predicate pushed
    into one broadcast-join scan, single revenue scalar."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).cast(
        "double"
    )
    return joined.filter(cond).agg(revenue.alias("revenue"))


SQL_Q19 = f"""
SELECT CAST({_SQL_REVENUE} AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nation key instead of phone country
    code, and "dormant" = no order since 2000 — every fixture customer
    has ordered at least once): per-nation count and balance of
    above-average-balance customers gone dormant. The average is a
    broadcast scalar; the anti join probes only the filtered recent
    orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a"))
        .select("a")
    )
    rich = cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a")).drop("a")
    idle = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


SQL_Q22 = """
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
ORDER BY 1
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no ``partsupp``, so the part-supplier
    relation and its cost are derived from lineitem — unit cost =
    shipped revenue / shipped quantity, both summed as DECIMAL before
    one double division): for every LARGE-type part, the EUROPE
    supplier(s) offering the minimum unit cost.

    The correlated MIN becomes a window over the aggregated (tiny)
    part×supplier frame — one shuffle to build it, no re-scan for the
    subquery. Dimensions broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    euro_supp = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        li.join(euro_supp, li["l_suppkey"] == euro_supp["s_suppkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(_dec("l_extendedprice")).cast("double")
                / F.sum(_dec("l_quantity")).cast("double")
            ).alias("supply_cost")
        )
    )
    w = Window.partitionBy("l_partkey")
    cheapest = (
        ps.withColumn("__min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("__min_cost"))
        .drop("__min_cost")
    )
    return (
        cheapest.join(part, cheapest["l_partkey"] == part["p_partkey"])
        .join(euro_supp, cheapest["l_suppkey"] == euro_supp["s_suppkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


SQL_Q2 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supply_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
FROM ps
JOIN part ON ps.l_partkey = p_partkey
JOIN supplier ON ps.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'LARGE'
  AND supply_cost = (SELECT MIN(p2.supply_cost) FROM ps p2
                     WHERE p2.l_partkey = ps.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: no ``partsupp``, so a part's "stock
    value" for NATION_7 suppliers is its discounted shipped revenue):
    parts whose value exceeds 0.1% of the nation's total.

    The total is a second aggregate over the per-part frame (tiny),
    broadcast back as a scalar — the 60k-row fact is scanned once. All
    sums stay DECIMAL until the final double comparison, so the
    threshold test is bit-stable cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    value = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    per_part = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(value).alias("__val_dec"))
    )
    total = per_part.agg(F.sum("__val_dec").cast("double").alias("__total"))
    return (
        per_part.join(
            F.broadcast(total),
            F.col("__val_dec").cast("double") > F.lit(0.001) * F.col("__total"),
        )
        .select("ps_partkey", F.col("__val_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


SQL_Q11 = f"""
WITH v AS (
  SELECT l_partkey AS ps_partkey, {_SQL_REVENUE} AS val_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY 1
)
SELECT ps_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM v
WHERE CAST(val_dec AS DOUBLE) > 0.001 * (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM v)
ORDER BY part_value DESC, ps_partkey
"""


def q12_priority_by_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no ``l_shipmode``/``l_commitdate``, so
    the grouping column is the ship-delay bucket — late means shipped
    more than 60 days after the order date, the same rule Q4/Q21 use):
    high- vs low-priority line counts per bucket. One fact⋈fact shuffle,
    conditional sums in a single aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit("late"),
    ).otherwise(F.lit("ontime"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


SQL_Q12 = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 'late' ELSE 'ontime' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: part-supplier pairs derived from
    lineitem; the excluded-supplier subquery keeps its NOT IN shape but
    excludes negative-balance suppliers instead of complaint comments):
    distinct supplier count per (brand, type, size) for selected sizes.

    The exclusion set is a broadcast anti join; the distinct count runs
    on the deduped pair frame, not raw lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            bad_supp, pairs["l_suppkey"] == bad_supp["s_suppkey"], "left_anti"
        )
        .join(part, pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no ``partsupp`` availability, so the
    inner correlated quantity test becomes "shipped more than 40 units
    of some red part during 1996"; the nation restriction stays):
    NATION_5 suppliers who moved excess volume of red parts.

    The nested IN becomes agg → HAVING → semi join; part and nation
    broadcast, one shuffle on (suppkey, partkey)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    heavy = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > F.lit(40).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(heavy, supp["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


SQL_Q20 = """
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(40 AS DECIMAL(18,2))
  )
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" = shipped more than 60 days
    after the order date, and the result keeps every nation with the
    nation name in the output instead of restricting to one): suppliers
    who were the ONLY late supplier on a finalized multi-supplier order,
    counted per late line (classic Q21 counts l1 rows, not orders).

    The EXISTS / NOT EXISTS pair collapses into one per-order aggregate
    (distinct suppliers, distinct late suppliers) joined back to the
    late lines — lineitem is scanned once and shuffled once on
    l_orderkey, instead of the three correlated probes the SQL
    spells."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    lines = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).withColumn(
        "__late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.countDistinct("l_suppkey").alias("__ns"),
        F.countDistinct(F.when(F.col("__late"), F.col("l_suppkey"))).alias("__nl"),
    )
    sole_late = (
        lines.filter(F.col("__late"))
        .join(per_order, F.col("l_orderkey") == F.col("__ok"))
        .filter((F.col("__ns") >= 2) & (F.col("__nl") == 1))
    )
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select("s_name", "n_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


SQL_Q21 = """
SELECT s_name, n_name, COUNT(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1, 2
ORDER BY numwait DESC, s_name
LIMIT 100
"""


TPCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q12_priority_by_lateness": q12_priority_by_lateness,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q4_order_priority": q4_order_priority,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q10_returned_revenue": q10_returned_revenue,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q19_disjunctive_filter": q19_disjunctive_filter,
    "q22_idle_customers": q22_idle_customers,
}

TPCH_ORACLES: dict[str, str] = {
    "q2_min_cost_supplier": SQL_Q2,
    "q11_important_parts": SQL_Q11,
    "q12_priority_by_lateness": SQL_Q12,
    "q16_supplier_part_counts": SQL_Q16,
    "q20_excess_shippers": SQL_Q20,
    "q21_waiting_suppliers": SQL_Q21,
    "q4_order_priority": SQL_Q4,
    "q7_nation_volume": SQL_Q7,
    "q8_market_share": SQL_Q8,
    "q9_profit_by_nation_year": SQL_Q9,
    "q10_returned_revenue": SQL_Q10,
    "q13_order_count_distribution": SQL_Q13,
    "q15_top_supplier": SQL_Q15,
    "q19_disjunctive_filter": SQL_Q19,
    "q22_idle_customers": SQL_Q22,
}
