"""Relational queries: scans, filters, aggregations, joins, top-k.

Covers SURVEY §2 operators S8/S9, F1-F4/F7/F11, A3-A6, J1/J4, T1-T3 on
the driver's TPC-H-ish tables.

Scale notes per query are inline; the common posture: dims (region,
nation, supplier, part at dim-scale) are broadcast; fact-fact joins
shuffle on the join key with AQE handling skew; every aggregate is a
partial (map-side) + final hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

R = 6  # float rounding for cross-engine hash stability


@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 6)      AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 6) AS sum_base_price,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 6) AS sum_disc_price,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 * (100 + CAST(round(l_tax * 100) AS BIGINT))) / 1000000.0, 6)   AS sum_charge,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / count(*), 6)      AS avg_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / count(*), 6) AS avg_price,
       round(sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*), 6)      AS avg_disc,
       count(*)                                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="A1/A3-family pricing summary (TPC-H Q1 shape) — partial+final "
    "hash agg, filter pushed to parquet scan.  Money columns are exact "
    "2dp values, so the sums run as integer cents (bigint): exact "
    "integer arithmetic is aggregation-order-insensitive like the "
    "DECIMAL(18,2) variant it replaces — eliminating the double-sum "
    "drift that can flip a round(,6) boundary between engines at larger "
    "SFs (the backtest_trades r2 failure class) — but adds JVM longs "
    "instead of BigDecimals inside codegen.  Products stay exact at "
    "fixed scale: price(2dp)×(1−disc)(2dp) is 1e-4 units, ×(1+tax) is "
    "1e-6 units; per-row magnitude ≤ ~2e11, so a partition sum stays "
    "inside int64 up to ~4e7 rows/partition and the final sum to "
    "~9e18 total units (≈ TPC-H SF10k for sum_charge) — headroom is "
    "re-checked, not assumed, if the grid ever scales past that.  "
    "Averages derive from the same exact sums.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    from ..operators.indicators import cents
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    disc_price_c4 = price_c * (F.lit(100) - disc_c)  # 1e-4 dollar units
    charge_c6 = disc_price_c4 * (F.lit(100) + tax_c)  # 1e-6 dollar units
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty_c) / 100.0, R).alias("sum_qty"),
            F.round(F.sum(price_c) / 100.0, R).alias("sum_base_price"),
            F.round(F.sum(disc_price_c4) / 10000.0, R).alias("sum_disc_price"),
            F.round(F.sum(charge_c6) / 1000000.0, R).alias("sum_charge"),
            F.round(F.sum(qty_c) / 100.0 / n, R).alias("avg_qty"),
            F.round(F.sum(price_c) / 100.0 / n, R).alias("avg_price"),
            F.round(F.sum(disc_c) / 100.0 / n, R).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "scalar_price_stats",
    oracle="""
SELECT count(*)                         AS n_rows,
       round(min(l_extendedprice), 6)   AS min_price,
       round(max(l_extendedprice), 6)   AS max_price,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
             / count(*), 6)             AS avg_price,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 6) AS total_qty,
       count(DISTINCT l_orderkey)       AS n_orders
FROM lineitem
""",
    doc="A3 — scalar stats in one aggregate pass "
    "(reference repository.py:234-309).  avg/sum run as integer-cents "
    "bigint sums (exact, aggregation-order-insensitive, long-adds in "
    "codegen instead of BigDecimal — see pricing_summary for the "
    "headroom arithmetic).",
)
def scalar_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    from ..operators.indicators import cents
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("l_extendedprice"), R).alias("min_price"),
        F.round(F.max("l_extendedprice"), R).alias("max_price"),
        F.round(
            F.sum(cents("l_extendedprice")) / 100.0 / F.count(F.lit(1)), R
        ).alias("avg_price"),
        F.round(F.sum(cents("l_quantity")) / 100.0, R).alias("total_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "group_distribution",
    oracle="""
SELECT o_orderpriority, count(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="A4 — group-by distribution (reference repository.py:271-283).",
)
def group_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@register(
    "filtered_count",
    oracle="""
SELECT count(*) AS n
FROM orders
WHERE o_orderstatus = 'F'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_totalprice > 1000
""",
    doc="A6 — COUNT(*) with predicates; all pushed to the scan "
    "(reference repository.py:399-422).",
)
def filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_totalprice") > 1000)
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    doc="T1/S9 — ORDER BY DESC LIMIT → TakeOrderedAndProject; no global "
    "sort materialized (reference repository.py:218-232).",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", R).alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "range_scan_limit",
    oracle="""
SELECT o_orderkey, o_orderdate, round(o_totalprice, 6) AS o_totalprice
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                      AND TIMESTAMP '1996-12-31 23:59:59'
ORDER BY o_orderdate, o_orderkey
LIMIT 100
""",
    doc="S8 — time-range scan + ORDER + LIMIT; range predicate prunes "
    "partitions at scale (reference repository.py:183-216).",
)
def range_scan_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1996-12-31 23:59:59").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", F.round("o_totalprice", R).alias("o_totalprice"))
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "revenue_by_nation",
    oracle="""
SELECT n.n_name AS nation,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0, 6) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
""",
    doc="J1-family 4-way join: fact-fact shuffle join on orderkey, dims "
    "broadcast (customer at SF is mid-size; nation tiny — Catalyst/AQE "
    "picks broadcast; hinted explicitly for the dims).  Revenue sums as "
    "integer 1e-4-dollar units (price cents × (100−disc cents)): exact "
    "and order-insensitive like the DECIMAL variant it replaces, but "
    "long-adds in codegen (see pricing_summary for headroom).",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    from ..operators.indicators import cents
    rev_c4 = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(rev_c4) / 10000.0, R).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation")
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
ANTI JOIN orders o ON c.c_custkey = o.o_custkey
ORDER BY c.c_custkey
""",
    doc="J4 — existence check as a set-based left_anti join (replaces "
    "the reference's per-row exists loop, repository.py:43-47).",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "customers_with_orders_semi",
    oracle="""
SELECT count(*) AS n
FROM customer c
SEMI JOIN orders o ON c.c_custkey = o.o_custkey
""",
    doc="J4 complement — EXISTS as left_semi join.",
)
def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "pagination_keyset",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice
FROM orders
WHERE o_orderkey > 200
ORDER BY o_orderkey
LIMIT 100
""",
    doc="F11 — keyset pagination: WHERE key > last_seen ORDER BY key "
    "LIMIT n.  The filter pushes into the parquet scan and the LIMIT "
    "becomes TakeOrderedAndProject — no global row_number sort, so the "
    "plan is identical at 100 TB.  (A row_number/OFFSET variant is the "
    "documented fallback for clients that genuinely need random page "
    "access; it forces every row through one task and is an "
    "anti-pattern at scale — repository.py:469-470.)",
)
def pagination_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") > 200)
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", R).alias("o_totalprice"))
    )


@register(
    "top_customers_per_nation",
    oracle="""
SELECT c_nationkey, c_custkey, round(c_acctbal, 6) AS c_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) t
WHERE rn <= 3
ORDER BY c_nationkey, c_acctbal DESC, c_custkey
""",
    doc="T2/T3 — top-K per group via ranked window; single shuffle on "
    "the partition key.",
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", R).alias("c_acctbal"))
        .orderBy("c_nationkey", F.desc("c_acctbal"), "c_custkey")
    )
