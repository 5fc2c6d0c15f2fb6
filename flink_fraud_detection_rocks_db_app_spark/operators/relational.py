"""Batch relational surface over the TPC-H-ish star schema.

The reference contract is join-free (SURVEY §2.8: "Joins: none"), but a
usable engine — and the driver's oracle harness — needs the standard
relational operators: multi-way joins, sorts, limits, set ops, and
grouped aggregation. These are pure Catalyst plans; the interesting
part is the physical strategy at 100 TB:

- dimension tables (region/nation/supplier/part/customer) are
  broadcast-joined explicitly (`F.broadcast`) so the fact-table scan
  never shuffles for them;
- fact-fact joins (lineitem x orders) shuffle on the join key, which
  is also the natural bucketing key for a warehouse deployment;
- top-k uses sort+limit (Spark's TakeOrderedAndProject — no global
  sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load
from ..registry import register


@register(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       round(SUM(l_extendedprice), 6) AS sum_base_price,
       round(SUM(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(AVG(l_quantity), 6) AS avg_qty,
       round(AVG(l_extendedprice), 6) AS avg_price,
       round(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: scan-heavy grouped aggregation with 8 aggregates; "
    "the whole-stage-codegen benchmark workhorse",
    tags=("batch", "aggregate"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "revenue_by_nation",
    oracle="""
SELECT n_name,
       round(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    doc="4-way join star query: fact-fact shuffle join (lineitem x orders) "
    "+ broadcast dims (customer at small SF would broadcast via AQE; "
    "nation is forced broadcast)",
    tags=("batch", "join"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "revenue_by_region_segment",
    oracle="""
SELECT r_name, c_mktsegment,
       round(SUM(o_totalprice), 6) AS total_revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, c_mktsegment
""",
    doc="Join through two broadcast dimension hops + two-key grouping",
    tags=("batch", "join"),
)
def revenue_by_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 6).alias("total_revenue"), F.count("*").alias("n_orders"))
    )


@register(
    "top10_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
    doc="Sort + limit (TakeOrderedAndProject): deterministic tiebreak on key; "
    "ordering on raw stored doubles is bit-identical across engines",
    tags=("batch", "sort", "limit"),
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "top3_orders_per_segment",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
QUALIFY row_number() OVER (
  PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC
) <= 3
""",
    doc="Top-K per group: window rank over a join (the classic OLAP pattern)",
    tags=("batch", "window_function"),
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""",
    doc="Set op / anti-join surface (EXCEPT -> left-anti join physically)",
    tags=("batch", "setop"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    ord_keys = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.subtract(ord_keys)


@register(
    "order_priority_by_status",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
    doc="Two-key categorical rollup base (cube/rollup available as Spark "
    "built-ins beyond the reference contract)",
    tags=("batch", "aggregate"),
)
def order_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT round(SUM(l_extendedprice * l_discount), 6) AS revenue, COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: highly selective scan aggregate — every "
    "predicate must reach the parquet scan (pushdown smoke for "
    "compound filters)",
    tags=("batch", "aggregate"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
    doc="TPC-H Q3 shape: selective dim filter -> fact-fact join -> "
    "grouped revenue -> top-10 (deterministic tiebreaks incl. orderkey)",
    tags=("batch", "join", "sort"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n_name, round(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    doc="TPC-H Q5 shape: six-way join with the region->nation->supplier "
    "dim chain broadcast, facts (lineitem x orders x customer) shuffled "
    "on their keys; the same-nation (c_nationkey = s_nationkey) "
    "predicate rides the supplier broadcast join",
    tags=("batch", "join", "aggregate"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # dim chain collapses to a small supplier->nation broadcast side
    supp_dim = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp_dim),
            (li.l_suppkey == supp_dim.s_suppkey)
            & (cust.c_nationkey == supp_dim.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
SELECT supp_region, cust_region, l_year, round(SUM(volume), 6) AS revenue,
       COUNT(*) AS n_items
FROM (
  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
      OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_region, cust_region, l_year
""",
    doc="TPC-H Q7 shape: bidirectional trade volume by ship year, at "
    "region granularity (nation pairs are sf-sparse in this fixture) — "
    "the nation->region dim chain is broadcast twice under different "
    "roles (supplier side / customer side), the OR pair predicate "
    "prunes AFTER both broadcasts so the fact scan shuffles once",
    tags=("batch", "join", "aggregate"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    ndim = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name")
    n1 = ndim.select(
        F.col("n_nationkey").alias("n1_key"), F.col("r_name").alias("supp_region")
    )
    n2 = ndim.select(
        F.col("n_nationkey").alias("n2_key"), F.col("r_name").alias("cust_region")
    )
    pair = (
        (F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE")
    ) | ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
WITH agg AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         round(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    AND l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM agg
ORDER BY round(revenue, 6) DESC, c_custkey ASC
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer, top-20 "
    "by revenue (rank key rounded to 6 dp + custkey tiebreak so fp "
    "summation noise can't flip the LIMIT gate); nation broadcast, "
    "facts shuffled",
    tags=("batch", "join", "sort"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.round("revenue", 6).desc(), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo_effect",
    oracle="""
SELECT round(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-12-01 00:00:00'
""",
    doc="TPC-H Q14 shape: conditional-aggregate ratio over a "
    "fact x broadcast-dim join with a tight scan-range predicate",
    tags=("batch", "join", "aggregate"),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-12-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(disc), 6).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
""",
    doc="TPC-H Q18 shape: large-volume orders via an aggregated "
    "semi-join (HAVING sum > 250, integer-valued so the gate is "
    "fp-safe) — the aggregate-then-semi-join pattern, shuffles keyed "
    "on l_orderkey both times so AQE can reuse the exchange",
    tags=("batch", "join", "aggregate"),
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "bk"),
                    F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@register(
    "tpch_q19_bracketed_revenue",
    oracle="""
SELECT round(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1  AND l_quantity <= 20)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 40)
""",
    doc="TPC-H Q19 shape: disjunctive bracket predicates spanning both "
    "join sides — the join itself stays a plain broadcast equi-join on "
    "partkey and the OR brackets evaluate post-join, while the "
    "single-side conjuncts (quantity ranges) still push to the fact scan",
    tags=("batch", "join", "aggregate"),
)
def tpch_q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 40)
    )
    part = load(spark, sf_dir, "part")
    bracket = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 35)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(bracket)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
