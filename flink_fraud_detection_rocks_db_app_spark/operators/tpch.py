"""TPC-H shapes beyond the core set in relational.py — the subquery-
heavy back half of the benchmark, adapted to the abridged fixture
schema (no partsupp table, no l_commitdate/l_receiptdate/l_shipmode,
no o_comment/c_phone — filters use the columns that exist; lateness is
expressed as l_shipdate > o_orderdate + N days).

These exercise the Catalyst capabilities a relational engine must
have that plain star-joins don't: EXISTS / NOT EXISTS decorrelation
into semi/anti joins (Q4, Q21), correlated scalar-aggregate subqueries
(Q17, Q22), outer-join group histograms (Q13), CTE reuse with a
scalar-subquery gate (Q15), and conditional-share aggregation over a
six-way join (Q8).

Scale notes (100 TB): every dimension side is broadcast; the only
shuffles are keyed on l_orderkey / l_suppkey / c_custkey — the same
keys a warehouse deployment buckets by (see warehouse.py), so all of
these ride bucketing with zero exchanges there. The decorrelated
subqueries become aggregate-then-join on those same keys, never
nested-loop per-row lookups.

TPC-H coverage across relational.py + this module: Q1 Q3 Q4 Q5 Q6 Q7
Q8 Q10 Q12 Q13 Q14 Q15 Q17 Q18 Q19 Q21 Q22 — 17 of 22; the other five
(Q2 Q9 Q11 Q16 Q20) need the partsupp table the fixture doesn't ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load
from ..registry import register


@register(
    "tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape: priority counts of orders with at least one "
    "late lineitem (shipped >90 days after order date; the fixture has "
    "no l_commitdate/l_receiptdate). The EXISTS decorrelates to a "
    "left-semi hash join on l_orderkey with the lateness predicate as "
    "join condition — one pass over each scan, no per-row subquery",
    tags=("batch", "join", "subquery"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       SUM(CASE WHEN n2.n_name = 'NATION_3'
                THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
         / SUM(l_extendedprice * (1 - l_discount)) AS mkt_share,
       COUNT(*) AS n_items
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
""",
    doc="TPC-H Q8 shape: NATION_3's share of ECONOMY-part revenue in "
    "the EUROPE customer market, by order year. Six-way join where "
    "every non-fact side (part, supplier, both nation roles, region) "
    "broadcasts; the share is a conditional-sum ratio computed in the "
    "same aggregate pass, not a self-join",
    tags=("batch", "join", "aggregate"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    cust = load(spark, sf_dir, "customer")
    ndim = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = ndim.join(
        F.broadcast(region), ndim.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = ndim.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"), "left_semi")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            ).alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "tpch_q12_late_shipment_priority",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 120 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
""",
    doc="TPC-H Q12 shape: high- vs low-priority order counts among "
    "very-late 1997 shipments, grouped by returnflag (the fixture's "
    "stand-in for l_shipmode). The single-table conjuncts push to the "
    "lineitem scan; the cross-table lateness predicate evaluates "
    "post-join; both counts come from one conditional-aggregate pass",
    tags=("batch", "join", "aggregate"),
)
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_order_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    doc="TPC-H Q13 shape: distribution of customers by how many "
    "non-urgent orders they placed. LEFT OUTER join with the filter in "
    "the join condition (a WHERE would turn it inner and drop the "
    "zero-order bucket), then a two-level aggregation — the second "
    "groupBy is on the tiny histogram, so the only real shuffle is "
    "keyed on c_custkey",
    tags=("batch", "join", "aggregate"),
)
def tpch_q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(SUM(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 shape: the supplier(s) with maximum quarterly "
    "revenue — a CTE consumed twice (join input + scalar-subquery MAX "
    "gate). Revenue is rounded to 6 dp BEFORE both uses so fp "
    "summation noise can't make the two engines crown different "
    "suppliers; the scalar MAX broadcasts as a one-row subquery result",
    tags=("batch", "join", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "total_revenue"
        )
    )
    supp = load(spark, sf_dir, "supplier")
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"), "left_semi")
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
SELECT SUM(l_extendedprice) / 7.0 AS avg_yearly, COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4' AND p_size <= 10
  AND l_quantity < (
    SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
""",
    doc="TPC-H Q17 shape: revenue from small-quantity orders of "
    "Brand#4 small parts (p_size stands in for p_container). The "
    "correlated AVG decorrelates to a per-partkey aggregate joined "
    "back on partkey — one extra aggregate pass, not a per-row "
    "subquery. The quantity gate is fp-safe: quantities are "
    "integer-valued, so both engines compute the identical 0.5*avg",
    tags=("batch", "join", "subquery"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 10)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("avg_key")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("avg_key"))
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders      ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 120 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 120 DAY
  )
GROUP BY s_name
""",
    doc="TPC-H Q21 shape: suppliers who were the SOLE late shipper on "
    "finished multi-supplier orders (late = shipped >120 days after "
    "order date, the fixture's stand-in for receipt>commit). The "
    "EXISTS becomes a left-semi and the NOT EXISTS a left-anti join, "
    "both keyed on l_orderkey — three shuffles on one key, which AQE "
    "can pipeline, instead of per-row subqueries",
    tags=("batch", "join", "subquery"),
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late_cutoff = F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > late_cutoff)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > late_cutoff)
        .select(
            F.col("l_orderkey").alias("o3_orderkey"),
            F.col("l_suppkey").alias("o3_suppkey"),
        )
    )
    sole_late = (
        l1.join(
            others,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("o3_orderkey") == F.col("l_orderkey"))
            & (F.col("o3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_q22_dormant_high_balance",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS numcust, SUM(c_acctbal) AS totacctbal
FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  AND c_acctbal > (
    SELECT round(AVG(c_acctbal), 6) FROM customer
    WHERE c_acctbal > 0.0
      AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_mktsegment
""",
    doc="TPC-H Q22 shape: above-average-balance customers in three "
    "segments with no orders since 2000 (mktsegment stands in for the "
    "phone country code; every fixture customer has SOME order, so "
    "dormancy is date-bounded to keep the anti-join non-vacuous). "
    "Scalar AVG subquery broadcasts as a one-row gate (rounded 6 dp so "
    "both engines use the identical threshold); the NOT EXISTS is a "
    "left-anti join on c_custkey against the post-2000 order scan",
    tags=("batch", "join", "subquery"),
)
def tpch_q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = ("AUTOMOBILE", "BUILDING", "MACHINERY")
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment").isin(*segs))
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 6).alias("avg_bal"))
    )
    recent = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("c_acctbal").alias("totacctbal"),
        )
    )
