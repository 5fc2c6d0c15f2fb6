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

TPC-H coverage across relational.py + this module: all 22 query
shapes. Q2 Q9 Q11 Q16 Q20 need the partsupp table the fixture doesn't
ship, so they run against a DERIVED part-supplier relation aggregated
from lineitem (`_partsupp` below): ps_availqty = total quantity the
supplier ever shipped of the part, ps_supplycost = their minimum
observed unit price. The derivation is one extra keyed aggregate
(shuffle on (l_partkey, l_suppkey)) shared by all five; every
distinctive plan shape of the originals — correlated regional MIN
(Q2), profit rollup (Q9), group-share HAVING gate (Q11), NOT-IN
anti-join + distinct count (Q16), nested semi-joins with a correlated
half-sum threshold (Q20) — is preserved.
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
       round(SUM(CASE WHEN n2.n_name = 'NATION_3'
                THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
         / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
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
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
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
SELECT round(SUM(l_extendedprice) / 7.0, 6) AS avg_yearly, COUNT(*) AS n_items
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
            F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
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
SELECT c_mktsegment, COUNT(*) AS numcust, round(SUM(c_acctbal), 6) AS totacctbal
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
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------- derived partsupp

# The fixture ships no partsupp table; Q2/Q9/Q11/Q16/Q20 run against
# this derived part-supplier relation instead. Unit price and summed
# quantity are exact in double (quantities are integer-valued, the
# division is a single fp op), and the cost is rounded to 6 dp at the
# source because Q2/Q11 GATE rows on it — and because Q9/Q11 multiply
# it onward, the rounding must be BIT-identical across engines, not
# just "round to 6dp": prices divided by power-of-two quantities
# produce EXACT decimal ties (e.g. 1037.0821875 = price/32), where
# Spark's BigDecimal HALF_UP and DuckDB's multiply-based rounding
# disagree by 1e-6 (7 such pairs at sf0.01 — the residue of r10's q11
# red after the emitted-sum fix). floor(x*1e6 + 0.5)/1e6 is the same
# IEEE op sequence on both engines, so ties are resolved identically
# by construction (magnitudes ~1e9 << 2^53, no precision loss).
_PS_CTE = """
ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         SUM(l_quantity) AS ps_availqty,
         floor(MIN(l_extendedprice / l_quantity) * 1000000 + 0.5) / 1000000
           AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.sum("l_quantity").alias("ps_availqty"),
        (
            F.floor(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 1_000_000
                + 0.5
            )
            / 1_000_000
        ).alias("ps_supplycost"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
WITH {_PS_CTE},
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
min_cost AS (
  SELECT ps_partkey AS mc_partkey, MIN(ps_supplycost) AS mc_cost
  FROM ps JOIN eu_supp ON ps_suppkey = s_suppkey
  GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
FROM ps
JOIN eu_supp ON ps_suppkey = s_suppkey
JOIN part ON p_partkey = ps_partkey
JOIN min_cost ON mc_partkey = ps_partkey AND ps_supplycost = mc_cost
WHERE p_type = 'SMALL' AND p_size < 15
""",
    doc="TPC-H Q2 shape: for each SMALL part under size 15, the "
    "EUROPE supplier(s) offering it at the region-minimum cost. The "
    "correlated MIN subquery decorrelates to a per-part aggregate "
    "joined back on (partkey, cost); costs are rounded 6 dp at the "
    "source so the equality gate is fp-stable. Supplier/nation/region "
    "and the min-cost table all broadcast; the only big shuffle is the "
    "derived-partsupp aggregate itself",
    tags=("batch", "join", "subquery"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_ps = ps.join(F.broadcast(eu_supp), ps.ps_suppkey == eu_supp.s_suppkey)
    min_cost = eu_ps.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("mc_cost")
    )
    part = load(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & (F.col("p_size") < 15)
    )
    return (
        eu_ps.join(F.broadcast(part), eu_ps.ps_partkey == part.p_partkey)
        .join(
            min_cost,
            (F.col("mc_partkey") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("mc_cost")),
            "left_semi",
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle=f"""
WITH {_PS_CTE}
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(SUM(l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity),
             6) AS sum_profit,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN ps       ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
""",
    doc="TPC-H Q9 shape: profit on red parts by supplier nation and "
    "order year, where cost comes from the derived partsupp relation "
    "(profit = revenue - min-unit-price * quantity). part/supplier/"
    "nation broadcast; lineitem joins ps on the composite "
    "(partkey, suppkey) key and orders on l_orderkey — the two "
    "unavoidable fact-side shuffles",
    tags=("batch", "join", "aggregate"),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 6).alias("sum_profit"), F.count("*").alias("n_items"))
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
WITH {_PS_CTE},
nat_ps AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS value
  FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'
)
SELECT ps_partkey, round(SUM(value), 6) AS total_value
FROM nat_ps
GROUP BY ps_partkey
HAVING round(SUM(value), 6) > (SELECT round(SUM(value) * 0.0002, 6) FROM nat_ps)
""",
    doc="TPC-H Q11 shape: NATION_9 parts whose stock value exceeds "
    "0.0002 of the nation total (fraction chosen so the gate filters, "
    "without emptying, at both sf0.01 and sf0.1). The scalar fraction "
    "subquery broadcasts "
    "as a one-row gate; both HAVING sides are rounded 6 dp so fp "
    "summation order can't flip membership, and the EMITTED total_value "
    "is rounded 6 dp too (the q15 pattern) so the driver's exact value "
    "hash is stable against summation-order ULP drift. Same aggregate "
    "feeds both the per-part rollup and the total (Catalyst reuses the "
    "scan)",
    tags=("batch", "join", "subquery"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    nat_ps = ps.join(
        F.broadcast(nat_supp), ps.ps_suppkey == F.col("s_suppkey"), "left_semi"
    ).withColumn("value", F.col("ps_supplycost") * F.col("ps_availqty"))
    total = nat_ps.agg(F.round(F.sum("value") * 0.0002, 6).alias("threshold"))
    return (
        nat_ps.groupBy("ps_partkey")
        .agg(F.sum("value").alias("total_value"))
        .join(F.broadcast(total))
        .where(F.round(F.col("total_value"), 6) > F.col("threshold"))
        .select("ps_partkey", F.round("total_value", 6).alias("total_value"))
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle=f"""
WITH {_PS_CTE}
SELECT p_brand, p_size, CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#4' AND p_type <> 'ECONOMY'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
    doc="TPC-H Q16 shape: how many distinct suppliers can deliver each "
    "(brand, size) combination, excluding one brand, one type, and "
    "suppliers with negative balances (the fixture's stand-in for the "
    "complaint-comment NOT IN). The NOT IN becomes a broadcast "
    "left-anti join (no nulls in s_suppkey, so anti-join semantics are "
    "exact); COUNT(DISTINCT) hash-partitions by the small group key",
    tags=("batch", "join", "aggregate"),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "ECONOMY")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    complained = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(complained), ps.ps_suppkey == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_excess_stock_suppliers",
    oracle=f"""
WITH {_PS_CTE},
shipped97 AS (
  SELECT l_partkey, l_suppkey, 0.5 * SUM(l_quantity) AS half_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM ps
  JOIN shipped97 ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE ps_availqty > half_qty
    AND ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_9', 'NATION_11')
  AND s_suppkey IN (SELECT ps_suppkey FROM excess)
""",
    doc="TPC-H Q20 shape: NATION_9/NATION_11 suppliers holding more "
    "stock of some small-named part than half of what they shipped of "
    "it in 1997. Both IN subqueries become left-semi joins (part-list "
    "broadcast; the correlated half-sum threshold decorrelates to a "
    "keyed aggregate joined on the same (partkey, suppkey) key as the "
    "derived partsupp — co-partitioned, no extra shuffle)",
    tags=("batch", "join", "subquery"),
)
def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    small_parts = load(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li97 = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    shipped97 = li97.groupBy("l_partkey", "l_suppkey").agg(
        (F.lit(0.5) * F.sum("l_quantity")).alias("half_qty")
    )
    excess = (
        ps.join(F.broadcast(small_parts), ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(
            shipped97,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_9", "NATION_11")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .join(F.broadcast(excess), supp.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
