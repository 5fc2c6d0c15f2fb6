"""Bucketed-table write path: the co-located-join deployment shape.

At 100 TB the dominant shuffle is the fact-fact join (lineitem x
orders on orderkey, or events keyed by account). Bucketing is how a
warehouse kills it permanently: write both tables `bucketBy(N, key)`
(+ sortBy for merge-ready runs), and every subsequent equi-join or
aggregation on that key reads co-located buckets — SortMergeJoin with
NO Exchange on either side, amortized across every query that ever
touches the pair. This is Spark's equivalent of the reference's
keyed-state locality: RocksDB keeps per-key state on the operator that
owns the key partition; a bucketed table keeps per-key rows in the
file that owns the key bucket
(reference: master/src/main/java/InorderTumblingWindow/FraudDetectionJob.java
keyBy semantics — locality by key hash, declared once).

Bucket-count sizing at scale: buckets are the JOIN parallelism floor
and each bucket file should land in the 128 MB - 1 GB range after
compression; 100 TB of lineitem at ~512 MB/bucket => ~200k buckets is
wrong (too many files) — you bucket the TABLE at e.g. 4096 and rely on
AQE to coalesce/split within a bucket-preserving scan. Locally the
fixtures use small counts; the *plan shape* (no Exchange) is identical.

Requires a metastore-backed catalog (`saveAsTable` — bucket metadata
lives in the catalog, not the parquet footer), which the local session
provides via the default in-cwd Derby metastore + spark-warehouse dir
(both gitignored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures import load


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int,
    name: str | None = None,
) -> str:
    """Write a fixture table bucketed (and sorted) by `key` into the
    session catalog; returns the catalog table name."""
    name = name or f"{table}_b{n_buckets}_{key}"
    (
        load(spark, sf_dir, table)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )
    return name


def cowarehouse_orders_lineitem(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8, suffix: str = ""
) -> tuple[str, str]:
    """Materialize the canonical co-located pair: orders and lineitem
    both bucketed on the order key."""
    o = write_bucketed(
        spark, sf_dir, "orders", "o_orderkey", n_buckets, f"orders_bkt{suffix}"
    )
    li = write_bucketed(
        spark, sf_dir, "lineitem", "l_orderkey", n_buckets, f"lineitem_bkt{suffix}"
    )
    return o, li


def bucketed_order_revenue(
    spark: SparkSession, orders_tbl: str, lineitem_tbl: str
) -> DataFrame:
    """Per-order revenue over the bucketed pair.

    With both sides bucketed on the join key this plans as a
    SortMergeJoin whose children are bucket-preserving file scans —
    zero Exchange nodes (asserted in tests/test_plans.py). The
    follow-on groupBy(o_orderkey) ALSO rides the bucketing: the
    aggregation is partial-only, no re-shuffle.
    """
    o = spark.table(orders_tbl)
    li = spark.table(lineitem_tbl)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def write_date_partitioned_events(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> str:
    """Write the events fixture partitioned by event DATE (`ds=`
    directories) — the standard time-partitioned lake layout.

    At 100 TB this is the first line of defense: any query with a date
    predicate prunes whole partitions at PLANNING time (zero I/O for
    excluded days), and ingestion appends to the newest partition
    without touching history. Date is derived from the epoch-micros
    instant (UTC days) so pruning semantics are timezone-free, matching
    the engine's epoch-integer window convention.
    """
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("account_id"),
        F.col("ts").alias("t_ns"),
        F.col("value").alias("amount"),
        "event_id",
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("ds"),
    )
    ev.write.mode("overwrite").partitionBy("ds").parquet(out_dir)
    return out_dir


def read_events_for_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Daily slice of the partitioned layout. The `ds = day` predicate
    is a partition filter — it never reaches row-level evaluation
    (asserted against PartitionFilters in tests/test_plans.py)."""
    return spark.read.parquet(path).where(F.col("ds") == day)
