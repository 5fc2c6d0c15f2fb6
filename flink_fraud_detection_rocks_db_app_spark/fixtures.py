"""Table loaders for the driver-generated parquet fixtures.

The reference's stream of `Transaction{accountId, timestamp, amount}`
(reference: master/src/main/java/InorderTumblingWindow/TransactionStreamSource.java:24-36)
maps onto the driver's `events` table as
`user_id -> account_id, ts -> event_time, value -> amount` (FIXTURES.md §1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects; read it as a raw nanosecond long instead. The
        # timestamp reconstruction happens in `transactions()` below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard projection every reference pipeline starts with.

    Mirrors the `TimestampAssigner` Tuple3 projection
    (reference: master/src/main/java/InorderTumblingWindow/FraudDetectionJob.java:239-252).
    Only 3 of 6 columns are selected, so Catalyst prunes the parquet
    scan to exactly these columns (verified in tests/test_plans.py).

    Timestamp handling: ``ts`` arrives as epoch-nanosecond longs (see
    `load`); ``timestamp_micros(ts div 1000)`` rebuilds a TimestampType
    from the absolute microsecond instant with no session-timezone
    involvement, so window arithmetic matches the DuckDB oracle's
    ``epoch_ms``/``epoch_us`` integer math bit-for-bit (both floor).
    """
    return load(spark, sf_dir, "events").select(
        F.col("user_id").alias("account_id"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
        F.col("value").alias("amount"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (plus the
    `transactions` projection) so the full engine surface is reachable
    from plain `spark.sql(...)` — the SQL face of the query catalog."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    transactions(spark, sf_dir).createOrReplaceTempView("transactions")


def transactions_with_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`transactions` plus event_id, the deterministic order tiebreak
    used by the order-sensitive stateful folds (FIXTURES.md §3)."""
    return load(spark, sf_dir, "events").select(
        F.col("user_id").alias("account_id"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
        F.col("value").alias("amount"),
        "event_id",
    )
