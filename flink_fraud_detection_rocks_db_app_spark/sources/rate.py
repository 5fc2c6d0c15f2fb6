"""Synthetic rate-limited transaction source — S2 parity.

The reference's TransactionStreamSource emits one random transaction
every 100 ms (10 ev/s): accountId in [0,10), amount in [0,1000),
ts = now()
(reference: master/src/main/java/InorderTumblingWindow/TransactionStreamSource.java:24-36);
the test-source variant narrows to accountId in [1,5], integer amount
in [1,100]
(reference: master/src/test/java/CustomTumblingWindowTest.java:150-160).

Spark-first form: the built-in `rate` source provides (timestamp,
value) at rowsPerSecond; account and amount derive deterministically
from the monotonically increasing `value` via xxhash64 — reproducible,
unlike the reference's unseeded Random, and backpressure-aware on a
real cluster (rate-limiting is the source's job, not a sleep()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_transactions(
    spark: SparkSession,
    rows_per_second: int = 10,
    n_accounts: int = 10,
    max_amount: float = 1000.0,
    integer_amounts: bool = False,
) -> DataFrame:
    """Unbounded stream of synthetic transactions at a fixed rate,
    schema (account_id, event_time, amount) like every other source."""
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    account = F.pmod(F.xxhash64("value"), F.lit(n_accounts)).alias("account_id")
    raw = F.pmod(F.xxhash64("value", F.lit(1)), F.lit(1_000_000)) / 1_000_000.0
    amount = (
        (F.floor(raw * max_amount) + 1).cast("double")
        if integer_amounts
        else (raw * max_amount).cast("double")
    )
    return src.select(
        account, F.col("timestamp").alias("event_time"), amount.alias("amount")
    )
