"""Skew-handling patterns, demonstrated with correctness proofs.

At 100 TB a handful of hot keys (one whale account, one dominant
event_type) can stall a shuffle. Two standard levers, both expressed
declaratively so the oracle can verify they change the PLAN, not the
RESULT:

- salted two-stage aggregation: groupBy(key, salt) partial ->
  groupBy(key) final. The hot key's rows spread over SALT_BUCKETS
  reducers in stage 1; stage 2 combines SALT_BUCKETS tiny partials.
  (Only for algebraic aggregates — sum/count/min/max — which is also
  why the reference's AggregateFunction.merge exists.)
- AQE skew-join splitting is enabled session-wide (session.py); the
  salted form is the explicit fallback when AQE can't see the skew
  (e.g. pre-4.x, or skewed aggregation rather than join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load
from ..registry import register

SALT_BUCKETS = 16


def salted_agg(
    df: DataFrame, key: str, value: str, salt_buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Two-stage skew-safe sum/count over a possibly-hot key."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_s"), F.count("*").alias("_c"))
    )
    # emitted float sum rounded 6dp (the registry convention): the
    # salted two-stage summation order differs from any single-stage
    # order, so the raw double is ULP-unstable across engines/configs
    return partial.groupBy(key).agg(
        F.round(F.sum("_s"), 6).alias("sum_value"), F.sum("_c").alias("n_events")
    )


@register(
    "event_type_stats_salted",
    oracle="SELECT event_type, round(SUM(value), 6) AS sum_value, "
    "COUNT(*) AS n_events FROM events GROUP BY 1",
    doc="Salted two-stage aggregation over the 5-value (maximally skewed) "
    "event_type key: same result as the plain aggregate — the oracle "
    "proves the rewrite is semantics-preserving — but the hot keys fan "
    "out over 16 salt buckets in stage one",
    tags=("skew", "aggregate"),
)
def event_type_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return salted_agg(load(spark, sf_dir, "events"), "event_type", "value")
