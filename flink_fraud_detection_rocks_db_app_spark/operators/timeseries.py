"""Time-series operators over `events` (EDBT'19 streaming-similarity
territory): row-frame moving aggregates, inter-event deltas, and
calendar resampling with gap fill. Window-function frames are the
Spark primitive; order is always the total (event-time, event_id)
order so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..fixtures import load
from ..registry import register


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        F.col("user_id").alias("account_id"),
        F.expr("ts div 1000").alias("t_us"),
        "event_id",
        "value",
    )


@register(
    "moving_avg_5_events",
    oracle="""
SELECT user_id AS account_id, event_id,
       AVG(value) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) AS ma5,
       SUM(value) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) AS sum5
FROM events
""",
    doc="Per-account moving average/sum over the last 5 events "
    "(row-frame window aggregate; single shuffle on the key)",
    tags=("timeseries", "window_function"),
)
def moving_avg_5_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    w = (
        Window.partitionBy("account_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "account_id",
        "event_id",
        F.avg("value").over(w).alias("ma5"),
        F.sum("value").over(w).alias("sum5"),
    )


@register(
    "event_deltas",
    oracle="""
SELECT user_id AS account_id, event_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       ) AS gap_us,
       value - lag(value) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       ) AS delta_value
FROM events
""",
    doc="Inter-event time gaps and value deltas per account (lag); the "
    "building block for irregular-series feature extraction",
    tags=("timeseries", "window_function"),
)
def event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("account_id").orderBy("t_us", "event_id")
    return ev.select(
        "account_id",
        "event_id",
        (F.col("t_us") - F.lag("t_us").over(w)).alias("gap_us"),
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
    )


@register(
    "resample_daily_gapfill",
    oracle="""
WITH d AS (
  SELECT user_id, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_no,
         SUM(value) AS s, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(day_no) AS lo, MAX(day_no) AS hi FROM d GROUP BY 1),
days AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day_no FROM span)
SELECT days.user_id AS account_id, days.day_no,
       COALESCE(s, 0.0) AS sum_value, COALESCE(c, 0) AS n_events
FROM days LEFT JOIN d ON days.user_id = d.user_id AND days.day_no = d.day_no
""",
    doc="Calendar resampling: per-account daily sums with zero-filled "
    "gap days across each account's active span (sequence + explode + "
    "left join — the distributed gap-fill shape)",
    tags=("timeseries", "resample"),
)
def resample_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("account_id"),
            F.expr("CAST(ts div 86400000000000 AS BIGINT)").alias("day_no"),
            "value",
        )
        .groupBy("account_id", "day_no")
        .agg(F.sum("value").alias("s"), F.count("*").alias("c"))
    )
    days = (
        d.groupBy("account_id")
        .agg(F.min("day_no").alias("lo"), F.max("day_no").alias("hi"))
        .select("account_id", F.explode(F.sequence("lo", "hi")).alias("day_no"))
    )
    return days.join(d, ["account_id", "day_no"], "left").select(
        "account_id",
        "day_no",
        F.coalesce("s", F.lit(0.0)).alias("sum_value"),
        F.coalesce("c", F.lit(0)).alias("n_events"),
    )
