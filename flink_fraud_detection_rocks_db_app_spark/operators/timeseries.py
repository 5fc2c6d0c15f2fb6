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
         round(SUM(value), 6) AS s, COUNT(*) AS c
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
        .agg(F.round(F.sum("value"), 6).alias("s"), F.count("*").alias("c"))
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


# ----------------------- z-normalized subsequence similarity (EDBT'19)

TS_SIM_K = 8  # subsequence length
TS_SIM_TOP = 50

# Query pattern: a z-normalized SPIKE (7 flat readings then a jump) —
# the "sudden large transaction after quiet history" shape the fraud
# detectors gate on, expressed as a similarity query. Literals are
# computed once in Python (left folds — the same sequential order both
# engines' parsers and the trusted dot-product primitives use).
def _ts_q() -> list[float]:
    raw = [0.0] * (TS_SIM_K - 1) + [1.0]
    m = sum(raw) / TS_SIM_K
    sd = (sum((x - m) ** 2 for x in raw) / TS_SIM_K) ** 0.5
    return [(x - m) / sd for x in raw]


_Q = _ts_q()
_SQ1 = 0.0
for _x in _Q:
    _SQ1 += _x
_SQ2 = 0.0
for _x in _Q:
    _SQ2 += _x * _x
_Q_SPARK = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in _Q) + ")"
_Q_DUCK = "[" + ", ".join(repr(x) for x in _Q) + "]"

# dist² via the dot identity on SCALARS: every term derives from the
# 6dp-rounded frame sums s1/s2 (identical in both engines) plus ONE
# array dot product against the literal pattern (the trusted
# list_dot_product ≡ fold pair) — no per-element z-normalization in
# either engine, so there is nothing order-sensitive to diverge.
_DIST_TMPL = (
    "round(sqrt(greatest("
    "(s2 - 2.0 * (s1 / {k}) * s1 + {k} * (s1 / {k}) * (s1 / {k}))"
    " / (s2 / {k} - (s1 / {k}) * (s1 / {k}))"
    " - 2.0 * (dotwq - (s1 / {k}) * CAST({sq1!r} AS DOUBLE))"
    " / sqrt(s2 / {k} - (s1 / {k}) * (s1 / {k}))"
    " + CAST({sq2!r} AS DOUBLE), 0.0)), 6)"
)
_DIST = _DIST_TMPL.format(k=float(TS_SIM_K), sq1=_SQ1, sq2=_SQ2)
_VAR = f"(s2 / {float(TS_SIM_K)} - (s1 / {float(TS_SIM_K)}) * (s1 / {float(TS_SIM_K)}))"


_ZNORM_CTES = f"""
e AS (
  SELECT user_id AS account_id, epoch_us(ts) AS t_us, event_id, value FROM events
),
f AS (
  SELECT account_id, event_id,
         COUNT(*) OVER w AS n,
         round(SUM(value) OVER w, 6) AS s1,
         round(SUM(value * value) OVER w, 6) AS s2,
         list_dot_product(list(value) OVER w, {_Q_DUCK}) AS dotwq
  FROM e
  WINDOW w AS (
    PARTITION BY account_id ORDER BY t_us, event_id
    ROWS BETWEEN {TS_SIM_K - 1} PRECEDING AND CURRENT ROW
  )
),
g AS (
  SELECT account_id, event_id, {_DIST} AS dist
  FROM f WHERE n = {TS_SIM_K} AND round({_VAR}, 6) > 0
)
"""


def sql_znorm_alerts(threshold: float) -> str:
    """Batch oracle for the streaming spike-pattern detector: every
    window whose z-normalized distance to the pattern beats the
    threshold (same CTEs as the top-k face)."""
    return f"""
WITH {_ZNORM_CTES}
SELECT account_id, event_id, dist FROM g WHERE dist < {threshold}
"""


@register(
    "ts_znorm_pattern_topk",
    oracle=f"""
WITH {_ZNORM_CTES}
SELECT account_id, event_id, dist,
       CAST(row_number() OVER (
         ORDER BY dist ASC, account_id ASC, event_id ASC
       ) AS BIGINT) AS rk
FROM g
QUALIFY rk <= {TS_SIM_TOP}
""",
    doc=f"Z-normalized subsequence similarity search (the UCR/EDBT'19 "
    f"shape): every {TS_SIM_K}-event window of an account's amount "
    "series is z-normalized and scored by Euclidean distance against a "
    f"literal spike pattern; global top-{TS_SIM_TOP} matches. The "
    "distance is rewritten onto SCALARS of the frame (6dp-rounded "
    "sliding sums + one dot product against the broadcast-literal "
    "pattern), so no per-element normalization happens in either "
    "engine — cross-engine determinism comes from the rounded-sums "
    "convention, and per-row cost is O(k) with zero extra shuffle "
    "(one key exchange + in-partition frames). The global top-k is a "
    "distributed TakeOrdered, not a single-partition window (the "
    "bm25_query_topk convention). At 100 TB this is the pattern-scan "
    "that rides the per-account sort the other row-frame analytics "
    "already pay — the streaming twin is the same frame over the "
    "stateful fold machinery.",
    tags=("timeseries", "similarity", "window_function"),
)
def ts_znorm_pattern_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    w = (
        Window.partitionBy("account_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(-(TS_SIM_K - 1), 0)
    )
    dotwq = F.expr(
        f"aggregate(zip_with(wv, {_Q_SPARK}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
    )
    f = (
        ev.select(
            "account_id",
            "t_us",
            "event_id",
            F.count("*").over(w).alias("n"),
            F.round(F.sum("value").over(w), 6).alias("s1"),
            F.round(F.sum(F.col("value") * F.col("value")).over(w), 6).alias("s2"),
            F.collect_list("value").over(w).alias("wv"),
        )
        .where(F.col("n") == TS_SIM_K)
        .withColumn("dotwq", dotwq)
        .where(F.expr(f"round({_VAR}, 6) > 0"))
        .select("account_id", "event_id", F.expr(_DIST).alias("dist"))
    )
    top = f.orderBy(
        F.asc("dist"), F.asc("account_id"), F.asc("event_id")
    ).limit(TS_SIM_TOP)
    rk = F.row_number().over(
        Window.orderBy(F.asc("dist"), F.asc("account_id"), F.asc("event_id"))
    )
    return top.withColumn("rk", rk.cast("long"))


# --------------------- point-in-time training-table assembly

_FEATURE_LABEL_ORACLE = """
WITH d AS (
  SELECT user_id, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_no,
         round(SUM(value), 6) AS s,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS p
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(day_no) AS lo, MAX(day_no) AS hi FROM d GROUP BY 1),
days AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day_no FROM span),
g AS (
  SELECT days.user_id, days.day_no,
         COALESCE(s, 0.0) AS amount_sum,
         COALESCE(c, 0) AS n_events,
         COALESCE(p, 0) AS n_purchases
  FROM days LEFT JOIN d
    ON days.user_id = d.user_id AND days.day_no = d.day_no
)
SELECT user_id, day_no, n_events, amount_sum,
       COALESCE(lag(amount_sum) OVER w, 0.0) AS lag1_sum,
       round(AVG(amount_sum) OVER (
         PARTITION BY user_id ORDER BY day_no
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 6) AS roll7_mean,
       CAST(COALESCE(SUM(n_purchases) OVER (
         PARTITION BY user_id ORDER BY day_no
         ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING
       ), 0) AS BIGINT) AS next7_purchases,
       (COALESCE(SUM(n_purchases) OVER (
         PARTITION BY user_id ORDER BY day_no
         ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING
       ), 0) > 0) AS label
FROM g WINDOW w AS (PARTITION BY user_id ORDER BY day_no)
"""


@register(
    "feature_label_matrix_daily",
    oracle=_FEATURE_LABEL_ORACLE,
    doc="Point-in-time-correct TRAINING TABLE assembly (the feature-"
    "store build): per (user, day) on the dense gap-filled daily "
    "spine — backward-looking features (yesterday's sum, 7-day "
    "rolling mean over ROWS frames, exact on the dense spine) and a "
    "forward-looking label (any purchase in the NEXT 7 days), so "
    "feature windows end strictly before the label window starts — "
    "no leakage by construction. One (user, day) aggregate, the "
    "gap-fill spine join, then every lag/rolling/lead frame rides a "
    "single (user)-partitioned day sort. The supervised-dataset prep "
    "shape a 100 TB behavioral-training pipeline runs nightly.",
    tags=("timeseries", "temporal", "sampling", "window_function"),
)
def feature_label_matrix_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("CAST(ts div 86400000000000 AS BIGINT)").alias("day_no"),
            "value",
            (F.col("event_type") == "purchase").cast("long").alias("is_p"),
        )
        .groupBy("user_id", "day_no")
        .agg(
            F.round(F.sum("value"), 6).alias("s"),
            F.count("*").cast("long").alias("c"),
            F.sum("is_p").cast("long").alias("p"),
        )
    )
    days = (
        d.groupBy("user_id")
        .agg(F.min("day_no").alias("lo"), F.max("day_no").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("day_no"))
    )
    g = days.join(d, ["user_id", "day_no"], "left").select(
        "user_id",
        "day_no",
        F.coalesce("s", F.lit(0.0)).alias("amount_sum"),
        F.coalesce("c", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("p", F.lit(0)).cast("long").alias("n_purchases"),
    )
    w = Window.partitionBy("user_id").orderBy("day_no")
    roll = w.rowsBetween(-6, 0)
    fut = w.rowsBetween(1, 7)
    next7 = F.coalesce(F.sum("n_purchases").over(fut), F.lit(0)).cast("long")
    return g.select(
        "user_id",
        "day_no",
        "n_events",
        "amount_sum",
        F.coalesce(F.lag("amount_sum").over(w), F.lit(0.0)).alias("lag1_sum"),
        F.round(F.avg("amount_sum").over(roll), 6).alias("roll7_mean"),
        next7.alias("next7_purchases"),
        (next7 > 0).alias("label"),
    )


# --------------------- expanding-window backtest folds

BACKTEST_FOLDS = 4

_BACKTEST_ORACLE = f"""
WITH d AS (
  SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_no FROM events
),
b AS (
  SELECT MIN(day_no) AS lo, MAX(day_no) AS hi FROM d
),
marks AS (
  SELECT lo, hi,
         {", ".join(f"lo + ((hi - lo + 1) * {i}) // {BACKTEST_FOLDS + 1} AS b{i}"
                     for i in range(1, BACKTEST_FOLDS + 2))}
  FROM b
),
c AS (
  SELECT
    {", ".join(
        f"CAST(SUM(CASE WHEN day_no < b{i} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS tr{i}, "
        f"CAST(SUM(CASE WHEN day_no >= b{i} AND day_no < b{i + 1} THEN 1"
        f" ELSE 0 END) AS BIGINT) AS te{i}"
        for i in range(1, BACKTEST_FOLDS + 1))},
    MAX(b1) AS b1, MAX(b2) AS b2, MAX(b3) AS b3, MAX(b4) AS b4, MAX(b5) AS b5
  FROM d CROSS JOIN marks
)
{" UNION ALL ".join(
    f"SELECT CAST({i} AS BIGINT) AS fold, b{i} - 1 AS train_end_day,"
    f" b{i + 1} - 1 AS test_end_day, tr{i} AS n_train, te{i} AS n_test FROM c"
    for i in range(1, BACKTEST_FOLDS + 1))}
"""


@register(
    "backtest_expanding_folds",
    oracle=_BACKTEST_ORACLE,
    doc=f"Time-series cross-validation assignment: {BACKTEST_FOLDS} "
    "expanding-window backtest folds over the event-day span (integer "
    "fifth boundaries — the temporal split that never trains on the "
    "future, the companion to the leakage-free training table). One "
    "scan, one row of conditional sums (every fold's train/test count "
    "in a single aggregate), reshaped to a fold-per-row summary — no "
    "per-fold rescans, which is what makes K-fold backtests affordable "
    "at 100 TB.",
    tags=("timeseries", "temporal", "sampling", "split", "eval"),
)
def backtest_expanding_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "events").select(
        F.expr("CAST(ts div 86400000000000 AS BIGINT)").alias("day_no")
    )
    lo, hi = d.agg(F.min("day_no"), F.max("day_no")).first()
    k = BACKTEST_FOLDS
    b = [lo + ((hi - lo + 1) * i) // (k + 1) for i in range(1, k + 2)]
    aggs = []
    for i in range(1, k + 1):
        aggs.append(
            F.sum(F.when(F.col("day_no") < b[i - 1], 1).otherwise(0))
            .cast("long")
            .alias(f"tr{i}")
        )
        aggs.append(
            F.sum(
                F.when(
                    (F.col("day_no") >= b[i - 1]) & (F.col("day_no") < b[i]), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"te{i}")
        )
    c = d.agg(*aggs)
    folds = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("fold"),
                F.lit(b[i - 1] - 1).cast("long").alias("train_end_day"),
                F.lit(b[i] - 1).cast("long").alias("test_end_day"),
                F.col(f"tr{i}").alias("n_train"),
                F.col(f"te{i}").alias("n_test"),
            )
            for i in range(1, k + 1)
        ]
    )
    return c.select(F.explode(folds).alias("f")).select("f.*")


# --------------------- in-engine model training (fixed-iteration GD)

LOGREG_ITERS = 3
LOGREG_LR = 1.0


def _logreg_oracle() -> str:
    # weight-carrying CTE chain: w{i} holds the weights AFTER iteration
    # i as columns (w1, w2, wb); each step cross-joins the previous
    # weight row into the feature frame and computes
    # w - lr * avg-gradient in one aggregate (MAX() lifts the constant
    # weight columns through the aggregate)
    sig = "1.0 / (1.0 + exp(-(w1 * x1 + w2 * x2 + wb)))"
    ctes = ["w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS wb)"]
    for i in range(1, LOGREG_ITERS + 1):
        ctes.append(
            f"""w{i} AS (
  SELECT MAX(w1) - {LOGREG_LR!r} * AVG(({sig} - y) * x1) AS w1,
         MAX(w2) - {LOGREG_LR!r} * AVG(({sig} - y) * x2) AS w2,
         MAX(wb) - {LOGREG_LR!r} * AVG({sig} - y) AS wb
  FROM f CROSS JOIN w{i - 1}
)"""
        )
    return f"""
WITH fl AS ({_FEATURE_LABEL_ORACLE}),
f AS (
  SELECT amount_sum / 1000.0 AS x1,
         n_events / 10.0 AS x2,
         CASE WHEN label THEN 1.0 ELSE 0.0 END AS y
  FROM fl
),
{", ".join(ctes)}
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       round(MAX(w1), 6) AS w_amount,
       round(MAX(w2), 6) AS w_events,
       round(MAX(wb), 6) AS bias,
       round(AVG(-(y * ln({sig}) + (1.0 - y) * ln(1.0 - ({sig})))), 6)
         AS logloss
FROM f CROSS JOIN w{LOGREG_ITERS}
"""


@register(
    "logreg_train_next7_purchase",
    oracle=_logreg_oracle(),
    doc=f"Model training INSIDE the engine: {LOGREG_ITERS} fixed "
    "full-batch gradient-descent iterations of logistic regression on "
    "the point-in-time training table (features scaled daily sum + "
    "event count, label = purchase in the next 7 days), emitting the "
    "learned weights and the final mean log-loss. Each iteration is "
    "ONE aggregate over the cached feature frame (three avg-gradient "
    "components together), weights travel as driver scalars — the "
    "kmeans/PageRank fixed-iteration convention, the shape a "
    "distributed GD epoch actually has (map-side partial gradients, "
    "one tiny reduce). The oracle unrolls the identical three "
    "iterations as chained CTEs; gradient sums differ only in "
    "summation order (~1e-15) and every emitted float is 6dp-rounded.",
    tags=("timeseries", "temporal", "eval", "iterative"),
)
def logreg_train_next7_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = (
        feature_label_matrix_daily(spark, sf_dir)
        .select(
            (F.col("amount_sum") / 1000.0).alias("x1"),
            (F.col("n_events") / 10.0).alias("x2"),
            F.when(F.col("label"), 1.0).otherwise(0.0).alias("y"),
        )
        .persist()
    )
    w1 = w2 = b = 0.0
    for _ in range(LOGREG_ITERS):
        z = F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2") + F.lit(b)
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = f.agg(
            F.avg((sig - F.col("y")) * F.col("x1")).alias("g1"),
            F.avg((sig - F.col("y")) * F.col("x2")).alias("g2"),
            F.avg(sig - F.col("y")).alias("gb"),
        ).first()
        w1, w2, b = (
            w1 - LOGREG_LR * g.g1,
            w2 - LOGREG_LR * g.g2,
            b - LOGREG_LR * g.gb,
        )
    z = F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2") + F.lit(b)
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    out = f.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.round(F.lit(w1), 6).alias("w_amount"),
        F.round(F.lit(w2), 6).alias("w_events"),
        F.round(F.lit(b), 6).alias("bias"),
        F.round(
            F.avg(
                -(
                    F.col("y") * F.log(sig)
                    + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - sig)
                )
            ),
            6,
        ).alias("logloss"),
    ).localCheckpoint(eager=True)
    f.unpersist()
    return out
