"""Temporal-table / CDC operators: SCD2 history compression, changelog
upsert compaction (the MERGE/latest-op-wins shape), and time-travel
snapshot reads.

The reference's data model is an append-only transaction stream with
keyed state holding "the latest per key" (ValueState read-modify-write,
master/src/main/java/InorderTumblingWindow/FraudDetector.java:55-65 and
the RocksDB merge in FraudDetectionJob.java:128-160). These faces are
the WAREHOUSE-side expression of that same contract: a changelog in, a
keyed current-state (or versioned-history) table out — what a
training-data pipeline needs to maintain dimension/metadata tables
under continuous upserts (the Hudi/Delta MERGE INTO compaction shape,
here as pure declarative DataFrame ops).

Scale design:
- SCD2 compression (gaps-and-islands) is ONE exchange on the entity
  key: the change flag and row numbers window over a (user_id)
  partitioned sort, the island-start filter preserves that
  partitioning AND ordering, and the second window pass (version,
  validity lead, event-count gap) reuses the same exchange and sort.
  No self-join, no per-island groupBy — the naive formulations pay a
  predecessor join or two extra shuffles of the compressed history.
- Changelog compaction is the rank-1-per-key pattern: row_number()
  over (key ORDER BY t DESC) = 1 lowers to WindowGroupLimit, so each
  shuffle partition keeps one candidate row per key before the final
  filter — state per key, not per event. At 100 TB of changelog the
  working set is the KEY cardinality (the dimension size), which is
  exactly the invariant the streaming twin's complete-mode aggregation
  state carries.
- Time-travel (`AS OF`) is the same plan with the cutoff predicate
  pushed to the scan (PushedFilters on the ms column), so a snapshot
  read prunes every later partition of a date-partitioned changelog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..fixtures import load
from ..registry import register

# 2024-01-16 00:00:00 UTC — mid-span of the fixture's Jan-2024 event
# window at every SF, so the snapshot sees roughly half the changelog.
SNAPSHOT_CUTOFF_MS = 1_705_363_200_000

# value-bucket "tier" — the slowly-changing attribute whose run-length
# compression the SCD2 face materializes. Boundaries are exact-double
# comparisons on untouched parquet values, identical in both engines.
_TIER_SQL = (
    "CASE WHEN value < 50 THEN 'low' "
    "WHEN value < 150 THEN 'mid' ELSE 'high' END"
)

SCD2_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
         {_TIER_SQL} AS tier
  FROM events
),
m AS (
  SELECT *, CASE WHEN lag(tier) OVER w IS DISTINCT FROM tier
                 THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
),
i AS (
  SELECT *, SUM(chg) OVER (
    PARTITION BY user_id ORDER BY t_ms, event_id
    ROWS UNBOUNDED PRECEDING
  ) AS ver
  FROM m
),
g AS (
  SELECT user_id, CAST(ver AS BIGINT) AS version, min(tier) AS tier,
         min(t_ms) AS valid_from_ms, CAST(count(*) AS BIGINT) AS n_events
  FROM i GROUP BY 1, 2
)
SELECT user_id, version, tier, valid_from_ms,
       lead(valid_from_ms) OVER (
         PARTITION BY user_id ORDER BY version
       ) AS valid_to_ms,
       n_events,
       (lead(valid_from_ms) OVER (
         PARTITION BY user_id ORDER BY version
       ) IS NULL) AS is_current
FROM g
"""


@register(
    "scd2_user_tier_history",
    oracle=SCD2_ORACLE,
    doc="SCD Type-2 history build by run-length compression "
    "(gaps-and-islands): per user, consecutive events sharing the same "
    "value-tier collapse into one versioned row with half-open "
    "[valid_from_ms, valid_to_ms) validity, valid_to_ms NULL (and "
    "is_current true) on the open head version. Change flag, island "
    "id and the validity lead() all window over the same "
    "(user_id)-partitioned sort — one exchange for the whole history "
    "build, no self-join.",
    tags=("temporal", "scd2", "window_function"),
)
def scd2_user_tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One-exchange formulation: instead of groupBy(user, island) (a
    # second shuffle) + lead over (user) (a third), keep only each
    # island's FIRST row (chg=1) and derive everything from window
    # functions over the same user_id partitioning — the filter
    # preserves both the partitioning and the (t_ms, event_id) sort, so
    # the second window pass reuses the first's exchange and sort:
    # version is the rank among island starts, n_events is the gap to
    # the next start's global row number, valid_to is the next start's
    # timestamp. The whole SCD2 build is one shuffle + one sort.
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000000").alias("t_ms"),
        "event_id",
        F.expr(_TIER_SQL).alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    prev = F.lag("tier").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("tier")), 1).otherwise(0)
    rows = ev.select(
        "user_id",
        "t_ms",
        "tier",
        chg.alias("chg"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("cnt"),
        "event_id",
    )
    starts = rows.where(F.col("chg") == 1)
    ws = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    valid_to = F.lead("t_ms").over(ws)
    return starts.select(
        "user_id",
        F.row_number().over(ws).cast("long").alias("version"),
        "tier",
        F.col("t_ms").alias("valid_from_ms"),
        valid_to.alias("valid_to_ms"),
        (
            F.coalesce(F.lead("rn").over(ws), F.col("cnt") + 1) - F.col("rn")
        ).cast("long").alias("n_events"),
        valid_to.isNull().alias("is_current"),
    )


def _cdc_oracle(cutoff_ms: int | None) -> str:
    where = f"WHERE epoch_ms(ts) <= {cutoff_ms}" if cutoff_ms else ""
    return f"""
WITH c AS (
  SELECT user_id, epoch_ms(ts) AS t_ms, event_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events {where}
),
r AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY user_id ORDER BY t_ms DESC, event_id DESC
         ) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
  FROM c
)
SELECT user_id, value AS cur_value, t_ms AS updated_ms, n_changes
FROM r WHERE rn = 1 AND op = 'U'
"""


# Shared by the batch compaction face and its streaming twin (one
# definition of the truth, the ASOF_ORACLE convention).
CDC_ORACLE = _cdc_oracle(None)


def _cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture stream read AS a changelog: every event is an upsert
    of its value onto the user key, except 'error' events which are
    tombstones (deletes). The op mapping is a fixture adapter — the
    faces exist to exercise MERGE semantics, not the mapping."""
    return load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000000").alias("t_ms"),
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )


def _cdc_compact(ch: DataFrame) -> DataFrame:
    """Latest-op-wins compaction: rank-1 per key by (t_ms, event_id)
    descending, keys whose latest op is a tombstone vanish.

    n_changes comes from a separate groupBy, NOT count() over the same
    window: a second window function over the key blocks the
    WindowGroupLimit rewrite, which is the whole scale story here —
    with it, each map task forwards ONE candidate row per key into the
    exchange (partial mode) instead of the full changelog, and the
    groupBy side ships only (key, count) partials. Both children hash
    on user_id, so the join adds no third exchange."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("t_ms"), F.desc("event_id")
    )
    latest = (
        ch.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .where(F.col("op") == "U")
    )
    counts = ch.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_changes")
    )
    return latest.join(counts, "user_id").select(
        "user_id",
        F.col("value").alias("cur_value"),
        F.col("t_ms").alias("updated_ms"),
        "n_changes",
    )


@register(
    "cdc_upsert_snapshot",
    oracle=CDC_ORACLE,
    doc="Changelog compaction to current state (the MERGE INTO / "
    "Hudi-Delta upsert-compaction shape): latest op per key wins, a "
    "trailing tombstone deletes the key. One shuffle on the key; "
    "row_number()=1 lowers to WindowGroupLimit so per-partition state "
    "is one row per key before the filter — the working set at 100 TB "
    "is the key cardinality, not the changelog length.",
    tags=("temporal", "cdc", "warehouse"),
)
def cdc_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cdc_compact(_cdc_changelog(spark, sf_dir))


@register(
    "cdc_snapshot_asof",
    oracle=_cdc_oracle(SNAPSHOT_CUTOFF_MS),
    doc="Time-travel read: the same changelog compaction evaluated AS "
    f"OF {SNAPSHOT_CUTOFF_MS} (2024-01-16T00:00Z, mid-span at every "
    "SF) — the cutoff is a plain predicate on the ms column, pushed "
    "to the parquet scan (PushedFilters), so a snapshot read of a "
    "date-partitioned changelog prunes every later partition before "
    "the key shuffle.",
    tags=("temporal", "cdc", "timetravel", "warehouse"),
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = _cdc_changelog(spark, sf_dir).where(
        F.col("t_ms") <= SNAPSHOT_CUTOFF_MS
    )
    return _cdc_compact(ch)


# ---- temporal (FOR SYSTEM_TIME AS OF) dimension join --------------------

# The dimension changelog: account-status events (signup/error) set the
# user's status tier; purchases are the facts enriched against it.
# Dimension and fact substreams are disjoint, so the join is genuinely
# informative (a fact never observes itself). Visibility is strict
# (s before p in the global (t_ms, event_id) order): a fact sees the
# dimension state as of its arrival, the Flink temporal-join contract.
_TEMPORAL_JOIN_ORACLE = f"""
WITH st AS (
  SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
         {_TIER_SQL} AS tier,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
         ) AS BIGINT) AS version
  FROM events WHERE event_type IN ('signup', 'error')
),
p AS (
  SELECT user_id, epoch_ms(ts) AS t_ms, event_id, value
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT p.event_id, p.user_id, p.t_ms, p.value,
         s.tier, s.version, s.t_ms AS since_ms,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY s.t_ms DESC NULLS LAST, s.event_id DESC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN st s
    ON p.user_id = s.user_id
   AND (s.t_ms < p.t_ms OR (s.t_ms = p.t_ms AND s.event_id < p.event_id))
)
SELECT event_id, user_id, t_ms, value AS amount,
       tier AS status_tier, version AS status_version,
       since_ms AS status_since_ms
FROM j WHERE rn = 1
"""


@register(
    "temporal_join_purchase_status",
    oracle=_TEMPORAL_JOIN_ORACLE,
    doc="Temporal-table join (Flink's FOR SYSTEM_TIME AS OF; the "
    "reference runtime's headline enrichment pattern): each purchase "
    "fact joined to the account-status dimension version (tier set by "
    "the latest signup/error event) valid at the fact's position in "
    "the global (t_ms, event_id) order — strictly-before visibility, "
    "NULLs before the first status. Spark side reads the three "
    "event types ONCE and derives tier/version/since from conditional "
    "window aggregates over a single (user_id)-partitioned sort — one "
    "scan, one exchange, one sort (plan-pinned), no per-fact probe, "
    "no fact x versions blowup; the oracle is the independent "
    "argmax-per-fact formulation.",
    tags=("temporal", "join", "asof"),
)
def temporal_join_purchase_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-scan formulation: instead of unioning a row_number-ed
    # dimension branch with a fact branch (two scans, and the version
    # numbering pays its own exchange+sort before the union), read the
    # three relevant event types once and derive everything from
    # CONDITIONAL window aggregates over one (user_id)-partitioned
    # (t_ms, event_id) sort: the running count of dimension rows IS
    # the valid version number, last(tier of dimension rows, ignore
    # nulls) carries the valid tier, and the strictly-before contract
    # holds because a fact row contributes nothing to either. One
    # scan, one exchange, one sort (plan-pinned).
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("signup", "error", "purchase"))
        .select(
            "user_id",
            F.expr("ts div 1000000").alias("t_ms"),
            "event_id",
            "value",
            (F.col("event_type") != "purchase").alias("is_dim"),
            F.expr(_TIER_SQL).alias("tier"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dim = F.when(F.col("is_dim"), F.col("tier"))
    n_dim = F.sum(F.when(F.col("is_dim"), 1).otherwise(0)).over(w)
    c = ev.select(
        "*",
        F.last(dim, ignorenulls=True).over(w).alias("status_tier"),
        F.when(n_dim > 0, n_dim).cast("long").alias("status_version"),
        F.last(
            F.when(F.col("is_dim"), F.col("t_ms")), ignorenulls=True
        ).over(w).alias("status_since_ms"),
    )
    return c.where(~F.col("is_dim")).select(
        "event_id",
        "user_id",
        "t_ms",
        F.col("value").alias("amount"),
        "status_tier",
        "status_version",
        "status_since_ms",
    )


# ---- snapshot diff ------------------------------------------------------


def _cdc_diff_oracle() -> str:
    return f"""
WITH old_s AS ({_cdc_oracle(SNAPSHOT_CUTOFF_MS)}),
new_s AS ({_cdc_oracle(None)})
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'I'
            WHEN n.user_id IS NULL THEN 'D'
            ELSE 'U' END AS op,
       o.cur_value AS old_value, n.cur_value AS new_value,
       o.updated_ms AS old_ms, n.updated_ms AS new_ms
FROM old_s o FULL OUTER JOIN new_s n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR o.cur_value <> n.cur_value OR o.updated_ms <> n.updated_ms
"""


@register(
    "cdc_snapshot_diff",
    oracle=_cdc_diff_oracle(),
    doc="Snapshot diff: the keyed delta between the AS-OF snapshot "
    f"(cutoff {SNAPSHOT_CUTOFF_MS}) and the current compaction — "
    "inserts (key appeared), deletes (key tombstoned away), updates "
    "(value or update time moved); unchanged keys are suppressed. "
    "Each side is the WindowGroupLimit-planned compaction, the diff "
    "is one full outer join on the key — both children hash on "
    "user_id so the join adds no extra exchange. In production the "
    "old side is a STORED snapshot table, so the diff prices one "
    "compaction + one co-partitioned join, the standard warehouse "
    "reconciliation/backfill-audit query.",
    tags=("temporal", "cdc", "timetravel", "join"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = _cdc_changelog(spark, sf_dir)
    old_s = _cdc_compact(ch.where(F.col("t_ms") <= SNAPSHOT_CUTOFF_MS)).select(
        F.col("user_id").alias("o_user"),
        F.col("cur_value").alias("old_value"),
        F.col("updated_ms").alias("old_ms"),
    )
    new_s = _cdc_compact(ch).select(
        F.col("user_id").alias("n_user"),
        F.col("cur_value").alias("new_value"),
        F.col("updated_ms").alias("new_ms"),
    )
    j = old_s.join(new_s, old_s.o_user == new_s.n_user, "full_outer")
    changed = (
        F.col("o_user").isNull()
        | F.col("n_user").isNull()
        | (F.col("old_value") != F.col("new_value"))
        | (F.col("old_ms") != F.col("new_ms"))
    )
    return j.where(changed).select(
        F.coalesce("o_user", "n_user").alias("user_id"),
        F.when(F.col("o_user").isNull(), F.lit("I"))
        .when(F.col("n_user").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "old_value",
        "new_value",
        "old_ms",
        "new_ms",
    )


# ---- SCD2 with tombstones ------------------------------------------------

SCD2_TOMBSTONE_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
         event_type = 'error' AS is_del,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE {_TIER_SQL} END AS tier
  FROM events
),
m AS (
  SELECT *,
         lag(is_del) OVER w AS prev_del,
         lag(tier) OVER w AS prev_tier,
         CAST(SUM(CASE WHEN is_del THEN 0 ELSE 1 END) OVER (
           PARTITION BY user_id ORDER BY t_ms, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS rn_ne,
         CAST(SUM(CASE WHEN is_del THEN 0 ELSE 1 END) OVER (
           PARTITION BY user_id
         ) AS BIGINT) AS cnt_ne
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
),
b AS (  -- boundary rows: tombstones + version starts
  SELECT *,
         (NOT is_del) AND (prev_del IS NULL OR prev_del
                           OR prev_tier IS DISTINCT FROM tier) AS is_start
  FROM m
  WHERE is_del OR (prev_del IS NULL OR prev_del
                   OR prev_tier IS DISTINCT FROM tier)
),
v AS (
  SELECT *,
         CAST(SUM(CASE WHEN is_start THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY t_ms, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS version,
         lead(t_ms) OVER wb AS nb_t,
         lead(is_del) OVER wb AS nb_del,
         lead(rn_ne) OVER wb AS nb_rn
  FROM b WINDOW wb AS (PARTITION BY user_id ORDER BY t_ms, event_id)
)
SELECT user_id, version, tier,
       t_ms AS valid_from_ms,
       nb_t AS valid_to_ms,
       CAST(CASE WHEN nb_t IS NULL THEN cnt_ne - rn_ne + 1
                 WHEN nb_del THEN nb_rn - rn_ne + 1
                 ELSE nb_rn - rn_ne END AS BIGINT) AS n_events,
       CASE WHEN nb_t IS NULL THEN NULL
            WHEN nb_del THEN 'tombstone' ELSE 'change' END AS closed_by,
       (nb_t IS NULL) AS is_current
FROM v WHERE is_start
"""


@register(
    "scd2_tombstoned_history",
    oracle=SCD2_TOMBSTONE_ORACLE,
    doc="SCD Type-2 WITH DELETES: tombstone events ('error') close the "
    "open version at their timestamp without opening a new one — the "
    "re-activation after a tombstone starts a fresh version even at "
    "the same tier, and a user can have validity GAPS (deactivated "
    "spans). Versions stay dense per user; closed_by distinguishes "
    "attribute-change closes from tombstone closes. Same one-exchange "
    "one-sort shape as the plain SCD2 build: boundary rows (tombstones "
    "+ version starts) are filtered from the first window pass and the "
    "second pass leads over them under the preserved sort.",
    tags=("temporal", "scd2", "cdc", "window_function"),
)
def scd2_tombstoned_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000000").alias("t_ms"),
        "event_id",
        (F.col("event_type") == "error").alias("is_del"),
        F.when(
            F.col("event_type") == "error", F.lit(None).cast("string")
        ).otherwise(F.expr(_TIER_SQL)).alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ne = F.when(F.col("is_del"), 0).otherwise(1)
    prev_del = F.lag("is_del").over(w)
    prev_tier = F.lag("tier").over(w)
    m = ev.select(
        "*",
        prev_del.alias("prev_del"),
        prev_tier.alias("prev_tier"),
        F.sum(ne).over(wr).cast("long").alias("rn_ne"),
        F.sum(ne).over(Window.partitionBy("user_id")).cast("long").alias("cnt_ne"),
    )
    new_ctx = (
        F.col("prev_del").isNull()
        | F.col("prev_del")
        | ~(F.col("prev_tier").eqNullSafe(F.col("tier")))
    )
    b = m.where(F.col("is_del") | new_ctx).select(
        "*", (~F.col("is_del") & new_ctx).alias("is_start")
    )
    wb = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    wbr = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = b.select(
        "*",
        F.sum(F.when(F.col("is_start"), 1).otherwise(0))
        .over(wbr)
        .cast("long")
        .alias("version"),
        F.lead("t_ms").over(wb).alias("nb_t"),
        F.lead("is_del").over(wb).alias("nb_del"),
        F.lead("rn_ne").over(wb).alias("nb_rn"),
    )
    n_events = (
        F.when(F.col("nb_t").isNull(), F.col("cnt_ne") - F.col("rn_ne") + 1)
        .when(F.col("nb_del"), F.col("nb_rn") - F.col("rn_ne") + 1)
        .otherwise(F.col("nb_rn") - F.col("rn_ne"))
    )
    return v.where("is_start").select(
        "user_id",
        "version",
        "tier",
        F.col("t_ms").alias("valid_from_ms"),
        F.col("nb_t").alias("valid_to_ms"),
        n_events.cast("long").alias("n_events"),
        F.when(F.col("nb_t").isNull(), F.lit(None).cast("string"))
        .when(F.col("nb_del"), F.lit("tombstone"))
        .otherwise(F.lit("change"))
        .alias("closed_by"),
        F.col("nb_t").isNull().alias("is_current"),
    )
