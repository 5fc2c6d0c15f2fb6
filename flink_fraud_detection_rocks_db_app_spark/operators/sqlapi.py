"""SQL-text query surface: the same engine through `spark.sql(...)`.

The reference has no SQL face (its "query language" is the hard-coded
operator DAG); this engine gets one for free from Spark SQL. These
queries run as SQL TEXT against registered views — proving a user can
drive every capability without touching the DataFrame API — and reuse
the DuckDB oracles unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..fixtures import register_views
from ..registry import register


@register(
    "sql_tumble_sum_3s",
    oracle="SELECT (epoch_ms(ts) // 3000) * 3000 AS w_start, user_id AS account_id, "
    "round(SUM(value), 6) AS sum_amount FROM events GROUP BY 1, 2",
    doc="EP1's windowed sum written as SQL text (window() TVF-style "
    "expression in SQL) — same Catalyst plan as the DataFrame form",
    tags=("sql", "window", "tumbling"),
)
def sql_tumble_sum_3s(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT unix_millis(window.start) AS w_start, account_id,
               round(SUM(amount), 6) AS sum_amount
        FROM transactions
        GROUP BY window(event_time, '3 seconds'), account_id
        """
    )


@register(
    "sql_revenue_rollup",
    oracle="""
SELECT n_name, o_orderstatus, round(SUM(o_totalprice), 6) AS revenue, COUNT(*) AS n
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_orderstatus)
""",
    doc="Join + ROLLUP as SQL text over the registered views",
    tags=("sql", "join", "rollup"),
)
def sql_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, o_orderstatus, round(SUM(o_totalprice), 6) AS revenue, COUNT(*) AS n
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, o_orderstatus)
        """
    )


@register(
    "sql_session_windows",
    oracle="""
WITH e AS (SELECT user_id, value, epoch_us(ts) AS tus FROM events),
o AS (
  SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                   OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) >= 21600000000
                 THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus ROWS UNBOUNDED PRECEDING) AS sid FROM o)
SELECT MIN(tus) // 1000 AS w_start, user_id AS account_id,
       round(SUM(value), 6) AS sum_amount, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
""",
    doc="session_window() invoked from SQL text (6h gap)",
    tags=("sql", "session"),
)
def sql_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT unix_millis(session_window.start) AS w_start, account_id,
               round(SUM(amount), 6) AS sum_amount, COUNT(*) AS n_events
        FROM transactions
        GROUP BY session_window(event_time, '6 hours'), account_id
        """
    )


@register(
    "sql_window_heavy_hitters_1h",
    oracle="""
SELECT w_start, event_type, n, rnk
FROM (
  SELECT w_start, event_type, n,
         row_number() OVER (PARTITION BY w_start ORDER BY n DESC, event_type ASC) AS rnk
  FROM (
    SELECT (epoch_ms(ts) // 3600000) * 3600000 AS w_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
  )
)
WHERE rnk <= 3
""",
    doc="window_heavy_hitters_1h as pure SQL text over the raw events "
    "view (window() grouping expression + rank subquery) — proves the "
    "round-4 top-k surface is reachable without the DataFrame API; "
    "Catalyst plans it identically (WindowGroupLimit included)",
    tags=("sql", "window", "topk"),
)
def sql_window_heavy_hitters_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT w_start, event_type, n, rnk
        FROM (
          SELECT w_start, event_type, n,
                 row_number() OVER (PARTITION BY w_start
                                    ORDER BY n DESC, event_type ASC) AS rnk
          FROM (
            SELECT unix_millis(window.start) AS w_start, event_type,
                   COUNT(*) AS n
            FROM (SELECT timestamp_micros(ts div 1000) AS event_time,
                         event_type FROM events)
            GROUP BY window(event_time, '3600000 milliseconds'), event_type
          )
        )
        WHERE rnk <= 3
        """
    )


@register(
    "sql_doc_chunk_windows",
    # same oracle as the DataFrame form (text.doc_chunk_windows)
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (
  SELECT doc_id, w, unnest(range(0, greatest(len(w) - 1, 0) + 1, 48)) AS st
  FROM t
)
SELECT doc_id,
       CAST(st // 48 AS BIGINT) AS chunk_id,
       CAST(st AS BIGINT) AS start_word,
       CAST(least(st + 64, len(w)) AS BIGINT) AS end_word,
       CAST(least(64, len(w) - st) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(w, st + 1, st + 64), ' ') AS chunk_text
FROM s
""",
    doc="The r5 context-chunking fan-out driven entirely from SQL text "
    "(LATERAL VIEW explode over a sequence of starts + slice/array_join "
    "— higher-order array SQL, no DataFrame API): proves the newest "
    "corpus operator is reachable from the SQL surface with the same "
    "oracle.",
    tags=("sql", "text", "chunking"),
)
def sql_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id,
               CAST(st DIV 48 AS BIGINT) AS chunk_id,
               CAST(st AS BIGINT) AS start_word,
               CAST(least(st + 64, size(w)) AS BIGINT) AS end_word,
               CAST(least(64, size(w) - st) AS BIGINT) AS n_tokens,
               array_join(slice(w, st + 1, 64), ' ') AS chunk_text
        FROM (SELECT doc_id, split(text, ' ') AS w FROM documents)
        LATERAL VIEW explode(sequence(0, greatest(size(w) - 1, 0), 48)) AS st
        """
    )


def _install_sql_scd2() -> None:
    """Register sql_scd2_history sharing the temporal pillar's oracle
    object (imported, not re-spelled), so the SQL face and the
    DataFrame face can never drift to different oracle strings."""
    from .temporal import SCD2_ORACLE

    def sql_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(
            """
            WITH e AS (
              SELECT user_id, ts div 1000000 AS t_ms, event_id,
                     CASE WHEN value < 50 THEN 'low'
                          WHEN value < 150 THEN 'mid' ELSE 'high' END AS tier
              FROM events
            ),
            m AS (
              SELECT *,
                     CASE WHEN lag(tier) OVER w IS NULL
                            OR lag(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg,
                     row_number() OVER w AS rn,
                     COUNT(*) OVER (PARTITION BY user_id) AS cnt
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
            ),
            s AS (SELECT * FROM m WHERE chg = 1)
            SELECT user_id,
                   CAST(row_number() OVER wb AS BIGINT) AS version,
                   tier,
                   t_ms AS valid_from_ms,
                   lead(t_ms) OVER wb AS valid_to_ms,
                   CAST(COALESCE(lead(rn) OVER wb, cnt + 1) - rn AS BIGINT)
                     AS n_events,
                   (lead(t_ms) OVER wb IS NULL) AS is_current
            FROM s WINDOW wb AS (PARTITION BY user_id ORDER BY t_ms, event_id)
            """
        )

    register(
        "sql_scd2_history",
        oracle=SCD2_ORACLE,
        doc="The temporal pillar's SCD2 build as pure SQL TEXT over the "
        "registered views — the identical one-exchange gaps-and-islands "
        "formulation (boundary filter between two window clauses) "
        "driven entirely through spark.sql(), under the same oracle as "
        "the DataFrame face.",
        tags=("sql", "temporal", "scd2", "window_function"),
    )(sql_scd2_history)


_install_sql_scd2()
