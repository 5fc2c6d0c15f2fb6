"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (EP1 semantics: tumbling-window
sum + fraud threshold) on sf0.001. `queries()` exposes every
implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
`oracle_sql()` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_fraud_detection_rocks_db_app_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    EP1's full pipeline shape (source -> project -> 1h tumbling window
    -> per-account stats) — the dense-window variant so the result is
    non-empty at sf0.001.
    """
    return all_queries()["tumble_stats_1h"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each query; omitted entries (oracle=None)
    are genuinely non-SQL-expressible ops and get rows-only checks."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
