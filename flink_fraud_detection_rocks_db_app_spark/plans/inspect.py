"""Physical-plan inspection: assert pushdown/pruning/broadcast happened.

The reference has no optimizer to inspect; here the "optimizer tests"
check that Catalyst produced the plan we want at scale: filters reach
the parquet scan, scans are pruned to referenced columns, small dims
broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of all scans in the plan."""
    plan = explain_str(df)
    return " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet ReadSchema in the plan."""
    plan = explain_str(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        out.append([f.split(":")[0].strip() for f in m.split(",") if f.strip()])
    return out
