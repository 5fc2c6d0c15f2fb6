"""Every registered query must match its DuckDB oracle at sf0.001
(the driver repeats this at sf0.01 — scripts/check_parity.py runs it
locally at any sf)."""

from __future__ import annotations

import pytest

from flink_fraud_detection_rocks_db_app_spark.registry import all_queries
from flink_fraud_detection_rocks_db_app_spark.testing import spark_vs_oracle

from .conftest import SF_SMALL

QUERIES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = all_queries()[name]
    err = spark_vs_oracle(spark, duck, spec, SF_SMALL)
    assert err is None, f"{name}: {err}"


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 28
