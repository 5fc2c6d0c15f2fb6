"""Query registry: name -> (PySpark builder, optional DuckDB oracle SQL).

This is the engine's "query catalog". The reference hard-codes each
query as a Flink operator DAG in a `FraudDetectionJob.main` variant;
here every capability is a named, declarative query over the fixture
tables, each paired with an ANSI-SQL oracle so the driver (and local
tests) can hash-compare results against DuckDB.

Conventions (critical for the driver's order-insensitive value-hash):
- window starts are emitted as epoch-milliseconds BIGINT named
  ``w_start`` (Spark: ``unix_millis(window.start)``; DuckDB: integer
  math on ``epoch_ms(ts)``) — timezone- and precision-proof.
- every computed column is aliased identically in both forms.
- comparisons that *gate rows* (HAVING thresholds, rank tiebreaks) are
  done on values rounded to 6 decimals so double summation-order noise
  between engines cannot flip row membership; raw aggregates are left
  unrounded (the driver compares them with fp tolerance).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import operator modules lazily so registration happens on first use.
    from . import operators  # noqa: F401

    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
