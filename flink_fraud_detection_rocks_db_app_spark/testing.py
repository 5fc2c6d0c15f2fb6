"""Shared oracle-comparison helpers (used by tests and scripts/check_parity.py).

Comparison rule (SURVEY §5): sort columns by name, sort rows, compare
values; floats with 1e-9 relative tolerance (documented; matches the
driver's hash tolerance intent).
"""

from __future__ import annotations

import math

import duckdb

from .fixtures import TABLES

REL_TOL = 1e-9


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Columns sorted by name; rows sorted with non-float (key) columns
    FIRST and floats rounded to 6 dp in the sort key only — so fp
    summation-order noise between engines can't flip the positional row
    order of near-tied aggregates (ADVICE r1). Returned tuples stay in
    column-name order; only the sort key is reordered/rounded."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(r[i] for i in order) for r in rows]
    ncols = len(order)
    is_float = [
        any(isinstance(r[c], float) for r in out[:1000]) for c in range(ncols)
    ]
    keycols = [c for c in range(ncols) if not is_float[c]] + [
        c for c in range(ncols) if is_float[c]
    ]

    def key(v):
        if isinstance(v, float):
            return (False, "float", f"{v:.6f}")
        return (v is None, str(type(v)), str(v))

    return sorted(out, key=lambda r: tuple(key(r[c]) for c in keycols))


def values_match(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        return math.isclose(float(a), float(b), rel_tol=REL_TOL, abs_tol=1e-12)
    return a == b


def compare(spark_rows, spark_cols, duck_rows, duck_cols) -> str | None:
    """None if equal, else a human-readable first difference."""
    if len(spark_rows) != len(duck_rows):
        return f"row count {len(spark_rows)} vs {len(duck_rows)}"
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        return f"columns {sorted(spark_cols)} vs {sorted(duck_cols)}"
    a = normalize(spark_rows, [c.lower() for c in spark_cols])
    b = normalize(duck_rows, [c.lower() for c in duck_cols])
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if not values_match(va, vb):
                return f"row {i}: {ra} vs {rb}"
    return None


def spark_vs_oracle(spark, con, spec, sf_dir: str) -> str | None:
    """Run one QuerySpec both ways and compare; None = match."""
    sdf = spec.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return None
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    return compare(spark_rows, sdf.columns, duck_rows, duck_cols)
