"""Local replica of the driver's t2 correctness gate.

Runs every registered query via Spark AND its DuckDB oracle on the same
parquet tables, then compares row counts + order-insensitive values.
Two float modes:

  default  — relative tolerance (REL_TOL), useful while iterating
  --exact  — driver-style exact comparison (the driver hashes raw
             values with NO tolerance; r10's q11 red slipped through
             because this script tolerated a 1-ULP summation-order
             drift the driver's hash did not). Rotation candidates
             MUST pass --exact before taking a DRIVER_WINDOW slot.

`--perturb` runs Spark under a deliberately different partitioning
(7 shuffle partitions, tiny input splits, AQE coalescing off) so
float summation ORDER differs from the default sweep — a query whose
emitted values survive exact compare under BOTH configs is
order-stable in practice; one that flips is emitting an unrounded
order-sensitive aggregate and must round (the q15/q11 6dp pattern).

Usage:

    python scripts/check_parity.py [--exact] [--perturb] [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_fraud_detection_rocks_db_app_spark.fixtures import TABLES
from flink_fraud_detection_rocks_db_app_spark.registry import all_queries
from flink_fraud_detection_rocks_db_app_spark.session import get_spark

REL_TOL = 1e-9


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, then sort rows; floats kept as floats."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def key(v):
        return (v is None, str(type(v)), str(v))

    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(key(v) for v in r))


def values_match(a, b, exact: bool = False) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        fa, fb = float(a), float(b)
        if exact:
            # Driver-style: raw value equality, no tolerance. NaN==NaN
            # so a NaN cell doesn't spuriously fail on both sides.
            return fa == fb or (math.isnan(fa) and math.isnan(fb))
        return math.isclose(fa, fb, rel_tol=REL_TOL, abs_tol=1e-12)
    return a == b


def compare(spark_rows, spark_cols, duck_rows, duck_cols,
            exact: bool = False) -> str | None:
    if len(spark_rows) != len(duck_rows):
        return f"row count {len(spark_rows)} vs {len(duck_rows)}"
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        return f"columns {sorted(spark_cols)} vs {sorted(duck_cols)}"
    a = normalize(spark_rows, [c.lower() for c in spark_cols])
    b = normalize(duck_rows, [c.lower() for c in duck_cols])
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if not values_match(va, vb, exact=exact):
                return f"row {i}: {ra} vs {rb}"
    return None


def main() -> int:
    args = sys.argv[1:]
    exact = "--exact" in args
    perturb = "--perturb" in args
    args = [a for a in args if a not in ("--exact", "--perturb")]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    names = [a for a in args if not a.startswith("/")]
    specs = all_queries()
    if names:
        specs = {n: specs[n] for n in names}
    if perturb:
        spark = get_spark(
            cpus=16,
            shuffle_partitions=7,
            extra_conf={
                "spark.sql.files.maxPartitionBytes": "262144",
                "spark.sql.adaptive.coalescePartitions.enabled": "false",
            },
        )
    else:
        spark = get_spark(cpus=16, shuffle_partitions=16)
    con = duck_con(sf_dir)
    failures = []
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        sdf = spec.fn(spark, sf_dir)
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = sdf.columns
        if spec.oracle is None:
            print(f"  {name}: {len(spark_rows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        res = con.execute(spec.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        err = compare(spark_rows, spark_cols, duck_rows, duck_cols, exact=exact)
        status = "OK " if err is None else "FAIL"
        print(f"  {name}: {status} {len(spark_rows)} rows [{time.time()-t0:.1f}s]"
              + (f" — {err}" if err else ""))
        if err:
            failures.append(name)
    mode = "exact" if exact else f"rel_tol={REL_TOL}"
    print(f"\n{len(specs) - len(failures)}/{len(specs)} queries match ({mode})")
    if failures:
        print("FAILURES:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
