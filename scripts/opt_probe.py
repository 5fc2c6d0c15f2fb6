"""Round-14 optimization probe: time registered queries in isolation
and capture their formatted plans.

Mirrors bench.py's methodology exactly (noop sink, min-of-2, warmup
action first) so numbers are comparable to BENCH_DETAIL.json rows, but
runs only the names given — isolating a query from the 155-row harness
so a change's effect is visible without a 4-minute full run.

Usage:

    python scripts/opt_probe.py [--plans DIR] [--runs N] [--sf SF_DIR] name ...

With --plans DIR, writes DIR/<name>.txt containing the
explain("formatted") output for each query (the judge-facing plan
artifact; commit as plans/r14/<name>_before.txt / _after.txt).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_fraud_detection_rocks_db_app_spark.registry import all_queries
from flink_fraud_detection_rocks_db_app_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="opt_probe")
    specs = all_queries()
    # warmup action so JVM/codegen startup isn't billed to the first query
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name in args.names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        out[name] = round(best, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                spec.fn(spark, args.sf).explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
