"""Stream-section plan sweep under spark.sql.join.preferSortMergeJoin
(VERDICT r14 #3): the r14 sweep that kept the flag covered BATCH plans
only; this probe closes the hole for the streaming paths.

For each of bench.py's seven stream jobs (verbatim job builders), the
job runs to completion under preferSortMergeJoin=false (the session
default) and =true, and the EXECUTED micro-batch physical plan
(StreamingQuery.explain after processAllAvailable) is captured to
<out>/<name>_{false,true}.txt. The flag is a planner conf read at
micro-batch planning time, so flipping it between runs inside one
session is the controlled A/B. A final summary line reports, per job,
whether the two plans differ outside checkpoint-path/run-id noise and
the min-of-N wall times under each setting.

Usage: python scripts/stream_plan_sweep.py [--out DIR] [--runs N] [sf_dir]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import shutil
import sys
import time
import uuid
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_fraud_detection_rocks_db_app_spark.session import (
    get_spark,
    rocksdb_tuning,
)
from flink_fraud_detection_rocks_db_app_spark.streaming import (
    read_replay_stream,
    record_buffer_tumbling_stream,
    running_sum_alerts_stream,
    session_agg_stream,
    sliding_sum_stream,
    windowed_agg_stream,
    write_replay_chunks,
)

# strip per-run noise so the diff is about operators, not identifiers:
# plan ids, checkpoint temp dirs, memory-sink names, state store ids
_NOISE = [
    (re.compile(r"plan_id=\d+"), "plan_id=#"),
    (re.compile(r"#\d+"), "#"),
    (re.compile(r"temporary-[0-9a-f-]+"), "temporary-#"),
    (re.compile(r"state info \[ checkpoint = [^]]+\]"), "state info [#]"),
    (re.compile(r"sweep_[0-9a-f_]+"), "sweep_#"),
    (re.compile(r"runId = [0-9a-f-]+"), "runId = #"),
    (re.compile(r"batchId = \d+"), "batchId = #"),
]


def _canon(plan: str) -> str:
    for rx, rep in _NOISE:
        plan = rx.sub(rep, plan)
    return plan


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r15/stream_sweep")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "sf_dir",
        nargs="?",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    spark = get_spark(app_name="stream_plan_sweep")

    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"plansweep-{uuid.uuid4().hex[:8]}",
    )
    os.makedirs(scratch, exist_ok=True)
    os.makedirs(args.out, exist_ok=True)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict[str, dict] = {}
    try:
        chunks = write_replay_chunks(spark, args.sf_dir, scratch, n_chunks=6)
        for k, v in rocksdb_tuning().items():
            spark.conf.set(k, v)
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        typed_chunks = write_replay_chunks(
            spark,
            args.sf_dir,
            os.path.join(scratch, "typed"),
            n_chunks=3,
            with_event_type=True,
        )

        def _ivj_side(etype, cols):
            return (
                read_replay_stream(spark, typed_chunks, with_event_type=True)
                .where(F.col("event_type") == etype)
                .select(*cols)
            )

        def _interval_join(_unused):
            c = _ivj_side(
                "click",
                [
                    "account_id",
                    F.col("event_time").alias("c_time"),
                    F.col("event_id").alias("click_id"),
                ],
            ).withWatermark("c_time", "0 seconds")
            p = _ivj_side(
                "purchase",
                [
                    F.col("account_id").alias("p_user"),
                    F.col("event_time").alias("p_time"),
                    F.col("event_id").alias("purchase_id"),
                    F.col("amount").alias("purchase_value"),
                ],
            ).withWatermark("p_time", "0 seconds")
            return c.join(
                p,
                (F.col("account_id") == F.col("p_user"))
                & (F.col("p_time") > F.col("c_time"))
                & (
                    F.col("p_time")
                    <= F.col("c_time") + F.expr("INTERVAL 7 DAYS")
                ),
            ).select(
                "account_id", "click_id", "purchase_id", "purchase_value"
            )

        jobs = {
            "stream_tumble_sum_1h": lambda s: windowed_agg_stream(
                s, 3_600_000, watermark="0 seconds"
            ),
            "stream_slide_sum_50s_10s": lambda s: sliding_sum_stream(
                s, 50_000, 10_000, watermark="0 seconds", mode="auto"
            ),
            "stream_running_sum_alerts": lambda s: running_sum_alerts_stream(
                s, 500.0
            ),
            "stream_session_sum_6h": lambda s: session_agg_stream(
                s, 6 * 3_600_000, watermark="0 seconds"
            ),
            "stream_tumble_median_1h": lambda s: windowed_agg_stream(
                s,
                3_600_000,
                watermark="0 seconds",
                aggs=[F.expr("percentile(amount, 0.5)").alias("median_amount")],
            ),
            "stream_recordbuffer_tumble_1h": lambda s: record_buffer_tumbling_stream(
                s, 3_600_000
            ),
            "stream_interval_join_7d": _interval_join,
        }

        for name, job in jobs.items():
            results[name] = {}
            for flag in ("false", "true"):
                spark.conf.set("spark.sql.join.preferSortMergeJoin", flag)
                best, plan_txt = None, None
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    out = job(read_replay_stream(spark, chunks))
                    q = (
                        out.writeStream.outputMode("append")
                        .format("memory")
                        .queryName(f"sweep_{uuid.uuid4().hex[:8]}")
                        .start()
                    )
                    try:
                        q.processAllAvailable()
                        buf = io.StringIO()
                        with redirect_stdout(buf):
                            q.explain(extended=False)
                        plan_txt = buf.getvalue()
                    finally:
                        q.stop()
                        q.awaitTermination()
                    elapsed = time.perf_counter() - t0
                    best = elapsed if best is None else min(best, elapsed)
                with open(
                    os.path.join(args.out, f"{name}_{flag}.txt"), "w"
                ) as fh:
                    fh.write(plan_txt or "")
                results[name][flag] = {
                    "sec": round(best, 3),
                    "plan": _canon(plan_txt or ""),
                }
            a = results[name]["false"].pop("plan")
            b = results[name]["true"].pop("plan")
            results[name]["plan_identical"] = a == b
            print(
                json.dumps(
                    {
                        "job": name,
                        "plan_identical": results[name]["plan_identical"],
                        "sec_false": results[name]["false"]["sec"],
                        "sec_true": results[name]["true"]["sec"],
                    }
                ),
                flush=True,
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"summary": {
        n: r["plan_identical"] for n, r in results.items()
    }}))
    spark.stop()


if __name__ == "__main__":
    main()
