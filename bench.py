"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully (noop sink — no driver-side collect, mirrors
a real distributed write) and is timed end-to-end including plan
compilation. The headline set spans every engine pillar: reference
windows (tumble/slide/pane/session), detectors (threshold, stateful
fold, count-trigger), relational (Q1, star join), and the
training-data extensions (dedup exact/ngram/minhash, simhash, ANN,
multimodal features).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tumble_sum_3s",
    "slide_mean_50s_10s",
    "slide_sum_50s_10s_paned",
    "global_slide_mean_5m_1m",
    "session_sum_user_6h",
    "union_max_by",
    "count_or_time_user_1d_3",
    "running_sum_alerts_gt_500",
    "tpch_q1_pricing_summary",
    "revenue_by_nation",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "doc_simhash",
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "multimodal_features",
    "asof_latest_order",
    "moving_avg_5_events",
    "resample_daily_gapfill",
    "cube_order_counts",
]


def _stream_bench(spark, sf_dir: str) -> float:
    """EP1 as a real micro-batched stream over the replayed fixture
    (watermark advancement + RocksDB window state), timed end to end;
    replay materialization is excluded (it's the generator, not the
    engine)."""
    import shutil
    import uuid

    from flink_fraud_detection_rocks_db_app_spark.streaming import (
        read_replay_stream,
        run_to_memory,
        windowed_agg_stream,
        write_replay_chunks,
    )

    scratch = os.path.join(".scratch", f"bench-stream-{uuid.uuid4().hex[:8]}")
    os.makedirs(scratch, exist_ok=True)
    try:
        chunks = write_replay_chunks(spark, sf_dir, scratch, n_chunks=6)
        t0 = time.perf_counter()
        agg = windowed_agg_stream(
            read_replay_stream(spark, chunks), 3_600_000, watermark="0 seconds"
        )
        run_to_memory(agg, f"bench_stream_{uuid.uuid4().hex[:8]}")
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from flink_fraud_detection_rocks_db_app_spark.registry import all_queries
    from flink_fraud_detection_rocks_db_app_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = all_queries()
    timings: dict[str, float] = {}
    # one warmup action so JVM/codegen startup isn't billed to the first query
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    timings["stream_tumble_sum_1h"] = round(_stream_bench(spark, sf_dir), 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
