"""End-to-end demo: the reference's fraud-detection jobs on this engine.

    python examples/fraud_pipeline_demo.py [sf_dir]

Runs, against the deterministic fixture stream:
  EP1  in-order tumbling-window sum + threshold alerts (streaming)
  EP2  out-of-order sliding-window mean (streaming, 5s watermark)
  F5   running-sum detector with reset-on-alert (stateful UDF)
  +    adaptive z-score anomaly stream (Welford state per account)
plus the reference-definition job metrics (latency = duration/numEvents,
throughput = numEvents/duration).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_fraud_detection_rocks_db_app_spark.session import get_spark  # noqa: E402
from flink_fraud_detection_rocks_db_app_spark.streaming import (  # noqa: E402
    IN_ORDER,
    OUT_OF_ORDER_5S,
    MetricsListener,
    alert_stream,
    choose_sliding_mode,
    read_replay_stream,
    run_to_memory,
    running_sum_alerts_stream,
    windowed_agg_stream,
    write_replay_chunks,
    zscore_alerts_stream,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="fraud-demo", cpus=8, shuffle_partitions=8)
    listener = MetricsListener()
    spark.streams.addListener(listener)
    scratch = tempfile.mkdtemp(prefix="fraud-demo-")
    try:
        chunks = write_replay_chunks(spark, sf_dir, scratch, n_chunks=6)

        print("== EP1: in-order 1h tumbling sum, alerts where sum > 300")
        agg = windowed_agg_stream(read_replay_stream(spark, chunks), 3_600_000, watermark=IN_ORDER)
        run_to_memory(alert_stream(agg, 300.0), "ep1_alerts")
        spark.table("ep1_alerts").orderBy("w_start", "account_id").show(5)

        print("== EP2: out-of-order (5s watermark) 50s/10s sliding mean (head)")
        jchunks = write_replay_chunks(
            spark, sf_dir, os.path.join(scratch, "ooo"), n_chunks=6, jitter_ms=4_000
        )
        slide = windowed_agg_stream(
            read_replay_stream(spark, jchunks),
            50_000,
            10_000,
            watermark=OUT_OF_ORDER_5S,
            aggs=[F.avg("amount").alias("mean_amount")],
        )
        run_to_memory(slide, "ep2_means")
        spark.table("ep2_means").orderBy("w_start", "account_id").show(5)
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        mode = choose_sliding_mode(
            50_000, 10_000, "auto", expected_events_per_batch=n_events // 6
        )
        print(f"   {spark.table('ep2_means').count()} sliding windows emitted; "
              f"auto plan policy at this density: {mode} "
              f"(paned wins only for multi-million-event micro-batches — SCALE.md)")

        print("== F5: running-sum detector (reset on alert, threshold 500)")
        run_to_memory(
            running_sum_alerts_stream(read_replay_stream(spark, chunks), 500.0), "f5"
        )
        spark.table("f5").orderBy("t_ms").show(5)
        print(f"   {spark.table('f5').count()} alerts")

        print("== adaptive z-score anomalies (3-sigma vs each account's history)")
        run_to_memory(
            zscore_alerts_stream(read_replay_stream(spark, chunks)), "zscore"
        )
        spark.table("zscore").orderBy("t_ms").show(5)
        print(f"   {spark.table('zscore').count()} anomalies")

        m = listener.metrics
        print(
            f"== job metrics (reference definitions): {m.num_events} events, "
            f"latency {m.latency_ms_per_event:.3f} ms/event, "
            f"throughput {m.throughput_events_per_sec:.0f} events/s"
        )
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
