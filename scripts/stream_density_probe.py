"""Streaming density probe for the two state-heaviest stream families
(VERDICT r5 #4 / r6 #4): the stream-stream interval join (join state)
and session windows (merging state), under the replay densify knob at
×1 and ×10 — completing SCALE.md's streaming table next to the
tumbling and F5 rows.

Axes (see write_replay_chunks):
- session ×k densifies WITHIN the fixed key population: extra events
  land inside existing sessions, so session count is fixed and
  per-session merging state grows k-fold — the expensive axis for
  session windows.
- interval join ×k uses densify_fresh_keys: each copy gets fresh
  account_ids, so the key population grows k-fold with per-key state
  fixed — the natural "k-times-more-users" scale-up. (Fixed keys would
  grow join OUTPUT ~k² — that measures pair materialization, not
  state.)

Metric: the reference's own numEvents/duration processing rate from
StreamingQueryProgress (run_to_memory), best-of-2, same RocksDB +
changelog + 4-state-partition deployment knobs as bench.py.

Usage: python scripts/stream_density_probe.py [sf_dir] [scales...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_fraud_detection_rocks_db_app_spark.session import get_spark, rocksdb_tuning
from flink_fraud_detection_rocks_db_app_spark.streaming import (
    read_replay_stream,
    record_buffer_bounded_tumbling_stream,
    run_to_memory,
    session_agg_stream,
    write_replay_chunks,
)


def interval_join_job(spark, typed_chunks: str, how: str = "inner"):
    def side(etype, cols):
        return (
            read_replay_stream(spark, typed_chunks, with_event_type=True)
            .where(F.col("event_type") == etype)
            .select(*cols)
        )

    c = side(
        "click",
        [
            "account_id",
            F.col("event_time").alias("c_time"),
            F.col("event_id").alias("click_id"),
        ],
    ).withWatermark("c_time", "0 seconds")
    p = side(
        "purchase",
        [
            F.col("account_id").alias("p_user"),
            F.col("event_time").alias("p_time"),
            F.col("event_id").alias("purchase_id"),
        ],
    ).withWatermark("p_time", "0 seconds")
    return c.join(
        p,
        (F.col("account_id") == F.col("p_user"))
        & (F.col("p_time") > F.col("c_time"))
        & (F.col("p_time") <= F.col("c_time") + F.expr("INTERVAL 7 DAYS")),
        how,
    ).select("account_id", "click_id", "purchase_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = [int(s) for s in sys.argv[2:]] or [1, 10]
    spark = get_spark(app_name="stream_density_probe")
    for k, v in rocksdb_tuning().items():
        spark.conf.set(k, v)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"stream-density-{uuid.uuid4().hex[:8]}",
    )
    results: dict[str, dict] = {}
    try:
        for k in scales:
            # distributed past 10x: the driver-side writer tops out
            # around 24M events (VERDICT r8 #7); in-order replays are
            # boundary-independent so the sampled range split is fine
            plain = write_replay_chunks(
                spark, sf_dir, os.path.join(scratch, f"plain{k}"),
                n_chunks=6, densify=k, distributed=k > 10,
            )
            typed = write_replay_chunks(
                spark, sf_dir, os.path.join(scratch, f"typed{k}"),
                n_chunks=6, densify=k, with_event_type=True,
                densify_fresh_keys=True, distributed=k > 10,
            )
            jobs = {
                # r9: the WA4 bounded buffer under fixed-key densify —
                # its distinctive claim is state bounded by the cap
                # REGARDLESS of volume: x-fold more events fold into
                # the same <=cap open windows per account (flush gate
                # set past the replay so the probe measures pure
                # ingest+evict rate; the correctness face flushes)
                "stream_bounded_buffer_1h_cap8": lambda: (
                    record_buffer_bounded_tumbling_stream(
                        read_replay_stream(spark, plain),
                        3_600_000,
                        8,
                        1 << 60,
                    )
                ),
                "stream_session_sum_6h": lambda: session_agg_stream(
                    read_replay_stream(spark, plain),
                    6 * 3_600_000,
                    watermark="0 seconds",
                ),
                "stream_interval_join_7d": lambda: interval_join_job(spark, typed),
                # r8: the LEFT OUTER form — same fresh-key axis; its
                # extra work over the inner row is the unmatched-click
                # eviction (null emission). No sentinels here: the
                # probe measures processing rate over the replay, and
                # mid-stream watermark advance already drives eviction
                # for all but the final window's state (the correctness
                # face stream_interval_join_left_replay flushes fully).
                "stream_interval_join_left_7d": lambda: interval_join_job(
                    spark, typed, "left_outer"
                ),
            }
            for name, job in jobs.items():
                best = None
                for _ in range(2):
                    stats = run_to_memory(
                        job(), f"probe_{name}_{uuid.uuid4().hex[:8]}"
                    )
                    if best is None or stats["sec"] < best["sec"]:
                        best = stats
                rate = round(best["rows"] / best["sec"], 1) if best["sec"] else None
                results.setdefault(name, {})[f"x{k}"] = {
                    "rows": best["rows"],
                    "sec": best["sec"],
                    "rows_per_sec": rate,
                }
                print(f"x{k:<3d} {name:28s} {best['rows']:>9d} rows "
                      f"{best['sec']:7.2f}s  {rate} rows/s", flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "scales": scales, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
