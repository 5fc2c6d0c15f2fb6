"""A/B: WA4 bounded-buffer state encoding — versioned JSON text blob
(the shipped default) vs pickle-protocol-5 binary — on the dense
replay (VERDICT r9 #6: "probe the WA4 JSON-state floor").

The state is cap-bounded (<= max_open windows x ~8 accounts per fold
bucket), so the encode/decode cost per micro-batch is a CONSTANT-size
serialization; the question is only whether that constant is visible
at high event density, where every micro-batch pays one decode+encode
per live bucket. Metric: the engine-side numEvents/duration rate from
StreamingQueryProgress (same harness as stream_density_probe), best
of N runs per arm, arms interleaved so JVM warmup cancels.

Usage: python scripts/ab_wa4_state.py [sf_dir] [densify] [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_fraud_detection_rocks_db_app_spark.session import get_spark, rocksdb_tuning
from flink_fraud_detection_rocks_db_app_spark.streaming import (
    read_replay_stream,
    record_buffer_bounded_tumbling_stream,
    run_to_memory,
    write_replay_chunks,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    densify = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="ab_wa4_state")
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
        f"ab-wa4-{uuid.uuid4().hex[:8]}",
    )
    results: dict[str, list] = {"json": [], "pickle": []}
    try:
        chunks = write_replay_chunks(
            spark,
            sf_dir,
            os.path.join(scratch, "replay"),
            n_chunks=6,
            densify=densify,
            distributed=densify > 10,
        )
        for i in range(runs):
            for codec in ("json", "pickle"):  # interleaved: warmup cancels
                agg = record_buffer_bounded_tumbling_stream(
                    read_replay_stream(spark, chunks),
                    3_600_000,
                    8,
                    1 << 60,
                    state_codec=codec,
                )
                stats = run_to_memory(agg, f"ab_wa4_{codec}_{i}_{uuid.uuid4().hex[:6]}")
                rate = round(stats["rows"] / stats["sec"], 1) if stats["sec"] else None
                rec = {"rows": stats["rows"], "sec": stats["sec"], "rows_per_sec": rate}
                results[codec].append(rec)
                # per-run JSON line so partial data survives a crash
                print(json.dumps({"run": i, "codec": codec, **rec}), flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    # a sec==0 run has no usable rate (rows_per_sec=None) — treat it as
    # failed for best/ratio so a full probe's results aren't lost to a
    # TypeError at the summary step (ADVICE r10)
    best = {
        c: max((r["rows_per_sec"] for r in rs if r["rows_per_sec"] is not None),
               default=None)
        for c, rs in results.items()
    }
    ratio = (
        round(best["pickle"] / best["json"], 3)
        if best["pickle"] is not None and best["json"] not in (None, 0)
        else None
    )
    print(json.dumps({
        "sf_dir": sf_dir, "densify": densify, "runs": runs,
        "results": results, "best_rows_per_sec": best,
        "pickle_over_json": ratio,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
