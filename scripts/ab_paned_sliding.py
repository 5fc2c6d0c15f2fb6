"""Crossover measurement: naive Expand-sliding vs paned sliding stream.

VERDICT r3: paned_sliding_stream (pane tumbling -> chained sliding over
pane rows) was ~10% SLOWER than the naive sliding agg at sf0.1 replay —
plausible at-scale argument (state writes ∝ |panes|, not |rows|×overlap)
but no measured crossover. This measures both at 1× and ~10× event
density over the SAME window population (replay densify knob), one warm
session, min-of-2, bench-identical streaming config.

Usage: python scripts/ab_paned_sliding.py [sf_dir] [densities...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_fraud_detection_rocks_db_app_spark.session import get_spark, rocksdb_tuning  # noqa: E402
from flink_fraud_detection_rocks_db_app_spark.streaming import (  # noqa: E402
    paned_sliding_stream,
    read_replay_stream,
    run_to_memory,
    windowed_agg_stream,
    write_replay_chunks,
)

SIZE_MS, SLIDE_MS = 50_000, 10_000


def time_job(spark, chunks, job) -> float:
    t0 = time.perf_counter()
    out = job(read_replay_stream(spark, chunks))
    run_to_memory(out, f"ab_paned_{uuid.uuid4().hex[:8]}")
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    densities = [int(d) for d in sys.argv[2:]] or [1, 10]
    spark = get_spark(app_name="ab_paned")
    for k, v in rocksdb_tuning().items():
        spark.conf.set(k, v)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    jobs = {
        "naive": lambda s: windowed_agg_stream(s, SIZE_MS, SLIDE_MS, watermark="0 seconds"),
        "paned": lambda s: paned_sliding_stream(s, SIZE_MS, SLIDE_MS, watermark="0 seconds"),
    }
    for density in densities:
        scratch = os.path.join(".scratch", f"ab-paned-{uuid.uuid4().hex[:8]}")
        os.makedirs(scratch, exist_ok=True)
        try:
            # distributed: densities past ~40x overflow the driver-side
            # writer (24M events was the practical ceiling, VERDICT r8
            # #7); the executor-side writer lifts it — in-order replay,
            # so chunk-boundary differences don't affect results
            chunks = write_replay_chunks(
                spark, sf_dir, scratch, n_chunks=6, densify=density,
                distributed=density > 10,
            )
            times = {name: [] for name in jobs}
            for _ in range(2):
                for name, job in jobs.items():
                    times[name].append(time_job(spark, chunks, job))
            print(
                f"density={density}: "
                + " | ".join(
                    f"{n} min={min(ts):.2f}s runs={[round(t, 2) for t in ts]}"
                    for n, ts in times.items()
                )
            )
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
