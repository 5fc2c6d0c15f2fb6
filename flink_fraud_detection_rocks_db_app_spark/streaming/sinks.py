"""foreachBatch sinks — the production exactly-once write pattern.

Structured Streaming's file sinks are exactly-once via their own
transaction log, but real deployments usually land micro-batches in an
external store through `foreachBatch`. There, exactly-once = the
engine's at-least-once batch re-delivery + an IDEMPOTENT write keyed
by `batchId`: after a crash between sink write and checkpoint commit,
the restarted query re-runs the same batch with the SAME batchId, and
an idempotent writer makes the second delivery a no-op/overwrite.

This mirrors the reference's AlertSink + RocksDB checkpoint contract
(reference: workspace/frauddetection/src/main/java/spendreport/
AlertSink usage with enableCheckpointing) — the sink must tolerate
replay from the last completed checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def foreach_batch_idempotent_parquet(out_dir: str):
    """foreachBatch writer: each micro-batch lands in its own
    ``batch_id=N`` partition directory with mode=overwrite, so a
    re-delivered batch REPLACES its previous (possibly partial) output
    instead of appending duplicates."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write


def read_idempotent_sink(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of all landed batches; `batch_id` is exposed as a
    partition column for audit."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*")
    )
