"""Compaction of append-accreted index assets (the small-files half of
the appending-corpus contract).

Per-micro-batch appends keep INGESTION cost ∝ batch, but every append
adds part-files, so PROBE-time listing/footer/task cost grows with
batches-ever-ingested. `indexcache.compact_parquet_table` rewrites a
table to one file per partition (with an optional associative
pre-merge) behind the crash-safe whole-directory swap
`pipeline.compact_prep_ledger` established. These tests pin the two
contracts that make compaction safe to run any time:

- probe results are IDENTICAL before and after (scores, ranks,
  neighbors — compact-then-probe == probe);
- compaction is idempotent (second run is a no-op returning 0).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_fraud_detection_rocks_db_app_spark.fixtures import load
from flink_fraud_detection_rocks_db_app_spark.operators.indexcache import (
    _parquet_part_files,
)

from .conftest import SF_SMALL


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_bm25_compaction_preserves_probe(spark, scratch):
    from flink_fraud_detection_rocks_db_app_spark.operators.text import (
        _probe_bm25_index,
        _write_bm25_segment,
        append_to_bm25_index,
        compact_bm25_index,
    )

    idx = os.path.join(scratch, "bm25")
    docs = load(spark, SF_SMALL, "documents")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(4))
    _write_bm25_segment(docs.where(part == 0), idx, "overwrite")
    for i in (1, 2, 3):  # three appends -> stats rows and postings files accrete
        append_to_bm25_index(docs.where(part == i), idx)

    stats_dir = os.path.join(idx, "stats")
    assert spark.read.parquet(stats_dir).count() == 4  # one row per segment
    before = _sorted_rows(_probe_bm25_index(spark, idx))
    assert before

    removed = compact_bm25_index(spark, idx)
    assert removed > 0
    # stats pre-merged to ONE exact-total row; probe unchanged
    assert spark.read.parquet(stats_dir).count() == 1
    assert _sorted_rows(_probe_bm25_index(spark, idx)) == before

    # idempotent: already compact -> no-op
    assert compact_bm25_index(spark, idx) == 0
    assert _sorted_rows(_probe_bm25_index(spark, idx)) == before


def test_ivf_compaction_preserves_probe(spark, scratch):
    from flink_fraud_detection_rocks_db_app_spark.operators.similarity import (
        _ivf_probes,
        _ivf_rerank,
        _vectors,
        compact_ivf_lists,
        write_ivf_incremental_index,
    )

    idx = os.path.join(scratch, "ivf")
    # base (~7/8) + one appended batch (~1/8) — lists already carry two
    # segments' worth of part-files per touched cell
    write_ivf_incremental_index(spark, SF_SMALL, idx)

    def probe():
        e = _vectors(spark, SF_SMALL)
        cents = spark.read.parquet(os.path.join(idx, "centroids"))
        probes = _ivf_probes(e, cents)
        cells = sorted(
            {r["cell"] for r in probes.select("cell").distinct().collect()}
        )
        inv = spark.read.parquet(os.path.join(idx, "lists")).where(
            F.col("cell").isin(cells)
        )
        return _sorted_rows(_ivf_rerank(inv, probes))

    before = probe()
    assert before
    files_before = len(_parquet_part_files(os.path.join(idx, "lists")))

    removed = compact_ivf_lists(spark, idx)
    assert removed > 0
    assert len(_parquet_part_files(os.path.join(idx, "lists"))) < files_before
    assert probe() == before

    assert compact_ivf_lists(spark, idx) == 0
    assert probe() == before


def test_bm25_ingest_restart_compact_resume(spark, scratch):
    """The operational composition: ingest part of the corpus through
    the streaming foreachBatch appender, STOP, compact the index, then
    RESUME the same checkpoint with new arrivals. Compaction between
    ingestion sessions must (a) not trip the duplicate-append guard —
    the compacted postings still carry every ingested doc_id — and
    (b) leave the final probe hash-equal to a monolithic full-corpus
    build. This is why compaction needs no quiescent index: appends
    and compaction commute through the associative stats merge."""
    import time

    from flink_fraud_detection_rocks_db_app_spark.operators.text import (
        _probe_bm25_index,
        _write_bm25_segment,
        append_to_bm25_index,
        compact_bm25_index,
    )

    docs = load(spark, SF_SMALL, "documents")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    src = os.path.join(scratch, "arrivals")
    idx = os.path.join(scratch, "idx")
    ckpt = os.path.join(scratch, "ckpt")

    def arrive(i: int, mtime: float) -> None:
        docs.where(part == i).coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):  # ascending mtimes: FileStreamSource order
            p = os.path.join(src, f)
            if f.endswith(".parquet") and os.path.getmtime(p) > mtime:
                os.utime(p, (mtime, mtime))

    def sink(batch, _bid):
        if batch.isEmpty():
            return
        if os.path.isdir(os.path.join(idx, "postings")):
            append_to_bm25_index(batch, idx)
        else:
            _write_bm25_segment(batch, idx, "overwrite")

    def run_stream():
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    base = time.time()
    arrive(0, base)
    arrive(1, base + 1)
    run_stream()  # two micro-batches ingested
    assert spark.read.parquet(os.path.join(idx, "stats")).count() == 2

    assert compact_bm25_index(spark, idx) > 0  # between sessions
    assert spark.read.parquet(os.path.join(idx, "stats")).count() == 1

    arrive(2, base + 2)
    run_stream()  # resume the SAME checkpoint; only the new file runs
    # one compacted row + one appended segment row
    assert spark.read.parquet(os.path.join(idx, "stats")).count() == 2

    mono = os.path.join(scratch, "mono")
    _write_bm25_segment(docs, mono, "overwrite")
    assert _sorted_rows(_probe_bm25_index(spark, idx)) == _sorted_rows(
        _probe_bm25_index(spark, mono)
    )
