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
