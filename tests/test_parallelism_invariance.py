"""Parallelism-differential tests — the reference's parallelism axis.

The reference ships duplicate build variants that differ ONLY in
parallelism (master/pom-SingleParallelism.xml vs
pom-MultipleParallelism.xml) and re-runs its window/detector jobs under
both, because hand-rolled window state is where partition count changes
results if anything is order- or placement-sensitive. The Spark
equivalent of that axis is `spark.sql.shuffle.partitions`: every query
must produce the IDENTICAL result set at 1 shuffle partition (the
serial schedule) and at many (the parallel schedule). This catches the
classic scale bugs — per-partition folds that assume global order,
non-commutative merges, partition-local tiebreaks — before a 1000-
executor cluster does.

Representatives cover each risk class: keyed window agg (tumbling),
order-sensitive stateful fold (F5 running sum with reset), window-
function ranking with tiebreaks (as-of), multi-stage join pipeline
(MinHash LSH), and a two-level pane aggregate (sliding paned).
"""

from __future__ import annotations

import pytest

from flink_fraud_detection_rocks_db_app_spark.registry import all_queries

from .conftest import SF_SMALL

REPRESENTATIVES = (
    "tumble_sum_3s",
    "running_sum_alerts_gt_500",
    "asof_latest_order",
    "dedup_minhash_lsh",
    "slide_sum_50s_10s_paned",
)


def _rows(spark, name):
    df = all_queries()[name].fn(spark, SF_SMALL)
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        vals = []
        for v in r:
            # double summation order may legitimately differ between
            # schedules; compare at 12 SIGNIFICANT digits (%.12g —
            # relative, so large-magnitude sums get the same tolerance
            # as small ones; still far tighter than the driver's own
            # fp tolerance)
            vals.append(float(f"{v:.12g}") if isinstance(v, float) else v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        serial = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        parallel = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert serial == parallel, (
        f"{name}: result depends on partition count "
        f"({len(serial)} vs {len(parallel)} rows)"
    )
