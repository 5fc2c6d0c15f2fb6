"""Z-order layout evidence: real parquet footer statistics must show
bounded (user, time) rectangles per file — the property that makes
min/max skipping work on BOTH dimensions — and the slice query must
push its range predicates into the scan. The result itself is
layout-invariant and oracle-gated; these tests pin the LAYOUT claims
the docstring makes."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flink_fraud_detection_rocks_db_app_spark.fixtures import load
from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
    ensure_zorder_layout,
    events_zorder_slice,
    zorder_events,
)

from .conftest import SF_SMALL


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    """(min, max) of `col` per parquet part file, from footer stats."""
    out = []
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _overlap_fraction(ranges: list[tuple[int, int]], lo: int, hi: int) -> float:
    hits = [1 for a, b in ranges if not (b < lo or a > hi)]
    return len(hits) / len(ranges)


def _mid_band(vals: list[tuple[int, int]]) -> tuple[int, int]:
    lo = min(a for a, _ in vals)
    hi = max(b for _, b in vals)
    return lo + (hi - lo) * 4 // 10, lo + (hi - lo) * 6 // 10


def test_zorder_files_are_bounded_rectangles_both_dims(spark, scratch):
    """The z-clustered asset's files each cover a bounded rectangle: a
    central band predicate on EITHER dimension overlaps only a small
    fraction of files. A time-sorted control layout over the same rows
    shows the failure mode the z-order exists to fix: tight on time,
    but every file spans the whole user domain."""
    zpath = ensure_zorder_layout(spark, SF_SMALL)
    u_ranges = _file_ranges(zpath, "user_id")
    t_ranges = _file_ranges(zpath, "t_ms")
    assert len(u_ranges) >= 8, "expected one file per populated zbucket"

    u_lo, u_hi = _mid_band(u_ranges)
    t_lo, t_hi = _mid_band(t_ranges)
    zu = _overlap_fraction(u_ranges, u_lo, u_hi)
    zt = _overlap_fraction(t_ranges, t_lo, t_hi)
    # 4x4 grid: a 20%-wide band spans at most 2 of 4 grid columns
    assert zu <= 0.55, f"z-order user-dim overlap {zu}"
    assert zt <= 0.55, f"z-order time-dim overlap {zt}"

    # control: arrival-order (time-range) layout of the SAME rows
    linear = os.path.join(scratch, "events_linear")
    ev = zorder_events(load(spark, SF_SMALL, "events"))
    ev.repartitionByRange(len(u_ranges), "t_ms").write.parquet(linear)
    lin_u = _overlap_fraction(_file_ranges(linear, "user_id"), u_lo, u_hi)
    lin_t = _overlap_fraction(_file_ranges(linear, "t_ms"), t_lo, t_hi)
    assert lin_t <= 0.55, "time-sorted control should still skip on time"
    assert lin_u >= 0.9, "control files should span the full user domain"
    # the central band straddles the 4x4 grid midline, so exactly half
    # the grid columns (and buckets) overlap — a 2x file-skip win at
    # this coarse granularity, growing with bucket count at scale
    assert zu <= lin_u / 2, (zu, lin_u)


def test_zorder_slice_pushes_both_range_predicates(spark):
    plan = events_zorder_slice(spark, SF_SMALL)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    line = pushed[0]
    for col in ("user_id", "t_ms"):
        assert f"GreaterThanOrEqual({col}" in line and f"LessThanOrEqual({col}" in line, line


def test_zorder_key_is_monotone_in_grid_cells(spark):
    """Sanity on the Morton math: two rows in the same (user, time)
    grid cell share a zbucket, and z respects bit interleave — verified
    against a pure-Python recompute on a sample."""
    rows = (
        zorder_events(load(spark, SF_SMALL, "events"))
        .select("user_id", "t_ms", "z", "zbucket")
        .limit(200)
        .collect()
    )
    ev = load(spark, SF_SMALL, "events").withColumn(
        "t_ms", F.expr("CAST(ts div 1000000 AS BIGINT)")
    )
    agg = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("t_ms"), F.max("t_ms")
    ).collect()[0]
    u_min, u_max, t_min, t_max = agg

    def morton(u, t):
        un = (u - u_min) * 255 // max(1, u_max - u_min)
        tn = (t - t_min) * 255 // max(1, t_max - t_min)
        z = 0
        for i in range(8):
            z |= ((un >> i) & 1) << (2 * i)
            z |= ((tn >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        z = morton(r.user_id, r.t_ms)
        assert r.z == z, (r, z)
        assert r.zbucket == z >> 12


def test_zorder_append_recluster_lifecycle(spark):
    """The OPTIMIZE loop: appends land in their correct buckets under
    frozen bounds, accreting part-files; a duplicate delivery RAISES
    (the append_to_ivf_index fail-loudly contract); recluster rewrites
    each bucket to one z-sorted file with the row set invariant."""
    import shutil

    import pytest

    from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
        ZORDER_BATCH_MOD,
        append_to_zorder_layout,
        ensure_zorder_base,
        events_zorder_slice_incremental,
        recluster_zorder_layout,
        write_zorder_base,
    )

    # build a PRISTINE base (no batch) to drive the append path by hand
    fresh = ensure_zorder_base(spark, SF_SMALL) + ".lifecycle"
    if os.path.isdir(fresh):
        shutil.rmtree(fresh)
    write_zorder_base(spark, SF_SMALL, fresh, with_batch=False)

    data = os.path.join(fresh, "data")
    ev = load(spark, SF_SMALL, "events")
    batch = ev.where(
        F.pmod(F.col("event_id"), F.lit(ZORDER_BATCH_MOD)) == ZORDER_BATCH_MOD - 1
    )
    n_total = ev.count()
    base_files = len(glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True))

    append_to_zorder_layout(batch, fresh)
    with pytest.raises(ValueError, match="already in the table"):
        append_to_zorder_layout(batch, fresh)  # duplicate delivery
    after = spark.read.parquet(data)
    assert after.count() == n_total
    assert after.select("event_id").distinct().count() == n_total
    assert after.select(F.min("zbucket"), F.max("zbucket")).collect()[0][1] <= 15
    appended_files = len(
        glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True)
    )
    assert appended_files > base_files, "appends should accrete part-files"

    before_rows = sorted(
        map(tuple, spark.read.parquet(data).select("event_id", "z").collect())
    )
    removed = recluster_zorder_layout(spark, fresh)
    assert removed > 0
    after_rows = sorted(
        map(tuple, spark.read.parquet(data).select("event_id", "z").collect())
    )
    assert after_rows == before_rows
    n_buckets = spark.read.parquet(data).select("zbucket").distinct().count()
    final_files = len(
        glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True)
    )
    assert final_files == n_buckets, (final_files, n_buckets)
    shutil.rmtree(fresh)

    # the registered face (shared asset) stays consistent with the raw slice
    inc = {
        tuple(r)
        for r in events_zorder_slice_incremental(spark, SF_SMALL).collect()
    }
    assert inc, "slice should be non-empty at test sf"


def test_segmented_zorder_recluster_collapses_segments(spark, scratch):
    """The streamed table's recluster: per-batch segment dirs collapse
    to one z-sorted file per bucket via compact_parquet_table's merge
    hook (drop the seg bookkeeping column) — row set and slice results
    invariant, seg gone from the compacted table."""
    from flink_fraud_detection_rocks_db_app_spark.operators.indexcache import (
        compact_parquet_table,
    )
    from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
        ZORDER_BATCH_MOD,
        zorder_events,
        zorder_events_frozen,
    )

    ev = load(spark, SF_SMALL, "events")
    is_batch = (
        F.pmod(F.col("event_id"), F.lit(ZORDER_BATCH_MOD)) == ZORDER_BATCH_MOD - 1
    )
    data = os.path.join(scratch, "data")
    base = zorder_events(ev.where(~is_batch))
    base.repartition("zbucket").sortWithinPartitions("z").write.mode(
        "overwrite"
    ).partitionBy("zbucket").parquet(os.path.join(data, "seg=0"))
    bounds = base.agg(
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
        F.min("t_ms").alias("t_min"),
        F.max("t_ms").alias("t_max"),
    )
    zorder_events_frozen(ev.where(is_batch), bounds).repartition(
        "zbucket"
    ).write.mode("overwrite").partitionBy("zbucket").parquet(
        os.path.join(data, "seg=1")
    )

    before = sorted(
        map(tuple, spark.read.parquet(data).select("event_id", "z").collect())
    )
    removed = compact_parquet_table(
        spark,
        data,
        partition_col="zbucket",
        merge=lambda df: df.drop("seg"),
        sort_col="z",
    )
    assert removed > 0
    compacted = spark.read.parquet(data)
    assert "seg" not in compacted.columns
    after = sorted(map(tuple, compacted.select("event_id", "z").collect()))
    assert after == before
    n_buckets = compacted.select("zbucket").distinct().count()
    files = len(glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True))
    assert files == n_buckets, (files, n_buckets)


def test_zorder_stream_sink_restart_and_redelivery(spark, scratch):
    """The streamed z-table's exactly-once story: (a) re-delivering a
    batch id overwrites its own segment (one copy survives); (b) a
    stop/restart streaming run over the same checkpoint lands every
    event exactly once, bounds frozen by the first batch."""
    import shutil

    from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
        ZORDER_BATCH_MOD,
        zorder_stream_sink,
    )

    ev = load(spark, SF_SMALL, "events")
    is_batch = (
        F.pmod(F.col("event_id"), F.lit(ZORDER_BATCH_MOD)) == ZORDER_BATCH_MOD - 1
    )

    # (a) direct double delivery of one batch id
    asset_a = os.path.join(scratch, "asset_a")
    sink_a = zorder_stream_sink(asset_a)
    sink_a(ev.where(~is_batch), 0)
    n_batch = ev.where(is_batch).count()
    sink_a(ev.where(is_batch), 1)
    sink_a(ev.where(is_batch), 1)  # re-delivery after a simulated crash
    landed = spark.read.parquet(os.path.join(asset_a, "data"))
    assert landed.count() == ev.count()
    assert landed.where(F.col("seg") == 1).count() == n_batch

    # (b) streaming stop/restart over one checkpoint
    src = os.path.join(scratch, "arrivals")
    os.makedirs(src)
    staged = os.path.join(scratch, "staged")
    chunk = F.when(~is_batch, F.lit(0)).otherwise(
        F.pmod(F.xxhash64("event_id"), F.lit(2)) + 1
    )
    for i in range(3):
        ev.where(chunk == i).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(staged, str(i))
        )
    asset_b = os.path.join(scratch, "asset_b")
    ckpt = os.path.join(scratch, "ckpt")
    sink_b = zorder_stream_sink(asset_b)

    def run_once():
        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink_b)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def stage(i):
        for f in glob.glob(os.path.join(staged, str(i), "*.parquet")):
            shutil.copy2(f, os.path.join(src, f"c{i}.parquet"))

    stage(0)
    run_once()  # bounds frozen from the base chunk
    stage(1)
    stage(2)
    run_once()  # restart: must process ONLY the new chunks

    got = spark.read.parquet(os.path.join(asset_b, "data"))
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
    # placement identical to the batch-API lifecycle: frozen bounds
    # come from the same base split, so z keys agree row for row
    base_like = spark.read.parquet(os.path.join(asset_a, "data"))
    za = sorted(map(tuple, base_like.select("event_id", "z", "zbucket").collect()))
    zb = sorted(map(tuple, got.select("event_id", "z", "zbucket").collect()))
    assert za == zb


def test_zorder_balance_monitor_accounts_for_every_row(spark):
    """Occupancy sums to the full corpus (base+batch asset), the spine
    is dense, and the hot/empty gates are the documented integer
    comparisons."""
    from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
        ZBUCKET_BITS,
        ZORDER_HOT_FACTOR,
        zorder_balance_monitor,
    )

    rows = zorder_balance_monitor(spark, SF_SMALL).collect()
    n_buckets = 1 << ZBUCKET_BITS
    assert len(rows) == n_buckets
    assert sorted(r.zbucket for r in rows) == list(range(n_buckets))
    total = sum(r.n_rows for r in rows)
    assert total == load(spark, SF_SMALL, "events").count()
    for r in rows:
        assert r.hot == (r.n_rows * n_buckets > ZORDER_HOT_FACTOR * total)
        assert r.empty == (r.n_rows == 0)
        assert abs(r.load_ratio - r.n_rows * n_buckets / total) < 1e-6


def test_zorder_files_are_z_sorted_within_each_bucket(spark):
    """ADVICE r11 #1 made structural: the partitioned write sorts by
    (zbucket, z), which satisfies the writer's required ordering — so
    each written part-file's physical row order is non-decreasing in z
    by guarantee, not by sort-stability luck. Read every part-file of
    the published layout independently and assert monotone z."""
    import pyarrow.parquet as pq

    from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
        ensure_zorder_layout,
    )

    path = ensure_zorder_layout(spark, SF_SMALL)
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    assert files
    checked = 0
    for f in files:
        zs = pq.read_table(f, columns=["z"]).column("z").to_pylist()
        if len(zs) > 1:
            assert all(a <= b for a, b in zip(zs, zs[1:])), f
            checked += 1
    assert checked > 0, "expected at least one multi-row part-file"


def test_zorder_bounds_refresh_invariance_and_rebalance(spark, scratch):
    """The r11/r12 verdicts' owed arm, end to end on a scratch asset:
    (1) a skew-appended table under stale quadrant bounds trips the
    hot trigger; (2) refresh_zorder_layout re-derives and re-places —
    the slice aggregate is IDENTICAL before and after (oracle
    unchanged: values never move, only placement), no row is lost,
    duplicated or altered; (3) balance is restored (no bucket over the
    trigger) and every file's footer rectangle tightens back to a
    bounded fraction of the domain."""
    from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
        ZBUCKET_BITS,
        refresh_zorder_layout,
        zorder_events_frozen,
        zorder_hot_buckets,
    )

    asset = os.path.join(scratch, "zorder_refresh")
    ev = load(spark, SF_SMALL, "events").withColumn(
        "t_ms", F.expr("CAST(ts div 1000000 AS BIGINT)")
    )
    dom = ev.agg(
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
        F.min("t_ms").alias("t_min"),
        F.max("t_ms").alias("t_max"),
    ).collect()[0]
    stale = ev.where(
        (F.col("user_id") <= dom.u_min + (dom.u_max - dom.u_min) * 5 // 10)
        & (F.col("t_ms") <= dom.t_min + (dom.t_max - dom.t_min) * 5 // 10)
    )
    stale.agg(
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
        F.min("t_ms").alias("t_min"),
        F.max("t_ms").alias("t_max"),
    ).write.parquet(os.path.join(asset, "bounds"))
    zorder_events_frozen(
        ev.drop("t_ms"), spark.read.parquet(os.path.join(asset, "bounds"))
    ).repartition("zbucket").sortWithinPartitions("zbucket", "z").write.partitionBy(
        "zbucket"
    ).parquet(os.path.join(asset, "data"))

    def snapshot(path):
        df = spark.read.parquet(path)
        slice_rows = {
            (r.event_type, r.n_events, r.sum_value)
            for r in df.where(
                F.col("user_id").between(
                    dom.u_min + (dom.u_max - dom.u_min) * 4 // 10,
                    dom.u_min + (dom.u_max - dom.u_min) * 6 // 10,
                )
                & F.col("t_ms").between(
                    dom.t_min + (dom.t_max - dom.t_min) * 4 // 10,
                    dom.t_min + (dom.t_max - dom.t_min) * 6 // 10,
                )
            )
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .collect()
        }
        ids = df.agg(
            F.count("*").alias("n"),
            F.countDistinct("event_id").alias("nd"),
            F.sum(F.hash("event_id", "user_id", "event_type")).alias("content"),
        ).collect()[0]
        return slice_rows, ids

    data = os.path.join(asset, "data")
    hot_before = zorder_hot_buckets(spark.read.parquet(data))
    assert hot_before, "stale quadrant bounds must trip the hot trigger"
    slice_before, ids_before = snapshot(data)

    retired = refresh_zorder_layout(spark, asset)
    assert retired == len(hot_before)

    slice_after, ids_after = snapshot(data)
    assert slice_after == slice_before
    assert ids_after == ids_before
    assert zorder_hot_buckets(spark.read.parquet(data)) == []

    # footer rectangles re-tighten: under stale bounds the clamp-pile
    # corner file spanned ~half the domain on both dims; after refresh
    # every file's user rectangle covers a bounded fraction again
    spans = _file_ranges(data, "user_id")
    u_span = dom.u_max - dom.u_min
    assert max(hi - lo for lo, hi in spans) <= u_span * 0.45

    # refreshed bounds really were re-derived from the full table
    nb = spark.read.parquet(os.path.join(asset, "bounds")).collect()[0]
    assert (nb.u_min, nb.u_max) == (dom.u_min, dom.u_max)
    assert (nb.t_min, nb.t_max) == (dom.t_min, dom.t_max)


def test_zorder_refreshed_asset_records_the_before_picture(spark):
    """The registered face's asset carries its own evidence: the
    recorded stale occupancy shows a bucket over the hot trigger, and
    the published (refreshed) data shows none, with identical totals."""
    from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
        ZBUCKET_BITS,
        ZORDER_HOT_FACTOR,
        ensure_zorder_refreshed,
        zorder_hot_buckets,
    )

    asset = ensure_zorder_refreshed(spark, SF_SMALL)
    n_buckets = 1 << ZBUCKET_BITS
    occ = spark.read.parquet(os.path.join(asset, "stale_occupancy")).collect()
    total = sum(r.n_rows for r in occ)
    assert total == load(spark, SF_SMALL, "events").count()
    assert any(r.n_rows * n_buckets > ZORDER_HOT_FACTOR * total for r in occ)
    refreshed = spark.read.parquet(os.path.join(asset, "data"))
    assert zorder_hot_buckets(refreshed) == []
    assert refreshed.count() == total


def test_swap_dir_crash_window_is_self_healing(spark, scratch):
    """_swap_dir displaces the live directory under a DETERMINISTIC
    `.old` name, so a crash inside the two-rename window (live absent,
    .old present) is healed by _recover_swap on the next touch instead
    of stranding the table in a random hex dir (ADVICE r13)."""
    import shutil

    from flink_fraud_detection_rocks_db_app_spark.operators.layout import (
        _recover_swap,
        _swap_dir,
    )

    live = os.path.join(scratch, "swap", "data")
    tmp = os.path.join(scratch, "swap", "data.tmp-x")
    os.makedirs(live)
    os.makedirs(tmp)
    open(os.path.join(live, "old.marker"), "w").write("old")
    open(os.path.join(tmp, "new.marker"), "w").write("new")

    # normal path: tmp becomes live, displaced copy cleaned away
    _swap_dir(live, tmp)
    assert os.path.exists(os.path.join(live, "new.marker"))
    assert not os.path.isdir(f"{live}.old")

    # simulate a crash mid-window: live renamed away, replacement never
    # renamed in
    os.rename(live, f"{live}.old")
    assert not os.path.isdir(live)
    _recover_swap(live)
    assert os.path.exists(os.path.join(live, "new.marker"))
    assert not os.path.isdir(f"{live}.old")
    # idempotent when nothing is wrong
    _recover_swap(live)
    assert os.path.exists(os.path.join(live, "new.marker"))
    shutil.rmtree(os.path.join(scratch, "swap"), ignore_errors=True)
