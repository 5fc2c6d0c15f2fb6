"""Lifecycle tests for ensure_ivf_index (VERDICT r6 #5 + ADVICE r6):
build-once reuse, stale-fingerprint pruning that spares in-flight
temps, and rename-failure semantics (race loser tolerated, real
failures surfaced at the cause)."""

from __future__ import annotations

import os
import shutil

import pytest

from flink_fraud_detection_rocks_db_app_spark.operators.similarity import (
    _ivf_index_path,
    ensure_ivf_index,
)

from .conftest import SF_SMALL


def _no_temps(parent: str) -> bool:
    return not any(".tmp-" in d for d in os.listdir(parent))


def test_build_once_then_reuse_without_rewrite(spark):
    parent, idx = _ivf_index_path(SF_SMALL)
    shutil.rmtree(idx, ignore_errors=True)
    assert ensure_ivf_index(spark, SF_SMALL) == idx
    assert os.path.isdir(idx) and _no_temps(parent)
    sig = {
        f: os.stat(os.path.join(root, f)).st_mtime_ns
        for root, _, files in os.walk(idx)
        for f in files
    }
    # second call must reuse: same path, not one file touched
    assert ensure_ivf_index(spark, SF_SMALL) == idx
    sig2 = {
        f: os.stat(os.path.join(root, f)).st_mtime_ns
        for root, _, files in os.walk(idx)
        for f in files
    }
    assert sig2 == sig, "second ensure_ivf_index call rewrote the index"


def test_prunes_stale_fingerprints_but_not_inflight_temps(spark):
    parent, idx = _ivf_index_path(SF_SMALL)
    key = os.path.basename(idx).split("-")[0]
    stale = os.path.join(parent, f"{key}-000000000000")
    inflight = os.path.join(parent, f"{key}-111111111111.tmp-deadbeef")
    os.makedirs(stale, exist_ok=True)
    os.makedirs(inflight, exist_ok=True)
    shutil.rmtree(idx, ignore_errors=True)
    try:
        assert ensure_ivf_index(spark, SF_SMALL) == idx
        # stale fingerprint for the same fixture: pruned
        assert not os.path.isdir(stale)
        # a CONCURRENT builder's half-written temp: untouched (ADVICE r6
        # medium — rmtree'ing it would fail the other writer's publish)
        assert os.path.isdir(inflight)
    finally:
        shutil.rmtree(inflight, ignore_errors=True)
        shutil.rmtree(stale, ignore_errors=True)


def test_rename_race_loser_returns_winner_index(spark, monkeypatch):
    parent, idx = _ivf_index_path(SF_SMALL)
    shutil.rmtree(idx, ignore_errors=True)
    real_rename = os.rename

    def winner_beat_us(src, dst):
        # the winner publishes between our write and our rename: the
        # destination exists, our rename raises — the loser must
        # discard its temp and return the (byte-equivalent) winner copy
        real_rename(src, dst)
        raise OSError("simulated publish race: destination exists")

    monkeypatch.setattr(os, "rename", winner_beat_us)
    assert ensure_ivf_index(spark, SF_SMALL) == idx
    assert os.path.isdir(idx) and _no_temps(parent)


def test_rename_real_failure_raises_at_cause(spark, monkeypatch):
    parent, idx = _ivf_index_path(SF_SMALL)
    shutil.rmtree(idx, ignore_errors=True)

    def broken_rename(src, dst):
        raise OSError("simulated cross-device link")

    monkeypatch.setattr(os, "rename", broken_rename)
    # destination absent after the failure: must raise HERE, not hand
    # back a path whose parquet read explodes downstream (ADVICE r6 low)
    with pytest.raises(OSError, match="cross-device"):
        ensure_ivf_index(spark, SF_SMALL)
    monkeypatch.undo()
    assert _no_temps(parent)
    # recovery: a clean call rebuilds normally
    assert ensure_ivf_index(spark, SF_SMALL) == idx
    assert os.path.isdir(idx)


def test_bm25_append_matches_full_build(spark, scratch):
    """Append-path contract: a base segment plus an appended batch must
    probe bit-identically to a monolithic full-corpus build — the
    exact-integer stats rows (one per segment) are what make the
    derived avgdl independent of segmentation."""
    from pyspark.sql import functions as F

    from flink_fraud_detection_rocks_db_app_spark.fixtures import load
    from flink_fraud_detection_rocks_db_app_spark.operators.text import (
        _probe_bm25_index,
        _write_bm25_segment,
        append_to_bm25_index,
    )

    full = os.path.join(scratch, "full")
    seg = os.path.join(scratch, "seg")
    docs = load(spark, SF_SMALL, "documents")
    _write_bm25_segment(docs, full, "overwrite")
    half = F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0
    _write_bm25_segment(docs.where(~half), seg, "overwrite")
    append_to_bm25_index(docs.where(half), seg)
    assert spark.read.parquet(os.path.join(seg, "stats")).count() == 2
    got = sorted(tuple(r) for r in _probe_bm25_index(spark, seg).collect())
    want = sorted(tuple(r) for r in _probe_bm25_index(spark, full).collect())
    assert got and got == want


def test_bm25_append_rejects_duplicate_doc_ids(spark, scratch):
    """ADVICE r7: a duplicate append would silently double-count
    postings tf/dl and inflate n_docs/sum_dl — the new-doc_ids contract
    is enforced at append time, failing loudly before a byte lands."""
    from flink_fraud_detection_rocks_db_app_spark.fixtures import load
    from flink_fraud_detection_rocks_db_app_spark.operators.text import (
        _write_bm25_segment,
        append_to_bm25_index,
    )

    idx = os.path.join(scratch, "dupidx")
    docs = load(spark, SF_SMALL, "documents")
    _write_bm25_segment(docs, idx, "overwrite")
    before = spark.read.parquet(os.path.join(idx, "postings")).count()
    with pytest.raises(ValueError, match="already in"):
        append_to_bm25_index(docs.limit(3), idx)
    # nothing was written by the rejected append
    assert spark.read.parquet(os.path.join(idx, "postings")).count() == before
    assert spark.read.parquet(os.path.join(idx, "stats")).count() == 1


def test_content_fingerprint_missing_source_raises():
    """ADVICE r7: a glob that matches nothing must not hash to a
    valid-looking (empty-string) content key — ensure_index would
    happily build and publish an empty index under it."""
    from flink_fraud_detection_rocks_db_app_spark.operators.indexcache import (
        content_fingerprint,
    )

    with pytest.raises(FileNotFoundError, match="no parquet source"):
        content_fingerprint(SF_SMALL, "no_such_table")


def test_ivf_append_matches_monolithic_assignment(spark, scratch):
    """Appending-IVF contract: base segment + appended batch must hold
    exactly the rows a monolithic full-corpus assignment produces —
    per-vector assignment against the FROZEN quantizer is segmentation-
    independent, so the union of segments IS the full index."""
    from pyspark.sql import functions as F

    from flink_fraud_detection_rocks_db_app_spark.operators.similarity import (
        _ivf_assigned,
        _ivf_centroids,
        _vectors,
        write_ivf_incremental_index,
    )

    idx = os.path.join(scratch, "ivfincr")
    write_ivf_incremental_index(spark, SF_SMALL, idx)
    e = _vectors(spark, SF_SMALL)
    want = sorted(
        (r.vec_id, r.cell)
        for r in _ivf_assigned(e, _ivf_centroids(e)).select("vec_id", "cell").collect()
    )
    got = sorted(
        (r.vec_id, r.cell)
        for r in spark.read.parquet(os.path.join(idx, "lists"))
        .select("vec_id", "cell")
        .collect()
    )
    assert got and got == want
    # the appended batch really is a separate ~1/8 slice, not empty
    n_batch = (
        spark.read.parquet(os.path.join(idx, "lists"))
        .where((F.pmod(F.xxhash64("vec_id"), F.lit(8)) == 0) & (F.col("vec_id") >= 8))
        .count()
    )
    assert n_batch > 0


def test_ivf_append_rejects_duplicate_vec_ids(spark, scratch):
    """Same fail-loudly contract as the BM25 append: a duplicate
    vec_id would put the same vector in an inverted list twice and
    corrupt downstream top-k ranks; the guard raises before writing."""
    from flink_fraud_detection_rocks_db_app_spark.operators.similarity import (
        _vectors,
        append_to_ivf_index,
        write_ivf_incremental_index,
    )

    idx = os.path.join(scratch, "ivfdup")
    write_ivf_incremental_index(spark, SF_SMALL, idx)
    lists = os.path.join(idx, "lists")
    before = spark.read.parquet(lists).count()
    with pytest.raises(ValueError, match="already in"):
        append_to_ivf_index(_vectors(spark, SF_SMALL).limit(3), idx)
    assert spark.read.parquet(lists).count() == before


def test_semdedup_append_rejects_duplicate_vec_ids(spark, scratch):
    """The SemDeDup append holds the same fail-loudly contract as the
    BM25/IVF appends: a duplicate vec_id would put the same vector in
    the scored frame twice (pairing it against itself and corrupting
    the keep verdict); the guard raises before writing either the
    losers or the scored segment."""
    from flink_fraud_detection_rocks_db_app_spark.operators.similarity import (
        _vectors,
        append_to_semdedup_index,
        write_semdedup_index,
    )

    idx = os.path.join(scratch, "semdedup_dup")
    write_semdedup_index(spark, SF_SMALL, idx)
    scored = os.path.join(idx, "scored")
    losers = os.path.join(idx, "losers")
    before = (
        spark.read.parquet(scored).count(),
        spark.read.parquet(losers).count(),
    )
    base_ids = spark.read.parquet(scored).select("vec_id").limit(3)
    dup = (
        _vectors(spark, SF_SMALL)
        .join(base_ids, "vec_id", "left_semi")
        .select("vec_id", "v")
    )
    with pytest.raises(ValueError, match="already in"):
        append_to_semdedup_index(dup, idx)
    assert (
        spark.read.parquet(scored).count(),
        spark.read.parquet(losers).count(),
    ) == before


def test_ivfpq_append_rejects_duplicate_vec_ids(spark, scratch):
    """Same fail-loudly contract as the other three appends: a
    duplicate vec_id would put the same compressed vector in an
    inverted list twice; the guard raises before writing."""
    from flink_fraud_detection_rocks_db_app_spark.operators.pq import (
        append_to_ivfpq_index,
        write_ivfpq_index,
    )
    from flink_fraud_detection_rocks_db_app_spark.operators.similarity import (
        _vectors,
    )

    idx = os.path.join(scratch, "ivfpq_dup")
    write_ivfpq_index(spark, SF_SMALL, idx)
    codes = os.path.join(idx, "codes")
    before = spark.read.parquet(codes).count()
    with pytest.raises(ValueError, match="already in"):
        append_to_ivfpq_index(_vectors(spark, SF_SMALL).limit(3), idx)
    assert spark.read.parquet(codes).count() == before


def test_version_keys_a_fresh_asset_and_prunes_the_stale_one(spark):
    """The tuning-constant version contract (ADVICE r13): the same
    source under a DIFFERENT version (int or constant-derived string)
    keys a different asset path — a constant change publishes fresh
    frames instead of silently serving stale ones — and publishing the
    new version prunes the old one for the same source."""
    import shutil

    from flink_fraud_detection_rocks_db_app_spark.operators.indexcache import (
        ensure_index,
        index_path,
    )

    kind = "verskeytest"
    parent, _ = index_path(kind, SF_SMALL, "documents")
    shutil.rmtree(parent, ignore_errors=True)

    def build(payload):
        def b(tmp):
            os.makedirs(tmp)
            open(os.path.join(tmp, "payload"), "w").write(payload)

        return b

    p1 = ensure_index(kind, SF_SMALL, "documents", build("v1"), version=1)
    p2 = ensure_index(
        kind, SF_SMALL, "documents", build("bands4"), version="bands4"
    )
    assert p1 != p2
    # same source+version resolves to the same path without rebuilding
    assert (
        ensure_index(kind, SF_SMALL, "documents", build("x"), version="bands4")
        == p2
    )
    assert open(os.path.join(p2, "payload")).read() == "bands4"
    # the stale same-source asset (old version) was pruned at publish
    assert not os.path.isdir(p1)
    shutil.rmtree(parent, ignore_errors=True)
