"""Golden tests for the order-sensitive stateful detectors (F3/F5/T3):
a 20-line Python fold over the fixture (FIXTURES.md §3) is the oracle."""

from __future__ import annotations

import duckdb

from flink_fraud_detection_rocks_db_app_spark.fixtures import transactions_with_id
from flink_fraud_detection_rocks_db_app_spark.streaming.stateful import (
    running_mean_alerts_batch,
    running_sum_alerts_batch,
)

from .conftest import SF_SMALL


def _events_sorted():
    con = duckdb.connect()
    return con.execute(
        f"SELECT user_id, epoch_ms(ts) AS t_ms, value, event_id "
        f"FROM '{SF_SMALL}/events.parquet' ORDER BY user_id, epoch_us(ts), event_id"
    ).fetchall()


def _golden_running_sum(threshold):
    alerts, state = [], {}
    for uid, t_ms, v, _eid in _events_sorted():
        s = state.get(uid, 0.0) + v
        if s > threshold:
            alerts.append((uid, t_ms, s))
            s = 0.0
        state[uid] = s
    return sorted(alerts)


def _golden_running_mean(threshold):
    alerts, state = [], {}
    for uid, t_ms, v, _eid in _events_sorted():
        s, c = state.get(uid, (0.0, 0))
        s, c = s + v, c + 1
        if s / c > threshold:
            alerts.append((uid, t_ms, s / c))
            s, c = 0.0, 0
        state[uid] = (s, c)
    return sorted(alerts)


def _close(a, b):
    return len(a) == len(b) and all(
        x[0] == y[0] and x[1] == y[1] and abs(x[2] - y[2]) < 1e-9 for x, y in zip(a, b)
    )


def test_running_sum_alerts_matches_golden(spark):
    got = sorted(
        tuple(r)
        for r in running_sum_alerts_batch(transactions_with_id(spark, SF_SMALL), 500.0).collect()
    )
    want = _golden_running_sum(500.0)
    assert len(want) > 0, "fixture should produce alerts at threshold 500"
    assert _close(got, want)


def test_running_sum_alerts_reference_threshold_empty(spark):
    got = running_sum_alerts_batch(transactions_with_id(spark, SF_SMALL), 10_000.0).collect()
    assert got == []


def test_running_mean_alerts_matches_golden(spark):
    got = sorted(
        tuple(r)
        for r in running_mean_alerts_batch(transactions_with_id(spark, SF_SMALL), 90.0).collect()
    )
    want = _golden_running_mean(90.0)
    assert len(want) > 0
    assert _close(got, want)


def test_count_or_time_segments_golden(spark):
    """T3: segments of max_count events per (key, window); the last
    (possibly short) segment fires at the timer instead (emit=final)."""
    from flink_fraud_detection_rocks_db_app_spark.operators.stateful import (
        count_or_time_segments,
    )

    size_ms, max_count = 86_400_000, 3
    got = {
        (r.w_start, r.account_id, r.seg): (round(r.sum_amount, 6), r.n_events, r.emit)
        for r in count_or_time_segments(
            transactions_with_id(spark, SF_SMALL), size_ms, max_count
        ).collect()
    }
    buckets: dict[tuple, list] = {}
    for uid, t_ms, v, _eid in _events_sorted():
        buckets.setdefault((t_ms - t_ms % size_ms, uid), []).append(v)
    want = {}
    for (w, uid), vals in buckets.items():
        for i in range(0, len(vals), max_count):
            chunk = vals[i : i + max_count]
            want[(w, uid, i // max_count)] = (
                round(sum(chunk), 6),
                len(chunk),
                "early" if len(chunk) == max_count else "final",
            )
    assert any(v[2] == "early" for v in want.values()), "fixture should trigger early fires"
    assert got == want


def test_fold_output_invariant_under_bucket_count(spark, monkeypatch):
    """N_FOLD_BUCKETS is the fold family's parallelism ceiling (at most
    that many concurrent tasks) and, since r13, a deployment knob
    (SPARK_GRAFT_FOLD_BUCKETS). The knob must be SEMANTICS-FREE:
    buckets only group accounts, every fold sorts by (account, t_us,
    event_id) and resets at key changes, so the emitted rows — values
    included, bit for bit — cannot depend on the bucket count. Pinned
    across a degenerate (4), the default (64) and a larger prime (257)
    count for the F5 fold, the EWMA fold and the capped-session fold."""
    import flink_fraud_detection_rocks_db_app_spark.streaming.stateful as ss
    from flink_fraud_detection_rocks_db_app_spark.operators.stateful import (
        ewma_amount_per_account,
        session_capped_user,
    )

    def snapshots():
        return (
            sorted(
                map(tuple, running_sum_alerts_batch(
                    transactions_with_id(spark, SF_SMALL), 500.0
                ).collect())
            ),
            sorted(map(tuple, ewma_amount_per_account(spark, SF_SMALL).collect())),
            sorted(map(tuple, session_capped_user(spark, SF_SMALL).collect())),
        )

    results = {}
    for n in (4, 64, 257):
        monkeypatch.setattr(ss, "N_FOLD_BUCKETS", n)
        results[n] = snapshots()
    assert results[4] == results[64] == results[257]
