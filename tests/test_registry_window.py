"""Meta-tests pinning the driver-window rotation policy.

The driver grades only the first 50 registered queries (DRIVER_WINDOW);
everything else gets suite-only evidence via tests/test_oracle_parity.
The rotation policy (registry.py comments) promises that every operator
FAMILY keeps at least one driver-gated representative — these tests
make that promise executable, so a future edit can't silently drop a
family out of both the window and the gate.

Families are the registry `tags`. Tags that are deliberately
suite-only carry an explicit allowlist entry WITH rationale; adding a
tag to the allowlist is a reviewed decision, not an accident.
"""

from __future__ import annotations

from flink_fraud_detection_rocks_db_app_spark.registry import (
    DRIVER_WINDOW,
    all_queries,
)

# Tags whose queries all sit past the driver window ON PURPOSE.
# Each entry must say WHY suite evidence suffices for the family.
SUITE_ONLY_TAGS: dict[str, str] = {
    "approx": "sketch twins (HLL/GK/approx_top_k/approx-heavy-hitters) are "
    "envelope-gated against their exact driver-gated twins in tests",
    "cube": "OLAP reshaping variant; the pivot row drives the same "
    "multi-grouping machinery in the window",
    "grouping_sets": "same rationale as cube",
    "rollup": "same rationale as cube",
    "distinct": "exact windowed distinct is the oracle twin of the "
    "driver-gated median/heavy-hitter window rows; HLL twin is approx",
    "filter": "P7 pushdown filters run inside every detector driver row's "
    "plan and are plan-tested (established r4b rotation rationale)",
    "projection": "P1/P2 projections run inside every driver row's plan "
    "(established r4 rotation rationale)",
    "histogram": "describe/summary aggregate over the same groupBy "
    "machinery as the driver-gated stats rows",
    "stats": "same rationale as histogram",
    "interval": "stream_interval_join_replay + interval_join_click_purchase "
    "share keyed-range-join machinery with the driver-gated asof row "
    "(established r4 rotation rationale)",
    "range": "same keyed-range-join machinery as asof_latest_order",
    "langid": "rides the same tokenized corpus scan as the driver-gated "
    "text rows (established r4 rotation rationale)",
    "tokens": "token counts are recomputed inside the driver-gated "
    "quality/gopher/tfidf rows (established r4b rotation rationale)",
    "limit": "order-by-limit is the simplest relational shape; subsumed "
    "by driver-gated top-k window rows (established r4 rationale)",
    "pattern": "pattern_rising_3's lag-window fold is subsumed by the "
    "richer driver-gated funnel fold (established r4b rationale)",
    "unpivot": "inverse of the driver-gated pivot row, same reshaping "
    "machinery",
    "iterative": "the connected_components min-label iteration runs "
    "VERBATIM inside the driver-gated dedup_keep_best_per_cluster row "
    "(same pruned pairs -> same CC call; r7 rotation rationale)",
    "setop": "EXCEPT lowers to the same physical left-anti join the "
    "driver-gated tpch_q21 NOT EXISTS half plans (r7 rotation "
    "rationale); the EXCEPT spelling stays full-suite verified",
    "sink": "the update-mode idempotent foreachBatch merge is "
    "oracle-gated by stream_continuous_rollup_replay (full-suite "
    "parity every round) and restart-tested in test_sources_sinks",
}
# r7: "warehouse" and "chunking" left the allowlist — ann_ivf_topk_indexed
# and doc_chunk_windows rotated INTO the window (registry.py comments).


def test_driver_window_is_exactly_50_unique_registered_names():
    qs = all_queries()
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert all(n in qs for n in DRIVER_WINDOW)


def test_every_tag_family_has_driver_evidence_or_allowlist():
    qs = all_queries()
    win = set(DRIVER_WINDOW)
    uncovered = {}
    for name, spec in qs.items():
        for tag in spec.tags:
            uncovered.setdefault(tag, []).append(name)
    problems = []
    for tag, names in sorted(uncovered.items()):
        in_window = [n for n in names if n in win]
        if not in_window and tag not in SUITE_ONLY_TAGS:
            problems.append(f"{tag}: {names}")
        if in_window and tag in SUITE_ONLY_TAGS:
            problems.append(
                f"{tag}: allowlisted as suite-only but {in_window} is in the "
                "window — remove the stale allowlist entry"
            )
    assert not problems, (
        "operator families lost driver evidence (rotate a member into "
        "DRIVER_WINDOW or allowlist the tag with rationale):\n"
        + "\n".join(problems)
    )


def test_every_query_is_tagged():
    untagged = [n for n, s in all_queries().items() if not s.tags]
    assert not untagged, f"untagged queries (family unknown): {untagged}"
