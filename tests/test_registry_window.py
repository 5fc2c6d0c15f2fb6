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
    "alert": "the daily-keyed-sum + threshold gate (P6/F2) machinery is "
    "driver-gated via stream_continuous_rollup_replay's continuous "
    "daily sums and dynamic_rules_alerts' rule gates (r8 rotation); "
    "the literal-threshold variants stay full-suite verified",
    "analytics": "cohort_retention_daily's join-then-histogram shape "
    "held a green driver row via tpch_q13 (r8); q13 rotated out green "
    "in r9 and outer-join machinery keeps rows via tpch_q5's "
    "six-table join and the q21/q22 anti-join gates",
    "anomaly": "zscore's per-key sort-window fold machinery is "
    "driver-gated via the bit-exact stream_ewma_replay twin (r8); "
    "zscore + its Welford streaming twin stay differential-tested",
    "cep": "the CEP family's driver row is stream_pattern_rising_replay "
    "(tag 'pattern', r8): carry-across-batches sequence state is "
    "strictly more surface than the batch lag-window/funnel folds",
    "funnel": "same rationale as cep — the sorted-array funnel fold "
    "stays full-suite verified",
    "global": "non-keyed windowAll is the keyed window machinery with a "
    "single global group (no key exchange); keyed sliding/session "
    "faces keep driver rows and windowAll was driver-green r3-r7 (r8)",
    "udf": "the Arrow-batched mapInPandas machinery keeps its driver "
    "row via multimodal_frame_sample; multimodal_features (driver-"
    "green r6/r7) gave its r8 slot to the left-outer join face and "
    "stays full-suite verified",
    "perf": "the pane-partial rewrite is driver-gated through its "
    "CHAINED stateful streaming form stream_paned_slide_sum_replay "
    "(r8); the batch paned row stays full-suite verified",
    "retention": "same rationale as analytics",
    "cube": "OLAP reshaping variant of the pivot family (below); "
    "multi-grouping aggregate machinery also runs inside the "
    "driver-gated stats/heavy-hitter rows",
    "grouping_sets": "same rationale as cube",
    "projection": "P1/P2 pure projections run inside every driver "
    "row's plan and are plan-tested (scan pruning / pushdown); P2 got "
    "its clean driver re-check in r8 after the r2 fixture-drift red "
    "(r9 rotation)",
    "chunking": "doc_chunk_windows held green driver rows r7b-r9; the "
    "scan-local token-window slice/explode stays plan-tested "
    "(zero-exchange) and full-suite verified; its slot went to "
    "ann_lsh_recall_at_k in the r10 quartet rotation",
    "resample": "resample_daily_gapfill held green r5-r9; the "
    "calendar-spine left-join machinery recurs in the driver-gated "
    "gapless window rows, and the time-series family's driver row is "
    "now ts_znorm_pattern_topk + its streaming twin (r10 rotation)",
    "topk": "window_heavy_hitters_1h held green r5-r9; the "
    "WindowGroupLimit rank-per-group machinery runs verbatim inside "
    "the driver-gated mlt_bm25_topk and every ANN top-k row (r10 "
    "rotation)",
    "filter": "P7 pushdown filters run inside every detector driver row's "
    "plan and are plan-tested (established r4b rotation rationale)",
    "histogram": "describe/summary aggregate over the same groupBy "
    "machinery as the driver-gated stats rows",
    "stats": "same rationale as histogram",
    "range": "same keyed-range-join machinery as asof_latest_order",
    "limit": "order-by-limit is the simplest relational shape; subsumed "
    "by driver-gated top-k window rows (established r4 rationale)",
    "unpivot": "inverse of the pivot reshape (same rationale as "
    "pivot above)",
    "lsh": "ann_lsh_recall_at_k held green r10 (bucket-collision loss) "
    "and rotated out in the r11 quartet collapse — the shared "
    "recall-oracle machinery keeps its driver row via "
    "ann_ivfpq_recall_at_k; minhash-LSH pair generation held green "
    "r2-r7 (dedup_minhash_lsh) + r5-r9 (dedup_incremental_lsh) and "
    "stays full-suite verified with the append contract "
    "(r11 rotation)",
    "sort": "order-by-limit (TakeOrderedAndProject) ran green through "
    "r10 via tpch_q3/q10 and the identical top-k machinery runs "
    "inside the driver-gated mlt_bm25_topk and every ANN top-k row; "
    "the TPC-H sort rows rotated out green in r11 "
    "(r11 rotation)",
    "setop": "EXCEPT lowers to the same physical left-anti join the "
    "driver-gated tpch_q21 NOT EXISTS half plans (r7 rotation "
    "rationale); the EXCEPT spelling stays full-suite verified",
    "pivot": "pivot_user_event_type holds SEVEN rounds of cumulative "
    "green driver evidence (r4-r8 + the r11 re-gate through r12); the "
    "reshape machinery stays full-suite verified; its r13 slot went "
    "to zorder_balance_monitor (r13 rotation)",
    "sql": "the spark.sql() text faces are plan-identical to their "
    "DataFrame twins under IMPORTED-SAME oracle objects and stay "
    "pinned by the sqlapi suite + full oracle parity every round; "
    "sql_tumble_sum_3s held green r3-r8 + r11-r12 before giving its "
    "slot to heavy_hitters_mg_bounded (r13 rotation)",
    "subquery": "all 22 TPC-H shapes hold cumulative driver evidence "
    "as of r10 and q11's scalar-subquery HAVING gate held green "
    "r10-r12; decorrelation machinery stays full-suite verified with "
    "the 6dp convention; q11's slot went to the temporal pillar "
    "(r13 rotation)",
    "distinct": "the windowed-HLL accuracy gate rotated out GREEN in "
    "r14 (tumble_approx_distinct_users_bounded, r13 driver row); its "
    "streaming twin stream_users_sketch_rollup_replay — the same "
    "mergeable-HLL gate through the engine — took the window slot, "
    "but carries the 'sketch'/'streaming' tags; the exact windowed "
    "distinct stays computed (and hash-gated) inside both "
    "(r14 rotation)",
}
# r7: "warehouse" and "chunking" left the allowlist — ann_ivf_topk_indexed
# and doc_chunk_windows rotated INTO the window (registry.py comments).
# r8c: "retrieval" and "pq" never entered the allowlist permanently —
# hybrid_rrf_topk and ann_ivfpq_topk rotated INTO the window the same
# round their families landed (registry.py comments).
# r12: "layout" and "simhash" left the allowlist — events_zorder_slice
# (+_incremental) and dedup_simhash_band_recall rotated INTO the window
# (the r11 queue); the layout-invariance caveat moves into the window
# comment: the hash certifies lifecycle invariance, test_layout.py
# certifies the layout itself.
# r8: "approx", "pattern", "sink", "projection" and "rollup" left the
# allowlist — approx_distinct_users_bounded,
# stream_pattern_rising_replay, stream_continuous_rollup_replay and
# project_account_amount_ts rotated INTO the window.
# r13: "sketch" and "distinct" left the allowlist —
# heavy_hitters_mg_bounded (the MG frequency sketch) and
# tumble_approx_distinct_users_bounded (the windowed HLL gate) rotated
# INTO the window; "temporal"/"cdc"/"scd2"/"graph"/"training" never
# entered it — the r12 pillar waves rotated in wholesale this round.
# r14: "langid", "tokens", "timetravel", "split" and "lifecycle" left
# the allowlist — langid_confusion_matrix, bpe_merge_candidates,
# cdc_snapshot_diff, backtest_expanding_folds and
# events_zorder_slice_refreshed rotated INTO the window (the r14 queue
# drain); "distinct" re-entered with the r14-rotation rationale above.


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


def test_bench_and_probe_lists_name_registered_queries():
    """bench.py's HEADLINE and scale_probe's PROBED lists are consumed
    by the per-round driver — a typo there only surfaces as a lost
    bench round. Pin both lists to the registry (probe names may also
    resolve via its EXTRA_PROBES)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def load(path, name):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    qs = all_queries()
    bench = load(os.path.join(root, "bench.py"), "bench_under_test")
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench.HEADLINE names unknown queries: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate bench entries"

    probe = load(
        os.path.join(root, "scripts", "scale_probe.py"), "scale_probe_under_test"
    )
    missing = [
        n for n in probe.PROBED if n not in qs and n not in probe.EXTRA_PROBES
    ]
    assert not missing, f"scale_probe.PROBED names unknown queries: {missing}"


def test_never_gated_ledger_is_exhaustive_and_current():
    """The standing rotation policy, executable (r13 verdict #3):
    every registered name either (a) holds cumulative driver evidence
    (a row in some committed CORRECTNESS_r*.json), (b) sits in
    DRIVER_WINDOW (gated next driver run), or (c) carries a
    TWIN_SUBSUMED ledger entry naming a DRIVER-GREEN twin. A new face
    landing without a rotation slot or ledger entry fails here; so
    does a ledger twin without actual driver evidence; so does a
    STALE entry whose key has since gained a driver row or slot."""
    import glob
    import json
    import os

    from flink_fraud_detection_rocks_db_app_spark.registry import TWIN_SUBSUMED

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    evidence: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        evidence |= set(json.load(open(f)).keys())
    assert evidence, "no committed CORRECTNESS_r*.json evidence found"

    names = set(all_queries().keys())
    never_gated = names - evidence - set(DRIVER_WINDOW)

    # (a) every never-gated name has a ledger entry
    unledgered = never_gated - set(TWIN_SUBSUMED)
    assert not unledgered, (
        "registered faces with neither driver evidence, a DRIVER_WINDOW "
        f"slot, nor a TWIN_SUBSUMED ledger entry: {sorted(unledgered)} — "
        "budget a rotation slot or add a ledger entry naming the "
        "driver-green twin that subsumes the machinery"
    )
    # (b) every named twin actually holds driver evidence
    weak_twins = {
        k: v for k, v in TWIN_SUBSUMED.items() if v not in evidence
    }
    assert not weak_twins, (
        f"ledger twins without driver evidence: {weak_twins}"
    )
    # (c) no stale entries: a key that gained evidence or a window slot
    # must leave the ledger (keeps the ledger an honest floor, not a
    # dumping ground), and keys must still be registered names
    stale = {
        k
        for k in TWIN_SUBSUMED
        if k in evidence or k in DRIVER_WINDOW or k not in names
    }
    assert not stale, f"stale TWIN_SUBSUMED entries: {sorted(stale)}"
