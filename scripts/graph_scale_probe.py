"""Graph-pillar scale probe: PageRank refresh wall-clock vs edge
count.

The graph pillar's scale contract is the scheduled REFRESH — the
five-iteration persisted-edges loop (`graph._pagerank_iterate`) that
both registered faces and the streamed ingest twin run once per
source content. Each iteration is one contribution join + one
groupBy(dst) shuffle over the degree-annotated edge frame, so wall
time should ride |E| ~linearly with a fixed iteration count.

Scaling construction: copy c>0 of the distinct trade pairs offsets
BOTH node ids by c * stride (stride = next power of ten above the max
id, the replay-harness fresh-keys rule), so the k-fold graph is k
DISJOINT copies of the fixture subgraph — degree distribution,
component structure and iteration count replicate per copy, edge and
node counts scale by k, and no cross-copy edges can exist (a k-fold
DENSER graph would be a different problem: same nodes, heavier rows
per contribution group).

Exponent: least-squares slope of log(t) vs log(k), min-of-2 warm
timings per scale (the scale_probe convention); the fixed
plan-compilation floor biases the slope BELOW 1, so ~1.0 reads as
linear and >1.2 deserves a look.

Usage: python scripts/graph_scale_probe.py [sf_dir] [scales...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_fraud_detection_rocks_db_app_spark.session import get_spark


def _fit_exponent(ks: list[int], ys: list[float]) -> float:
    xs = [math.log(k) for k in ks]
    ls = [math.log(max(1e-9, y)) for y in ys]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ls) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ls))
    den = sum((x - mx) ** 2 for x in xs)
    return round(num / den, 2) if den else 0.0


def main() -> None:
    from flink_fraud_detection_rocks_db_app_spark.operators.graph import (
        _pagerank_iterate,
        _trade_pairs,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    scales = [int(s) for s in sys.argv[2:]] or [1, 3, 10]
    spark = get_spark()
    base = _trade_pairs(spark, sf_dir)
    max_id = base.agg(F.greatest(F.max("a"), F.max("b"))).first()[0] or 0
    stride = max(1_000_000, 10 ** len(str(max_id)))
    report: dict[str, dict] = {}
    for k in scales:
        pairs = (
            base.crossJoin(spark.range(k).select(F.col("id").alias("rep")))
            .select(
                (F.col("a") + F.col("rep") * F.lit(stride)).alias("a"),
                (F.col("b") + F.col("rep") * F.lit(stride)).alias("b"),
            )
            # materialize the scaled edge source so the timed loop pays
            # iteration cost, not the crossJoin scaffolding
            .localCheckpoint(eager=True)
        )
        n_edges = pairs.count()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _, ranks = _pagerank_iterate(pairs)
            n_nodes = ranks.count()  # forces the final checkpointed frame
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        report[str(k)] = {
            "edges": n_edges,
            "nodes": n_nodes,
            "sec": round(best, 2),
        }
        print(
            f"x{k}: {n_edges} edges / {n_nodes} nodes -> {best:.2f}s",
            flush=True,
        )
    exp = _fit_exponent(
        [int(k) for k in report], [report[k]["sec"] for k in report]
    )
    print(f"pagerank_refresh exponent: {exp}")
    print(json.dumps({"pagerank_refresh": {"scales": report, "exponent": exp}}))


if __name__ == "__main__":
    main()
