"""Warm-session A/B for dedup_ngram_jaccard_pruned plan shapes.

Current (r3): one groupBy(s).collect_list postings frame consumed by
TWO branches (pair expansion + per-doc pruned sizes); collect_list's
non-determinism flag blocks ReuseExchange, so the whole
scan->shingle->explode->shuffle->agg lineage runs once PER consumer.

Candidate (r4): document frequency via a DETERMINISTIC count agg,
then kept postings = ex JOIN dfc(df<=MAXDF) on s. The explode
exchange on s canonicalizes identically in both consumers, so the
scan+shingle+explode+shuffle runs ONCE (ReuseExchange), and only the
cheap post-join branches (collect_list for pairs, doc_id count for
sizes) diverge.

Usage: python scripts/ab_ngram_reuse.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_fraud_detection_rocks_db_app_spark.operators.dedup import (  # noqa: E402
    MAXDF,
    shingled,
)
from flink_fraud_detection_rocks_db_app_spark.registry import all_queries  # noqa: E402
from flink_fraud_detection_rocks_db_app_spark.session import get_spark  # noqa: E402


def candidate(spark, sf_dir):
    sh = shingled(spark, sf_dir)
    ex = sh.select(
        "doc_id", F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("s")
    )
    dfc = ex.groupBy("s").agg(F.count("*").alias("df"))
    kept_ex = ex.join(dfc.where(F.col("df") <= MAXDF), "s")
    sz = kept_ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    groups = kept_ex.groupBy("s").agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
    pairs = (
        groups.where(F.size("ds") > 1)
        .select("ds", F.posexplode("ds").alias("i", "doc_a"))
        .select("doc_a", F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sza = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    szb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        pairs.join(sza, "doc_a")
        .join(szb, "doc_b")
        .where(j >= 0.5)
        .select("doc_a", "doc_b", j.alias("jaccard"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab_ngram")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    current = all_queries()["dedup_ngram_jaccard_pruned"].fn

    # correctness first: identical row sets
    a = {tuple(r) for r in current(spark, sf_dir).collect()}
    b = {tuple(r) for r in candidate(spark, sf_dir).collect()}
    print(f"rows current={len(a)} candidate={len(b)} equal={a == b}")

    times = {"current": [], "candidate": []}
    for _ in range(3):
        for name, fn in (("current", current), ("candidate", candidate)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.2f}s runs={[round(t, 2) for t in ts]}")

    n_reuse = candidate(spark, sf_dir)._jdf.queryExecution().executedPlan().toString().count("ReusedExchange")
    print("candidate ReusedExchange nodes:", n_reuse)
    spark.stop()


if __name__ == "__main__":
    main()
