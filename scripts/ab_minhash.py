"""One-warm-session A/B: minhash signature construction variants.

VERDICT r3 flagged dedup_minhash_lsh at 3.02 s vs r1's 1.77 s — but r1
measured the *degenerate* signature bug (all k lanes collapsed) and r2's
bench crashed, so there was never an honest A/B between

  A: hash-once   — xxhash64(shingle) once, k lanes = xxhash64(long, i)
                    (the r3 form, operators/dedup.py minhash_signatures)
  B: per-shingle — xxhash64(shingle, i) for every (shingle, i)
                    (the r2-era form: k times more string hashing)

Both run the IDENTICAL downstream (banding, bucket grouping, pair
expansion, exact-Jaccard verification) via the shared helpers, in ONE
warm session, min-of-2, interleaved A/B/A/B so drift hits both equally.

Usage: python scripts/ab_minhash.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_fraud_detection_rocks_db_app_spark.operators.dedup import (  # noqa: E402
    MINHASH_K,
    lsh_candidate_pairs,
    minhash_signatures,
    shingled,
    verify_exact_jaccard,
)
from flink_fraud_detection_rocks_db_app_spark.session import get_spark  # noqa: E402


def sig_per_shingle(spark, sf_dir):
    """r2-era form: k independent string hashes per shingle."""
    sh = shingled(spark, sf_dir)
    mh = [
        F.expr(f"array_min(transform(shingles, s -> xxhash64(s, {i})))").alias(f"h{i}")
        for i in range(MINHASH_K)
    ]
    return sh.select("doc_id", F.array(*mh).alias("sig"))


def run(spark, sf_dir, sig_builder) -> float:
    t0 = time.perf_counter()
    out = verify_exact_jaccard(spark, sf_dir, lsh_candidate_pairs(sig_builder(spark, sf_dir)))
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="ab_minhash")
    # warmup: JVM + codegen
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for sf_dir in sf_dirs:
        times = {"hash_once": [], "per_shingle_k": []}
        for _ in range(2):
            times["hash_once"].append(run(spark, sf_dir, minhash_signatures))
            times["per_shingle_k"].append(run(spark, sf_dir, sig_per_shingle))
        print(
            f"{sf_dir}: hash_once min={min(times['hash_once']):.3f}s "
            f"runs={[round(t, 3) for t in times['hash_once']]} | "
            f"per_shingle_k min={min(times['per_shingle_k']):.3f}s "
            f"runs={[round(t, 3) for t in times['per_shingle_k']]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
