"""End-to-end demo: the training-data pipeline stack on this engine.

    python examples/corpus_pipeline_demo.py [sf_dir]

Walks the documents/embeddings fixtures through the full 100 TB-shaped
corpus flow — every step is a registered, oracle-verified query:

  1. quality gating        (gopher_quality_filter, doc_unigram_logprob)
  2. token budgeting       (doc_bpe_token_estimate)
  3. exact + passage dedup (dedup_exact, span_dup_stats)
  4. near-dup dedup        (dedup_minhash_lsh -> dedup_clusters)
  5. decontamination       (decontaminate_bloom_prefilter)
  6. sampling + splits     (stratified / weighted / exactly-k,
                            split_train_val_test)
  7. sequence packing      (pack_sequences)
  8. similarity            (ann_cosine_topk_blas vs ann_ivf_topk,
                            kmeans_assign IVF training)

Prints one summary line per step: rows in/out and what moved in the
shuffle — the narrative version of SCALE.md's per-family budgets.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_fraud_detection_rocks_db_app_spark.registry import all_queries  # noqa: E402
from flink_fraud_detection_rocks_db_app_spark.session import get_spark  # noqa: E402

STEPS = (
    ("quality gate", "gopher_quality_filter",
     "scan-local rule cascade, zero shuffle"),
    ("LM quality score", "doc_unigram_logprob",
     "top-V unigram model broadcast as one map row; in-scan scoring"),
    ("token budget", "doc_bpe_token_estimate",
     "pre-token runs + subword fertility, rides the corpus scan"),
    ("exact dedup", "dedup_exact",
     "one shuffle keyed on md5 fingerprint; text never moves"),
    ("passage dedup", "span_dup_stats",
     "stride-1 8-token spans shuffle as 8-byte hashes only"),
    ("winnow fingerprints", "doc_winnow_fingerprints",
     "rolling-min shingle selection, scan-local, order-sensitive"),
    ("near-dup pairs", "dedup_minhash_lsh",
     "scan-local 32-lane signatures; (band,bucket) equi-join candidates; exact-verified"),
    ("near-dup clusters", "dedup_clusters",
     "min-label propagation, O(diameter) keyed shuffles"),
    ("keep best of cluster", "dedup_keep_best_per_cluster",
     "argmax-quality canonical per cluster (6dp gate, id tiebreak)"),
    ("decontamination", "decontaminate_bloom_prefilter",
     "16 KB bloom probed scan-side; survivors exact-verified"),
    ("stratified sample", "stratified_sample_docs",
     "Knuth-hash gate, zero shuffle, bit-reproducible"),
    ("weighted sample", "weighted_sample_docs",
     "length-proportional keep rate through the same gate"),
    ("exactly-k sample", "sample_k_per_lang",
     "hash-ranked reservoir contract, one window shuffle"),
    ("temperature rebalance", "temperature_resample_docs",
     "keep sqrt(n_min/n_l) per language; exact IEEE threshold"),
    ("train/val/test split", "split_train_val_test",
     "independent-hash gates, scan-local, engine-reproducible"),
    ("context chunking", "doc_chunk_windows",
     "64-token windows, 16-token overlap; scan-local slice fan-out"),
    ("sequence packing", "pack_sequences",
     "per-lang cumulative-sum bins, one window shuffle"),
    ("ANN (BLAS exact)", "ann_cosine_topk_blas",
     "one matmul per Arrow batch + per-batch top-k prune"),
    ("ANN (IVF)", "ann_ivf_topk",
     "IVF cell = partition key, nprobe=2"),
    ("ANN (IVF, indexed)", "ann_ivf_topk_indexed",
     "materialized inverted lists; unprobed partitions pruned"),
    ("IVF training", "kmeans_assign",
     "Lloyd iterations: centroids broadcast, corpus never shuffles"),
    ("ANN quality eval", "ann_ivf_recall_at_k",
     "recall@5 of the IVF path vs the exact baseline, per query"),
    ("semantic dedup", "semdedup_keep",
     "SemDeDup: per-cluster near-dup pairs, keep most-diverse copy"),
    ("semantic dedup (appending)", "semdedup_incremental_keep",
     "frozen quantizer + precomputed base losers; batch-cost update"),
    ("PII redaction", "doc_pii_redact",
     "regexp mask cascade, rides the corpus scan"),
    ("passage dedup + rebuild", "dedup_passages_keep_first",
     "corpus-wide keep-first on 8-token passages; docs reassembled"),
    ("mixture plan", "mixture_plan_langs",
     "declared weights + token budget -> per-lang epochs, O(strata)"),
    ("mixture apply", "mixture_apply_docs",
     "floor-epochs + salted fractional admission; scan-local explode"),
    ("curriculum buckets", "curriculum_quality_buckets",
     "per-lang quality tertiles by exact rank (6dp + id tiebreak)"),
    ("ANN (PQ, flat ADC)", "ann_pq_topk",
     "corpus searched as 4 codes/vector; LUT broadcast per query"),
    ("ANN (IVFPQ, indexed)", "ann_ivfpq_topk_indexed",
     "cell-partitioned PQ codes + frozen quantizers in the asset"),
    ("MoreLikeThis", "mlt_bm25_topk",
     "per-doc interesting terms -> BM25 over those terms only"),
    ("hybrid retrieval", "hybrid_rrf_topk",
     "RRF(K=60) of the MLT and exact-cosine arms; rank-based, exact"),
    ("hybrid retrieval (indexed)", "hybrid_rrf_topk_indexed",
     "semantic arm probes the IVFPQ asset; no raw-vector rescan"),
    ("hard negatives", "hard_negatives_topk",
     "BM25-close minus embedding-close: DPR-style training negatives"),
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-demo", cpus=8, shuffle_partitions=8)
    qs = all_queries()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(f"corpus: {n_docs} documents at {sf_dir}")
    for label, name, note in STEPS:
        t0 = time.perf_counter()
        n = qs[name].fn(spark, sf_dir).count()
        print(f"  {label:18s} {name:32s} -> {n:6d} rows "
              f"[{time.perf_counter() - t0:5.1f}s]  ({note})")
    spark.stop()


if __name__ == "__main__":
    main()
