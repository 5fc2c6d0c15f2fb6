"""End-to-end training-data prep pipeline — the composition the
extension pillars exist for (SURVEY §7 phase E): quality-filter ->
exact-dedup -> corpus report, as ONE declarative plan.

This is the canonical pre-LLM corpus pass: score every document with
cheap scan-local heuristics, drop the low-quality tail, collapse exact
duplicates (keep the lowest doc_id), and report per-language corpus
composition. At 100 TB the whole pipeline is two shuffles — one
hash-group on the text fingerprint (only (fp, doc_id, small scalars)
shuffle, never the text) and one tiny per-language rollup — everything
else rides the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load
from ..registry import register
from .dedup import NORM_SQL_DUCK, NORM_SQL_SPARK
from .text import STOPWORDS, _STOP_SQL

QUALITY_CUTOFF = 0.55  # ~median of the fixture's quality distribution


@register(
    "corpus_prep_pipeline",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS w,
         md5({NORM_SQL_DUCK}) AS fp
  FROM documents
),
m AS (
  SELECT doc_id, lang, fp, len(w) AS n_tokens,
         round(0.4 * LEAST(len(w) / 100.0, 1.0)
             + 0.4 * len(list_distinct(w))::DOUBLE / len(w)
             + 0.2 * (1.0 - ABS(len(list_filter(w, x -> x IN ('{_STOP_SQL}')))::DOUBLE
                               / len(w) - 0.4)), 6) AS quality
  FROM t
),
q AS (SELECT * FROM m WHERE quality >= {QUALITY_CUTOFF}),
kept AS (SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM q GROUP BY 1),
surv AS (SELECT q.*, k.n_copies FROM q JOIN kept k ON q.doc_id = k.keep_id)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_copies - 1) AS BIGINT) AS n_dups_removed,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       AVG(quality) AS avg_quality
FROM surv GROUP BY lang
""",
    doc=f"Training-data prep pipeline: quality score (rounded 6dp, "
    f"cutoff {QUALITY_CUTOFF} — fp-safe gate) -> exact dedup on the "
    "normalized-text fingerprint (keep lowest doc_id; duplicate credit "
    "attributed to the survivor's language) -> per-language corpus "
    "report. One plan, two shuffles; the fixture has exact dups only "
    "at sf0.1, so n_dups_removed is 0 at smaller sf by design.",
    tags=("pipeline", "dedup", "text"),
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    m = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "lang",
        f"md5(encode({NORM_SQL_SPARK}, 'UTF-8')) AS fp",
        "CAST(size(split(lower(text), ' ')) AS BIGINT) AS n_tokens",
        "size(array_distinct(split(lower(text), ' '))) "
        "  / CAST(size(split(lower(text), ' ')) AS DOUBLE) AS distinct_ratio",
        f"size(filter(split(lower(text), ' '), x -> x IN ({stop_list}))) "
        "  / CAST(size(split(lower(text), ' ')) AS DOUBLE) AS stop_ratio",
    ).withColumn(
        "quality",
        F.round(
            0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
            + 0.4 * F.col("distinct_ratio")
            + 0.2 * (1.0 - F.abs(F.col("stop_ratio") - 0.4)),
            6,
        ),
    )
    q = m.where(F.col("quality") >= QUALITY_CUTOFF).select(
        "doc_id", "lang", "fp", "n_tokens", "quality"
    )
    kept = q.groupBy("fp").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )
    surv = q.join(kept, q.doc_id == kept.keep_id)
    return surv.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_copies") - 1).alias("n_dups_removed"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("quality").alias("avg_quality"),
    )
