"""Deterministic corpus sampling + TF-IDF term weighting.

Training-data pipelines at 100 TB need *reproducible* subsampling
(re-running the pipeline must pick the same rows — no RNG state, no
`TABLESAMPLE` nondeterminism) and per-document term weighting for
filtering/diagnostics. Both are expressed as pure integer/column
arithmetic so the identical formula replays in any SQL engine:

- Sampling key: Knuth multiplicative hash ``(id * 2654435761) mod 2^32``
  — a uniform permutation of the id space using only BIGINT math (no
  engine-specific hash functions). The multiply is evaluated in
  SPLIT form (16-bit hi/lo halves of ``id mod 2^32``, each product
  < 2^49) so it is overflow-free for ARBITRARY 64-bit ids: the naive
  ``id * 2654435761`` wraps int64 once ids pass ~3.47e9, and
  non-ANSI Spark wraps silently where DuckDB/ANSI errors — the
  sampled sets would silently diverge between engines at exactly the
  corpus scale this targets. The per-stratum rate gate is then a
  plain integer comparison, so the oracle is exact, not statistical.
- TF-IDF: integer tf/df plus ``ln(N/df)``; scores are rounded to 6
  decimals BEFORE the per-doc ranking so a sub-ulp libm difference
  between engines can never flip row membership (registry.py
  conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..fixtures import load
from ..functions.hashing import HASH_DUCK, HASH_MOD, HASH_SPARK, HASH_TMPL, KNUTH
from ..registry import register
from .text import QUALITY_SQL_CTES

# Knuth multiplicative hash, shared with the DSIR gate — definition
# and overflow analysis in functions/hashing.py. Local aliases keep
# this module's oracle strings and tests unchanged.
_KNUTH = KNUTH
_MOD = HASH_MOD
_HASH_TMPL = HASH_TMPL
_HASH_SPARK = HASH_SPARK
_HASH_DUCK = HASH_DUCK

# per-stratum keep rates in 1/100ths applied to the 32-bit hash space;
# stratification axis is (lang): high-resource languages are downsampled
# harder — the standard corpus-balancing move.
_RATES = {"en": 20, "de": 40, "fr": 40, "es": 40}
_DEFAULT_RATE = 80

_RATE_SQL = (
    # CAST: rate * (2^32/100) exceeds INT32 — must be 64-bit in both
    # engines (Spark ANSI mode hard-errors on the overflow otherwise).
    "CAST(CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    + f" ELSE {_DEFAULT_RATE} END AS BIGINT)"
)


@register(
    "stratified_sample_docs",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_HASH_DUCK} < ({_RATE_SQL}) * ({_MOD} // 100)
""",
    doc="Deterministic per-language stratified sample: Knuth "
    "multiplicative hash of doc_id gates each row against its stratum's "
    "keep rate. Scan-local (zero shuffle), reproducible across runs and "
    "engines — the reservoir-free way to subsample a 100 TB corpus.",
    tags=("sampling", "text"),
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = F.expr(_HASH_SPARK)
    rate = F.expr(_RATE_SQL)
    return docs.where(bucket < rate * (_MOD // 100)).select(
        "doc_id", "lang", "source"
    )


TFIDF_TOP_K = 5


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term,
         ROUND(tf * LN(n_docs::DOUBLE / df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
         ) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= {TFIDF_TOP_K}
""",
    doc=f"Top-{TFIDF_TOP_K} TF-IDF terms per document. Shuffle budget: "
    "one on (doc_id, term) for tf, one on term for df (both with "
    "map-side partial aggregation), the tf-df join on term (AQE picks "
    "broadcast while the vocabulary is small, sort-merge once it "
    "isn't), and one on doc_id for the ranking window — each keyed on "
    "a bounded derived key, no all-pairs anywhere. Scores rounded to "
    "6dp before ranking so libm noise cannot flip membership.",
    tags=("text", "join", "window"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf", "rk")
    )


# ------------------------------------------------------------ sequence packing

PACK_BUDGET_TOKENS = 512


@register(
    "pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, len(string_split(lower(text), ' ')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY n_tokens DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM t
)
SELECT doc_id, lang, n_tokens,
       CAST((cum - n_tokens) // {PACK_BUDGET_TOKENS} AS BIGINT) AS bin_id
FROM c
""",
    doc=f"Training-sequence packing: assign docs to {PACK_BUDGET_TOKENS}-"
    "token bins per language via a cumulative token sum over a "
    "deterministic (size desc, doc_id) order — the shuffle-free "
    "approximation of first-fit-decreasing. One window shuffle keyed on "
    "lang; at 100 TB the partition key widens to (lang, shard) so no "
    "single ordering grows unbounded, which only renumbers bins, never "
    "overfills them: bin occupancy stays bounded by budget + one doc "
    "because the cumulative sum is per-partition by construction.",
    tags=("sampling", "window"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return docs.select(
        "doc_id",
        "lang",
        "n_tokens",
        (
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / F.lit(PACK_BUDGET_TOKENS)
        )
        .cast("bigint")
        .alias("bin_id"),
    )


# Weighted keep-rate: longer documents sampled more (the standard
# quality-proportional corpus move), capped at _W_CAP chars, scaled by
# _W_BASE_PCT at the cap. All integer math: threshold fits int64
# (2000 * 30 * 42949672 ~ 2.6e12) and the division is integer in both
# engines, so the kept set is bit-reproducible.
_W_CAP = 2000
_W_BASE_PCT = 30
_W_UNIT = _MOD // 100  # 1% of the 32-bit hash space


@register(
    "weighted_sample_docs",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_HASH_DUCK} <
      (least(n_chars, {_W_CAP}) * {_W_BASE_PCT} * {_W_UNIT}) // {_W_CAP}
""",
    doc="Deterministic WEIGHTED sampling: per-doc keep probability "
    f"proportional to min(n_chars, {_W_CAP}) — {_W_BASE_PCT}% at the cap "
    "— gated by the same overflow-free Knuth hash as the stratified "
    "sampler. Scan-local, zero shuffle, reproducible across engines and "
    "runs; with stratified_sample_docs and pack_sequences this completes "
    "the deterministic sampling toolkit (uniform-per-stratum, "
    "importance-weighted, budget-packed).",
    tags=("sampling", "text"),
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = F.expr(_HASH_SPARK)
    thresh = F.expr(
        f"least(n_chars, {_W_CAP}) * {_W_BASE_PCT} * {_W_UNIT} div {_W_CAP}"
    )
    return docs.where(bucket < thresh).select("doc_id", "lang", "n_chars")


SAMPLE_K_PER_STRATUM = 40


@register(
    "sample_k_per_lang",
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang, {_HASH_DUCK} AS hk FROM documents
),
r AS (
  SELECT doc_id, lang, hk,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
  FROM h
)
SELECT doc_id, lang, rk FROM r WHERE rk <= {SAMPLE_K_PER_STRATUM}
""",
    doc=f"Exactly-k-per-stratum sampling: rank docs per language by the "
    "overflow-free Knuth hash (a deterministic uniform permutation) and "
    f"keep the first {SAMPLE_K_PER_STRATUM} — the reservoir-sampling "
    "contract (uniform k without replacement per group) with zero RNG "
    "state and bit-reproducible output. One window shuffle keyed on "
    "lang; at 100 TB swap row_number for a per-partition top-k "
    "(rank <= k pushes TakeOrdered partials map-side) — the rate-based "
    "stratified gate cannot guarantee exact counts, this can.",
    tags=("sampling", "window"),
)
def sample_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.expr(_HASH_SPARK).alias("hk")
    )
    w = Window.partitionBy("lang").orderBy(F.col("hk").asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= SAMPLE_K_PER_STRATUM)
        .select("doc_id", "lang", "rk")
    )


# ------------------------------------------------- train/val/test split

# Split fractions in 1/100ths of the 32-bit hash space. The split uses
# its OWN multiplier (xxhash's PRIME32_2), not a second Knuth pass:
# composing multiplicative hashes is itself multiplicative with step
# K^2 mod 2^32, and K_knuth^2/2^32 = 0.99961... — nearly rational, so
# sequential ids cluster into one split (measured: 1/239/260 at
# sf0.01). An independent well-distributed constant restores both
# uniformity (400/51/49 on 500 sequential ids) and decorrelation from
# the sampling gates (80%-gate agreement 0.68 = the independence
# expectation 0.8*0.8 + 0.2*0.2).
_SPLIT_TRAIN, _SPLIT_VAL = 80, 10  # test = the remainder
_SPLIT_K = 2246822519  # xxhash PRIME32_2 — public constant

_SPLIT_HASH_TMPL = _HASH_TMPL.replace("2654435761", str(_SPLIT_K))


def _split_hash(idiv: str) -> str:
    return _SPLIT_HASH_TMPL.format(idiv=idiv)


@register(
    "split_train_val_test",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN {_split_hash('//')} < {_SPLIT_TRAIN} * ({_MOD} // 100) THEN 'train'
            WHEN {_split_hash('//')} < {_SPLIT_TRAIN + _SPLIT_VAL} * ({_MOD} // 100) THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    doc=f"Deterministic {_SPLIT_TRAIN}/{_SPLIT_VAL}/"
    f"{100 - _SPLIT_TRAIN - _SPLIT_VAL} train/val/test assignment: a "
    "double Knuth hash of doc_id thresholded over the 32-bit space — "
    "scan-local, zero shuffle, reproducible across engines/runs/"
    "cluster sizes, and decorrelated from the sampling gates that use "
    "the single-pass hash. The property every eval pipeline needs: a "
    "document's split NEVER changes as the corpus grows (assignment "
    "depends only on its own id).",
    tags=("sampling", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = F.expr(_split_hash("div"))
    cell = _MOD // 100
    split = (
        F.when(h < _SPLIT_TRAIN * cell, "train")
        .when(h < (_SPLIT_TRAIN + _SPLIT_VAL) * cell, "val")
        .otherwise("test")
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id", "lang", split.alias("split")
    )


@register(
    "temperature_resample_docs",
    oracle=f"""
WITH c AS (
  SELECT lang, COUNT(*) AS n_l, MIN(COUNT(*)) OVER () AS n_min
  FROM documents GROUP BY 1
)
SELECT doc_id, lang,
       CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_l) * 1000000) AS BIGINT) AS rate_ppm
FROM documents JOIN c USING (lang)
WHERE {_HASH_DUCK} <
      CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_l) * {_MOD}) AS BIGINT)
""",
    doc="Temperature-based language rebalancing (the mT5/CC-100 "
    "alpha-sampling move, alpha=0.5): each language keeps "
    "sqrt(n_min/n_l) of its documents, so the post-sample distribution "
    "is proportional to sqrt of the original — high-resource languages "
    "downsampled hardest, the rarest kept whole. The per-language "
    "rates derive from ONE tiny count aggregate (O(langs) rows, "
    "broadcast-joined back); the gate reuses the overflow-free Knuth "
    "hash, and because /, sqrt, * and floor are all correctly-rounded "
    "IEEE ops, the integer threshold is bit-identical across engines — "
    "the oracle is exact with no rounding seam at all.",
    tags=("sampling", "text"),
)
def temperature_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_l"))
        .withColumn("n_min", F.min("n_l").over(Window.partitionBy()))
    )
    thresh = F.expr(f"CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_l) * {_MOD}) AS BIGINT)")
    rate_ppm = F.expr(
        "CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_l) * 1000000) AS BIGINT)"
    )
    return (
        docs.join(F.broadcast(c), "lang")
        .where(F.expr(_HASH_SPARK) < thresh)
        .select("doc_id", "lang", rate_ppm.alias("rate_ppm"))
    )


# ---------------------------------------------------------------------------
# Data-mixture planning: target weights -> per-language token budgets.
#
# The standard pre-training move (GPT-3 / The Pile / data-constrained
# scaling): the corpus owner declares a TARGET mixture over strata and a
# total token budget; each stratum is then read for `epochs` passes,
# where epochs = target_tokens / available_tokens, capped at ~4 repeats
# (past that, repeated data stops helping — the data-constrained
# scaling-law rule of thumb). This planner is the tiny O(strata)
# aggregate that turns (corpus stats, weights, budget) into an explicit
# per-language plan; temperature_resample_docs above is the IMPLICIT
# alpha=0.5 version of the same decision.
#
# All integer math. The epochs ratio is emitted in parts-per-million via
# SPLIT integer division ((q div a)*1e6 + ((q mod a)*1e6) div a) so no
# intermediate exceeds max(avail, rem*1e6) — int64-safe for strata up to
# ~9.2e12 tokens (comfortably past a 100 TB corpus's per-language text).
_MIX_WEIGHTS = {"en": 40, "zh": 15, "es": 15, "de": 15, "fr": 15}  # pct
_MIX_MAX_EPOCHS = 4
_MIX_W_SQL = (
    "CAST(CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())
    + " ELSE 0 END AS BIGINT)"
)
# budget = the corpus's own total token count (self-normalizing across
# SFs, and it makes epochs straddle 1.0: strata whose availability share
# falls short of their target weight get whole-copy upsampling, the rest
# fractional downsampling — both replication paths exercised at every
# fixture SF); target = budget * weight / 100; planned = min(target,
# 4 * available).
_MIX_TMPL = {
    "target_tokens": "(total_tokens * target_weight_pct) {idiv} 100",
    "planned_tokens": f"LEAST(target_tokens, avail_tokens * {_MIX_MAX_EPOCHS})",
    "epochs_ppm": (
        "(planned_tokens {idiv} avail_tokens) * 1000000"
        " + ((planned_tokens % avail_tokens) * 1000000) {idiv} avail_tokens"
    ),
}

# The shared plan relation (one O(strata) aggregate over a single corpus
# scan), used by both the planner query and the apply gate below.
_MIX_PLAN_CTE_TMPL = f"""
s AS (
  SELECT lang, COUNT(*) AS n_docs,
         SUM(len(string_split(lower(text), ' '))) AS avail_tokens
  FROM documents GROUP BY 1
),
t AS (
  SELECT *, SUM(avail_tokens) OVER () AS total_tokens,
         {_MIX_W_SQL} AS target_weight_pct
  FROM s
),
p AS (
  SELECT *, {_MIX_TMPL["target_tokens"]} AS target_tokens
  FROM t
),
q AS (SELECT *, {_MIX_TMPL["planned_tokens"]} AS planned_tokens FROM p),
mix_plan AS (
  SELECT *, {_MIX_TMPL["epochs_ppm"]} AS epochs_ppm FROM q
)
"""


def _mixture_plan_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(strata) plan frame: lang, n_docs, avail_tokens,
    target_weight_pct, target_tokens, planned_tokens, epochs_ppm."""
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), " ")).cast("bigint")).alias(
            "avail_tokens"
        ),
    )
    t = s.withColumn(
        "total_tokens", F.sum("avail_tokens").over(Window.partitionBy())
    ).withColumn("target_weight_pct", F.expr(_MIX_W_SQL))
    p = t.withColumn(
        "target_tokens", F.expr(_MIX_TMPL["target_tokens"].format(idiv="div"))
    )
    return p.withColumn(
        "planned_tokens", F.expr(_MIX_TMPL["planned_tokens"])
    ).withColumn("epochs_ppm", F.expr(_MIX_TMPL["epochs_ppm"].format(idiv="div")))


@register(
    "mixture_plan_langs",
    oracle=f"""
WITH {_MIX_PLAN_CTE_TMPL}
SELECT lang, n_docs, avail_tokens, target_weight_pct, target_tokens,
       planned_tokens, epochs_ppm
FROM mix_plan
""".format(idiv="//"),
    doc="Explicit data-mixture plan: declared target weights + a total "
    "token budget -> per-language planned tokens and repeat factor "
    "(ppm), with the data-constrained-scaling 4-epoch repeat cap. One "
    "O(strata) aggregate over a single corpus scan; the whole plan is "
    "integer arithmetic (split ppm division, overflow-safe to ~9.2e12 "
    "tokens per stratum) so the oracle is bit-exact. Complements "
    "temperature_resample_docs (the implicit alpha-sampling form of "
    "the same mixture decision).",
    tags=("sampling", "text"),
)
def mixture_plan_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mixture_plan_frame(spark, sf_dir).select(
        "lang",
        "n_docs",
        "avail_tokens",
        "target_weight_pct",
        "target_tokens",
        "planned_tokens",
        "epochs_ppm",
    )


# Fractional-epoch admission gate: a SALTED Knuth hash (xxHash's odd
# PRIME32_2 multiplier in the same overflow-free split form) so the
# kept-remainder set is decorrelated from the stratified-sample /
# train-val-test gates above — reusing one hash would make "the extra
# epoch" systematically the same docs that land in 'train'.
_MIX_K = 2246822519
_MIX_HASH_TMPL = _HASH_TMPL.replace("2654435761", str(_MIX_K))
# frac_ppm is compared against the 32-bit hash space scaled by
# (2^32 div 1e6) = 4294 — pure integers, identical in both engines.
_MIX_COPIES_TMPL = (
    "epochs_ppm {idiv} 1000000"
    " + CASE WHEN " + _MIX_HASH_TMPL + " <"
    " (epochs_ppm % 1000000) * (4294967296 {idiv} 1000000)"
    " THEN 1 ELSE 0 END"
)


@register(
    "mixture_apply_docs",
    oracle=f"""
WITH {_MIX_PLAN_CTE_TMPL},
g AS (
  SELECT d.doc_id, d.lang,
         CAST({_MIX_COPIES_TMPL} AS BIGINT) AS n_copies
  FROM documents d JOIN mix_plan USING (lang)
)
SELECT doc_id, lang, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_id
FROM g WHERE n_copies > 0
""".format(idiv="//"),
    doc="Materialize the mixture plan: every document is emitted "
    "floor(epochs) times plus one more copy iff a salted Knuth hash "
    "admits it into the fractional remainder — so each stratum's "
    "output token mass converges to planned_tokens while staying "
    "deterministic and engine-exact. The plan is an O(strata) "
    "broadcast join; replication is a scan-local explode of "
    "sequence(1, n_copies): zero shuffle on the corpus itself, which "
    "is what makes epoch-upsampling viable at 100 TB (copies are "
    "manufactured where the data lives, never moved).",
    tags=("sampling", "text"),
)
def mixture_apply_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    plan = _mixture_plan_frame(spark, sf_dir).select("lang", "epochs_ppm")
    g = docs.join(F.broadcast(plan), "lang").withColumn(
        "n_copies", F.expr(_MIX_COPIES_TMPL.format(idiv="div"))
    )
    return (
        g.where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), F.col("n_copies").cast("bigint"))
            ).alias("copy_id"),
        )
    )


# --------------------------------------------------- curriculum buckets

CURRICULUM_BUCKETS = 3  # high / mid / low quality tiers


@register(
    "curriculum_quality_buckets",
    oracle=f"""
WITH {QUALITY_SQL_CTES}
SELECT doc_id, lang, quality,
       CAST(ntile({CURRICULUM_BUCKETS}) OVER (
         PARTITION BY lang ORDER BY quality DESC, doc_id ASC
       ) AS BIGINT) AS bucket
FROM quality
""",
    doc=f"Curriculum bucketing: per-language quality {CURRICULUM_BUCKETS}"
    "-tiles (1 = highest) over the doc_quality_score signal — the "
    "data-ordering stage a curriculum-trained run consumes (feed "
    "bucket 1 first, anneal toward 3), and the inverse knob for "
    "quality-pruned pretraining (drop bucket 3). ntile is pure rank "
    "arithmetic over a 6dp-rounded score with a doc_id tiebreak, so "
    "bucket membership is bit-exact across engines. Scale shape: ONE "
    "hash exchange on lang + an in-partition sort; a language is a "
    "coarse partition at 100 TB, so the production twin computes "
    "approx-quantile thresholds per language (one tiny broadcast) and "
    "assigns buckets scan-locally — the stratified_sample_docs "
    "pattern; this exact-rank face is the oracle-gateable form the "
    "twin is validated against (the tumble_median / approx-median "
    "pairing, applied to curriculum).",
    tags=("sampling", "text"),
)
def curriculum_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import doc_quality_score

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    q = doc_quality_score(spark, sf_dir).join(docs, "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), F.asc("doc_id"))
    return q.select(
        "doc_id",
        "lang",
        "quality",
        F.ntile(CURRICULUM_BUCKETS).over(w).cast("long").alias("bucket"),
    )


# ------------------------------------------------ training-shard export

N_EXPORT_SHARDS = 8


@register(
    "export_shard_manifest",
    oracle=f"""
WITH h AS (
  SELECT doc_id, {_HASH_DUCK} AS hkey FROM documents
)
SELECT doc_id,
       CAST(hkey % {N_EXPORT_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY hkey % {N_EXPORT_SHARDS} ORDER BY hkey, doc_id
       ) - 1 AS BIGINT) AS pos
FROM h
""",
    doc="Deterministic training-shard manifest — the dataloader-facing "
    f"EXPORT stage of the sampling family: every document lands in one "
    f"of {N_EXPORT_SHARDS} shards via the engine-proof Knuth hash "
    "(scan-local, ZERO shuffle for the assignment) and gets a "
    "deterministic intra-shard position ordered by (hash, doc_id) — a "
    "reproducible pseudorandom read order, the 'shuffle then shard' "
    "contract a training run consumes. Re-running the export over the "
    "same corpus reproduces byte-identical shards; a grown corpus "
    "never moves an existing doc between shards (assignment depends "
    "only on its own id). Scale shape: ONE hash exchange on the shard "
    "key + an in-partition sort for positions (plan-tested); the "
    "perfectly-balanced ntile alternative is rejected on purpose — it "
    "needs a GLOBAL total order (single-partition window), while "
    "hash-mod spreads 100 TB uniformly to within law-of-large-numbers "
    "noise. Reference anchor: the reference's sink stage "
    "(AlertSink/file sinks) writes unsharded; this is the scale-out "
    "form a corpus export needs.",
    tags=("sampling", "export"),
)
def export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    h = docs.select("doc_id", F.expr(_HASH_SPARK).alias("hkey"))
    w = Window.partitionBy("shard").orderBy(F.asc("hkey"), F.asc("doc_id"))
    return (
        h.withColumn("shard", (F.col("hkey") % N_EXPORT_SHARDS).cast("long"))
        .select(
            "doc_id",
            "shard",
            (F.row_number().over(w) - 1).cast("long").alias("pos"),
        )
    )


@register(
    "export_mixture_shards",
    oracle=f"""
WITH {_MIX_PLAN_CTE_TMPL},
g AS (
  SELECT d.doc_id, d.lang,
         CAST({_MIX_COPIES_TMPL} AS BIGINT) AS n_copies
  FROM documents d JOIN mix_plan USING (lang)
),
m AS (
  SELECT doc_id, lang,
         CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_id
  FROM g WHERE n_copies > 0
),
h AS (
  SELECT doc_id, lang, copy_id,
         ({_HASH_DUCK} + copy_id * {_KNUTH}) % {_MOD} AS hkey
  FROM m
)
SELECT doc_id, lang, copy_id,
       CAST(hkey % {N_EXPORT_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY hkey % {N_EXPORT_SHARDS}
         ORDER BY hkey, doc_id, copy_id
       ) - 1 AS BIGINT) AS pos
FROM h
""".format(idiv="//"),
    doc="The export pipeline COMPOSED: the mixture-materialized corpus "
    "(mixture_apply_docs verbatim — floor-epochs + salted fractional "
    "admission, copies manufactured scan-locally) flows into the "
    "deterministic shard manifest, with every epoch COPY placed "
    "independently (hash key = knuth(doc_id) + copy_id·knuth mod 2³², "
    "pure overflow-free int64 math) so repeated copies of a document "
    "spread across shards and positions — the property an epoch-aware "
    "dataloader needs instead of back-to-back repeats. Same scale "
    "shape as its two stages: broadcast plan join + scan-local "
    "explode, then ONE shard-keyed exchange for positions; "
    "re-exporting reproduces byte-identical shards.",
    tags=("sampling", "export"),
)
def export_mixture_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = mixture_apply_docs(spark, sf_dir)
    h = m.withColumn(
        "hkey",
        (F.expr(_HASH_SPARK) + F.col("copy_id") * F.lit(_KNUTH)) % F.lit(_MOD),
    )
    w = Window.partitionBy("shard").orderBy(
        F.asc("hkey"), F.asc("doc_id"), F.asc("copy_id")
    )
    return (
        h.withColumn("shard", (F.col("hkey") % N_EXPORT_SHARDS).cast("long"))
        .select(
            "doc_id",
            "lang",
            "copy_id",
            "shard",
            (F.row_number().over(w) - 1).cast("long").alias("pos"),
        )
    )
