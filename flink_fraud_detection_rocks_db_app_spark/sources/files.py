"""File-format ingestion beyond parquet: JSON-lines and CSV readers
with EXPLICIT schemas.

Training corpora overwhelmingly arrive as JSONL (one document per
line) and operational exports as CSV; an engine that only reads
parquet makes the user run a separate conversion job. These loaders
make the formats first-class while keeping the 100 TB discipline:

- schemas are DECLARED, never inferred — schema inference is an extra
  full pass over the data before the real read (Spark samples JSON/CSV
  exhaustively by default), which at corpus scale doubles the scan;
- `columnNameOfCorruptRecord` quarantines malformed lines into a
  `_corrupt` column instead of failing the job (PERMISSIVE mode), so
  one bad line in a 100 TB drop doesn't kill the pipeline — callers
  split good/bad with `quarantine()`;
- readers return the same column names/types as the parquet fixtures,
  so every registered operator runs unchanged on JSONL/CSV input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)

TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("account_id", T.LongType()),
        T.StructField("event_time", T.TimestampNTZType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def jsonl_documents(spark: SparkSession, path: str) -> DataFrame:
    """documents table from JSON-lines; malformed lines land in
    `_corrupt` instead of failing the read."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def csv_transactions(spark: SparkSession, path: str) -> DataFrame:
    """transactions from headered CSV with an ISO-8601 event_time."""
    return (
        spark.read.schema(TRANSACTIONS_SCHEMA)
        .option("header", "true")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, corrupt) — clean rows drop
    the `_corrupt` column; corrupt rows keep every column (nulls plus
    the raw line). The bad side deliberately does NOT project down to
    `_corrupt` alone: Spark refuses plans over raw JSON/CSV whose only
    referenced column is the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    aggregate it after a write/persist — which is what a quarantine
    sink does anyway."""
    clean = df.where(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.where(F.col("_corrupt").isNotNull())
    return clean, bad


# ------------------------------------------------------- more formats

# Columnar alternative to parquet. ORC is built into Spark; the reader
# gets the same predicate-pushdown / column-pruning treatment from the
# data source framework, so every registered operator runs unchanged on
# an ORC lake.


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """Avro is an EXTERNAL Spark module (spark-avro jar); this container
    ships core Spark only. Capability-gated like the Kafka connector:
    honest failure now, zero code change when the jar is on the
    classpath."""
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
        return True  # pragma: no cover - jar present and path existed
    except Exception as ex:  # noqa: BLE001
        return "Failed to find data source: avro" not in str(ex)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise RuntimeError(
            "the spark-avro module is not on the classpath; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    return spark.read.format("avro").load(path)  # pragma: no cover


def text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Raw text files -> documents-shaped frame, one document per line.
    doc_id is the xxhash64 of the line content — a deterministic
    content-derived ID (what corpus pipelines use), not a partition-
    dependent monotonically_increasing_id that would renumber on every
    repartition. Duplicate lines therefore share an ID, which is
    exactly what the downstream exact-dedup stage wants."""
    return spark.read.text(path).select(
        F.xxhash64("value").alias("doc_id"),
        F.col("value").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit("text").alias("source"),
        F.length("value").cast("long").alias("n_chars"),
    )


def binary_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Opaque media files -> multimodal-shaped frame via Spark's
    binaryFile source: payload stays a binary column (never decoded on
    the driver), media_type comes from the extension, media_id from the
    path hash. Feeds operators/multimodal.py unchanged. binaryFile
    prunes the `content` column if the query doesn't reference it, so
    metadata-only queries never read the bytes."""
    bf = spark.read.format("binaryFile").load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    return bf.select(
        F.xxhash64("path").alias("media_id"),
        ext.alias("media_type"),
        F.col("length").cast("long").alias("n_bytes"),
        F.col("content").alias("payload"),
        F.col("path").alias("uri"),
    )
