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
