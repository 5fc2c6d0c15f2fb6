"""Table loaders for the driver-generated parquet fixtures.

The reference's stream of `Transaction{accountId, timestamp, amount}`
(reference: master/src/main/java/InorderTumblingWindow/TransactionStreamSource.java:24-36)
maps onto the driver's `events` table as
`user_id -> account_id, ts -> event_time, value -> amount` (FIXTURES.md §1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-session memo of the LAZY fixture DataFrames (r14 optimization
# round). Resolving a parquet source (file listing + footer schema
# read + relation build) costs ~0.2 s of driver time per call even
# warm, and a bench/parity session re-resolves the same ~10 read-only
# files hundreds of times (~2 loads x 155 rows x min-of-2). The memo
# returns the SAME lazy DataFrame — a plan, not data: every action
# still scans the parquet inputs, so nothing here caches results
# (the same reuse a session-scoped temp view would give). Keyed on
# (absolute path, mtime_ns, size, inode, file count), so a regenerated
# fixture — the test-suite tmp fixtures rewrite paths in place — keys
# a fresh relation instead of serving a stale file listing even when
# the rewrite lands within the filesystem's timestamp granularity
# (ADVICE r14: copy2 preserves mtimes; size/ino are the second change
# signal). The memo dict hangs OFF THE SESSION OBJECT itself — not a
# module-level WeakKeyDictionary, whose entries would never die
# because the memoized DataFrames strongly reference their session
# (the documented WeakKeyDictionary caveat, ADVICE r14). As a plain
# attribute, session -> memo -> DataFrame -> session is an ordinary
# reference cycle the GC collects once the caller drops the session.


def _plan_memo(spark: SparkSession) -> dict:
    memo = getattr(spark, "_graft_plan_memo", None)
    if memo is None:
        memo = {}
        spark._graft_plan_memo = memo
    return memo


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table; `events.ts` is normalized to the canonical
    contract REGARDLESS of the fixture's physical type.

    Contract: downstream code always sees ``ts`` as an epoch-NANOSECOND
    BIGINT (the round-1 physical format). The driver has shipped the
    column as parquet TIMESTAMP(NANOS) (read as long via the
    nanosAsLong flag) and as timestamp[us] (read natively as
    TIMESTAMP_NTZ); adapting *here* — the single choke point every
    events read goes through — keeps the 12+ downstream ``ts div``
    arithmetic sites oblivious to physical-type drift.

    Each branch is TIMEZONE-FREE by construction (the driver runs a
    vanilla session with the host's timezone, so nothing here may
    depend on spark.sql.session.timeZone):
    - TIMESTAMP_NTZ (current fixtures): ``timestampdiff(MICROSECOND,
      NTZ-epoch, ts)`` is pure wall-clock arithmetic — parity-probed
      bit-identical to DuckDB ``epoch_us(ts)`` under America/New_York.
      (A ``cast("timestamp")`` here would shift every instant by the
      session offset — the rejected first draft of this fix.)
    - TIMESTAMP (LTZ, future-proofing): ``unix_micros`` reads the
      instant directly, no zone involved.
    - BIGINT (round-1 nanos physical type): passthrough.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.abspath(f"{sf_dir}/{name}.parquet")
    try:
        st = os.stat(path)
        mt, size, ino, count = st.st_mtime_ns, st.st_size, st.st_ino, 1
        if os.path.isdir(path):
            # dir mtime misses an in-place part rewrite, and a rewrite
            # inside a nested partition subdir changes neither the top
            # dir's mtime nor its entry list; walk the whole tree
            # (fixtures are a handful of files — still no Spark work)
            for root, _dirs, files in os.walk(path):
                for fname in files:
                    fst = os.stat(os.path.join(root, fname))
                    mt = max(mt, fst.st_mtime_ns)
                    size += fst.st_size
                    count += 1
    except OSError:
        mt, size, ino, count = -1, -1, -1, -1  # absent: spark.read raises below
    memo = _plan_memo(spark)
    cached = memo.get((path, mt, size, ino, count))
    if cached is not None:
        return cached
    if name == "events":
        # Harmless for non-nano physical types; required if the driver
        # ever regenerates events.ts as TIMESTAMP(NANOS) again.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dtype = dict(df.dtypes).get("ts")
        if dtype == "timestamp_ntz":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"
                ),
            )
        elif dtype == "timestamp":
            df = df.withColumn("ts", F.unix_micros(F.col("ts")) * F.lit(1000))
        elif dtype != "bigint":
            raise TypeError(
                f"events.ts arrived as unsupported dtype {dtype!r}; "
                "extend fixtures.load() for this physical type"
            )
    elif name == "embeddings":
        # Same drift-probe idea for the vector column: every consumer
        # casts elements to DOUBLE on BOTH engines (similarity.py uses
        # `transform(embedding, x -> CAST(x AS DOUBLE))` / `::DOUBLE[]`),
        # so float<->double physical drift is semantically neutral —
        # float->double widening is exact and a double fixture is read
        # natively by both. Anything else (decimal, binary, string)
        # needs a new adapter; fail HERE with the type in the message,
        # not one `zip_with` deep in a similarity query.
        dtype = dict(df.dtypes).get("embedding")
        if dtype not in ("array<float>", "array<double>"):
            raise TypeError(
                f"embeddings.embedding arrived as unsupported dtype {dtype!r}; "
                "extend fixtures.load() for this physical type"
            )
    memo[(path, mt, size, ino, count)] = df
    return df


def transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard projection every reference pipeline starts with.

    Mirrors the `TimestampAssigner` Tuple3 projection
    (reference: master/src/main/java/InorderTumblingWindow/FraudDetectionJob.java:239-252).
    Only 3 of 6 columns are selected, so Catalyst prunes the parquet
    scan to exactly these columns (verified in tests/test_plans.py).

    Timestamp handling: ``ts`` arrives as epoch-nanosecond longs (see
    `load`); ``timestamp_micros(ts div 1000)`` rebuilds a TimestampType
    from the absolute microsecond instant with no session-timezone
    involvement, so window arithmetic matches the DuckDB oracle's
    ``epoch_ms``/``epoch_us`` integer math bit-for-bit (both floor).
    """
    return load(spark, sf_dir, "events").select(
        F.col("user_id").alias("account_id"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
        F.col("value").alias("amount"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (plus the
    `transactions` projection) so the full engine surface is reachable
    from plain `spark.sql(...)` — the SQL face of the query catalog."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    transactions(spark, sf_dir).createOrReplaceTempView("transactions")


def transactions_with_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`transactions` plus event_id, the deterministic order tiebreak
    used by the order-sensitive stateful folds (FIXTURES.md §3)."""
    return load(spark, sf_dir, "events").select(
        F.col("user_id").alias("account_id"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
        F.col("value").alias("amount"),
        "event_id",
    )
