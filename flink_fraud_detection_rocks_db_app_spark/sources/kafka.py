"""Kafka source — K5 parity.

The reference declares flink-connector-kafka but never wires it
(reference: master/pom.xml, unused dependency). We expose the
equivalent Spark connector behind a capability gate: the kafka
data-source jars are not bundled in this environment, so construction
raises a clear error unless the package is on the classpath. The
mapping into the engine's transaction schema is real and tested at
the plan level where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSACTION_JSON_SCHEMA = T.StructType(
    [
        T.StructField("account_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_transactions(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """JSON transactions from a Kafka topic -> engine schema.

    Raises RuntimeError when the spark-sql-kafka package is absent
    (this container); on a real deployment add
    `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector not on the classpath; launch with "
            "spark-sql-kafka-0-10 to use kafka_transactions()"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), TRANSACTION_JSON_SCHEMA).alias("t")
    )
    return parsed.select(
        F.col("t.account_id").alias("account_id"),
        F.timestamp_millis(F.col("t.ts_ms")).alias("event_time"),
        F.col("t.amount").alias("amount"),
    )
