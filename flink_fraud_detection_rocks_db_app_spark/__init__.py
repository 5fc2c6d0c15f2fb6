"""PySpark-native analytics/streaming engine with the query and
data-processing capabilities of nirbhay221/Flink-Fraud-Detection-Rocks-DB-App
(reference read-only at /root/reference/), re-expressed Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, Structured
Streaming with the RocksDB state store for the stateful paths.
"""

from .registry import all_queries, get, register  # noqa: F401
