"""Custom Spark Python DataSource for synthetic transactions — the
Spark-4-native counterpart of the reference's hand-written
SourceFunction pair (canned TransactionSource / rate-limited
TransactionStreamSource, reference:
master/src/main/java/InorderTumblingWindow/TransactionStreamSource.java:24-36).

Where the reference implements `run(SourceContext)` + `cancel()`, the
Spark idiom is the DataSource V2 Python API (Spark 4): one class
registered once (`spark.dataSource.register`) serves BOTH
`spark.read.format("fraud_transactions")` and
`spark.readStream.format("fraud_transactions")`.

Design points:

- **Deterministic**: rows derive from a splitmix64 hash of
  (seed, index) — no unseeded Random like the reference, so tests and
  replays are exactly reproducible, and the batch and stream forms
  emit the IDENTICAL sequence (stream offset n == batch row n).
- **Partition-parallel batch**: each InputPartition generates its own
  index range on its executor; nothing materializes on the driver, so
  n_rows scales to whatever the cluster can hold.
- **Streaming offsets**: the stream reader tracks a single integer
  offset; `readBetweenOffsets` regenerates any range on demand, which
  makes replay after failure exact (the reference's source can't
  replay — its data dies with the Random). The Simple stream reader
  runs driver-side, which is the right trade for a rate-limited
  source: generation is trivial, the heavy operators downstream still
  fan out.
- 10 ev/s parity: event_time advances 100 ms per row from `base_ts`,
  matching the reference's Thread.sleep(100) cadence.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_M64 = (1 << 64) - 1
SCHEMA = "account_id bigint, event_time timestamp_ntz, amount double, event_id bigint"
_EPOCH = _dt.datetime(1997, 1, 1)  # inside the fixture's date range


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def _row(i: int, seed: int, n_accounts: int, max_amount: float):
    h = _splitmix64(seed ^ i)
    account = h % n_accounts
    amount = ((h >> 20) % 1_000_000) / 1_000_000.0 * max_amount
    ts = _EPOCH + _dt.timedelta(milliseconds=100 * i)
    return (account, ts, amount, i)


class _Opts:
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.n_accounts = int(options.get("n_accounts", 10))
        self.max_amount = float(options.get("max_amount", 1000.0))
        self.n_rows = int(options.get("n_rows", 1000))
        self.partitions = int(options.get("partitions", 4))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class FraudTransactionsReader(DataSourceReader):
    def __init__(self, options):
        self.o = _Opts(options)

    def partitions(self):
        o = self.o
        per = -(-o.n_rows // o.partitions)  # ceil
        return [
            _RangePartition(lo, min(lo + per, o.n_rows))
            for lo in range(0, o.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        o = self.o
        for i in range(partition.start, partition.end):
            yield _row(i, o.seed, o.n_accounts, o.max_amount)


class FraudTransactionsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.o = _Opts(options)

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start: dict):
        o = self.o
        pos = start["pos"]
        end = pos + o.rows_per_batch
        rows = [_row(i, o.seed, o.n_accounts, o.max_amount) for i in range(pos, end)]
        return (iter(rows), {"pos": end})

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        o = self.o
        return iter(
            _row(i, o.seed, o.n_accounts, o.max_amount)
            for i in range(start["pos"], end["pos"])
        )


class FraudTransactionsDataSource(DataSource):
    """format("fraud_transactions") — batch and streaming."""

    @classmethod
    def name(cls) -> str:
        return "fraud_transactions"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> FraudTransactionsReader:
        return FraudTransactionsReader(self.options)

    def simpleStreamReader(self, schema) -> FraudTransactionsStreamReader:
        return FraudTransactionsStreamReader(self.options)


def register_fraud_source(spark) -> None:
    spark.dataSource.register(FraudTransactionsDataSource)
