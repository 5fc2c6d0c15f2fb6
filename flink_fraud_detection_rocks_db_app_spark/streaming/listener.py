"""Observability matching the reference's Prometheus gauges (K3/K4).

The reference computes latency = duration_ms / numEvents and
throughput = numEvents / duration_s at job end
(reference: GraphSolution-Prometheus-SlidingWindows/src/main/java/spendreport/FraudDetectionJob.java:173-191)
and per-operator gauges every 100 records
(reference: CustomWindowAssigner/metrics/src/main/java/spendreport/FraudDetector1.java:36-78).

Spark's StreamingQueryListener provides the same numbers per
micro-batch (numInputRows, durationMs, processedRowsPerSecond); this
listener accumulates them and reports the reference's two metrics with
identical definitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class JobMetrics:
    num_events: int = 0
    duration_ms: float = 0.0
    batches: int = 0
    rows_per_sec: list[float] = field(default_factory=list)

    @property
    def latency_ms_per_event(self) -> float:
        """Reference definition: duration_ms / numEvents."""
        return self.duration_ms / self.num_events if self.num_events else 0.0

    @property
    def throughput_events_per_sec(self) -> float:
        """Reference definition: numEvents / duration_s."""
        return self.num_events / (self.duration_ms / 1000.0) if self.duration_ms else 0.0


def with_event_count(df, name: str = "source_metrics"):
    """K4 parity: the reference counts events inside its watermark
    extractor via an accumulator-style gauge
    (reference: GraphSolution-Prometheus-SlidingWindows/src/main/java/spendreport/FraudDetectionJob.java:90-98,193-203).
    Spark's `observe()` attaches the counter to the plan itself; the
    numbers surface in QueryProgress.observedMetrics per batch (and in
    batch query execution listeners).
    """
    from pyspark.sql import functions as F

    return df.observe(name, F.count(F.lit(1)).alias("n_events"))


class MetricsListener(StreamingQueryListener):
    """Accumulates per-batch progress into reference-style metrics."""

    def __init__(self) -> None:
        self.metrics = JobMetrics()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.metrics.num_events += p.numInputRows
        self.metrics.duration_ms += p.durationMs.get("triggerExecution", 0)
        self.metrics.batches += 1
        if p.processedRowsPerSecond:
            self.metrics.rows_per_sec.append(p.processedRowsPerSecond)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
