"""Streaming observability: a StreamingQueryListener that collects per-batch
progress metrics — the ops-grade generalization of the reference's T8
latency column (spark_streaming.py:109-116, which bakes one wall-clock
latency number into every output row; here the engine-level numbers come
from Spark's own progress events instead, without touching the data plan).

Captured per micro-batch: input rows, processed rows/sec, batch duration,
watermark, and per-stateful-operator state-store row counts — the numbers
needed to answer the two 100 TB ops questions: "is the stream keeping up?"
(processedRowsPerSecond vs input rate) and "is state bounded?"
(state rows must plateau once the watermark advances)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetrics:
    query_id: str
    batch_id: int
    num_input_rows: int
    processed_rows_per_second: float
    batch_duration_ms: int
    watermark: str
    state_rows: int
    # Full durationMs map from the progress event (addBatch, getBatch,
    # latestOffset, queryPlanning, walCommit, commitOffsets,
    # triggerExecution, ...) — addBatch is the per-batch COMPUTE; the rest
    # is micro-batch scheduling/checkpoint overhead. Separating the two is
    # what lets a bench distinguish "the plan got slower" from "the
    # machine's checkpoint/WAL overhead moved" (r5 verdict #1).
    duration_breakdown_ms: dict = field(default_factory=dict)


@dataclass
class MetricsCollector:
    """In-memory sink for progress events (driver-side, bounded by
    ``max_batches`` retained)."""

    max_batches: int = 1000
    batches: list[BatchMetrics] = field(default_factory=list)

    def record(self, progress) -> None:
        state_rows = sum(
            (op.get("numRowsTotal") or 0) for op in (progress.get("stateOperators") or [])
        )
        self.batches.append(
            BatchMetrics(
                query_id=str(progress.get("id")),
                batch_id=int(progress.get("batchId", -1)),
                num_input_rows=int(progress.get("numInputRows") or 0),
                processed_rows_per_second=float(
                    progress.get("processedRowsPerSecond") or 0.0
                ),
                batch_duration_ms=int(
                    (progress.get("durationMs") or {}).get("triggerExecution") or 0
                ),
                watermark=str((progress.get("eventTime") or {}).get("watermark", "")),
                state_rows=state_rows,
                duration_breakdown_ms={
                    k: int(v)
                    for k, v in (progress.get("durationMs") or {}).items()
                },
            )
        )
        if len(self.batches) > self.max_batches:
            del self.batches[: -self.max_batches]

    @property
    def total_input_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)

    def summary(self) -> dict:
        if not self.batches:
            return {"batches": 0}
        durs = [b.batch_duration_ms for b in self.batches]
        adds = [
            b.duration_breakdown_ms.get("addBatch", 0) for b in self.batches
        ]
        return {
            "batches": len(self.batches),
            "total_input_rows": self.total_input_rows,
            "mean_batch_ms": sum(durs) / len(durs),
            "max_batch_ms": max(durs),
            "mean_add_batch_ms": sum(adds) / len(adds),
            "final_state_rows": self.batches[-1].state_rows,
        }


class ProgressListener(StreamingQueryListener):
    def __init__(self, collector: MetricsCollector):
        self.collector = collector

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        # event.progress is a StreamingQueryProgress; its json dict form is
        # version-stable, so metrics are read from that
        import json

        self.collector.record(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_metrics(spark: SparkSession, max_batches: int = 1000):
    """Attach a progress listener; returns (collector, detach_fn)."""
    collector = MetricsCollector(max_batches=max_batches)
    listener = ProgressListener(collector)
    spark.streams.addListener(listener)
    return collector, lambda: spark.streams.removeListener(listener)
