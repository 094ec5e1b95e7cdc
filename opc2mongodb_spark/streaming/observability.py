"""Observability (SURVEY.md R11) — the reference's per-event console logging
(reference: OPC2MongoDB/Program.cs:40-42 logevent/logread flags, :158, :474)
re-expressed as engine-native metrics:

- ``with_metrics``: attach ``observe()`` aggregates to any (batch or
  streaming) DataFrame — record count, event-time bounds, bad-quality count.
  Zero overhead beyond the aggregates; no per-record Python, no log spam.
- ``ConsoleProgressListener``: a StreamingQueryListener printing one line per
  micro-batch, gated by flags like the reference's logevent/logread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "opc_metrics"


def with_metrics(df: DataFrame, name: str = OBSERVATION_NAME) -> DataFrame:
    """Attach throughput/quality metrics; read them from QueryProgressEvent
    (streaming) or an Observation (batch)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_records"),
        F.min("sourceTimestamp").alias("min_source_ts"),
        F.max("sourceTimestamp").alias("max_source_ts"),
        F.sum(F.when(F.col("quality") != 192, 1).otherwise(0)).alias("n_bad_quality"),
    )


class ConsoleProgressListener(StreamingQueryListener):
    """One line per micro-batch: rows, rates, observed metrics.

    ``log_progress`` / ``log_events`` mirror the reference's logread/logevent
    flags (Program.cs:40-42) — but per batch, not per record.
    """

    def __init__(self, log_progress: bool = True, log_events: bool = False):
        self.log_progress = log_progress
        self.log_events = log_events
        self.progress_rows: list[int] = []  # inspectable by tests

    def onQueryStarted(self, event):
        if self.log_events:
            print(f"[opc2mongodb_spark] query started: {event.id}")

    def onQueryProgress(self, event):
        p = event.progress
        self.progress_rows.append(p.numInputRows)
        if self.log_progress:
            obs = p.observedMetrics.get(OBSERVATION_NAME)
            extra = f" observed={obs}" if obs is not None else ""
            print(
                f"[opc2mongodb_spark] batch={p.batchId} rows={p.numInputRows} "
                f"rate={p.processedRowsPerSecond:.0f}/s{extra}"
            )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        if self.log_events:
            print(f"[opc2mongodb_spark] query terminated: {event.id}")
