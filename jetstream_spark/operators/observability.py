"""S26/S27 — pipeline conservation metrics and liveness supervision.

The reference instruments every stage with Prometheus counters
(pkg/consumer/metrics.go:8-57: processed → sequenced → persisted →
emitted) and crashes the process when the head stalls 15 s
(cmd/jetstream/main.go:184-214). Spark-side equivalents:

- `with_stage_metrics` — `df.observe()` named counters evaluated inline
  with the job (no extra pass), matching the reference's counter names.
- `LivenessMonitor` — a `StreamingQueryListener` that tracks per-query
  progress; `stalled()` reports queries whose head hasn't advanced
  within the window (the supervisor decides the restart policy, exactly
  as the container restart does for the reference).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

STALL_LIMIT_S = 15  # main.go:188


def with_stage_metrics(df: DataFrame, stage: str) -> tuple[DataFrame, Observation]:
    """Attach conservation counters to a batch stage. Read them after the
    action: obs.get → {'events_processed': n, 'bytes_estimate': b}."""
    obs = Observation(f"jetstream_{stage}")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("events_processed"),
        F.sum(F.length(F.to_json(F.struct(*[F.col(c) for c in df.columns])))).alias("bytes_estimate"),
    )
    return observed, obs


class LivenessMonitor(StreamingQueryListener):
    """Tracks last-progress wall time + rows/sec per streaming query."""

    def __init__(self, stall_limit_s: float = STALL_LIMIT_S):
        self.stall_limit_s = stall_limit_s
        self.last_progress: dict[str, float] = {}
        self.rows_per_sec: dict[str, float] = {}

    def onQueryStarted(self, event) -> None:
        self.last_progress[event.id] = time.time()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.last_progress[p.id] = time.time()
        self.rows_per_sec[p.id] = p.processedRowsPerSecond or 0.0

    def onQueryIdle(self, event) -> None:
        # idle-but-alive counts as progress (no data ≠ stalled)
        self.last_progress[event.id] = time.time()

    def onQueryTerminated(self, event) -> None:
        self.last_progress.pop(event.id, None)
        self.rows_per_sec.pop(event.id, None)

    def stalled(self) -> list[str]:
        now = time.time()
        return [qid for qid, t in self.last_progress.items() if now - t > self.stall_limit_s]
