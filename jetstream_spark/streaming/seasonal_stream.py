"""Streaming seasonal-anomaly monitor — the pattern-break member of the
standing monitoring ladder (rate_anomaly = spikes, THIS = breaks of the
diurnal pattern, cusum = slow drift).

Like the CUSUM monitor it owns NO state of its own: the STL-lite
decomposition consumes exactly the (event_type, hb, n) hourly-count
frame the rate-anomaly monitor maintains, and the probe runs the SAME
`decompose_seasonal` core as the batch `seasonal_anomaly` query
(queries/eventlog.py), so the standing monitor and the declared
operator can never disagree — asserted in tests.

At 100 TB: the probe's input is |types| × |hours| rows regardless of
event volume; all ingest-side cost is owned by the shared hourly state
and amortized across the three monitors reading it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jetstream_spark.queries.eventlog import decompose_seasonal
from jetstream_spark.streaming.anomaly_stream import read_hourly_counts


def detect_seasonal_anomalies(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current decomposition + 3σ flags over everything the monitor has
    seen — the batch `seasonal_anomaly` semantics applied to the merged
    hourly-count state."""
    return decompose_seasonal(read_hourly_counts(spark, state_dir))
