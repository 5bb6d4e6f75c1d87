"""Streaming CUSUM drift monitor — the slow-drift member of the standing
monitoring ladder (rate_anomaly = spikes, seasonal profile = pattern
breaks, CUSUM = level shifts).

It owns NO state of its own: daily counts are the day-rollup of the
hourly counts the rate-anomaly monitor already maintains (counts are
additive, so the rollup of the merged state equals the one-shot daily
counts over every event seen — the same additivity argument, one level
up). The drift probe runs the SAME flagging core as the batch
`cusum_changepoint` query (queries/eventlog.py::flag_cusum_drift) over
that rollup, so the standing monitor and the declared operator can
never disagree — asserted against the batch core in tests.

At 100 TB: the probe's input is |types| × |days| rows regardless of
event volume; the expensive part (per-batch count shuffles, state
compaction, TTL of old buckets) is owned by the shared hourly state and
amortized across all three monitors reading it.

Reference parity anchor: the reference's liveness/throughput monitors
(SURVEY.md S26/S27) watch instantaneous rates; this adds the sequential
test for gradual decay they cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.queries.eventlog import flag_cusum_drift
from jetstream_spark.streaming.anomaly_stream import read_hourly_counts


def read_daily_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """(event_type, day, n) rolled up from the shared hourly-count state;
    equal to one-shot daily counts of every event seen."""
    hourly = read_hourly_counts(spark, state_dir)
    return hourly.groupBy(
        "event_type", F.date_trunc("day", "hb").alias("day")
    ).agg(F.sum("n").alias("n"))


def detect_drift(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current CUSUM drift table over everything the monitor has seen —
    the batch `cusum_changepoint` semantics applied to the rolled-up
    state."""
    return flag_cusum_drift(read_daily_counts(spark, state_dir))
