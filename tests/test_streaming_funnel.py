"""Streaming strict-funnel monitor: the state-store fold over per-user
(stage, last_us) must converge to exactly the batch operator's
funnel_user_stages over all events seen — across batches, across a
cross-batch strict-sequencing boundary, and across a query restart from
the checkpoint."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from jetstream_spark.queries.eventlog import _FUNNEL_STEPS, funnel_user_stages
from jetstream_spark.streaming.funnel_stream import (
    current_stages,
    funnel_counts,
    funnel_stage_stream,
)

SCHEMA = "user_id bigint, ts string, event_type string"


def _write(src: str, tag: str, rows) -> None:
    with open(os.path.join(src, f"{tag}.jsonl"), "w") as f:
        for user_id, ts, et in rows:
            f.write(json.dumps({"user_id": user_id, "ts": ts, "event_type": et}) + "\n")


def _batch_frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )


# user 1: full funnel split ACROSS batches (view+click in b1, purchase b2)
# user 2: purchase BEFORE click — must stall at stage 1 (view only) in b1,
#         then a post-click purchase in b2 completes it
# user 3: click at the EXACT ts of its view — strict > must reject it,
#         a later click (b2) advances
# user 4: only noise event types — never enters the state
# user 5: view in b2 only — stage 1, emitted on first sight
B1 = [
    (1, "2024-03-01T10:00:00", "view"),
    (1, "2024-03-01T10:05:00", "click"),
    (2, "2024-03-01T09:00:00", "purchase"),
    (2, "2024-03-01T09:30:00", "view"),
    (3, "2024-03-01T08:00:00", "view"),
    (3, "2024-03-01T08:00:00", "click"),  # same ts as the view: rejected
    (4, "2024-03-01T07:00:00", "error"),
]
B2 = [
    (1, "2024-03-02T11:00:00", "purchase"),
    (2, "2024-03-02T09:00:00", "click"),
    (2, "2024-03-02T09:10:00", "purchase"),
    (3, "2024-03-02T08:30:00", "click"),
    (5, "2024-03-02T12:00:00", "view"),
]


def _start(spark, src, ck, out):
    """Parquet file sink: unlike the memory sink it supports restart from
    the checkpoint — the property under test."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    )
    return (
        funnel_stage_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )


def test_funnel_monitor_equals_batch_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ck = str(tmp_path / "ck")

    out = str(tmp_path / "emitted")
    _write(src, "b1", B1)
    q = _start(spark, src, ck, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got1 = {
        r["user_id"]: r["stage"]
        for r in current_stages(spark.read.parquet(out)).collect()
    }
    want1 = {
        r["user_id"]: r["stage"]
        for r in funnel_user_stages(_batch_frame(spark, B1)).collect()
    }
    assert got1 == want1 == {1: 2, 2: 1, 3: 1}
    # noise-only user 4 is outside the pool in BOTH forms
    assert 4 not in got1

    # restart from the checkpoint: state must survive the process boundary
    _write(src, "b2", B2)
    q = _start(spark, src, ck, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = spark.read.parquet(out)
    got = {r["user_id"]: r["stage"] for r in current_stages(emitted).collect()}
    want = {
        r["user_id"]: r["stage"]
        for r in funnel_user_stages(_batch_frame(spark, B1 + B2)).collect()
    }
    assert got == want == {1: 3, 2: 3, 3: 2, 5: 1}

    # cross-batch strictness specifics the map-equality already proves,
    # pinned explicitly for the reader:
    assert got[2] == 3, "pre-click purchase must not satisfy stage 3"
    assert got[3] == 2, "same-ts click must be rejected; later click advances"

    # step-count report matches the batch operator's monotone shape
    counts = {
        r["step_no"]: r["n_users"]
        for r in funnel_counts(current_stages(emitted)).collect()
    }
    assert counts == {1: 4, 2: 3, 3: 2}
