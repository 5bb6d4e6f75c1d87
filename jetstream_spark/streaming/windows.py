"""Streaming windowed aggregations + stateful per-key operators.

The reference has no event-time windows (SURVEY §2.2: absent) — these are
the engine's analytical extensions, in their true streaming form (the
batch forms are declared as oracle-checked queries in queries/eventlog.py).

Late data: the reference cannot see late data post-sequencer because
time_us is assigned at ingest (clock.go:51-53) — for the engine's own log
that invariant holds too, so watermarks here matter only for *external*
event-time sources (the `events` stream), where `withWatermark` bounds
state exactly as TTL trim bounds the reference's store (S13 analogy).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts(events: DataFrame, window_size: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window with watermarked state expiry."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("events"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "events",
            "value_sum",
        )
    )


def sliding_counts(events: DataFrame, size: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Sliding window — each event lands in size/slide overlapping windows."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (gap-closed) — the streaming form of the
    oracle-checked batch sessionization query."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("session_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "session_events",
        )
    )


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition: each
    purchase matched to the same user's clicks within [purchase − max_gap,
    purchase]. Watermarks on BOTH sides bound the join state: a click older
    than watermark + max_gap can never match a future purchase, so its
    state row is evicted — state is O(rate × horizon), not unbounded.
    The streaming analogue of the asof/range join family in queries/."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.expr(f"purchase_ts - INTERVAL {max_gap}"))
    )
    return c.join(p, cond, "inner").select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id"), "purchase_ts", "click_ts"
    )


def dedup_stream(events: DataFrame, keys: list[str], watermark_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins; state for a key
    is dropped once the watermark passes it (bounded state — the S13-style
    retention bound applied to dedup state)."""
    return events.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(keys)


# --- stateful per-key monotonic filter (S18's true streaming form) --------------
_STATE_SCHEMA = "max_seq bigint"
_OUT_SCHEMA = "key string, time_us bigint"


def _monotonic_filter_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit only rows with time_us strictly above the key's running max —
    the per-subscriber dedup guarantee (server.go:131-134) carried across
    microbatches in Spark state instead of a Go struct field."""
    (max_seq,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        pdf = pdf.sort_values("time_us")
        out = pdf[pdf["time_us"] > max_seq]
        if len(out):
            max_seq = int(out["time_us"].max())
            yield out[["key", "time_us"]]
    state.update((max_seq,))


def monotonic_per_key(stream: DataFrame) -> DataFrame:
    """stream(key string, time_us long) → rows each key sees at most once,
    strictly increasing per key, surviving restarts via the state store."""
    return stream.groupBy("key").applyInPandasWithState(
        _monotonic_filter_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- the same operator on the Spark 4 transformWithStateInPandas API -------------
def monotonic_per_key_tws(stream: DataFrame) -> DataFrame:
    """S18 on the arbitrary-stateful-processing v2 API
    (transformWithStateInPandas): typed ValueState instead of a tuple
    blob, explicit processor lifecycle, and (unlike applyInPandasWithState)
    support for state TTL and timers — the API the engine would standardize
    on for new stateful operators.

    Runtime requirement: Spark's TWS Python runner speaks protobuf to the
    JVM, so `google.protobuf` must be importable on the workers (absent in
    this container — the test for this operator skips without it; the
    applyInPandasWithState twin above carries the verified behavior)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MonotonicProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._max = handle.getValueState("max_seq", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            mx = self._max.get()[0] if self._max.exists() else 0
            for pdf in rows:
                pdf = pdf.sort_values("time_us")
                out = pdf[pdf["time_us"] > mx]
                if len(out):
                    mx = int(out["time_us"].max())
                    yield out[["key", "time_us"]]
            self._max.update((mx,))

        def close(self) -> None:
            pass

    return stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=MonotonicProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
