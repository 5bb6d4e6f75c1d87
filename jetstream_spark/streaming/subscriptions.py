"""M4 — live subscription delivery with replay→live cutover (S15-S20, H2).

A subscriber session is the reference's HandleSubscribe lifecycle
(server.go:240-356) re-expressed:

  1. parse+validate → Subscription (S21, subscribe.py)
  2. if cursor set: batch replay LOOP over the persisted log — each round
     scans [cursor, head], applies filters + the monotonic seq guard,
     advances the cursor, and re-checks distance to the live head
     (server.go:305-337);
  3. once within the cutover threshold, attach to the live stream: a
     streaming query over the log directory (the log is the serialized
     single-writer order, so tailing it preserves total order) with the
     same filter stack; the seq guard makes the handover gapless and
     duplicate-free (S18) — overlap between the last replay round and the
     stream's first batch is filtered, exactly like server.go:131-134.

Delivery lands in per-subscriber sinks (in tests: memory sink / collected
lists; in prod: the websocket edge, which is outside Spark — H4). The
wire frame (S16) is computed once upstream via to_wire.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from jetstream_spark.atproto.subscribe import Subscription
from jetstream_spark.atproto.wire import to_wire


def _default_batch_limit() -> int:
    """One second of replay at the contract rate: 10× the per-subscriber
    live ceiling (persist.go:149's playback multiplier over main.go:79-84's
    5k/s) — bounds per-round driver materialization to the same contract."""
    from jetstream_spark.serving.edge import MAX_SUB_RATE, PLAYBACK_MULT

    return int(MAX_SUB_RATE * PLAYBACK_MULT)


class ReplayPacer:
    """persist.go:149 analogue, ENGINE-side: the replay loop itself is paced
    at the playback rate (a synchronous token bucket, burst = one second),
    so the per-subscriber replay ceiling holds even if the serving edge —
    whose asyncio TokenBucket normally owns pacing — is bypassed and the
    engine is driven directly."""

    def __init__(self, rate_per_s: float):
        self.rate = float(rate_per_s)
        self.tokens = self.rate
        self.last = time.monotonic()

    def wait(self, n: int) -> None:
        if self.rate <= 0 or self.rate == float("inf"):
            return
        while True:
            now = time.monotonic()
            self.tokens = min(self.rate, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= n:
                self.tokens -= n
                return
            time.sleep(min(1.0, (n - self.tokens) / self.rate))


def backfill(
    spark: SparkSession,
    log_dir: str,
    sub: Subscription,
    server_head_us: Callable[[], int],
    deliver: Callable[[list], None],
    max_rounds: int = 100,
    batch_limit: int | None = None,
    rate_per_s: float | None = None,
) -> int:
    """Replay loop (server.go:305-337): scan from cursor, deliver, advance,
    until within the cutover window of the live head. Returns delivered count.

    Two limiter layers, matching the reference: batch_limit bounds how much
    one round materializes on the driver, and rate_per_s paces the loop
    itself (persist.go:149's playback limiter, default 10× the live
    per-subscriber ceiling) — the engine holds the replay-rate contract
    even when the edge's per-connection limiter is bypassed.
    """
    if batch_limit is None:
        batch_limit = _default_batch_limit()
    if rate_per_s is None:
        rate_per_s = float(_default_batch_limit())
    pacer = ReplayPacer(rate_per_s)
    delivered = 0
    for _ in range(max_rounds):
        # replay_rows: a compaction swap landing mid-chunk surfaces as a
        # missing-file task error (read_log keeps mid-swap buckets visible
        # via their aside copy, so loss is impossible) -> re-plan + retry;
        # the cursor advances only after a delivered chunk, so the retry
        # is exactly-once
        from jetstream_spark.atproto.log import replay_rows

        batch = replay_rows(
            spark,
            log_dir,
            lambda: to_wire(sub.replay_batch(spark, log_dir).limit(batch_limit)).orderBy("time_us"),
        )
        if batch:
            pacer.wait(len(batch))
            deliver(batch)
            delivered += len(batch)
            sub.advance(batch[-1]["time_us"])
        if sub.caught_up(server_head_us()) or not batch:
            break
    return delivered


def start_subscription(
    spark: SparkSession,
    log_dir: str,
    sub: Subscription,
    server_head_us: Callable[[], int],
    deliver: Callable[[list], None],
    checkpoint_dir: str,
    batch_limit: int | None = None,
    rate_per_s: float | None = None,
) -> StreamingQuery:
    """Full lifecycle: backfill (if cursor set) then live tail.

    The live tail streams the log directory, but parquet part-files are
    discovered in file order, not time order — a single appended ingest
    batch can straddle two triggers, which would make a naive
    deliver-the-microbatch loop drop the late files at the monotonic
    guard. So the microbatch is used as a TICK: each trigger delivers an
    ordered incremental replay (sub.seq, last_committed_time_us] — the
    sequencer state is written only after its batch is fully in the log
    (log.py ingest_batch), so that upper bound is a consistent snapshot.
    Gapless + duplicate-free delivery follows from the seq guard exactly
    as in the reference (server.go:131-134); ordering comes from the
    replay sort, mirroring how the reference's live path inherits the
    sequencer's single-writer order (§3.1).
    """
    from jetstream_spark.atproto import log as eventlog
    from jetstream_spark.atproto.sequencer import SequencerState

    if batch_limit is None:
        batch_limit = _default_batch_limit()
    if rate_per_s is None:
        rate_per_s = float(_default_batch_limit())
    if sub.cursor is not None:
        backfill(
            spark, log_dir, sub, server_head_us, deliver,
            batch_limit=batch_limit, rate_per_s=rate_per_s,
        )
    pacer = ReplayPacer(rate_per_s)  # shared across ticks: one contract per subscriber
    # minimal tick stream: only new-file arrival matters, so read just the
    # cheapest column — the delivery query below re-reads with pruning.
    # ignoreMissingFiles: the tick's FIRST trigger lists every existing
    # file, so a TTL trim landing between that listing and the read would
    # otherwise kill the subscriber's query over data nobody reads (the
    # tick is a heartbeat; delivery is the seq-guarded replay re-read in
    # handle). Deliberately NOT set on the replay/backfill batch reads:
    # there a vanished file can be a mid-compaction swap whose data lives
    # on at the aside copy, and silently skipping it would lose events —
    # the replay_rows re-plan retry is the correct tool on that path.
    tick = (
        spark.readStream.schema("time_us bigint, hour_bucket bigint")
        .option("maxFilesPerTrigger", 1000)
        .option("ignoreMissingFiles", "true")
        .parquet(log_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # bounded rounds, like backfill: a subscriber far behind head (or a
        # huge append landing in one tick) must not collect an unbounded
        # backlog to the driver in one go — each round materializes at most
        # batch_limit rows (TakeOrderedAndProject, executor-side top-k) and
        # advances the watermark before the next round
        hi = SequencerState.load(log_dir).last_time_us
        while sub.seq < hi:
            # compaction-swap retry: see backfill. The frame MUST be built
            # INSIDE the retry lambda — a pre-built frame pins the pre-swap
            # InMemoryFileIndex file listing, and refreshByPath only
            # invalidates the cache for FUTURE listings, so every retry of
            # a captured frame would re-fail on the same vanished files
            # (ADVICE r8: the backfill path already rebuilt per-attempt;
            # this path didn't).
            rows = eventlog.replay_rows(
                spark,
                log_dir,
                lambda: to_wire(
                    eventlog.replay(
                        spark,
                        log_dir,
                        cursor=sub.seq + 1,
                        wanted_collections=sub.wanted_collections or None,
                        wanted_dids=sub.wanted_dids or None,
                    ).where(F.col("time_us") <= hi)
                )
                .orderBy("time_us")
                .limit(batch_limit),
            )
            if not rows:
                break
            pacer.wait(len(rows))
            deliver(rows)
            sub.advance(rows[-1]["time_us"])

    return (
        tick.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
