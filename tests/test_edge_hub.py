"""E2E: serving edge fed by the SHARED streaming live tail (LiveTailHub) —
S15 replay→live cutover + S18 monotonic guard, exercised under concurrent
writes (the reference's single-live-pipeline topology, server.go:187-238)."""

from __future__ import annotations

import http.client
import json
import threading
import time

import pytest

from jetstream_spark.atproto import log as eventlog
from jetstream_spark.atproto.normalize import normalize_frames
from jetstream_spark.atproto.schema import RAW_FRAME_SCHEMA
from jetstream_spark.serving.edge import run_server_in_thread
from jetstream_spark.serving.hub import LiveTailHub
from tests.fixtures import make_frames


@pytest.mark.timeout(300)
def test_edge_hub_cutover_no_dup_no_gap_under_concurrent_writes(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    frames = spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    normalized = normalize_frames(frames).cache()
    n = normalized.count()
    head = eventlog.ingest_batch(normalized, log_dir, wall_clock_us=1_000_000, batch_id=0)

    hub = LiveTailHub(spark, log_dir, str(tmp_path / "hubckpt"))
    hub.start()
    server, _ = run_server_in_thread(spark, log_dir, hub=hub)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
        conn.request("GET", "/subscribe?cursor=0")
        resp = conn.getresponse()
        assert resp.status == 200

        def writer() -> None:
            h = head
            for i in range(1, 4):
                h = eventlog.ingest_batch(normalized, log_dir, wall_clock_us=h + 1, batch_id=i)
                time.sleep(0.5)

        wt = threading.Thread(target=writer)
        wt.start()

        total = 4 * n
        got: list[dict] = []
        while len(got) < total:
            line = resp.readline()
            if not line:
                break
            got.append(json.loads(line))
        wt.join()
        conn.close()

        times = [f["time_us"] for f in got]
        assert len(got) == total, f"gap across cutover: delivered {len(got)}/{total}"
        assert times == sorted(times), "delivery must be time-ordered"
        assert len(set(times)) == total, "duplicates across replay→live cutover"
        # server.go:62-80: emitted counts each event once at the shared
        # fan-out point — the 3 live batches, never the cursor-replayed
        # pre-start batch, no matter how many slices/subscribers saw them
        assert server.events_emitted_total == 3 * n
    finally:
        import asyncio

        asyncio.run_coroutine_threadsafe(server.stop(), server._loop).result(timeout=10)
        hub.stop()


@pytest.mark.timeout(300)
def test_edge_hub_drops_slow_consumer(spark, tmp_path):
    """S19 on the hub path: a live subscriber whose buffer overflows is
    dropped (non-blocking enqueue), exactly like the polling path — the
    reference closes the websocket on a full channel (server.go:168-175)."""
    log_dir = str(tmp_path / "log")
    frames = spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    normalized = normalize_frames(frames).cache()
    head = eventlog.ingest_batch(normalized, log_dir, wall_clock_us=1_000_000, batch_id=0)

    hub = LiveTailHub(spark, log_dir, str(tmp_path / "hubckpt"))
    hub.start()
    # tiny buffer: the first live batch (hundreds of events) must overflow it
    server, _ = run_server_in_thread(spark, log_dir, hub=hub, sub_buffer=5)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("GET", "/subscribe")  # live tail, starts at head
        resp = conn.getresponse()
        assert resp.status == 200
        deadline = time.time() + 60
        while time.time() < deadline and not server.registry.subscribers:
            time.sleep(0.1)
        assert server.registry.subscribers, "subscriber never registered"
        # do NOT read: the subscriber is slow; append a burst
        eventlog.ingest_batch(normalized, log_dir, wall_clock_us=head + 1, batch_id=1)
        dropped = False
        while time.time() < deadline:
            infos = list(server.registry.subscribers.values())
            if not infos or any(i.dropped for i in infos):
                dropped = True  # flagged, or already dropped AND unregistered
                break
            time.sleep(0.2)
        assert dropped, "slow consumer must be dropped when its buffer overflows"
        conn.close()
    finally:
        import asyncio

        asyncio.run_coroutine_threadsafe(server.stop(), server._loop).result(timeout=10)
        hub.stop()


@pytest.mark.timeout(300)
def test_hub_fanout_soak_no_drops_across_ten_subscribers(spark):
    """Sustained shared-tail fan-out (the bench's delivery metric): ten
    concurrent subscribers each receive EVERY event exactly once, in time
    order — zero drops — and aggregate delivery stays well above one
    subscriber's worth of the reference's 5k events/s live ceiling (the
    per-subscriber ceiling comparison is recorded by bench.py at the
    bench SF, where the one-time tick cost amortizes)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import bench_delivery_fanout

    r = bench_delivery_fanout(spark, "/root/testdata/sf0.01", n_subs=10, cap=10000)
    assert r["complete"], f"dropped events: {r}"
    assert r["ordered"], f"out-of-order delivery: {r}"
    assert r["events_per_sec_total"] >= 5000, r


@pytest.mark.timeout(300)
def test_edge_hub_filters_applied_at_emit(spark, tmp_path):
    """Per-subscriber predicates are evaluated at hub emit time (S17
    semantics incl. account/identity bypass) — one shared slice, N filtered
    deliveries."""
    log_dir = str(tmp_path / "log")
    frames = spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    normalized = normalize_frames(frames).cache()
    head = eventlog.ingest_batch(normalized, log_dir, wall_clock_us=1_000_000, batch_id=0)

    hub = LiveTailHub(spark, log_dir, str(tmp_path / "hubckpt"))
    hub.start()
    server, _ = run_server_in_thread(spark, log_dir, hub=hub)
    try:
        expected = eventlog.replay(
            spark, log_dir, wanted_collections=["app.bsky.feed.like"]
        ).count()
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
        conn.request("GET", "/subscribe?cursor=0&wantedCollections=app.bsky.feed.like")
        resp = conn.getresponse()
        assert resp.status == 200
        got: list[dict] = []
        while len(got) < expected:
            line = resp.readline()
            if not line:
                break
            got.append(json.loads(line))
        conn.close()
        assert len(got) == expected
        kinds = {f["type"] for f in got}
        assert {"acc", "id"} <= kinds, "account/identity must bypass collection filters"
        for f in got:
            if f["type"] == "com":
                assert f["commit"]["collection"] == "app.bsky.feed.like"
    finally:
        import asyncio

        asyncio.run_coroutine_threadsafe(server.stop(), server._loop).result(timeout=10)
        hub.stop()
