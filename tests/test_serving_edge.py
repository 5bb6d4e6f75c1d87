"""The serving edge (H4): /subscribe over HTTP chunked ndjson — validation,
cursor replay, filters, live tail, registry."""

from __future__ import annotations

import http.client
import json

import pytest
from pyspark.sql import functions as F

from jetstream_spark.atproto import log as eventlog
from jetstream_spark.atproto.normalize import normalize_frames
from jetstream_spark.atproto.schema import RAW_FRAME_SCHEMA
from jetstream_spark.serving.edge import run_server_in_thread
from tests.fixtures import make_frames


@pytest.fixture(scope="module")
def edge(spark, tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("edgelog"))
    frames = spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    normalized = normalize_frames(frames).cache()
    eventlog.ingest_batch(normalized, log_dir, wall_clock_us=1_000_000)
    server, thread = run_server_in_thread(spark, log_dir)
    yield server, log_dir, normalized
    import asyncio

    asyncio.run_coroutine_threadsafe(server.stop(), server._loop).result(timeout=10)


def _read_frames(port: int, path: str, n: int, timeout: float = 60.0) -> list[dict]:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("GET", path)
    resp = conn.getresponse()
    assert resp.status == 200, resp.read().decode()
    frames = []
    while len(frames) < n:
        line = resp.readline()
        if not line:
            break
        frames.append(json.loads(line))
    conn.close()
    return frames


def test_subscribe_replay_from_cursor(edge, spark):
    server, log_dir, _ = edge
    total = eventlog.read_log(spark, log_dir).count()
    frames = _read_frames(server.port, "/subscribe?cursor=0", total)
    assert len(frames) == total
    times = [f["time_us"] for f in frames]
    assert times == sorted(times) and len(set(times)) == total
    assert {"did", "time_us", "type"}.issubset(frames[0])


def test_subscribe_filters_and_bypass(edge, spark):
    server, log_dir, _ = edge
    df = eventlog.replay(spark, log_dir, wanted_collections=["app.bsky.feed.like"])
    expected = df.count()
    frames = _read_frames(
        server.port, "/subscribe?cursor=0&wantedCollections=app.bsky.feed.like", expected
    )
    assert len(frames) == expected
    kinds = {f["type"] for f in frames}
    assert {"acc", "id"} <= kinds, "account/identity must bypass collection filters"
    for f in frames:
        if f["type"] == "com":
            assert f["commit"]["collection"] == "app.bsky.feed.like"


def test_subscribe_invalid_params_rejected(edge):
    server, _, _ = edge
    for q in ("wantedCollections=banana", "wantedDids=nope", "cursor=abc"):
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.request("GET", f"/subscribe?{q}")
        resp = conn.getresponse()
        assert resp.status == 400, q
        resp.read()
        conn.close()


def test_live_tail_receives_new_events(edge, spark):
    server, log_dir, normalized = edge
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("GET", "/subscribe")  # no cursor = live tail
    resp = conn.getresponse()
    assert resp.status == 200
    head_before = eventlog.read_log(spark, log_dir).agg(F.max("time_us")).first()[0]
    # append new events while subscribed
    eventlog.ingest_batch(normalized, log_dir, wall_clock_us=head_before + 1)
    new_count = eventlog.read_log(spark, log_dir).where(F.col("time_us") > head_before).count()
    frames = []
    while len(frames) < new_count:
        line = resp.readline()
        if not line:
            break
        frames.append(json.loads(line))
    conn.close()
    assert len(frames) == new_count
    assert all(f["time_us"] > head_before for f in frames), "live tail must skip history"


def test_emitted_counts_once_per_event_across_subscribers(edge, spark):
    """server.go:62-80 semantics (ADVICE r6): emitted increments once per
    event entering the fan-out, regardless of subscriber count; per-sub
    enqueues live under the engine-specific subscriber_*_enqueued names."""
    import threading

    server, log_dir, normalized = edge
    emitted_before = server.events_emitted_total
    enqueued_before = server.events_enqueued_total

    results: list[list[dict]] = [[], []]
    ready = threading.Barrier(3, timeout=60)

    head_before = eventlog.read_log(spark, log_dir).agg(F.max("time_us")).first()[0]

    def tail(slot: int, expect: list[int]) -> None:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("GET", "/subscribe")  # live tail
        resp = conn.getresponse()
        assert resp.status == 200
        ready.wait()
        while len(results[slot]) < expect[0]:
            line = resp.readline()
            if not line:
                break
            results[slot].append(json.loads(line))
        conn.close()

    expect = [1 << 30]  # patched once new_count is known
    threads = [threading.Thread(target=tail, args=(i, expect)) for i in range(2)]
    for t in threads:
        t.start()
    ready.wait()
    import time as _time

    deadline = _time.time() + 30
    while len(server.registry.subscribers) != 2 and _time.time() < deadline:
        _time.sleep(0.1)  # earlier tests' subscribers must finish deregistering
    assert len(server.registry.subscribers) == 2
    eventlog.ingest_batch(normalized, log_dir, wall_clock_us=head_before + 1)
    new_count = eventlog.read_log(spark, log_dir).where(F.col("time_us") > head_before).count()
    expect[0] = new_count
    for t in threads:
        t.join(timeout=120)
    assert [len(r) for r in results] == [new_count, new_count]
    # once per event — NOT once per subscriber-enqueue
    assert server.events_emitted_total - emitted_before == new_count
    assert server.events_enqueued_total - enqueued_before == 2 * new_count


def _wait_registry_empty(server, timeout: float = 15.0) -> bool:
    import time

    deadline = time.time() + timeout
    while server.registry.subscribers and time.time() < deadline:
        time.sleep(0.2)
    return not server.registry.subscribers


def test_registry_tracks_and_clears(edge, spark):
    server, log_dir, _ = edge
    assert _wait_registry_empty(server), "stale subscribers from earlier tests not cleaned"
    total = eventlog.read_log(spark, log_dir).count()
    _read_frames(server.port, "/subscribe?cursor=0", total)
    assert _wait_registry_empty(server), "registry must clear on disconnect"
