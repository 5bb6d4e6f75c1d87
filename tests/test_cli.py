"""The `python -m jetstream_spark` server-binary surface: replay, trim,
compact, and serve (edge boot + /metrics scrape) driven as real
subprocesses against a populated log."""

from __future__ import annotations

import http.client
import json
import os
import signal
import subprocess
import sys
import time

import pytest

from jetstream_spark.atproto import log as eventlog
from jetstream_spark.atproto.normalize import normalize_frames
from jetstream_spark.atproto.schema import RAW_FRAME_SCHEMA
from tests.fixtures import make_frames

ENV = {**os.environ, "SPARK_GRAFT_CPUS": "4", "SPARK_GRAFT_DRIVER_MEM": "2g"}


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clilog"))
    frames = spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    normalized = normalize_frames(frames).cache()
    h = eventlog.ingest_batch(normalized, d, wall_clock_us=1_000_000, batch_id=0)
    eventlog.ingest_batch(normalized, d, wall_clock_us=h + 1, batch_id=1)
    for b in (0, 1):  # compact refuses buckets with un-marked batches
        eventlog.mark_batch_done(d, b)
    return d


def _run(*args: str, timeout: int = 300) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "jetstream_spark", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=ENV,
        cwd="/root/repo",
    )


@pytest.mark.timeout(300)
def test_cli_replay(log_dir, spark):
    total = eventlog.read_log(spark, log_dir).count()
    out = _run("replay", "--data-dir", log_dir, "--limit", "1000000")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == total
    times = [f["time_us"] for f in lines]
    assert times == sorted(times)


@pytest.mark.timeout(300)
def test_cli_compact_and_trim(log_dir, spark):
    part = os.path.join(log_dir, "hour_bucket=0")
    assert len([f for f in os.listdir(part) if f.endswith(".parquet")]) >= 2
    out = _run("compact", "--data-dir", log_dir)
    assert out.returncode == 0, out.stderr[-2000:]
    assert len([f for f in os.listdir(part) if f.endswith(".parquet")]) == 1

    out = _run("trim", "--data-dir", log_dir, "--event-ttl-hours", "24")
    assert out.returncode == 0, out.stderr[-2000:]
    # bucket 0 (1970) is far past TTL relative to now → dropped
    assert not os.path.isdir(part)


@pytest.mark.timeout(300)
def test_cli_dedup_stream_drain(tmp_path):
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    base = "a perfectly ordinary document about shuffle boundaries " * 3
    with open(docs_dir / "batch1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": base}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "unrelated words entirely here " * 4}) + "\n")
    state = str(tmp_path / "state")
    out = _run("dedup-stream", "--docs-dir", str(docs_dir), "--state-dir", state, "--drain")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "near-dup pairs so far: 0" in out.stdout

    # second invocation: fresh process re-registers the band table over the
    # existing state and catches the cross-run near-dup
    with open(docs_dir / "batch2.json", "w") as f:
        f.write(json.dumps({"doc_id": 10, "text": base + " zz"}) + "\n")
    out = _run("dedup-stream", "--docs-dir", str(docs_dir), "--state-dir", state, "--drain")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "near-dup pairs so far: 1" in out.stdout


@pytest.mark.timeout(300)
def test_cli_serve_boots_and_scrapes(log_dir):
    proc = subprocess.Popen(
        [sys.executable, "-m", "jetstream_spark", "serve", "--data-dir", log_dir,
         "--listen-addr", "127.0.0.1:0"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=ENV,
        cwd="/root/repo",
    )
    try:
        port = None
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving /subscribe" in line:
                port = int(line.rsplit(":", 1)[1])
                break
        assert port, "server never reported its port"
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        body = resp.read().decode()
        conn.close()
        assert "jetstream_subscribers_connected" in body
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.timeout(300)
def test_cli_sql(tmp_path, spark):
    d = str(tmp_path / "sqllog")
    frames = spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    eventlog.ingest_batch(normalize_frames(frames), d, wall_clock_us=1_000_000, batch_id=0)
    n_log = eventlog.read_log(spark, d).count()

    # log + analytics views in one statement, json output
    out = _run(
        "sql",
        "SELECT (SELECT count(*) FROM events_log) AS n_events, "
        "(SELECT count(*) FROM documents) AS n_docs",
        "--data-dir", d,
        "--sf-dir", "/root/testdata/sf0.001",
        "--format", "json",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    row = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][0])
    assert row["n_events"] == n_log
    assert row["n_docs"] > 0

    # bad SQL → nonzero exit, parse error surfaced
    out = _run("sql", "SELEKT 1", "--data-dir", d)
    assert out.returncode != 0


@pytest.mark.timeout(300)
def test_cli_ann_stream_drain(tmp_path, spark):
    from jetstream_spark.tables import table

    rows = (
        table(spark, "/root/testdata/sf0.001", "embeddings")
        .limit(3)
        .select("vec_id", "embedding")
        .collect()
    )
    qdir = tmp_path / "queries_in"
    qdir.mkdir()
    with open(qdir / "q.json", "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {"query_id": r["vec_id"], "embedding": [float(x) for x in r["embedding"]]}
                )
                + "\n"
            )
    state = str(tmp_path / "state")
    out = _run(
        "ann-stream", "--queries-dir", str(qdir), "--sf-dir", "/root/testdata/sf0.001",
        "--state-dir", state, "--drain",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "result rows so far: 15" in out.stdout  # 3 queries x top-5


def test_cli_anomaly_stream_drain(tmp_path):
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    rows = []
    eid = 0
    for h in range(8):  # steady 2/hour baseline
        for m in (5, 35):
            rows.append({"event_id": (eid := eid + 1), "ts": f"2024-03-01T{h:02d}:{m:02d}:00", "event_type": "click"})
    for m in range(12):  # burst hour
        rows.append({"event_id": (eid := eid + 1), "ts": f"2024-03-01T08:{m:02d}:00", "event_type": "click"})
    with open(events_dir / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    state = str(tmp_path / "state")
    out = _run(
        "anomaly-stream", "--events-dir", str(events_dir), "--state-dir", state,
        "--drain", "--cusum",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "click 2024-03-01 08:00:00 n=12" in out.stdout
    # --cusum prints the drift table from the SAME state (day rollup):
    # one day of data = one cusum row, statistics zero at the baseline day
    assert "cusum click 2024-03-01 n=28" in out.stdout


def test_cli_funnel_stream_drain(tmp_path):
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    rows = [
        {"user_id": 1, "ts": "2024-03-01T10:00:00", "event_type": "view"},
        {"user_id": 1, "ts": "2024-03-01T10:05:00", "event_type": "click"},
        {"user_id": 1, "ts": "2024-03-01T10:10:00", "event_type": "purchase"},
        {"user_id": 2, "ts": "2024-03-01T09:00:00", "event_type": "purchase"},
        {"user_id": 2, "ts": "2024-03-01T09:30:00", "event_type": "view"},
    ]
    with open(events_dir / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = _run(
        "funnel-stream", "--events-dir", str(events_dir),
        "--out-dir", str(tmp_path / "out"),
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--drain",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # user 1 completes strictly; user 2's pre-view purchase must not count
    assert "step 1 view: 2 users" in out.stdout
    assert "step 2 click: 1 users" in out.stdout
    assert "step 3 purchase: 1 users" in out.stdout


def test_cli_funnel_stream_drain_no_events(tmp_path):
    """ADVICE r8 (low): an input with no funnel-step events writes no sink
    data files — --drain must print an all-zero table, not die on schema
    inference."""
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    rows = [
        {"user_id": 1, "ts": "2024-03-01T10:00:00", "event_type": "error"},
        {"user_id": 2, "ts": "2024-03-01T10:05:00", "event_type": "noise"},
    ]
    with open(events_dir / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = _run(
        "funnel-stream", "--events-dir", str(events_dir),
        "--out-dir", str(tmp_path / "out"),
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--drain",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "step 1 view: 0 users" in out.stdout
    assert "step 2 click: 0 users" in out.stdout
    assert "step 3 purchase: 0 users" in out.stdout


def test_cli_scd2_stream_drain(tmp_path):
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-03-01T10:00:00", "user_id": 1, "props": '{"k": 5}'},
        {"event_id": 2, "ts": "2024-03-01T10:05:00", "user_id": 1, "props": '{"k": 80}'},
        {"event_id": 3, "ts": "2024-03-01T10:06:00", "user_id": 1, "props": '{"k": 90}'},
    ]
    with open(events_dir / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    state = str(tmp_path / "state")
    out = _run("scd2-stream", "--events-dir", str(events_dir), "--state-dir", state, "--drain")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dimension rows: 2 (1 current)" in out.stdout
    assert "u1 v2 tier=3" in out.stdout


def test_cli_scd2_stream_compact_state(tmp_path):
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-03-01T10:00:00", "user_id": 1, "props": '{"k": 5}'},
        {"event_id": 2, "ts": "2024-03-01T10:05:00", "user_id": 1, "props": '{"k": 80}'},
    ]
    with open(events_dir / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    state = str(tmp_path / "state")
    out = _run("scd2-stream", "--events-dir", str(events_dir), "--state-dir", state, "--drain")
    assert out.returncode == 0, out.stderr[-2000:]
    with open(events_dir / "b2.json", "w") as f:
        f.write(json.dumps({"event_id": 3, "ts": "2024-03-01T10:06:00", "user_id": 1, "props": '{"k": 90}'}) + "\n")
    out = _run("scd2-stream", "--events-dir", str(events_dir), "--state-dir", state, "--drain")
    assert out.returncode == 0, out.stderr[-2000:]
    out = _run("scd2-stream", "--state-dir", state, "--compact-state")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "state compaction: done" in out.stdout
    # dimension survives compaction verbatim
    out = _run("scd2-stream", "--events-dir", str(events_dir), "--state-dir", state, "--drain")
    assert "dimension rows: 2 (1 current)" in out.stdout


def test_cli_query_list_and_run(tmp_path):
    out = _run("query", "--list")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "q1_pricing_summary" in out.stdout and "[oracle]" in out.stdout
    out = _run("query", "hll_distinct", "--sf-dir", "/root/testdata/sf0.001", "--format", "json", "--limit", "0")
    assert out.returncode == 0, out.stderr[-2000:]
    assert '"exact_distinct"' in out.stdout
    out = _run("query", "q1_pricing_sumary")  # typo -> suggestion, exit 2
    assert out.returncode == 2
    assert "did you mean" in out.stdout
    out = _run("query", "dedup_exact", "--sf-dir", "/root/testdata/sf0.001", "--explain")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Physical Plan" in out.stdout


def test_queries_catalog_in_sync():
    """QUERIES.md is generated from the registry; a stale commit fails here."""
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    before = (root / "QUERIES.md").read_text()
    subprocess.run([sys.executable, str(root / "tools" / "gen_catalog.py")], check=True, cwd=root)
    after = (root / "QUERIES.md").read_text()
    if before != after:
        (root / "QUERIES.md").write_text(before)  # restore; the assert reports
    assert before == after, "QUERIES.md is stale — run tools/gen_catalog.py"
