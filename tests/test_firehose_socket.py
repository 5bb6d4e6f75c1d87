"""Live socket transport for the firehose source (S1): a REAL local socket
server speaking the reference's dial semantics — `GET /subscribe?cursor=N`
streams frames with seq > N (cmd/jetstream/main.go:294-328), `/head`
reports the relay head — driven end-to-end through the Spark DataSource,
including checkpoint resume against a live (still-appending) relay."""

from __future__ import annotations

import json
import socketserver
import threading
import time

import pytest

from jetstream_spark.streaming.firehose import FirehoseDataSource
from tests.fixtures import make_frames


class _Relay:
    """In-memory frame store served over TCP — the websocket stand-in.
    Connections with a cursor stream matching frames as they arrive (live
    tail); the handler exits when the client detaches or goes idle."""

    def __init__(self):
        self.frames: list[dict] = []
        self.lock = threading.Lock()
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                try:
                    request_line = self.rfile.readline().decode()
                    while self.rfile.readline().strip():
                        pass  # drain headers
                    path = request_line.split()[1]
                    self.wfile.write(b"HTTP/1.1 200 OK\r\n\r\n")
                    if path == "/head":
                        with outer.lock:
                            head = outer.frames[-1]["seq"] if outer.frames else 0
                        self.wfile.write(f"{head}\n".encode())
                        return
                    cursor = 0
                    if "cursor=" in path:
                        cursor = int(path.split("cursor=")[1].split("&")[0])
                    sent = cursor
                    idle = 0
                    while idle < 40:  # ~2 s with no new frames ⇒ hang up
                        with outer.lock:
                            out = [f for f in outer.frames if f["seq"] > sent]
                        if out:
                            idle = 0
                            for fr in out:
                                self.wfile.write((json.dumps(fr) + "\n").encode())
                                sent = fr["seq"]
                            self.wfile.flush()
                        else:
                            idle += 1
                            time.sleep(0.05)
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client detached mid-stream — normal

        self.server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
        self.server.daemon_threads = True
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def append(self, frames: list[dict]) -> None:
        with self.lock:
            self.frames.extend(frames)

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(FirehoseDataSource)
    return spark


@pytest.mark.timeout(300)
def test_firehose_socket_end_to_end(registered, tmp_path):
    spark = registered
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    frames = make_frames()
    relay = _Relay()
    relay.append(frames)
    try:
        stream = (
            spark.readStream.format("atproto_firehose")
            .option("socket_url", f"127.0.0.1:{relay.port}")
            .option("numPartitions", "4")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        relay.stop()
    df = spark.read.parquet(out_dir)
    assert df.count() == len(frames)
    assert df.select("seq").distinct().count() == len(frames), "no duplicate seqs"


@pytest.mark.timeout(300)
def test_firehose_socket_resume_from_checkpoint(registered, tmp_path):
    """Kill the query, let the relay advance, restart from the checkpoint:
    only frames past the checkpointed seq offset are fetched (the S12
    cursor-resume contract, over a live socket)."""
    spark = registered
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    frames = make_frames()
    half = len(frames) // 2
    relay = _Relay()
    relay.append(frames[:half])
    try:

        def run_until_drained() -> None:
            stream = (
                spark.readStream.format("atproto_firehose")
                .option("socket_url", f"127.0.0.1:{relay.port}")
                .load()
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        run_until_drained()
        assert spark.read.parquet(out_dir).count() == half

        relay.append(frames[half:])
        run_until_drained()
    finally:
        relay.stop()
    df = spark.read.parquet(out_dir)
    assert df.count() == len(frames), "resume must fetch exactly the new frames"
    assert df.select("seq").distinct().count() == len(frames), "no duplicate seqs"
