"""H4 — the serving edge: `/subscribe` over HTTP chunked ndjson.

The reference serves websocket text frames (cmd/jetstream/server.go:240-356).
Websocket libs aren't in this container, so the edge speaks the stdlib-
feasible equivalent — HTTP/1.1 chunked transfer, one reference-format JSON
frame per line — with the same query semantics and the same per-subscriber
policies:

  S19  bounded buffer + drop-slow-consumer: per-sub asyncio.Queue(10_000);
       live enqueue is non-blocking — full queue closes the connection
       (server.go:136-176, buffer size server.go:204)
  S20  token-bucket rate limit, default 5_000 frames/s, replay 10×
       (main.go:79-84, server.go:307)
  S21  param validation via Subscription.parse — invalid NSID/DID/cursor
       ⇒ HTTP 400 (server.go:250-287)
  S22  subscriber registry with ids + counts (server.go:187-238)
  S15/S18  replay→live cutover and the monotonic seq guard come from
       Subscription/backfill — the same code paths the engine tests

Spark work (replay scans) runs in worker threads; the event loop only
shuttles frames. The live tail polls the sequencer state file — the same
"new data committed?" signal the tick stream uses in
streaming/subscriptions.py.
"""

from __future__ import annotations

import asyncio
import threading
import time
import urllib.parse
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from jetstream_spark.atproto.log import replay
from jetstream_spark.atproto.sequencer import SequencerState
from jetstream_spark.atproto.subscribe import Subscription, SubscriptionError
from jetstream_spark.atproto.wire import to_wire

MAX_SUB_RATE = 5_000  # frames/s (main.go:79-84)
PLAYBACK_MULT = 10  # server.go:307
SUB_BUFFER = 10_000  # server.go:204
POLL_INTERVAL_S = 0.2


class TokenBucket:
    """rate.NewLimiter analogue: `rate` tokens/s, burst = rate."""

    def __init__(self, rate: float):
        self.rate = rate
        self.tokens = rate
        self.last = time.monotonic()

    async def wait(self, n: int = 1) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.rate, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= n:
                self.tokens -= n
                return
            await asyncio.sleep((n - self.tokens) / self.rate)


@dataclass
class SubscriberInfo:
    sub_id: int
    sub: Subscription
    delivered: int = 0
    dropped: bool = False


@dataclass
class Registry:
    """S22: mutex-guarded id→subscriber map."""

    _next_id: int = 0
    subscribers: dict[int, SubscriberInfo] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def add(self, sub: Subscription) -> SubscriberInfo:
        with self._lock:
            self._next_id += 1
            info = SubscriberInfo(self._next_id, sub)
            self.subscribers[info.sub_id] = info
            return info

    def remove(self, sub_id: int) -> None:
        with self._lock:
            self.subscribers.pop(sub_id, None)


class SubscribeServer:
    def __init__(
        self,
        spark: SparkSession,
        log_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_sub_rate: float = MAX_SUB_RATE,
        hub=None,
        sub_buffer: int = SUB_BUFFER,
    ):
        self.spark = spark
        self.log_dir = log_dir
        self.host = host
        self.port = port
        self.max_sub_rate = max_sub_rate
        self.sub_buffer = sub_buffer
        # optional LiveTailHub (serving/hub.py): when set, the live phase is
        # fed by the ONE shared streaming tail instead of per-sub polling —
        # the reference's single-live-pipeline topology (server.go:187-238)
        self.hub = hub
        self.registry = Registry()
        # server-level delivery counters (cmd/jetstream/metrics.go names);
        # mutated only on the event loop thread
        self.events_delivered_total = 0
        self.bytes_delivered_total = 0
        self._server: asyncio.AbstractServer | None = None

    # --- engine-side helpers (run in threads) ------------------------------

    def _head(self) -> int:
        return SequencerState.load(self.log_dir).last_time_us

    def _fetch_batch(self, sub: Subscription, limit: int) -> list:
        df = replay(
            self.spark,
            self.log_dir,
            cursor=(sub.seq + 1) if sub.seq else sub.cursor,
            wanted_collections=sub.wanted_collections or None,
            wanted_dids=sub.wanted_dids or None,
        )
        return to_wire(df.limit(limit)).orderBy("time_us").collect()

    async def _live_via_hub(self, info: "SubscriberInfo", sub: Subscription, queue: "asyncio.Queue[bytes]") -> None:
        """Attach to the shared LiveTailHub for the live phase. The hub's
        emit callback runs on its tick thread — frames hop to the event loop
        and enqueue non-blocking: a full buffer drops the subscriber (S19),
        same policy as the polling path."""
        loop = asyncio.get_running_loop()

        def emit(rows: list) -> None:
            def _push() -> None:
                for row in rows:
                    try:
                        queue.put_nowait(row["value"].encode() + b"\n")
                    except asyncio.QueueFull:
                        info.dropped = True
                        return

            loop.call_soon_threadsafe(_push)

        hub_id = await asyncio.to_thread(self.hub.register, sub, emit)
        try:
            while not info.dropped:
                await asyncio.sleep(POLL_INTERVAL_S)
        finally:
            self.hub.unregister(hub_id)

    # --- HTTP plumbing ------------------------------------------------------

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter) -> None:
        try:
            request_line = (await reader.readline()).decode()
            while (await reader.readline()).strip():  # drain headers
                pass
            parts = request_line.split()
            if len(parts) < 2 or parts[0] != "GET":
                await self._respond(writer, 405, "method not allowed")
                return
            url = urllib.parse.urlparse(parts[1])
            if url.path == "/metrics":
                await self._respond(writer, 200, self._metrics_text())
                return
            if url.path != "/subscribe":
                await self._respond(writer, 404, "not found")
                return
            params = urllib.parse.parse_qs(url.query)
            try:
                sub = Subscription.parse(
                    wanted_collections=params.get("wantedCollections"),
                    wanted_dids=params.get("wantedDids"),
                    cursor=params.get("cursor", [None])[0],
                    server_time_us=self._head(),
                )
            except SubscriptionError as e:
                await self._respond(writer, 400, str(e))
                return
            await self._stream(reader, writer, sub)
        except (ConnectionResetError, BrokenPipeError, asyncio.IncompleteReadError):
            pass
        finally:
            writer.close()

    def _metrics_text(self) -> str:
        """Prometheus text exposition — the scrape surface the reference
        serves from its metrics listener (cmd/jetstream/main.go:216-218),
        with the same metric names (cmd/jetstream/metrics.go:8-28 +
        pkg/consumer/metrics.go consumer_last_seq)."""
        lines = [
            "# TYPE jetstream_subscribers_connected gauge",
            f"jetstream_subscribers_connected {len(self.registry.subscribers)}",
            "# TYPE jetstream_events_delivered_total counter",
            f"jetstream_events_delivered_total {self.events_delivered_total}",
            "# TYPE jetstream_bytes_delivered_total counter",
            f"jetstream_bytes_delivered_total {self.bytes_delivered_total}",
            "# TYPE consumer_last_seq gauge",
            f'consumer_last_seq{{socket_url="{self.log_dir}"}} {self._head()}',
        ]
        return "\n".join(lines) + "\n"

    async def _respond(self, writer: asyncio.StreamWriter, code: int, msg: str) -> None:
        reason = {200: "OK", 400: "Bad Request", 404: "Not Found", 405: "Method Not Allowed"}[code]
        body = msg.encode() + b"\n"
        writer.write(
            f"HTTP/1.1 {code} {reason}\r\nContent-Length: {len(body)}\r\n"
            f"Content-Type: text/plain\r\nConnection: close\r\n\r\n".encode() + body
        )
        await writer.drain()

    async def _stream(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter, sub: Subscription
    ) -> None:
        if sub.cursor is None:
            # live tail: start at the current head (server.go:274-287 —
            # no cursor ⇒ only new events), the S18 guard does the rest
            sub.seq = self._head()
        info = self.registry.add(sub)
        limiter = TokenBucket(self.max_sub_rate * (PLAYBACK_MULT if sub.cursor is not None else 1))
        queue: asyncio.Queue[bytes] = asyncio.Queue(maxsize=self.sub_buffer)
        writer.write(
            b"HTTP/1.1 200 OK\r\nContent-Type: application/x-ndjson\r\n"
            b"Transfer-Encoding: chunked\r\nConnection: close\r\n\r\n"
        )
        await writer.drain()

        async def producer() -> None:
            """Replay rounds then live tail; S18 guard via sub.seq. The live
            phase is either per-sub polling (no hub) or the shared streaming
            tail fan-out (hub set — S15 cutover onto the single live feed)."""
            try:
                while not info.dropped:
                    if self.hub is not None and (sub.cursor is None or sub.caught_up(self._head())):
                        await self._live_via_hub(info, sub, queue)
                        return
                    head = self._head()
                    batch = await asyncio.to_thread(self._fetch_batch, sub, self.sub_buffer)
                    if batch:
                        playback = sub.cursor is not None and not sub.caught_up(head)
                        for row in batch:
                            frame = row["value"].encode() + b"\n"
                            if playback:
                                await queue.put(frame)  # replay: blocking = backpressure
                            else:
                                try:
                                    queue.put_nowait(frame)  # live: full buffer ⇒ drop
                                except asyncio.QueueFull:
                                    info.dropped = True
                                    return
                        sub.advance(batch[-1]["time_us"])
                        limiter.rate = self.max_sub_rate * (
                            PLAYBACK_MULT if not sub.caught_up(self._head()) else 1
                        )
                    elif self.hub is not None:
                        # empty round at head: cut over to the shared tail
                        await self._live_via_hub(info, sub, queue)
                        return
                    else:
                        await asyncio.sleep(POLL_INTERVAL_S)
            finally:
                await queue.put(b"")  # sentinel

        async def read_pump() -> None:
            """server.go:291-300: client close/EOF cancels the subscription
            even when nothing is being delivered (idle live tail)."""
            try:
                await reader.read(1)
            except (ConnectionResetError, BrokenPipeError):
                pass
            info.dropped = True
            await queue.put(b"")

        task = asyncio.create_task(producer())
        pump = asyncio.create_task(read_pump())
        try:
            while True:
                frame = await queue.get()
                if not frame:
                    break
                await limiter.wait()
                writer.write(f"{len(frame):x}\r\n".encode() + frame + b"\r\n")
                await writer.drain()
                info.delivered += 1
                self.events_delivered_total += 1
                self.bytes_delivered_total += len(frame)
        except (ConnectionResetError, BrokenPipeError):
            info.dropped = True
        finally:
            info.dropped = True
            task.cancel()
            pump.cancel()
            self.registry.remove(info.sub_id)
            try:
                writer.write(b"0\r\n\r\n")
                await writer.drain()
            except (ConnectionResetError, BrokenPipeError):
                pass

    async def start(self) -> None:
        self._server = await asyncio.start_server(self._handle, self.host, self.port)
        self.port = self._server.sockets[0].getsockname()[1]

    async def stop(self) -> None:
        if self._server:
            self._server.close()
            await self._server.wait_closed()


def run_server_in_thread(spark: SparkSession, log_dir: str, **kw) -> tuple[SubscribeServer, threading.Thread]:
    """Test/demo helper: run the edge on a daemon thread with its own loop."""
    server = SubscribeServer(spark, log_dir, **kw)
    started = threading.Event()
    loop_holder: dict = {}

    def runner() -> None:
        loop = asyncio.new_event_loop()
        loop_holder["loop"] = loop
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.start())
        started.set()
        loop.run_forever()

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    started.wait(timeout=30)
    server._loop = loop_holder["loop"]  # for clean shutdown from tests
    return server, t
