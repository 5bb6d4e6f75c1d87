"""S23/S24/S25 — the consumer client library.

Reference: pkg/client/client.go:60-141 (ConnectAndRead: dial /subscribe
with cursor + filters, feed every decoded frame to a Scheduler) plus the
two scheduler implementations:

  - sequential (pkg/client/schedulers/sequential): one event at a time,
    stream order (S24);
  - parallel (pkg/client/schedulers/parallel/parallel.go:1-3): "Events for
    the same repository will be processed sequentially, but events for
    different repositories can be processed concurrently" (S25).

The parallel scheduler here partitions repos to workers by DID hash —
static assignment gives the same guarantee (per-repo sequential, cross-repo
concurrent) as the reference's dynamic active-map without its bookkeeping;
the trade-off is that a single hot repo can head-of-line block its worker's
other repos, which the reference shares via its per-repo pending queues.

Transport: websocket text frames (use_websocket=True — the reference
client's actual protocol, RFC 6455 over the stdlib) or the edge's HTTP
chunked ndjson; identical frame JSON either way."""

from __future__ import annotations

import http.client
import json
import queue
import threading
from collections.abc import Callable

from jetstream_spark.wsutil import send_masked_frame


class SequentialScheduler:
    """S24: caller-thread, in-order delivery — the sequential scheduler."""

    def __init__(self, handle_event: Callable[[dict], None]):
        self.handle_event = handle_event

    def add_work(self, did: str, event: dict) -> None:
        self.handle_event(event)

    def shutdown(self) -> None:
        pass


class ParallelScheduler:
    """S25: fixed worker pool; same DID always lands on the same worker
    queue, so per-repo order is preserved while distinct repos run
    concurrently (parallel.go:36-152 semantics)."""

    _SENTINEL = None

    def __init__(self, num_workers: int, handle_event: Callable[[dict], None]):
        self.handle_event = handle_event
        self.num_workers = num_workers
        self._queues: list[queue.Queue] = [queue.Queue() for _ in range(num_workers)]
        self._workers = [
            threading.Thread(target=self._worker, args=(q,), daemon=True) for q in self._queues
        ]
        for w in self._workers:
            w.start()

    def _worker(self, q: queue.Queue) -> None:
        while True:
            item = q.get()
            if item is self._SENTINEL:
                return
            self.handle_event(item)

    def add_work(self, did: str, event: dict) -> None:
        # stable hash — Python's str hash is salted per process, which would
        # break cross-run determinism in tests
        import zlib

        idx = zlib.crc32(did.encode()) % self.num_workers
        self._queues[idx].put(event)

    def shutdown(self) -> None:
        for q in self._queues:
            q.put(self._SENTINEL)
        for w in self._workers:
            w.join(timeout=30)


class JetstreamClient:
    """ConnectAndRead (client.go:60-141): dial /subscribe with cursor and
    filters, hand each frame to the scheduler, track the cursor for
    reconnect-resume."""

    def __init__(
        self,
        host: str,
        port: int,
        scheduler,
        wanted_collections: list[str] | None = None,
        wanted_dids: list[str] | None = None,
        use_websocket: bool = False,
        use_tls: bool = False,
        tls_ca: str | None = None,
    ):
        self.host = host
        self.port = port
        self.scheduler = scheduler
        self.wanted_collections = wanted_collections or []
        self.wanted_dids = wanted_dids or []
        self.use_websocket = use_websocket  # the reference's wire protocol
        self.use_tls = use_tls  # wss:// upstreams; system trust unless tls_ca given
        self.tls_ca = tls_ca
        self.cursor: int | None = None  # last delivered time_us

    def _path(self, cursor: int | None) -> str:
        params = []
        if cursor is not None:
            params.append(f"cursor={cursor}")
        params += [f"wantedCollections={c}" for c in self.wanted_collections]
        params += [f"wantedDids={d}" for d in self.wanted_dids]
        return "/subscribe" + ("?" + "&".join(params) if params else "")

    def connect_and_read(
        self,
        cursor: int | None = None,
        max_events: int | None = None,
        timeout: float = 60.0,
    ) -> int:
        """Read frames until the connection closes or max_events arrive.
        Returns the number of events scheduled; self.cursor advances per
        frame, so a reconnect with cursor=self.cursor + 1 resumes exactly
        (the client-side S12 analogue)."""
        if cursor is not None:
            self.cursor = cursor if cursor == 0 else cursor - 1
        if self.use_websocket:
            return self._read_websocket(cursor, max_events, timeout)
        conn = http.client.HTTPConnection(self.host, self.port, timeout=timeout)
        conn.request("GET", self._path(cursor))
        resp = conn.getresponse()
        if resp.status != 200:
            body = resp.read().decode()
            conn.close()
            raise ConnectionError(f"subscribe rejected ({resp.status}): {body.strip()}")
        n = 0
        try:
            while max_events is None or n < max_events:
                line = resp.readline()
                if not line:
                    break
                frame = json.loads(line)
                self.scheduler.add_work(frame["did"], frame)
                self.cursor = frame["time_us"]
                n += 1
        finally:
            conn.close()
        return n

    def _read_websocket(self, cursor: int | None, max_events: int | None, timeout: float) -> int:
        """RFC 6455 client: handshake, then one JSON text frame per event —
        the reference client's actual transport (client.go websocket dial)."""
        import base64
        import os
        import socket

        key = base64.b64encode(os.urandom(16)).decode()
        sock = socket.create_connection((self.host, self.port), timeout=timeout)
        if self.use_tls:
            import ssl

            ctx = ssl.create_default_context(cafile=self.tls_ca)
            sock = ctx.wrap_socket(sock, server_hostname=self.host)
        try:
            sock.sendall(
                (
                    f"GET {self._path(cursor)} HTTP/1.1\r\nHost: {self.host}\r\n"
                    f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
                ).encode()
            )
            f = sock.makefile("rb")
            status = f.readline().decode()
            if "101" not in status:
                raise ConnectionError(f"websocket upgrade rejected: {status.strip()}")
            while f.readline().strip():
                pass  # drain handshake headers

            def read_exact(k: int) -> bytes:
                buf = f.read(k)
                if buf is None or len(buf) < k:
                    raise EOFError
                return buf

            n = 0
            while max_events is None or n < max_events:
                try:
                    h = read_exact(2)
                except EOFError:
                    break
                opcode = h[0] & 0x0F
                ln = h[1] & 0x7F
                if ln == 126:
                    ln = int.from_bytes(read_exact(2), "big")
                elif ln == 127:
                    ln = int.from_bytes(read_exact(8), "big")
                payload = read_exact(ln) if ln else b""
                if opcode == 0x9:  # server ping → masked pong (RFC 6455 §5.5.3)
                    send_masked_frame(sock, 0xA, payload)
                    continue
                if opcode == 0x8:  # server close → masked close echo
                    try:
                        send_masked_frame(sock, 0x8)
                    except OSError:
                        pass
                    break
                if opcode != 0x1:  # ignore pongs/continuations from the server
                    continue
                frame = json.loads(payload)
                self.scheduler.add_work(frame["did"], frame)
                self.cursor = frame["time_us"]
                n += 1
            return n
        finally:
            sock.close()
