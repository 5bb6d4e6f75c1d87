"""S27 — stage tracing and live profiling endpoints.

The reference wraps every consumer stage in an OTEL span
(pkg/consumer/consumer.go:100,165 — `tracer.Start(ctx, "HandleStreamEvent")`
etc.) and serves Go pprof from its metrics listener
(cmd/jetstream/main.go:218 — `/debug/pprof/*`). Python/Spark analogues:

- `StageTracer` — OTEL-shaped spans (trace/span ids, unix-nano times,
  attributes) in a bounded in-process ring; when the `opentelemetry` SDK
  is importable each span is mirrored to the real tracer (import-try
  gated — the bare container has no OTEL, a deployment that installs it
  gets real export for free). Driver-side only: spans time *stages*
  (microbatch commit, delivery sessions), never per-row work — per-row
  instrumentation belongs in Spark's own task metrics, not here.
- `cpu_profile(seconds)` — a sampling profiler over every live Python
  thread (`sys._current_frames`), emitting collapsed flamegraph stacks;
  the analogue of `/debug/pprof/profile`. Sampling, like Go's profiler,
  so cost is bounded (hz * threads stack walks) regardless of load.
- `thread_dump()` — all-thread tracebacks (`/debug/pprof/goroutine`).
- `heap_profile()` — tracemalloc top allocation sites when tracing is
  active, else a gc object-type histogram (`/debug/pprof/heap`).

Only the DRIVER process is profiled: on a real cluster the executors are
JVM processes owned by Spark (its own /api/v1 metrics + thread dumps
cover them); the driver is where this engine's Python orchestration —
the part invisible to Spark's UI — runs.
"""

from __future__ import annotations

import collections
import contextlib
import gc
import json
import secrets
import sys
import threading
import time
import traceback
from dataclasses import dataclass, field

try:  # optional real exporter — absent in the bare container
    from opentelemetry import trace as _otel_trace
except Exception:  # pragma: no cover - import-try gate
    _otel_trace = None

MAX_SPANS = 2048  # ring bound: ~300 B/span → <1 MB resident


@dataclass
class Span:
    name: str
    trace_id: str
    span_id: str
    parent_id: str | None
    start_unix_nano: int
    end_unix_nano: int = 0
    attributes: dict = field(default_factory=dict)
    status: str = "OK"

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "traceId": self.trace_id,
            "spanId": self.span_id,
            "parentSpanId": self.parent_id,
            "startTimeUnixNano": self.start_unix_nano,
            "endTimeUnixNano": self.end_unix_nano,
            "attributes": self.attributes,
            "status": self.status,
        }


class StageTracer:
    """Thread-safe span recorder with OTEL semantics and a bounded ring."""

    def __init__(self, service: str = "jetstream-spark"):
        self.service = service
        self._spans: collections.deque[Span] = collections.deque(maxlen=MAX_SPANS)
        self._lock = threading.Lock()
        self._local = threading.local()
        self._otel = _otel_trace.get_tracer(service) if _otel_trace is not None else None

    @contextlib.contextmanager
    def span(self, name: str, **attributes):
        """`with tracer.span("CommitBatch", batch_id=3):` — nesting on the
        same thread links parent ids, like OTEL context propagation."""
        parent: Span | None = getattr(self._local, "current", None)
        s = Span(
            name=name,
            trace_id=parent.trace_id if parent else secrets.token_hex(16),
            span_id=secrets.token_hex(8),
            parent_id=parent.span_id if parent else None,
            start_unix_nano=time.time_ns(),
            attributes=dict(attributes),
        )
        self._local.current = s
        otel_cm = self._otel.start_as_current_span(name) if self._otel is not None else None
        if otel_cm is not None:
            otel_span = otel_cm.__enter__()
            for k, v in attributes.items():
                with contextlib.suppress(Exception):
                    otel_span.set_attribute(k, v)
        try:
            yield s
        except BaseException as e:
            s.status = f"ERROR: {type(e).__name__}"
            raise
        finally:
            s.end_unix_nano = time.time_ns()
            self._local.current = parent
            if otel_cm is not None:
                otel_cm.__exit__(*sys.exc_info())
            with self._lock:
                self._spans.append(s)

    def recent(self, limit: int = 100) -> list[dict]:
        with self._lock:
            return [s.to_dict() for s in list(self._spans)[-limit:]]

    def render_json(self, limit: int = 100) -> str:
        return json.dumps({"service": self.service, "spans": self.recent(limit)}, indent=1)


def thread_dump() -> str:
    """All-thread tracebacks — the goroutine-dump analogue."""
    names = {t.ident: t.name for t in threading.enumerate()}
    out = []
    for ident, frame in sys._current_frames().items():
        out.append(f"thread {ident} [{names.get(ident, '?')}]:")
        out.extend(line.rstrip() for line in traceback.format_stack(frame))
        out.append("")
    return "\n".join(out)


def cpu_profile(seconds: float = 1.0, hz: int = 100) -> str:
    """Sampling CPU profile over all Python threads for `seconds`,
    rendered as collapsed flamegraph stacks ('a;b;c N') sorted by count.
    Wall-clock sampling (a sleeping thread keeps accruing samples in its
    blocking frame), which is what you want for finding a stalled stage."""
    interval = 1.0 / hz
    counts: collections.Counter[str] = collections.Counter()
    deadline = time.monotonic() + min(seconds, 30.0)
    me = threading.get_ident()
    while time.monotonic() < deadline:
        for ident, frame in sys._current_frames().items():
            if ident == me:
                continue
            stack = []
            f = frame
            while f is not None:
                stack.append(f"{f.f_code.co_name} ({f.f_code.co_filename.rsplit('/', 1)[-1]}:{f.f_lineno})")
                f = f.f_back
            counts[";".join(reversed(stack))] += 1
        time.sleep(interval)
    return "\n".join(f"{stack} {n}" for stack, n in counts.most_common())


def heap_profile(top: int = 25) -> str:
    """tracemalloc top allocation sites when tracing is active, else a gc
    object-type histogram — the `/debug/pprof/heap` analogue."""
    import tracemalloc

    if tracemalloc.is_tracing():
        snap = tracemalloc.take_snapshot()
        lines = [str(s) for s in snap.statistics("lineno")[:top]]
        return "tracemalloc top allocations:\n" + "\n".join(lines)
    hist = collections.Counter(type(o).__name__ for o in gc.get_objects())
    lines = [f"{n:>10}  {t}" for t, n in hist.most_common(top)]
    return (
        "tracemalloc inactive (start with tracemalloc.start() for site-level data);\n"
        "gc live-object histogram:\n" + "\n".join(lines)
    )
