"""Source-fingerprint freshness for materialized index layouts.

Both materialized indexes (the MinHash band index, dedup_index.py, and the
ANN LSH/IVF layouts, ann_index.py) follow a build-once/probe-many contract:
rebuild only when the source corpus changed. "Changed" is decided by VALUE
— a sidecar `_source_fingerprint.json` recording the source parquet's file
count, total size, and max mtime_ns, written at build time and compared
exactly at probe time. A raw mtime ORDERING check (marker newer than
source?) silently reuses a stale index when the corpus is regenerated with
preserved or backdated timestamps (cp -p, archive extraction) — which the
round-start testdata refresh can do.
"""

from __future__ import annotations

import json
import os

FPRINT_FILE = "_source_fingerprint.json"


def source_fingerprint(src: str) -> dict:
    """Identity of a source parquet file (or directory of part files)."""
    if os.path.isdir(src):
        parts = sorted(os.path.join(r, f) for r, _, fs in os.walk(src) for f in fs)
    else:
        parts = [src]
    stats = [os.stat(p) for p in parts]
    return {
        "n_files": len(stats),
        "total_size": sum(s.st_size for s in stats),
        "max_mtime_ns": max((s.st_mtime_ns for s in stats), default=0),
    }


def write_source_fingerprint(index_path: str, src: str) -> None:
    with open(os.path.join(index_path, FPRINT_FILE), "w") as f:
        json.dump(source_fingerprint(src), f)


def index_is_fresh(index_path: str, src: str) -> bool:
    """A completed write (_SUCCESS) whose recorded source fingerprint still
    matches the source exactly. No sidecar (pre-fingerprint layout or
    partial write) → stale, rebuild."""
    try:
        if not os.path.exists(os.path.join(index_path, "_SUCCESS")):
            return False
        with open(os.path.join(index_path, FPRINT_FILE)) as f:
            return json.load(f) == source_fingerprint(src)
    except (OSError, ValueError):
        return False
