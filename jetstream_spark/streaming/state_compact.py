"""Crash-safe compaction for the standing monitors' per-batch state parts.

The anomaly / SCD2 streams accumulate one `b{batch_id}` parquet directory
per micro-batch; their read sides re-aggregate across parts, so the part
COUNT only costs file listings — but an unbounded standing job should not
list thousands of directories forever. Compaction folds all current parts
into one `c{n}` part with the SAME merge the reader applies, so the merged
state is bit-identical before and after (asserted in tests).

Swap protocol (the atproto/log.py compaction lesson, adapted to N-dir
absorption — no multi-dir atomic rename exists):

1. write the merged frame under `_compact_tmp`
2. write `_compact_manifest.json` {absorbed: [...], merged: "cN"}
3. rename tmp → cN                 (the commit point)
4. delete absorbed part dirs
5. delete the manifest

`recover()` resolves every crash window: tmp with no manifest → drop tmp
(nothing committed); manifest but no merged dir → drop manifest+tmp (still
nothing committed); manifest AND merged dir → finish the deletes. The
reader (`list_parts`) consults the manifest so a half-deleted state never
double-counts: once the merged dir exists, absorbed parts are excluded
even if their dirs still linger.

Batch replay stays exactly-once: the done-marker file is untouched, so a
crash-replayed absorbed batch is skipped by its marker before it could
write a fresh `b` dir.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_compact_manifest.json"
TMP = "_compact_tmp"


def _entries(d: str) -> list[str]:
    return sorted(
        e for e in os.listdir(d) if e[0] in "bc" and e[1:].isdigit()
    )


def recover(subdir: str) -> None:
    """Resolve any interrupted compaction; idempotent, safe to call always."""
    man_path = os.path.join(subdir, MANIFEST)
    tmp_path = os.path.join(subdir, TMP)
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        merged = os.path.join(subdir, man["merged"])
        if os.path.isdir(merged):
            for name in man["absorbed"]:
                shutil.rmtree(os.path.join(subdir, name), ignore_errors=True)
            os.remove(man_path)
        else:
            os.remove(man_path)
            shutil.rmtree(tmp_path, ignore_errors=True)
    elif os.path.isdir(tmp_path):
        shutil.rmtree(tmp_path, ignore_errors=True)


def list_parts(subdir: str) -> list[str]:
    """Part directories a reader should load — manifest-aware, so a
    mid-recovery state never double-counts absorbed parts."""
    if not os.path.isdir(subdir):
        return []
    names = _entries(subdir)
    man_path = os.path.join(subdir, MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if os.path.isdir(os.path.join(subdir, man["merged"])):
            absorbed = set(man["absorbed"])
            names = [n for n in names if n not in absorbed]
    return [os.path.join(subdir, n) for n in names]


def compact(
    spark: SparkSession,
    subdir: str,
    merge: "callable[[DataFrame], DataFrame]",
    min_parts: int = 2,
    done_batches: "set[int] | None" = None,
) -> bool:
    """Fold all current parts into one via `merge` (the reader's own
    re-aggregation). Returns True if a compaction happened.

    `done_batches` coordinates against a CONCURRENTLY RUNNING stream: a
    `b{id}` directory whose parquet write is still in flight (batch not
    yet done-marked) must not be read half-written, folded in, and
    deleted. When provided, only done-marked b-dirs are absorbed;
    committed `c` parts are always safe (their rename IS the commit).
    Callers pass load_done_batches(state_dir) — see the stream modules."""
    recover(subdir)
    paths = list_parts(subdir)
    if done_batches is not None:
        paths = [
            p
            for p in paths
            if os.path.basename(p).startswith("c")
            or int(os.path.basename(p)[1:]) in done_batches
        ]
    if len(paths) < min_parts:
        return False
    names = [os.path.basename(p) for p in paths]
    gen = max(int(n[1:]) for n in names) + 1
    merged_name = f"c{gen}"
    tmp_path = os.path.join(subdir, TMP)
    shutil.rmtree(tmp_path, ignore_errors=True)
    merge(spark.read.parquet(*paths)).write.parquet(tmp_path)
    man_path = os.path.join(subdir, MANIFEST)
    with open(man_path + ".tmp", "w") as f:
        json.dump({"absorbed": names, "merged": merged_name}, f)
    os.replace(man_path + ".tmp", man_path)
    os.rename(tmp_path, os.path.join(subdir, merged_name))  # commit point
    for n in names:
        shutil.rmtree(os.path.join(subdir, n), ignore_errors=True)
    os.remove(man_path)
    return True
