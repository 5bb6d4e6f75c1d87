"""The enforced single-maintenance-owner contract (VERDICT r10 asks #4).

Trim and compaction are safe against readers and the ingest writer but
not against a SECOND maintenance actor over the same log (a one-shot
`trim` CLI can sweep a standing ticker's _compact_tmp_ stage mid-swap).
The reference cannot hit this — its store is embedded and single-process
(cmd/jetstream/main.go:188-205 runs trim inside the consumer). Here the
contract is a lease: an owner marker under the log dir, claimed on
start, touched every tick, released on clean stop, adoptable once stale.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from jetstream_spark.atproto import log as eventlog
from jetstream_spark.atproto import maintenance as maint_mod
from jetstream_spark.atproto.maintenance import (
    OWNER_FRESH_S,
    MaintenanceLoop,
    claim_owner,
    new_owner_token,
    owner_info,
    owner_is_fresh,
    release_owner,
)
from jetstream_spark.atproto.normalize import normalize_frames
from jetstream_spark.atproto.schema import RAW_FRAME_SCHEMA
from tests.fixtures import make_frames


def _quiet_loop(spark, log_dir) -> MaintenanceLoop:
    # huge interval + no compaction: the thread claims, ticks once over an
    # empty/static log, then sleeps — the test drives everything else
    return MaintenanceLoop(spark, log_dir, interval_s=3600, compact=False)


def test_second_loop_refused_until_first_releases(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    first = _quiet_loop(spark, log_dir).start()
    try:
        assert owner_is_fresh(log_dir)
        with pytest.raises(RuntimeError, match="another maintenance owner"):
            _quiet_loop(spark, log_dir).start()
    finally:
        assert first.stop() == "stopped"
    # clean stop releases the lease: the log is claimable again
    assert owner_info(log_dir) is None
    second = _quiet_loop(spark, log_dir).start()
    assert owner_is_fresh(log_dir)
    assert second.stop() == "stopped"


def test_stale_marker_is_adopted(spark, tmp_path):
    """A dead process's marker must not fence the log forever: past the
    freshness window the lease is adoptable (the standing loop touches its
    marker every 15 s tick, so a live owner never goes stale)."""
    log_dir = str(tmp_path / "log")
    claim_owner(log_dir, interval_s=15.0, owner="dead-process:1")
    path = os.path.join(log_dir, maint_mod.OWNER_MARKER)
    old = time.time() - OWNER_FRESH_S - 1
    os.utime(path, (old, old))
    assert not owner_is_fresh(log_dir)
    loop = _quiet_loop(spark, log_dir).start()
    try:
        assert owner_info(log_dir)["owner"] != "dead-process:1"
    finally:
        loop.stop()


def test_hung_loop_keeps_the_lease(spark, tmp_path, monkeypatch):
    """A wedged tick may still be mid-trim/compact: stop() reporting
    "hung" must NOT release the marker — a second actor stays fenced
    until the marker ages out (the adoptable-after-death path)."""
    log_dir = str(tmp_path / "log")
    loop = _quiet_loop(spark, log_dir)
    entered, release = threading.Event(), threading.Event()
    orig_tick = loop.tick

    def wedged_tick():
        orig_tick()
        entered.set()
        release.wait(30)

    monkeypatch.setattr(loop, "tick", wedged_tick)
    loop.start()
    try:
        assert entered.wait(10)
        assert loop.stop(join_timeout_s=0.5) == "hung"
        assert owner_is_fresh(log_dir), "hung owner must keep the lease"
        with pytest.raises(RuntimeError, match="another maintenance owner"):
            claim_owner(log_dir, 15.0, new_owner_token())
    finally:
        release.set()
        loop.stop(join_timeout_s=30)


def test_release_requires_matching_owner(tmp_path):
    log_dir = str(tmp_path / "log")
    claim_owner(log_dir, 15.0, owner="a:1")
    release_owner(log_dir, "b:2")
    assert owner_is_fresh(log_dir), "a non-owner's release must be a no-op"
    release_owner(log_dir, "a:1")
    assert owner_info(log_dir) is None


def test_oneshot_cli_refuses_under_fresh_owner(tmp_path, capsys):
    """The one-shot trim/compact commands respect the lease (and bail
    before touching Spark); --force is the explicit override."""
    from jetstream_spark.__main__ import _refuse_if_owned, main

    log_dir = str(tmp_path / "log")
    claim_owner(log_dir, 15.0, owner=f"{os.getpid()}:standing")
    assert main(["trim", "--data-dir", log_dir]) == 1
    assert main(["compact", "--data-dir", log_dir]) == 1
    out = capsys.readouterr().out
    assert "refusing" in out and "--force" in out
    assert _refuse_if_owned(log_dir, force=True) is False
    release_owner(log_dir, f"{os.getpid()}:standing")
    assert _refuse_if_owned(log_dir, force=False) is False


def test_marker_invisible_to_log_readers(spark, tmp_path):
    """The `_`-prefixed marker must never surface as data: replay over a
    log with a live lease reads exactly the ingested events (same hidden-
    file contract the _compact_* stages rely on)."""
    log_dir = str(tmp_path / "log")
    normalized = normalize_frames(
        spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    )
    n = normalized.count()
    eventlog.ingest_batch(normalized, log_dir, wall_clock_us=1_000_000, batch_id=0)
    claim_owner(log_dir, 15.0, owner="reader-test:1")
    assert eventlog.replay(spark, log_dir, cursor=0).count() == n


def test_dead_pid_marker_is_adopted_immediately(spark, tmp_path):
    """A crashed ingest must not fence its own restart for the freshness
    window: a FRESH marker whose recording pid is gone is adoptable now."""
    import subprocess
    import sys

    log_dir = str(tmp_path / "log")
    dead = subprocess.run([sys.executable, "-c", "import os; print(os.getpid())"],
                          capture_output=True, text=True)
    dead_pid = int(dead.stdout.strip())
    claim_owner(log_dir, 15.0, owner=f"{dead_pid}:1")
    # rewrite the pid field to the exited process (claim records OUR pid)
    import json as _json

    path = os.path.join(log_dir, maint_mod.OWNER_MARKER)
    info = _json.load(open(path))
    info["pid"] = dead_pid
    _json.dump(info, open(path, "w"))
    assert not owner_is_fresh(log_dir), "dead-pid marker must not fence"
    loop = _quiet_loop(spark, log_dir).start()
    try:
        assert owner_info(log_dir)["pid"] == os.getpid()
    finally:
        loop.stop()
