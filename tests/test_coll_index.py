"""Collection-group derived layout: the probe must be partition-pruned
(coll_group PartitionFilters), equal log.replay's results exactly, and
always include account/identity events (the S17 bypass rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jetstream_spark.atproto import log as eventlog
from jetstream_spark.atproto.coll_index import (
    N_COLL_GROUPS,
    build_coll_index,
    coll_group_of,
    probe_groups,
    replay_filtered,
)
from jetstream_spark.atproto.normalize import normalize_frames
from jetstream_spark.atproto.schema import RAW_FRAME_SCHEMA
from tests.fixtures import make_frames


@pytest.fixture(scope="module")
def log_and_index(spark, tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("colllog"))
    frames = spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    eventlog.ingest_batch(normalize_frames(frames), log_dir, wall_clock_us=1_000_000)
    index_dir = str(tmp_path_factory.mktemp("collidx"))
    build_coll_index(spark, log_dir, index_dir)
    return log_dir, index_dir


def test_group_expr_matches_python(spark, log_and_index):
    _, index_dir = log_and_index
    rows = (
        spark.read.parquet(index_dir)
        .select(F.col("commit.collection").alias("c"), "coll_group")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["coll_group"] == coll_group_of(r["c"])


def test_probe_is_partition_pruned(spark, log_and_index):
    _, index_dir = log_and_index
    groups = probe_groups(["app.bsky.feed.post"])
    assert len(groups) <= 2 < N_COLL_GROUPS
    probed = spark.read.parquet(index_dir).where(F.col("coll_group").isin(groups))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "coll_group" in pf_line


def test_filtered_replay_equals_primary_log(spark, log_and_index):
    log_dir, index_dir = log_and_index
    wanted = ["app.bsky.feed.post"]
    primary = eventlog.replay(spark, log_dir, wanted_collections=wanted).collect()
    derived = replay_filtered(spark, index_dir, wanted).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, primary))
    # bypass rule: account/identity events must be present in both
    kinds = {r["type"] for r in derived}
    assert {"acc", "id"}.issubset(kinds)


def test_filtered_replay_with_cursor_and_dids(spark, log_and_index):
    log_dir, index_dir = log_and_index
    times = [r["time_us"] for r in eventlog.replay(spark, log_dir).collect()]
    cursor = times[len(times) // 2]
    wanted = ["app.bsky.feed.like"]
    dids = ["did:plc:user001", "did:plc:user002"]
    primary = eventlog.replay(
        spark, log_dir, cursor=cursor, wanted_collections=wanted, wanted_dids=dids
    ).collect()
    derived = replay_filtered(
        spark, index_dir, wanted, cursor=cursor, wanted_dids=dids
    ).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, primary))


def test_incremental_refresh_overwrites_only_touched_buckets(spark, tmp_path):
    """refresh_coll_index must replace exactly the refreshed hour bucket's
    partitions and leave other buckets' directories byte-untouched."""
    import os

    from jetstream_spark.atproto.coll_index import refresh_coll_index

    log_dir = str(tmp_path / "log")
    frames = spark.createDataFrame(make_frames(), schema=RAW_FRAME_SCHEMA)
    norm = normalize_frames(frames)
    # bucket 0 and a second batch an hour later (bucket 1)
    h = eventlog.ingest_batch(norm, log_dir, wall_clock_us=1_000_000)
    eventlog.ingest_batch(norm, log_dir, wall_clock_us=h + 3_600_000_000)
    index_dir = str(tmp_path / "idx")
    build_coll_index(spark, log_dir, index_dir)

    def bucket_files(bucket):
        out = {}
        for g in os.listdir(index_dir):
            if not g.startswith("coll_group="):
                continue
            d = os.path.join(index_dir, g, f"hour_bucket={bucket}")
            if os.path.isdir(d):
                for fn in os.listdir(d):
                    if fn.endswith(".parquet"):
                        p = os.path.join(d, fn)
                        out[p] = os.path.getmtime(p)
        return out

    before_b0, before_b1 = bucket_files(0), bucket_files(1)
    assert before_b0 and before_b1
    refresh_coll_index(spark, log_dir, index_dir, buckets=[1])
    assert bucket_files(0) == before_b0, "untouched bucket must keep its files"
    assert set(bucket_files(1)) != set(before_b1) or bucket_files(1) != before_b1

    # full equality with the primary log after refresh
    primary = eventlog.replay(spark, log_dir, wanted_collections=["app.bsky.feed.post"]).collect()
    derived = replay_filtered(spark, index_dir, ["app.bsky.feed.post"]).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, primary))
