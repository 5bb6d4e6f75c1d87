"""Collection-group derived layout for the event log — physical pruning
for collection-filtered replay (S14+S17 at 100 TB).

The primary log (log.py) is hour-partitioned, matching the reference's
time-leading Pebble key — a collection-filtered replay there scans every
file in the time range and filters rows (exactly what the reference's
iterator does, persist.go:143-204). At 100 TB that reads the whole log to
deliver one collection. This module materializes the other access path as
a DERIVED table, the same pattern as operators/ann_index.py: the log
rewritten `coll_group=<g>/hour_bucket=<h>/`, so a subscription for
app.bsky.feed.post prunes to 1/N_COLL_GROUPS of the files BEFORE the hour
pruning even applies.

Group id = md5-fold of the collection name (the engine-independent
arithmetic sample_split already uses), so group membership is computable
in Python at probe time without touching Spark. Account/identity events
(no collection) land in the group of "" — and because the S17 bypass rule
says those events pass every collection filter, a probe ALWAYS includes
that group.

Derived, not primary: the ingest path's exactly-once commit protocol keys
on flat hour-partitioned batch files and stays untouched; a standing
deployment refreshes this layout incrementally per sealed hour bucket.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.atproto.log import US_PER_HOUR, apply_subscription_filters, read_log

N_COLL_GROUPS = 16


def coll_group_of(collection: str | None) -> int:
    """Python-side group id — MUST match coll_group_expr (first 4 hex chars
    of md5 → int → mod N)."""
    h = hashlib.md5((collection or "").encode("utf-8")).hexdigest()
    return int(h[:4], 16) % N_COLL_GROUPS


def coll_group_expr() -> F.Column:
    h = F.md5(F.coalesce(F.col("commit.collection"), F.lit("")).cast("binary"))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % N_COLL_GROUPS).cast("int")


def build_coll_index(spark: SparkSession, log_dir: str, index_dir: str) -> None:
    """One rewrite of the log as coll_group/hour_bucket directories; rows
    stay time-sorted within files so row-group stats keep pruning inside
    an hour."""
    (
        read_log(spark, log_dir)
        .withColumn("coll_group", coll_group_expr())
        .sortWithinPartitions("time_us")
        .write.mode("overwrite")
        .partitionBy("coll_group", "hour_bucket")
        .parquet(index_dir)
    )


def refresh_coll_index(
    spark: SparkSession, log_dir: str, index_dir: str, buckets: list[int]
) -> None:
    """Incremental refresh: rewrite ONLY the given (sealed) hour buckets
    into the derived layout — dynamic partition overwrite replaces exactly
    the (coll_group, hour_bucket) partitions the new data touches, leaving
    every other bucket's directories untouched. This is the standing
    deployment's per-sealed-bucket maintenance step; build_coll_index is
    the bootstrap."""
    df = (
        read_log(spark, log_dir)
        .where(F.col("hour_bucket").isin([int(b) for b in buckets]))
        .withColumn("coll_group", coll_group_expr())
        .sortWithinPartitions("time_us")
    )
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("coll_group", "hour_bucket")
        .parquet(index_dir)
    )


def probe_groups(wanted_collections: list[str]) -> list[int]:
    """Groups a filtered replay must read: each wanted collection's group
    plus the no-collection group (account/identity bypass, server.go's
    'all subscribers receive Account and Identity events')."""
    groups = {coll_group_of(c) for c in wanted_collections}
    groups.add(coll_group_of(None))
    return sorted(groups)


def replay_filtered(
    spark: SparkSession,
    index_dir: str,
    wanted_collections: list[str],
    cursor: int | None = None,
    wanted_dids: list[str] | None = None,
) -> DataFrame:
    """Collection-filtered replay over the derived layout: coll_group IN
    (...) and hour_bucket >= cursor-hour are both PARTITION filters (the
    scan never opens non-matching directories); the exact collection
    predicate + bypass rule then applies row-wise as in log.replay.
    Result is identical to log.replay(log_dir, ...) with the same
    arguments — asserted in tests/test_coll_index.py."""
    df = spark.read.parquet(index_dir).where(F.col("coll_group").isin(probe_groups(wanted_collections)))
    if cursor is not None:
        df = df.where(
            (F.col("hour_bucket") >= cursor // US_PER_HOUR) & (F.col("time_us") >= cursor)
        )
    df = apply_subscription_filters(df, wanted_collections, wanted_dids)
    return df.drop("hour_bucket", "coll_group").orderBy("time_us")
