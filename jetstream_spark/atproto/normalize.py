"""Normalize: raw firehose frames → flat Event envelopes.

Re-expresses the reference's per-event Go handlers as one declarative
DataFrame transform, so Catalyst fuses the whole stage into a single
codegen'd pass (the reference runs 100 hand-pooled workers for this —
main.go:150; Spark's task parallelism replaces the pool, S2):

  S3 event-kind dispatch   consumer.go:99-161   → per-kind branches, union
  S4 TooBig guard          consumer.go:105-108  → filter(~too_big)
  S6 op explode            consumer.go:194-305  → explode(ops) + split(path)
  S7 CID verify            consumer.go:222-231  → filter(cid == record_cid)
  S9 envelope build        consumer.go:210-301  → struct() projection

S5/S8 (CAR/CBOR decode) happen upstream of this schema: a real firehose
source decodes CAR blocks into `ops[].record_json` before frames reach
here (the decode UDF slot is jetstream_spark.streaming.firehose). Works
identically on batch and streaming DataFrames (same API → reusable in
readStream pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jetstream_spark.atproto.schema import (
    COMMIT_CREATE,
    COMMIT_DELETE,
    COMMIT_UPDATE,
    EVENT_ACCOUNT,
    EVENT_COMMIT,
    EVENT_IDENTITY,
)

def _null_commit():
    return F.lit(None).cast(
        "struct<rev:string,type:string,collection:string,rkey:string,record:string,cid:string>"
    )


def _null_account():
    return F.lit(None).cast("struct<active:boolean,did:string,seq:bigint,time:string,status:string>")


def _null_identity():
    return F.lit(None).cast("struct<did:string,handle:string,seq:bigint,time:string>")


def normalize_frames(frames: DataFrame) -> DataFrame:
    """RAW_FRAME_SCHEMA rows → EVENT_SCHEMA rows (minus time_us, which the
    sequencer assigns downstream — consumer.go:326 happens after this).

    Keeps the upstream `seq` as `_seq` for cursor checkpointing (S12).
    """
    commits = frames.where(
        (F.col("kind") == "commit") & ~F.coalesce(F.col("too_big"), F.lit(False))
    )
    ops = commits.select(
        "did", "seq", "rev", F.explode("ops").alias("op")
    )
    # integrity filter: create/update must carry a record whose CID matches
    # the op's claim (consumer.go:229-231, 265-268); deletes carry neither
    is_mutation = F.col("op.action").isin("create", "update")
    cid_ok = (~is_mutation) | (
        F.col("op.record_json").isNotNull()
        & (F.coalesce(F.col("op.cid") == F.col("op.record_cid"), F.lit(False)))
    )
    ops = ops.where(cid_ok)
    action = (
        F.when(F.col("op.action") == "create", COMMIT_CREATE)
        .when(F.col("op.action") == "update", COMMIT_UPDATE)
        .otherwise(COMMIT_DELETE)
    )
    commit_events = ops.select(
        "did",
        F.col("seq").alias("_seq"),
        F.lit(EVENT_COMMIT).alias("type"),
        F.struct(
            F.col("rev").alias("rev"),
            action.alias("type"),
            F.split("op.path", "/").getItem(0).alias("collection"),
            F.split("op.path", "/").getItem(1).alias("rkey"),
            # deletes carry no record/cid (consumer.go:290-297)
            F.when(is_mutation, F.col("op.record_json")).alias("record"),
            F.when(is_mutation, F.col("op.cid")).alias("cid"),
        ).alias("commit"),
        _null_account().alias("account"),
        _null_identity().alias("identity"),
    )

    account_events = frames.where(F.col("kind") == "account").select(
        "did",
        F.col("seq").alias("_seq"),
        F.lit(EVENT_ACCOUNT).alias("type"),
        _null_commit().alias("commit"),
        F.col("account"),
        _null_identity().alias("identity"),
    )

    identity_events = frames.where(F.col("kind") == "identity").select(
        "did",
        F.col("seq").alias("_seq"),
        F.lit(EVENT_IDENTITY).alias("type"),
        _null_commit().alias("commit"),
        _null_account().alias("account"),
        F.col("identity"),
    )

    return commit_events.unionByName(account_events).unionByName(identity_events)
