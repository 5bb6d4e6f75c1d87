"""Canonical event schemas.

The envelope mirrors the reference's one core type
(/root/reference/pkg/models/models.go:9-35): exactly one of
commit/account/identity is non-null, selected by `type`; omitempty JSON
tags become nullable fields (FIXTURES.md A.1).

The raw-frame schema models what the firehose delivers *before*
normalization (one frame per repo commit, with an ops array —
consumer.go:194's loop input), so the normalize stage can be tested
without a live websocket.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# 'com' | 'acc' | 'id' — models.go:27-31
EVENT_COMMIT = "com"
EVENT_ACCOUNT = "acc"
EVENT_IDENTITY = "id"

# 'c' | 'u' | 'd' — models.go:32-34
COMMIT_CREATE = "c"
COMMIT_UPDATE = "u"
COMMIT_DELETE = "d"

COMMIT_STRUCT = StructType(
    [
        StructField("rev", StringType(), True),
        StructField("type", StringType(), False),
        StructField("collection", StringType(), True),
        StructField("rkey", StringType(), True),
        StructField("record", StringType(), True),  # raw JSON — never parsed (models.go:23)
        StructField("cid", StringType(), True),
    ]
)

ACCOUNT_STRUCT = StructType(
    [
        StructField("active", BooleanType(), True),
        StructField("did", StringType(), True),
        StructField("seq", LongType(), True),
        StructField("time", StringType(), True),
        StructField("status", StringType(), True),
    ]
)

IDENTITY_STRUCT = StructType(
    [
        StructField("did", StringType(), True),
        StructField("handle", StringType(), True),
        StructField("seq", LongType(), True),
        StructField("time", StringType(), True),
    ]
)

EVENT_SCHEMA = StructType(
    [
        StructField("did", StringType(), False),
        StructField("time_us", LongType(), False),
        StructField("type", StringType(), False),
        StructField("commit", COMMIT_STRUCT, True),
        StructField("account", ACCOUNT_STRUCT, True),
        StructField("identity", IDENTITY_STRUCT, True),
    ]
)

# One op inside a commit frame (consumer.go:194-305's loop element):
# path = "<collection>/<rkey>"; record JSON + cid claims for create/update.
# record_cid is the CID of the record actually fetched from the CAR blocks
# (consumer.go:222-231) — mismatch vs `cid` means integrity failure.
OP_STRUCT = StructType(
    [
        StructField("action", StringType(), False),  # create | update | delete
        StructField("path", StringType(), False),
        StructField("cid", StringType(), True),
        StructField("record_json", StringType(), True),
        StructField("record_cid", StringType(), True),
    ]
)

RAW_FRAME_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),  # commit | account | identity
        StructField("did", StringType(), False),
        StructField("seq", LongType(), False),  # upstream relay sequence
        StructField("rev", StringType(), True),
        StructField("too_big", BooleanType(), True),  # consumer.go:105-108
        StructField("ops", ArrayType(OP_STRUCT), True),
        StructField("account", ACCOUNT_STRUCT, True),
        StructField("identity", IDENTITY_STRUCT, True),
    ]
)
