"""S16 — the wire format: one JSON text frame per event.

Byte-level contract from the reference (models.go:9-25 + serialize-once at
server.go:73):

  * top-level keys: did, time_us, type, then exactly one of
    commit/account/identity — absent (not null) when empty (`omitempty`)
  * commit.record is RAW JSON (json.RawMessage) — spliced into the frame
    as an object, NOT a quoted string
  * deletes carry no record/cid keys at all

Spark mapping: `to_json` drops null fields by default (= omitempty);
`parse_json` lifts the stored record string to VARIANT so `to_json`
embeds it as raw JSON. The projection is computed ONCE upstream of any
fan-out (P3 serialize-once): subscriber queries filter on the retained
envelope columns next to the prebuilt `value`, never re-serializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_wire(df: DataFrame) -> DataFrame:
    """Envelope rows → (did, time_us, type, collection, value) where value
    is the reference-format JSON frame. Filter columns ride alongside so
    S17 predicates never touch the JSON."""
    commit_variant = F.when(
        F.col("commit").isNotNull(),
        F.struct(
            F.col("commit.rev").alias("rev"),
            F.col("commit.type").alias("type"),
            F.col("commit.collection").alias("collection"),
            F.col("commit.rkey").alias("rkey"),
            F.when(F.col("commit.record").isNotNull(), F.parse_json(F.col("commit.record"))).alias(
                "record"
            ),
            F.col("commit.cid").alias("cid"),
        ),
    )
    frame = F.struct(
        F.col("did"),
        F.col("time_us"),
        F.col("type"),
        commit_variant.alias("commit"),
        F.col("account"),
        F.col("identity"),
    )
    return df.select(
        "did",
        "time_us",
        "type",
        F.col("commit.collection").alias("collection"),
        F.to_json(frame).alias("value"),
    )
