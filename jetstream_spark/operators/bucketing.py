"""Bucketed (co-located) joins — the no-shuffle join path at 100 TB.

A fact-fact join (e.g. orders ⋈ lineitem on orderkey) shuffles BOTH sides
every query. Bucketing pays that shuffle once at write time: both tables
hash-partitioned into the same number of buckets on the join key and
sorted within buckets, so SortMergeJoin reads bucket i ⋈ bucket i directly
— `.explain` shows NO Exchange on either side (asserted in
tests/test_operators.py). This is the Spark analogue of the co-located
key-range layout the reference gets for free from its single Pebble store,
generalized to a distributed setting.

At scale: bucket count is chosen once per table family (power of two,
~128 MB per bucket file); every downstream join/aggregation on the bucket
key skips its shuffle. Re-bucketing is a full rewrite — pick keys that the
workload actually joins on (orderkey for the TPC-H family, did/collection
for the event log family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains any Exchange (shuffle) operator."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst plans a
    shuffle-free SortMergeJoin when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), key)
