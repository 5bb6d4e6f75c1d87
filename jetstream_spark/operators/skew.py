"""Skew-aware join: salting for hot keys (SURVEY §2.3 / M5 scale work).

The firehose workload is DID-skewed (a few hyperactive repos dominate —
the reference handles this with per-repo FIFO queues, parallel.go:92-152;
in Spark the analogue problem is one reducer owning a hot join key).
AQE's skew-join split handles sort-merge cases; `salted_join` is the
explicit form for when the small side is broadcastable-after-explosion
or when AQE can't see the skew (e.g. post-UDF stats).

  large ⋈ small on key   →   large(+salt = hash(row)%N) ⋈ small×[0..N)
                             on (key, salt)

Exact same result set; hot keys fan across N reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_partitions: int = 16,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join `large` with `small` on column `on`, salting the key N ways.

    `salt_source` is any deterministic per-row expression on the large side
    (defaults to a hash over all large-side columns); the small side is
    replicated N× — keep it dimension-sized.
    """
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in large.columns])
    salted_large = large.withColumn("_salt", F.pmod(salt_source, F.lit(salt_partitions)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_partitions - 1)))
    )
    joined = salted_large.join(salted_small, [on, "_salt"], how)
    return joined.drop("_salt")
