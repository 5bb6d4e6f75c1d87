"""QuerySpec — one declared engine capability.

``build(spark, sf_dir)`` returns the Spark result; ``oracle`` is the DuckDB
SQL computing the same values over the same parquet tables (views named
region/nation/customer/supplier/part/orders/lineitem/events/documents/
embeddings are pre-registered by the driver). ``oracle=None`` marks a
genuinely non-SQL-expressible operator (driver records a rows-only check).

Column-name contract: every computed column is aliased identically in the
Spark builder and the oracle SQL — the driver sorts columns by name before
hashing values.

Float contract: any column whose value depends on float summation order is
rounded (same digits both sides) so Spark's and DuckDB's accumulation order
cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
