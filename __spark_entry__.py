"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query at sf0.001 (smoke check).
queries()     — every declared operator from SURVEY.md §2 as
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching DuckDB SQL per query (omitted only for
                genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary at sf0.001."""
    from jetstream_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jetstream_spark.queries import all_queries

    return {name: spec.build for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from jetstream_spark.queries import all_queries

    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
