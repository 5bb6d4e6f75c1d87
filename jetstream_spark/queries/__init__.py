"""The declared query catalog.

Every operator capability from SURVEY.md §2 (reference operators S1-S27 where
batch-expressible, the §2.2 relational surface, and the §2.3 LLM-data-pipeline
extensions) is declared here as a named QuerySpec: a Spark DataFrame builder
plus, where SQL-expressible, a DuckDB oracle SQL string computing the same
result (same column names — the driver hashes values after sorting columns by
name).
"""

from __future__ import annotations

from jetstream_spark.queries.spec import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    # imports deferred so a syntax error in one domain doesn't break the rest
    from jetstream_spark.queries import dedup, eventlog, multimodal, relational, relational2, relational3, similarity, text

    registry: dict[str, QuerySpec] = {}
    for module in (relational, relational2, relational3, eventlog, dedup, similarity, text, multimodal):
        for spec in module.QUERIES:
            assert spec.name not in registry, f"duplicate query name {spec.name}"
            registry[spec.name] = spec
    return registry
