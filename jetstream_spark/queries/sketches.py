"""Mergeable sketch operators (SURVEY.md §2.3 extensions).

Count-min sketch over the corpus term stream: D=4 hash rows x W=1024
buckets, hashes derived from md5 (engine-independent — the same fold
arithmetic as `sample_split`'s bucket), so unlike HLL/approx_percentile
(engine-specific estimators, error-bound-tested in tests/test_operators)
the CMS estimate is a DETERMINISTIC function of the data and carries an
exact SQL oracle.

Scale notes (100 TB): the sketch build is the canonical mergeable-partial
shape — explode tokens x D rows, partial-count map-side, one shuffle to
<= D*W rows. The sketch table (<=4096 rows) broadcasts back for probing;
heavy-hitter selection is a distributed top-k (TakeOrderedAndProject).
CMS guarantee (estimate >= true count) is asserted corpus-wide in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.queries.text import _TOKENS_SQL, _tokens
from jetstream_spark.tables import table

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOP_N = 20


def _cms_bucket(j: F.Column, term: F.Column) -> F.Column:
    """bucket_j(term) = first-4-hex(md5(j || ':' || term)) mod W —
    16 bits folded mod 1024, engine-independent."""
    h = F.md5(F.concat(j.cast("string"), F.lit(":"), term).cast("binary"))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % CMS_WIDTH)


def _cms_bucket_sql(j_expr: str, term_expr: str) -> str:
    md5_arg = f"CAST({j_expr} AS VARCHAR) || ':' || {term_expr}"
    return (
        "(("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({md5_arg}), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
            for i in range(4)
        )
        + f") % {CMS_WIDTH})"
    )


def cms_estimates(terms: DataFrame) -> DataFrame:
    """(term, exact_count, cms_estimate, overcount) for the CMS_TOP_N
    heavy hitters of a (term) stream. The sketch and the exact counts are
    built from the same exploded frame; the estimate is min over the D
    hash rows of that row's bucket count."""
    spark = terms.sparkSession
    js = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("j"))
    keyed = terms.crossJoin(F.broadcast(js)).select(
        "term", "j", _cms_bucket(F.col("j"), F.col("term")).alias("b")
    )
    sketch = keyed.groupBy("j", "b").agg(F.count(F.lit(1)).alias("bucket_count"))
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("exact_count"))
    top = exact.orderBy(F.desc("exact_count"), "term").limit(CMS_TOP_N)
    probe = top.crossJoin(F.broadcast(js)).select(
        "term", "exact_count", "j", _cms_bucket(F.col("j"), F.col("term")).alias("b")
    )
    return (
        probe.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("term", "exact_count")
        .agg(F.min("bucket_count").alias("cms_estimate"))
        .select(
            "term",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
        )
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(_tokens()).alias("term"))
    return cms_estimates(terms)


_J_SERIES = ", ".join(str(j) for j in range(CMS_DEPTH))

Q_CMS_ORACLE = f"""
WITH terms AS (
  SELECT unnest({_TOKENS_SQL}) AS term FROM documents
), js AS (
  SELECT unnest([{_J_SERIES}]) AS j
), keyed AS (
  SELECT term, j, {_cms_bucket_sql('j', 'term')} AS b FROM terms CROSS JOIN js
), sketch AS (
  SELECT j, b, count(*) AS bucket_count FROM keyed GROUP BY j, b
), exact AS (
  SELECT term, count(*) AS exact_count FROM terms GROUP BY term
), top AS (
  SELECT term, exact_count FROM exact ORDER BY exact_count DESC, term LIMIT {CMS_TOP_N}
), probe AS (
  SELECT t.term, t.exact_count, js.j, {_cms_bucket_sql('js.j', 't.term')} AS b
  FROM top t CROSS JOIN js
)
SELECT p.term, p.exact_count,
       min(s.bucket_count) AS cms_estimate,
       min(s.bucket_count) - p.exact_count AS overcount
FROM probe p JOIN sketch s ON s.j = p.j AND s.b = p.b
GROUP BY p.term, p.exact_count
"""


QUERIES = [
    QuerySpec("cms_heavy_hitters", q_cms_heavy_hitters, Q_CMS_ORACLE, "deterministic count-min sketch vs exact heavy hitters", ("sketch", "text")),
]
