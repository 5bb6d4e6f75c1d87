"""Embedding clustering operators (SURVEY.md §2.3 extensions): the
cluster-then-curate shapes (SemDeDup, cluster-balanced sampling) a
training-data pipeline runs over an embedding column.

- kmeans_cluster_stats: one deterministic Lloyd round over the IVF coarse
  quantizer's fixed seed centroids (corpus rows 100-115, L2-normalized —
  the same quantizer as `ann_ivf_topk`): assign every vector to its
  argmax-cosine cell, then report per-cluster size, cohesion (mean cosine
  to the assigned centroid), and the centroid shift one mean-update would
  apply. The convergence probe of a k-means training loop, expressed as
  one declarative plan.
- semdedup_pairs: SemDeDup (Abbas et al.) — near-duplicate pairs detected
  WITHIN clusters only: pairwise cosine >= the dedup threshold, but only
  for vectors quantized into the same cell. The quadratic is bounded per
  cluster instead of per corpus — the approximation that makes
  embedding-dedup tractable at 100 TB (its exact counterpart is
  `dedup_embedding_cosine`; containment of the pair sets is
  property-tested).

Scale notes: the 16-row centroid table broadcasts; assignment is one
map-side cross join + a partial-aggregated max-struct per vector (no
window, no shuffle before the agg's own exchange). The SemDeDup self-join
shuffles both sides once on the cell key; pair volume is sum of
per-cluster quadratics, the operator's defining bound. Everything is
JVM-side zip_with/aggregate arithmetic — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.queries.dedup import COS_T
from jetstream_spark.queries.similarity import (
    _COS_E_SQL,
    _IVF_CENTROID_BASE,
    IVF_CELLS,
)
from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table

EMB_DIM = 64


def _e_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings as (vec_id, v: array<double>, nrm) — the Spark twin of
    the oracle's `e` CTE."""
    v = F.col("embedding").cast("array<double>")
    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        v.alias("v"),
        F.sqrt(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        ).alias("nrm"),
    )


def _cents_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF coarse quantizer: corpus rows [100, 116) L2-normalized, as a
    16-row (cell, cv) frame. Bounded collect (16 rows), like q_ann_ivf."""
    rows = (
        _e_frame(spark, sf_dir)
        .where(
            (F.col("vec_id") >= _IVF_CENTROID_BASE)
            & (F.col("vec_id") < _IVF_CENTROID_BASE + IVF_CELLS)
        )
        .select("vec_id", "v", "nrm")
        .collect()
    )
    data = [
        (int(r["vec_id"]) - _IVF_CENTROID_BASE, [x / r["nrm"] for x in r["v"]])
        for r in sorted(rows, key=lambda r: r["vec_id"])
    ]
    return spark.createDataFrame(data, "cell int, cv array<double>")


def assign_cells(e: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell, dot, nrm): each vector's argmax-cosine cell against
    the broadcast quantizer. Ties break to the LOWEST cell (struct max on
    (dot, -cell) — the oracle's `ORDER BY dot DESC, cell` rank). The
    per-vector max is a partial-aggregated groupBy, not a window: the
    16-way candidate expansion collapses map-side before the exchange."""
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    best = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "nrm", F.struct(dot.alias("dot"), (-F.col("cell")).alias("negc")).alias("cand"))
        .groupBy("vec_id")
        .agg(F.max("cand").alias("m"), F.first("nrm").alias("nrm"))
    )
    return best.select(
        "vec_id",
        (-F.col("m.negc")).cast("int").alias("cell"),
        F.col("m.dot").alias("dot"),
        "nrm",
    )


def q_kmeans_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _e_frame(spark, sf_dir)
    cents = _cents_frame(spark, sf_dir)
    members = assign_cells(e, cents).join(e.select("vec_id", "v"), "vec_id")
    per_cell = members.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(F.col("dot") / F.col("nrm")), 6).alias("cohesion"),
        F.array(*[F.avg(F.element_at("v", i + 1)) for i in range(EMB_DIM)]).alias("mean_v"),
    )
    shift = F.sqrt(
        F.aggregate(
            F.zip_with("mean_v", "cv", lambda m, c: (m - c) * (m - c)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return (
        per_cell.join(F.broadcast(cents), "cell")
        .select("cell", "n_vecs", "cohesion", F.round(shift, 6).alias("centroid_shift"))
        .orderBy("cell")
    )


_CELLS_SQL = f"""
cents AS (
  SELECT vec_id - {_IVF_CENTROID_BASE} AS cell,
         list_transform(v, x -> x / nrm) AS cv
  FROM e
  WHERE vec_id >= {_IVF_CENTROID_BASE} AND vec_id < {_IVF_CENTROID_BASE + IVF_CELLS}
),
celldot AS (
  SELECT e.vec_id, c.cell,
         list_aggregate(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c.cv[i]), 'sum') AS dot,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_aggregate(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c.cv[i]), 'sum') DESC,
                    c.cell
         ) AS rn
  FROM e, cents c
),
assign AS (
  SELECT vec_id, cell, dot FROM celldot WHERE rn = 1
)"""

Q_KMEANS_ORACLE = f"""
WITH e AS ({_COS_E_SQL}),
{_CELLS_SQL},
members AS (
  SELECT a.cell, a.dot, e.nrm, e.v FROM assign a JOIN e USING (vec_id)
),
dims AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS i),
dimmeans AS (
  SELECT m.cell, d.i, avg(m.v[d.i]) AS mean_d
  FROM members m CROSS JOIN dims d
  GROUP BY m.cell, d.i
),
shifts AS (
  SELECT dm.cell, sqrt(sum((dm.mean_d - c.cv[dm.i]) * (dm.mean_d - c.cv[dm.i]))) AS shift
  FROM dimmeans dm JOIN cents c USING (cell)
  GROUP BY dm.cell
)
SELECT m.cell, count(*) AS n_vecs,
       round(avg(m.dot / m.nrm), 6) AS cohesion,
       round(any_value(s.shift), 6) AS centroid_shift
FROM members m JOIN shifts s ON s.cell = m.cell
GROUP BY m.cell
ORDER BY m.cell
"""


def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _e_frame(spark, sf_dir)
    cents = _cents_frame(spark, sf_dir)
    members = assign_cells(e, cents).select("vec_id", "cell", "nrm").join(
        e.select("vec_id", "v"), "vec_id"
    )
    a, b = members.alias("a"), members.alias("b")
    cos = (
        F.aggregate(
            F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.cell").alias("cell"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= COS_T)
        .select("cell", "vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


Q_SEMDEDUP_ORACLE = f"""
WITH e AS ({_COS_E_SQL}),
{_CELLS_SQL},
members AS (
  SELECT a.cell, e.vec_id, e.v, e.nrm FROM assign a JOIN e USING (vec_id)
)
SELECT a.cell AS cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_aggregate(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]), 'sum')
             / (a.nrm * b.nrm), 6) AS cosine
FROM members a JOIN members b
  ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE list_aggregate(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]), 'sum')
      / (a.nrm * b.nrm) >= {COS_T}
"""


QUERIES = [
    QuerySpec("kmeans_cluster_stats", q_kmeans_cluster_stats, Q_KMEANS_ORACLE, "one Lloyd round: cluster sizes, cohesion, centroid shift", ("clustering", "embedding")),
    QuerySpec("semdedup_pairs", q_semdedup_pairs, Q_SEMDEDUP_ORACLE, "SemDeDup: within-cluster cosine near-dup pairs", ("clustering", "dedup")),
]
