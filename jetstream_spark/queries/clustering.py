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
window, no shuffle before the agg's own exchange; JVM zip_with/aggregate
arithmetic). The SemDeDup quadratic shuffles the corpus ONCE on the cell
key into an Arrow cogrouped kernel that runs one GEMM per cell — pair
volume (the operator's defining bound) never materializes as joined rows,
only as a per-cell matrix product; cells too big for one executor would
block the GEMM the way dedup_embedding_cosine's cogroup does.
"""

from __future__ import annotations

import pandas as pd
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
    """Cell assignment stays the JVM argmax plan; the within-cell
    quadratic is ONE GEMM per cell in an Arrow cogrouped kernel (m @ m.T
    over the cell's matrix) instead of a per-pair zip_with fold — the
    SemDeDup-paper shape, and ~2x faster than the row-expanded self-join
    it replaces. Vectors ride through the assignment aggregate as a
    first() so the cell key needs no second join against the corpus.
    Threshold filtering happens on the raw double; rounding is Spark-side
    F.round (half-up, oracle-parity — never numpy's banker rounding)."""
    import numpy as np
    import pyspark.sql.types as T

    e = _e_frame(spark, sf_dir)
    cents = _cents_frame(spark, sf_dir)
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    members = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "nrm", "v",
            F.struct(dot.alias("dot"), (-F.col("cell")).alias("negc")).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.max("cand").alias("m"), F.first("nrm").alias("nrm"), F.first("v").alias("v"))
        .select("vec_id", (-F.col("m.negc")).cast("int").alias("cell"), "nrm", "v")
    )

    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def cell_pairs(key, pdf):
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"cell": [], "vec_a": [], "vec_b": [], "cosine": []})
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nr = pdf["nrm"].to_numpy().astype(np.float64)
        g = (m @ m.T) / np.outer(nr, nr)
        iu, ju = np.triu_indices(len(ids), 1)
        c = g[iu, ju]
        keep = c >= COS_T
        return pd.DataFrame(
            {
                "cell": np.full(int(keep.sum()), key[0], dtype=np.int32),
                "vec_a": ids[iu[keep]],
                "vec_b": ids[ju[keep]],
                "cosine": c[keep],
            }
        )

    return (
        members.groupBy("cell")
        .applyInPandas(cell_pairs, schema)
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


# --- full iterative k-means trainer -------------------------------------------
KM_ROUNDS = 3


def _km_assign_of(c):
    """Vectorized assigner for a fixed centroid matrix: |x|²−2x·c+|c|²
    expansion — an (n,k) product, never an (n,k,d) tensor."""
    import numpy as np

    cn = (c**2).sum(axis=1)

    def cells_of(m):
        d2 = (m**2).sum(axis=1, keepdims=True) - 2.0 * (m @ c.T) + cn[None, :]
        return np.argmin(d2, axis=1), d2

    return cells_of


def _km_partials_frame(emb: DataFrame, cents) -> DataFrame:
    """The map half of one Lloyd round: an Arrow assignment pass emitting
    per-batch per-cell partial sums — ≤ k·d rows per input partition,
    regardless of row count (the map-side combine)."""
    import numpy as np

    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(cents)
    d = cents.shape[1]

    def partials(batches):
        cells_of = _km_assign_of(bc.value)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cell, _ = cells_of(m)
            out_c, out_d, out_s, out_n = [], [], [], []
            for kk in np.unique(cell):
                mask = cell == kk
                s = m[mask].sum(axis=0)
                out_c.append(np.full(d, kk))
                out_d.append(np.arange(d))
                out_s.append(s)
                out_n.append(np.full(d, int(mask.sum())))
            yield pd.DataFrame(
                {
                    "cell": np.concatenate(out_c).astype(np.int32),
                    "d": np.concatenate(out_d).astype(np.int32),
                    "s": np.concatenate(out_s),
                    "n": np.concatenate(out_n).astype(np.int64),
                }
            )

    return emb.mapInPandas(partials, schema="cell int, d int, s double, n long")


def _km_round_agg(emb: DataFrame, cents) -> DataFrame:
    """ONE Lloyd round's aggregate as a frame (pre-collect): the map-side
    partials combined through one groupBy(cell, d) exchange of ≤ P·k·d
    partial rows — the wide-cluster tier, where collecting raw partials
    would move P·k·d rows to the driver. Extracted so the per-round
    physical plan is test-assertable (the engine-wide plan sweep only
    sees final frames, not loop bodies)."""
    return (
        _km_partials_frame(emb, cents)
        .groupBy("cell", "d")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )


# Above this many (partition × cell × dim) partial rows, a Lloyd round
# combines through the (cell, d) exchange before the driver sees it;
# below, the driver reduces the raw partials itself — one stage per
# round instead of two (MLlib's treeAggregate depth choice). At 1M rows
# the driver-side reduce is ~32 MB of Arrow traffic; a 1000-executor
# scan (P ≈ 10⁵ splits) crosses the bound and takes the exchange tier.
_KM_DRIVER_REDUCE_MAX = 1 << 20


def _km_round_sums(emb: DataFrame, cents, n_parts: int):
    """One Lloyd round's global (sum, count) per (cell, dim) as numpy
    arrays. Two-tier reduce keyed on P·k·d (see _KM_DRIVER_REDUCE_MAX)."""
    import numpy as np

    k, d = cents.shape
    if n_parts * k * d <= _KM_DRIVER_REDUCE_MAX:
        rows = _km_partials_frame(emb, cents).collect()
    else:
        rows = _km_round_agg(emb, cents).collect()
    s = np.zeros((k, d))
    n = np.zeros((k, d), dtype=np.int64)
    for r in rows:
        s[r["cell"], r["d"]] += r["s"]
        n[r["cell"], r["d"]] += r["n"]
    return s, n


def _km_seeds(emb: DataFrame):
    """Raw (unnormalized) float64 seed centroids: corpus rows [100, 116) —
    classic euclidean Lloyd, distinct from the cosine coarse quantizer.
    Reads the (possibly cached) training frame, not a fresh scan."""
    import numpy as np

    rows = (
        emb.where(
            (F.col("vec_id") >= _IVF_CENTROID_BASE)
            & (F.col("vec_id") < _IVF_CENTROID_BASE + IVF_CELLS)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def q_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL iterative Lloyd k-means ({KM_ROUNDS} assign+update rounds from
    the fixed corpus seeds, euclidean on raw vectors), then a final
    assignment pass reporting per-cluster size, inertia (mean squared
    distance), and a centroid fingerprint. The training loop every
    embedding-curation pipeline runs before SemDeDup / cluster-balanced
    sampling — and, unlike the usual practice of leaving iterative
    algorithms rows-only, this one is HASH-CHECKED: the oracle unrolls all
    rounds as generated SQL CTEs (assignment = row_number over squared
    distance, update = per-(cell, dim) avg with empty-cell carry-forward),
    so Spark and DuckDB must agree on every centroid trajectory.

    Scale shape (MLlib's own k-means topology): the training frame is
    persisted once for the loop (MLlib caches norms the same way — 3
    rounds read 1 scan, and the r8 bench-flag fix: 5 parquet scan-jobs
    per build collapsed to 1). Per round, ONE map-only Arrow pass assigns
    cells against the broadcast k×d centroid matrix using the
    |x|²−2x·c+|c|² expansion (an (n,k) product — never an (n,k,d)
    tensor) and pre-aggregates per-batch per-cell sums; the partials then
    reduce through the two-tier _km_round_sums — a direct driver reduce
    when P·k·d is bounded (one stage per round), one (cell, d) exchange
    first when it isn't (the 1000-executor tier). The data never moves,
    only ≤ P·k·d sums do. Empty cluster ⇒ centroid carried forward (both
    engines). The driver-side per-round collect is a bounded-partials
    aggregate (components.py convergence-collect precedent), not a data
    collect."""
    import numpy as np

    from pyspark import StorageLevel

    emb = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cents = _km_seeds(emb)  # first action — materializes the cache
    k, d = cents.shape
    n_parts = emb.rdd.getNumPartitions()
    sc = spark.sparkContext

    for _ in range(KM_ROUNDS):
        s, n = _km_round_sums(emb, cents, n_parts)
        new = cents.copy()  # empty cluster: carry the centroid forward
        nz = n > 0
        new[nz] = s[nz] / n[nz]
        cents = new

    bfinal = sc.broadcast(cents)
    # training over: release the cache now (the lazy final pass below
    # re-reads parquet — one scan — rather than pinning the corpus in the
    # block store past the operator's lifetime)
    emb.unpersist(blocking=False)

    def final_stats(batches):
        cells_of = _km_assign_of(bfinal.value)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cell, d2 = cells_of(m)
            best = d2[np.arange(len(m)), cell]
            out = []
            for kk in np.unique(cell):
                mask = cell == kk
                out.append((int(kk), int(mask.sum()), float(best[mask].sum())))
            yield pd.DataFrame(out, columns=["cluster", "n", "ssq"])

    stats = (
        emb.mapInPandas(final_stats, schema="cluster int, n long, ssq double")
        .groupBy("cluster")
        .agg(F.sum("n").alias("n_vectors"), F.sum("ssq").alias("ssq"))
    )
    c0 = spark.createDataFrame(
        [(int(i), float(cents[i, 0])) for i in range(k)], "cluster int, c0d double"
    )
    return stats.join(F.broadcast(c0), "cluster").select(
        "cluster",
        "n_vectors",
        (F.round(F.col("ssq") / F.col("n_vectors"), 6) + F.lit(0.0)).alias("mean_sqdist"),
        (F.round("c0d", 6) + F.lit(0.0)).alias("c0"),
    )


def _kmeans_train_oracle() -> str:
    """Unrolled Lloyd rounds as generated CTEs. The |x-c|^2 distance is
    computed directly (vs Spark's expanded form) — the VALUES differ in
    low-order bits but only the per-vector ranking feeds the result, and
    ties break to the lowest cell in both engines."""
    base, cells, dim = _IVF_CENTROID_BASE, IVF_CELLS, EMB_DIM
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""c0 AS (
  SELECT vec_id - {base} AS cell, t.range + 1 AS d, v[t.range + 1] AS val
  FROM e, range(0, {dim}) t
  WHERE vec_id >= {base} AND vec_id < {base + cells})""",
    ]
    for r in range(1, KM_ROUNDS + 1):
        p = r - 1
        parts.append(
            f"""dist{r} AS (
  SELECT e.vec_id, c.cell, sum((e.v[c.d] - c.val) * (e.v[c.d] - c.val)) AS sq
  FROM e CROSS JOIN c{p} c GROUP BY 1, 2)"""
        )
        parts.append(
            f"""a{r} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sq, cell) AS rn
    FROM dist{r}) WHERE rn = 1)"""
        )
        parts.append(
            f"""m{r} AS (
  SELECT a.cell, t.range + 1 AS d, avg(e.v[t.range + 1]) AS val
  FROM a{r} a JOIN e USING (vec_id), range(0, {dim}) t
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"""c{r} AS (
  SELECT p.cell, p.d, coalesce(m.val, p.val) AS val
  FROM c{p} p LEFT JOIN m{r} m ON m.cell = p.cell AND m.d = p.d)"""
        )
    t = KM_ROUNDS
    body = ",\n".join(parts)
    return f"""
WITH {body},
distF AS (
  SELECT e.vec_id, c.cell, sum((e.v[c.d] - c.val) * (e.v[c.d] - c.val)) AS sq
  FROM e CROSS JOIN c{t} c GROUP BY 1, 2),
aF AS (
  SELECT vec_id, cell, sq FROM (
    SELECT vec_id, cell, sq,
           row_number() OVER (PARTITION BY vec_id ORDER BY sq, cell) AS rn
    FROM distF) WHERE rn = 1)
SELECT aF.cell AS cluster, count(*) AS n_vectors,
       round(avg(aF.sq), 6) + 0.0 AS mean_sqdist,
       round(any_value(cz.val), 6) + 0.0 AS c0
FROM aF JOIN (SELECT cell, val FROM c{t} WHERE d = 1) cz ON cz.cell = aF.cell
GROUP BY aF.cell
"""


QUERIES = [
    QuerySpec("kmeans_cluster_stats", q_kmeans_cluster_stats, Q_KMEANS_ORACLE, "one Lloyd round: cluster sizes, cohesion, centroid shift", ("clustering", "embedding")),
    QuerySpec("kmeans_train", q_kmeans_train, _kmeans_train_oracle(), "full iterative Lloyd trainer (3 unrolled rounds, hash-checked against generated SQL CTEs)", ("clustering", "embedding")),
    QuerySpec("semdedup_pairs", q_semdedup_pairs, Q_SEMDEDUP_ORACLE, "SemDeDup: within-cluster cosine near-dup pairs", ("clustering", "dedup")),
]
