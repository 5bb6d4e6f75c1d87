"""Similarity search over the `embeddings` table (SURVEY.md §2.3).

Two tiers:

- brute-force top-k (correctness baseline, oracle-checked): broadcast the
  query matrix, score every base vector with vectorized numpy block
  products inside mapInPandas (Arrow batches, float64), take top-k per
  query with a window. Cost is O(N·Q) but embarrassingly parallel — each
  partition scores independently and pre-reduces to its own k rows per
  query INSIDE the Arrow kernel, so the global window merges ≤ k·P
  candidate rows per query instead of N (see q_ann_brute_force_topk).

- LSH-bucketed ANN (the 100 TB path): random-hyperplane signatures put
  near vectors in the same bucket; search touches only the probed
  buckets. Approximate relative to brute force, but fully DETERMINISTIC
  (seeded planes / fixed centroids), so both scale-path queries carry
  real SQL oracles: the plane matrix is emitted as SQL literals and the
  bucket assignment + probe + exact re-score is recomputed in DuckDB.
  Recall floors vs the brute-force baseline are additionally asserted in
  tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _query_matrix(spark: SparkSession, sf_dir: str):
    emb = table(spark, sf_dir, "embeddings")
    rows = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _scores_df(spark: SparkSession, sf_dir: str, partial_topk: int | None = None) -> DataFrame:
    """(query_id, vec_id, cosine) of base × query vectors (self-matches
    excluded). With `partial_topk=k` each PARTITION emits only its k best
    rows per query — a running heap over the partition's Arrow batches by
    the final global order (cosine desc, vec_id asc), the map-side combine
    of top-k. Any globally top-k row is necessarily within its own
    partition's top-k under the same order, so the downstream window sees
    ≤ k·Q rows per partition instead of the full N·Q score matrix — at
    100 TB the difference between shuffling ~everything and ~nothing."""
    q_ids, q_mat = _query_matrix(spark, sf_dir)
    q_norms = np.linalg.norm(q_mat, axis=1)
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_norms))
    emb = table(spark, sf_dir, "embeddings")

    def score(batches):
        ids, mat, norms = bq.value
        nq = len(ids)
        # per-query running candidates for this partition
        run_v = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        run_c = [np.empty(0, dtype=np.float64) for _ in range(nq)]
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            b_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            b_norms = np.linalg.norm(b_mat, axis=1)
            cos = (b_mat @ mat.T) / np.outer(b_norms, norms)  # (batch, Q)
            if partial_topk is None:
                n = len(b_ids)
                full = pd.DataFrame(
                    {
                        "query_id": np.repeat(ids, n),
                        "vec_id": np.tile(b_ids, nq),
                        "cosine": cos.T.ravel(),
                    }
                )
                yield full[full["query_id"] != full["vec_id"]]
                continue
            for qi in range(nq):
                keep = b_ids != ids[qi]  # self-match never competes for a slot
                v = np.concatenate([run_v[qi], b_ids[keep]])
                c = np.concatenate([run_c[qi], cos[keep, qi]])
                order = np.lexsort((v, -c))[:partial_topk]
                run_v[qi], run_c[qi] = v[order], c[order]
        if partial_topk is not None and any(len(v) for v in run_v):
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, [len(v) for v in run_v]),
                    "vec_id": np.concatenate(run_v),
                    "cosine": np.concatenate(run_c),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )


def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each of the 10 query vectors
    (self-match excluded); deterministic tiebreak (cosine desc, vec_id).
    The kernel pre-reduces to TOP_K rows per query per partition, so the
    window shuffle merges partials instead of ranking the full N·Q."""
    scores = _scores_df(spark, sf_dir, partial_topk=TOP_K)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


# Portable cosine: spelled out as list_transform/list_aggregate arithmetic —
# no list_cosine_similarity (newer DuckDB surface; the driver's engine may
# predate it, and a rejected oracle means the query is never checked).
_COS_E_SQL = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')) AS nrm
  FROM embeddings
"""

Q_ANN_ORACLE = f"""
WITH e AS ({_COS_E_SQL}),
scores AS (
  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         list_aggregate(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * b.v[i]), 'sum')
           / (q.nrm * b.nrm) AS cos
  FROM e q JOIN e b ON q.vec_id <> b.vec_id
  WHERE q.vec_id < {N_QUERIES}
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scores
)
SELECT query_id, vec_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


# --- LSH-bucketed ANN (scale path; approximate, no SQL oracle) -------------------
LSH_PLANES = 6  # 2^6 = 64 buckets
LSH_PROBE_RADIUS = 2  # multi-probe: buckets within hamming 2 of the query's
LSH_SEED = 7


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN with multi-probe: base vectors hashed into
    sign-buckets; each query rescans only buckets whose signature is within
    hamming-2 of its own (1+6+15 = 22 of 64 buckets — the standard recall
    lever without more tables). Approximate vs brute force but
    deterministic (seeded planes), so it carries a real SQL oracle
    (_lsh_oracle). Recall floor additionally asserted in tests. At 100 TB
    the bucket id becomes the partition key and a probe touches those
    partitions only; #planes grows with log(N) to keep bucket occupancy
    constant."""
    dim = 64
    rng = np.random.RandomState(LSH_SEED)
    planes = rng.randn(LSH_PLANES, dim)
    q_ids, q_mat = _query_matrix(spark, sf_dir)
    q_norms = np.linalg.norm(q_mat, axis=1)
    q_buckets = (np.sign(q_mat @ planes.T) > 0) @ (1 << np.arange(LSH_PLANES))
    popcount = np.array([bin(i).count("1") for i in range(1 << LSH_PLANES)])
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_norms, q_buckets, planes, popcount))
    emb = table(spark, sf_dir, "embeddings")

    def probe(batches):
        ids, mat, norms, buckets, pl, pc = bq.value
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            b_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            b_buckets = (np.sign(b_mat @ pl.T) > 0) @ (1 << np.arange(LSH_PLANES))
            b_norms = np.linalg.norm(b_mat, axis=1)
            out_q, out_v, out_c = [], [], []
            for qi in range(len(ids)):
                ham = pc[np.bitwise_xor(b_buckets, buckets[qi])]
                mask = (ham <= LSH_PROBE_RADIUS) & (b_ids != ids[qi])
                if mask.any():
                    cos = (b_mat[mask] @ mat[qi]) / (b_norms[mask] * norms[qi])
                    out_q.append(np.full(mask.sum(), ids[qi]))
                    out_v.append(b_ids[mask])
                    out_c.append(cos)
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "vec_id": np.concatenate(out_v),
                        "cosine": np.concatenate(out_c),
                    }
                )

    scores = emb.select("vec_id", "embedding").mapInPandas(
        probe, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _lsh_oracle() -> str:
    """DuckDB oracle for q_ann_lsh. The query is deterministic — the 6×64
    hyperplane matrix comes from a fixed-seed RandomState — so the planes
    are emitted as SQL literals (repr() round-trips float64 exactly) and
    DuckDB independently recomputes sign-buckets, the hamming<=2
    multi-probe, and the exact cosine re-score over candidates."""
    rng = np.random.RandomState(LSH_SEED)
    planes = rng.randn(LSH_PLANES, 64)
    plane_rows = ",\n         ".join(
        "({b}, [{vals}])".format(
            b=b, vals=", ".join(repr(float(x)) for x in planes[b])
        )
        for b in range(LSH_PLANES)
    )
    return f"""
WITH e AS ({_COS_E_SQL}),
planes(b, p) AS (
  VALUES {plane_rows}
),
buckets AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN list_aggregate(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * p.p[i]), 'sum') > 0
                       THEN 1 << p.b ELSE 0 END) AS BIGINT) AS bucket
  FROM e, planes p
  GROUP BY e.vec_id
),
scores AS (
  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         list_aggregate(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * b.v[i]), 'sum')
           / (q.nrm * b.nrm) AS cos
  FROM e q
  JOIN buckets qb ON qb.vec_id = q.vec_id
  JOIN buckets bb ON bit_count(xor(qb.bucket, bb.bucket)) <= {LSH_PROBE_RADIUS}
  JOIN e b ON b.vec_id = bb.vec_id AND b.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scores
)
SELECT query_id, vec_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


# --- IVF-bucketed ANN (coarse-quantizer cells; deterministic -> SQL oracle) ------
IVF_CELLS = 16
IVF_NPROBE = 4
_IVF_CENTROID_BASE = 100  # vec_id in [100, 100+IVF_CELLS) serve as centroids


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> "np.ndarray":
    """(IVF_CELLS, d) unit-norm coarse-quantizer centroids — the fixed
    corpus rows, shared by every IVF consumer. Bounded 16-row collect."""
    emb = table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.where(
            (F.col("vec_id") >= _IVF_CENTROID_BASE)
            & (F.col("vec_id") < _IVF_CENTROID_BASE + IVF_CELLS)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    cent_rows.sort(key=lambda r: r["vec_id"])
    cents = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: a coarse quantizer (here: 16 fixed, deterministic corpus
    vectors as centroids — a real pipeline k-means-trains them on a sample;
    the partition/probe machinery is identical) assigns every base vector
    to its nearest cell; each query scores only its IVF_NPROBE nearest
    cells. At 100 TB the cell id is the partition key: one shuffle to build
    the inverted file, and a probe touches nprobe/cells of the data —
    orthogonal to the LSH path (q_ann_lsh), which needs no training.
    Approximate vs brute force but deterministic (fixed centroid rows), so
    it carries a real SQL oracle (_ivf_oracle); recall floor vs brute
    force additionally asserted in tests."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    q_ids, q_mat = _query_matrix(spark, sf_dir)
    q_norms = np.linalg.norm(q_mat, axis=1)
    # each query's nprobe nearest cells (by cosine to the centroid)
    q_cells = np.argsort(-(q_mat / q_norms[:, None]) @ cents.T, axis=1)[:, :IVF_NPROBE]
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_norms, q_cells, cents))

    def probe(batches):
        ids, mat, norms, cells, c = bq.value
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            b_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            b_norms = np.linalg.norm(b_mat, axis=1)
            b_cell = np.argmax((b_mat / b_norms[:, None]) @ c.T, axis=1)
            out = []
            for qi in range(len(ids)):
                mask = np.isin(b_cell, cells[qi]) & (b_ids != ids[qi])
                if mask.any():
                    cos = (b_mat[mask] @ mat[qi]) / (b_norms[mask] * norms[qi])
                    out.append(
                        pd.DataFrame(
                            {"query_id": ids[qi], "vec_id": b_ids[mask], "cosine": cos}
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    scores = emb.select("vec_id", "embedding").mapInPandas(
        probe, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def q_ann_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ann_lsh through the MATERIALIZED index (operators/ann_index.py):
    embeddings written once partitioned by LSH bucket id, probe reads only
    the bucket=<id>/ directories within hamming<=2 of a query signature —
    partition pruning makes the 100 TB probe-subset claim physical
    (plan-asserted in tests/test_ann_index.py). Same bucket semantics as
    q_ann_lsh, so the same SQL oracle checks it. The index is reused when
    a completed build is newer than the source corpus (build once, probe
    many times); a stale or absent index is rebuilt in-line."""
    import os
    import tempfile

    from jetstream_spark.operators.ann_index import (
        build_lsh_index,
        index_is_fresh,
        probe_lsh_index,
    )

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    index_path = os.path.join(tempfile.gettempdir(), f"jetstream_ann_index_{tag}")
    if not index_is_fresh(index_path, sf_dir):
        build_lsh_index(spark, sf_dir, index_path)
    return probe_lsh_index(spark, sf_dir, index_path)


def _ivf_oracle() -> str:
    """DuckDB oracle for q_ann_ivf. Deterministic: centroids are the corpus
    rows vec_id in [100, 116) L2-normalized; cell assignment is
    argmax-cosine (per-vector positive scaling doesn't change the argmax,
    so the dot against the unit centroid suffices); each query probes its
    IVF_NPROBE nearest cells and exact cosine ranks the candidates."""
    return f"""
WITH e AS ({_COS_E_SQL}),
cents AS (
  SELECT vec_id - {_IVF_CENTROID_BASE} AS cell,
         list_transform(v, x -> x / nrm) AS cv
  FROM e
  WHERE vec_id >= {_IVF_CENTROID_BASE} AND vec_id < {_IVF_CENTROID_BASE + IVF_CELLS}
),
celldot AS (
  SELECT e.vec_id, c.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_aggregate(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c.cv[i]), 'sum') DESC,
                    c.cell
         ) AS rn
  FROM e, cents c
),
assign AS (
  SELECT vec_id, cell FROM celldot WHERE rn = 1
),
qprobe AS (
  SELECT vec_id, cell FROM celldot WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
scores AS (
  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         list_aggregate(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * b.v[i]), 'sum')
           / (q.nrm * b.nrm) AS cos
  FROM e q
  JOIN qprobe qp ON qp.vec_id = q.vec_id
  JOIN assign a ON a.cell = qp.cell
  JOIN e b ON b.vec_id = a.vec_id AND b.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scores
)
SELECT query_id, vec_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ann_ivf through the MATERIALIZED inverted file
    (operators/ann_index.py): embeddings written once partitioned by IVF
    cell id, probe reads only the nprobe cell=<id>/ directories — the
    partition-pruned physical form of 'a probe touches nprobe/cells of the
    data'. Same cell-assignment semantics as q_ann_ivf, same SQL oracle.
    The inverted file is reused when a completed build is newer than the
    source corpus; a stale or absent one is rebuilt in-line."""
    from jetstream_spark.operators.ann_index import ensure_ivf_index, probe_ivf_index

    return probe_ivf_index(spark, sf_dir, ensure_ivf_index(spark, sf_dir))


# --- embedding vector ops (scalar outputs — oracle-safe) -------------------------
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-op surface: L2 norm, mean component, min/max — pure HOF
    arithmetic on array<float>, JVM-side."""
    emb = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)
    s = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq), 6).alias("l2_norm"),
        F.round(s / F.size("embedding"), 6).alias("mean_component"),
        F.round(F.array_max(dbl), 6).alias("max_component"),
    )


Q_EMB_NORMS_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) AS l2_norm,
       round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') / len(embedding), 6) AS mean_component,
       round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS max_component
FROM embeddings
"""


def q_embedding_downproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensionality reduction by adjacent-pair averaging (64 -> 32) —
    the cheap linear projection shape; output summarized as scalars."""
    emb = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda i: (F.element_at(dbl, i * 2 + 1) + F.element_at(dbl, i * 2 + 2)) / 2.0,
    )
    sq = F.aggregate(proj, F.lit(0.0), lambda acc, x: acc + x * x)
    return emb.select(
        "vec_id",
        F.lit(32).alias("proj_dim"),
        F.round(F.sqrt(sq), 6).alias("proj_l2_norm"),
        F.round(F.element_at(proj, 1), 6).alias("proj_first"),
    )


Q_EMB_DOWNPROJECT_ORACLE = """
WITH p AS (
  SELECT vec_id,
         list_transform(generate_series(0, 31),
                        i -> (CAST(embedding[i * 2 + 1] AS DOUBLE) + CAST(embedding[i * 2 + 2] AS DOUBLE)) / 2.0) AS proj
  FROM embeddings
)
SELECT vec_id,
       32 AS proj_dim,
       round(sqrt(list_aggregate(list_transform(proj, x -> x * x), 'sum')), 6) AS proj_l2_norm,
       round(proj[1], 6) AS proj_first
FROM p
"""


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/serving form of
    an embedding corpus (4x smaller than float32, 8x than float64):
    scale = max|x| / 127, q_i = clamp(round(x_i / scale), ±127), and the
    round-trip reconstruction error (MSE + max abs) per vector.

    All JVM HOF arithmetic (whole-stage codegen, one narrow pass, no
    shuffle) — at 100 TB this is a map-only rewrite job. Half-up rounding
    on both engines (Spark F.round == DuckDB round); zero vectors guarded
    (Spark double/0 is NULL, not inf)."""
    emb = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    mx = F.aggregate(dbl, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    base = emb.select("vec_id", dbl.alias("v"), (mx / F.lit(127.0)).alias("qscale"))
    q = F.transform(
        "v",
        lambda x: F.when(F.col("qscale") == 0.0, F.lit(0.0))
        .otherwise(F.greatest(F.lit(-127.0), F.least(F.lit(127.0), F.round(x / F.col("qscale")))))
        .cast("int"),
    )
    errs = F.zip_with("v", "q", lambda x, qi: x - qi.cast("double") * F.col("qscale"))
    per_vec = base.withColumn("q", q).withColumn("errs", errs)
    mse = F.aggregate("errs", F.lit(0.0), lambda acc, e: acc + e * e) / F.size("errs")
    max_abs_err = F.aggregate("errs", F.lit(0.0), lambda acc, e: F.greatest(acc, F.abs(e)))
    return per_vec.select(
        "vec_id",
        F.round("qscale", 9).alias("qscale"),
        F.round(mse, 9).alias("mse"),
        F.round(max_abs_err, 9).alias("max_abs_err"),
        F.element_at("q", 1).alias("q_first"),
    )


Q_EMB_QUANTIZE_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') / 127.0 AS qscale
  FROM embeddings
), qd AS (
  SELECT vec_id, v, qscale,
         list_transform(v, x -> CAST(CASE WHEN qscale = 0 THEN 0.0
                                          ELSE greatest(-127.0, least(127.0, round(x / qscale)))
                                     END AS INT)) AS q
  FROM e
), er AS (
  SELECT vec_id, qscale, q,
         list_transform(generate_series(1, len(v)), i -> v[i] - CAST(q[i] AS DOUBLE) * qscale) AS errs
  FROM qd
)
SELECT vec_id,
       round(qscale, 9) AS qscale,
       round(list_aggregate(list_transform(errs, e -> e * e), 'sum') / len(errs), 9) AS mse,
       round(list_aggregate(list_transform(errs, e -> abs(e)), 'max'), 9) AS max_abs_err,
       q[1] AS q_first
FROM er
"""


# --- covariance + PCA (distributed linear algebra substrate) -------------------
EMB_DIM = 64
PCA_DIM = 4


def _covariance_partials(emb: DataFrame) -> DataFrame:
    """Per-partition second-moment partials for the covariance matrix:
    each partition emits (i, j, sxy=Σx_i·x_j, sxi=Σx_i, sxj=Σx_j, n) for
    i ≤ j — the one-pass mergeable statistic. One numpy X^T·X per Arrow
    batch; the partials frame is P·d(d+1)/2 rows regardless of corpus
    size, so the reduce shuffle is constant-bounded at any scale."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("j", T.LongType()),
            T.StructField("sxy", T.DoubleType()),
            T.StructField("sxi", T.DoubleType()),
            T.StructField("sxj", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def kernel(batches):
        sxx = None
        sx = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if sxx is None:
                d = m.shape[1]
                sxx = np.zeros((d, d))
                sx = np.zeros(d)
            sxx += m.T @ m
            sx += m.sum(axis=0)
            n += m.shape[0]
        if n == 0:
            return
        d = sx.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": iu.astype(np.int64),
                "j": ju.astype(np.int64),
                "sxy": sxx[iu, ju],
                "sxi": sx[iu],
                "sxj": sx[ju],
                "n": np.int64(n),
            }
        )

    return emb.select("embedding").mapInPandas(kernel, schema)


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix of the embedding corpus (upper
    triangle, d(d+1)/2 rows) — the substrate of PCA whitening, Mahalanobis
    outlier scoring, and drift detection over a training-data embedding
    column.

    Scale shape: the classic one-pass distributed second-moment reduction —
    every partition computes X^T·X / ΣX / n partials with ONE numpy product
    per Arrow batch (no explode of N·d² rows, no covar_pop over d² column
    pairs), and the only shuffle moves P·d(d+1)/2 partial rows (P =
    partition count — independent of N). cov = E[xy] − E[x]E[y] at the
    reduce. The oracle recomputes with DuckDB's covar_pop per (i, j)."""
    emb = table(spark, sf_dir, "embeddings")
    partials = _covariance_partials(emb)
    agg = partials.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("sxi").alias("sxi"),
        F.sum("sxj").alias("sxj"),
        F.sum("n").alias("n"),
    )
    cov = (F.col("sxy") - F.col("sxi") * F.col("sxj") / F.col("n")) / F.col("n")
    # + 0.0 canonicalizes IEEE -0.0 to 0.0 (mirrored in the oracle) so a
    # negative value that rounds to zero hashes identically on both engines
    return agg.select("i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov"))


Q_EMB_COVARIANCE_ORACLE = f"""
SELECT ti.range AS i, tj.range AS j,
       round(covar_pop(CAST(embedding[ti.range + 1] AS DOUBLE),
                       CAST(embedding[tj.range + 1] AS DOUBLE)), 6) + 0.0 AS cov
FROM embeddings, range(0, {EMB_DIM}) ti, range(0, {EMB_DIM}) tj
WHERE ti.range <= tj.range
GROUP BY 1, 2
"""


def q_embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection onto the top-{PCA_DIM} principal components, plus
    per-vector reconstruction error — the standard dense dim-reduction
    step before clustering/indexing an embedding corpus.

    Scale shape: covariance via the one-pass partial reduction above (the
    only corpus-wide work), eigendecomposition of the tiny d×d matrix on
    the DRIVER (d=64 — microseconds; this is the correct split at any
    corpus size, the data never moves), then a map-only broadcast
    projection: each vector is centered and dotted with the d×{PCA_DIM}
    component matrix inside one Arrow kernel. Deterministic: components
    are sign-fixed (largest-|loading| coordinate positive, ties to the
    lowest index). Not SQL-expressible (eigendecomposition) — rows-only
    for the driver; pinned instead by an independent full-numpy equality
    test in tests/test_operators.py.

    Output shape: the projection is serialized as `proj_csv` (comma-joined
    %.6f per component, IEEE -0.0 canonicalized to 0.0) rather than an
    ARRAY<DOUBLE> column — every output column is a hashable scalar, so
    row-level canonicalizers (sort + hash) work without list handling."""
    import pyspark.sql.types as T

    emb = table(spark, sf_dir, "embeddings")
    rows = _covariance_partials(emb).groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("sxi").alias("sxi"),
        F.sum("sxj").alias("sxj"),
        F.sum("n").alias("n"),
    ).collect()
    d = max(r["j"] for r in rows) + 1
    cov = np.zeros((d, d))
    mean = np.zeros(d)
    n = rows[0]["n"]
    for r in rows:
        c = (r["sxy"] - r["sxi"] * r["sxj"] / r["n"]) / r["n"]
        cov[r["i"], r["j"]] = c
        cov[r["j"], r["i"]] = c
        mean[r["i"]] = r["sxi"] / r["n"]
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comps = evecs[:, ::-1][:, :PCA_DIM].T  # (PCA_DIM, d), descending eigenvalue
    for k in range(comps.shape[0]):
        pivot = np.argmax(np.abs(comps[k]))
        if comps[k, pivot] < 0:
            comps[k] = -comps[k]
    var_explained = evals[::-1][:PCA_DIM]
    sc = emb.sparkSession.sparkContext
    b_comps, b_mean = sc.broadcast(comps), sc.broadcast(mean)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("proj_csv", T.StringType()),
            T.StructField("recon_err", T.DoubleType()),
        ]
    )

    def project(batches):
        c, mu = b_comps.value, b_mean.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) - mu
            p = m @ c.T  # (n, PCA_DIM)
            resid = m - p @ c  # components are orthonormal
            rp = np.round(p, 6) + 0.0  # +0.0: canonicalize IEEE -0.0
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype(np.int64),
                    "proj_csv": [",".join(f"{v:.6f}" for v in row) for row in rp],
                    "recon_err": np.round(np.sqrt((resid**2).sum(axis=1)), 6),
                }
            )

    out = emb.select("vec_id", "embedding").mapInPandas(project, schema)
    # attach the (identical-per-row) explained-variance summary for audit
    return out.withColumn(
        "var_explained_topk", F.lit(float(np.round(var_explained.sum(), 6)))
    )


MAHA_RIDGE = 1e-6
MAHA_TOP_N = 25


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mahalanobis outlier scoring: squared distance (x−μ)ᵀ(Σ+εI)⁻¹(x−μ)
    per vector, top-{MAHA_TOP_N} most anomalous — the embedding-space
    member of the monitoring family (rate_anomaly / split_drift_psi):
    a poisoned or out-of-domain batch shows up as a Mahalanobis tail
    before it contaminates training.

    Scale shape: μ/Σ via the same one-pass mergeable partials as
    embedding_covariance (the only corpus-wide work), the d×d inverse on
    the DRIVER (ridge-regularized — microseconds at d=64), then a
    map-only broadcast Arrow scoring pass and TakeOrderedAndProject.
    Not SQL-expressible (matrix inverse) — rows-only for the driver;
    pinned by a full-numpy pipeline equality test in
    tests/test_operators.py."""
    import pyspark.sql.types as T

    emb = table(spark, sf_dir, "embeddings")
    rows = _covariance_partials(emb).groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("sxi").alias("sxi"),
        F.sum("sxj").alias("sxj"),
        F.sum("n").alias("n"),
    ).collect()
    d = max(r["j"] for r in rows) + 1
    cov = np.zeros((d, d))
    mean = np.zeros(d)
    for r in rows:
        c = (r["sxy"] - r["sxi"] * r["sxj"] / r["n"]) / r["n"]
        cov[r["i"], r["j"]] = c
        cov[r["j"], r["i"]] = c
        mean[r["i"]] = r["sxi"] / r["n"]
    prec = np.linalg.inv(cov + MAHA_RIDGE * np.eye(d))
    sc = emb.sparkSession.sparkContext
    b_prec, b_mean = sc.broadcast(prec), sc.broadcast(mean)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("mahalanobis_sq", T.DoubleType()),
        ]
    )

    def score(batches):
        p, mu = b_prec.value, b_mean.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) - mu
            md = np.einsum("ij,jk,ik->i", m, p, m)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype(np.int64),
                    "mahalanobis_sq": np.round(md, 6),
                }
            )

    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(score, schema)
        .orderBy(F.col("mahalanobis_sq").desc(), F.col("vec_id"))
        .limit(MAHA_TOP_N)
    )


# --- kNN graph (every vector's top-k neighbors) -------------------------------
_KNN_BLOCKS = 8
KNN_PARTIAL_PAD = 3  # per-block partial k padding against rounded-tie flips


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT k-nearest-neighbor GRAPH: top-{TOP_K} cosine neighbors for
    EVERY vector, not just the {N_QUERIES} probe vectors — the structure
    SemDeDup, graph-based clustering, and kNN-LM retrieval all start from.

    Scale shape: the query side is the whole corpus, so the broadcast-
    query-matrix trick of ann_brute_force doesn't apply. Instead vectors
    hash into B blocks and all B² ordered block pairs are cogrouped (the
    dedup_embedding_cosine topology); each task scores one block pair with
    a single numpy float64 matrix product and pre-reduces to k+pad rows
    per query vector BEFORE the shuffle, so the global per-vector window
    merges ≤ (k+pad)·B candidate rows per vector instead of N. Executor
    memory is bounded by two blocks; total work is the inherent O(N²·d) of
    an exact kNN graph, spread over B² even tasks. The approximate scale
    path at 100 TB is the same graph restricted to IVF cells (semdedup's
    within-cell structure) or LSH buckets (ann_lsh) — both in-repo."""
    B = _KNN_BLOCKS

    def side(pair_col: str) -> DataFrame:
        block_pairs = spark.createDataFrame(
            [(i, j) for i in range(B) for j in range(B)], "bi int, bj int"
        )
        blocked = table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", F.pmod(F.xxhash64("vec_id"), F.lit(B)).cast("int").alias("block")
        )
        return blocked.join(F.broadcast(block_pairs), F.col("block") == F.col(pair_col)).select(
            "bi", "bj", "vec_id", "embedding"
        )

    keep = TOP_K + KNN_PARTIAL_PAD

    def compare(key, lpdf, rpdf):
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "cosine": []}).astype(
                {"vec_id": "int64", "neighbor_id": "int64", "cosine": "float64"}
            )
        l_ids = lpdf["vec_id"].to_numpy(dtype=np.int64)
        r_ids = rpdf["vec_id"].to_numpy(dtype=np.int64)
        l_mat = np.array(lpdf["embedding"].tolist(), dtype=np.float64)
        r_mat = np.array(rpdf["embedding"].tolist(), dtype=np.float64)
        cos = (l_mat @ r_mat.T) / np.outer(
            np.linalg.norm(l_mat, axis=1), np.linalg.norm(r_mat, axis=1)
        )
        cos[l_ids[:, None] == r_ids[None, :]] = -np.inf  # self-match
        out_q, out_n, out_c = [], [], []
        k = min(keep, cos.shape[1])
        for li in range(cos.shape[0]):
            row = cos[li]
            # top-k by (cosine desc, neighbor_id asc) — the global contract
            idx = np.lexsort((r_ids, -row))[:k]
            idx = idx[np.isfinite(row[idx])]
            out_q.append(np.full(len(idx), l_ids[li]))
            out_n.append(r_ids[idx])
            out_c.append(row[idx])
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_c),
            }
        )

    raw = (
        side("bi").groupby("bi", "bj")
        .cogroup(side("bj").groupby("bi", "bj"))
        .applyInPandas(compare, schema="vec_id long, neighbor_id long, cosine double")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        raw.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("vec_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


Q_KNN_GRAPH_ORACLE = f"""
WITH e AS ({_COS_E_SQL}),
scores AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_aggregate(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]), 'sum')
           / (a.nrm * b.nrm) AS cos
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scores
)
SELECT vec_id, neighbor_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


def q_knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE kNN graph — the 100 TB path that q_knn_graph's
    docstring names: candidate generation restricted to IVF coarse cells
    instead of all B² block pairs. Every vector probes its IVF_NPROBE
    nearest cells; candidates are the vectors ASSIGNED (nearest-cell) to
    those cells; exact cosine ranks candidates and keeps top-{TOP_K}.

    Scale shape: one Arrow pass assigns cells against the broadcast
    16-row centroid matrix (map-only), then ONE cogroup shuffle on the
    cell id scores probe×assign within each cell with a single numpy
    product, pre-reduced to k+pad rows per vector before the global
    window — total candidate work is nprobe·Σ_c |probe_c|·|cell_c|
    instead of N², and executor memory is bounded by one cell pair. A
    standing corpus would materialize the assignment once as the
    cell-partitioned inverted file (operators/ann_index.py — the
    ann_ivf_indexed layout) making the candidate side shuffle-free on
    rebuild-free days; this one-shot builder shuffles both sides once.
    Deterministic (fixed centroid rows, stable argsort ties to the
    lowest cell) ⇒ real SQL oracle; recall floor vs the exact graph
    asserted in tests."""
    emb = table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.where(
            (F.col("vec_id") >= _IVF_CENTROID_BASE)
            & (F.col("vec_id") < _IVF_CENTROID_BASE + IVF_CELLS)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    cent_rows.sort(key=lambda r: r["vec_id"])
    cents = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(cents)

    def assign(batches):
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            dots = (m / np.linalg.norm(m, axis=1, keepdims=True)) @ c.T
            # stable sort on -dots: equal dots keep ascending cell order,
            # matching the oracle's ORDER BY dot DESC, cell
            order = np.argsort(-dots, axis=1, kind="stable")[:, :IVF_NPROBE]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(dtype=np.int64), IVF_NPROBE),
                    "embedding": [e for e in pdf["embedding"] for _ in range(IVF_NPROBE)],
                    "cell": order.ravel().astype(np.int32),
                    "probe_rank": np.tile(np.arange(1, IVF_NPROBE + 1), n).astype(np.int32),
                }
            )

    probed = emb.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, embedding array<float>, cell int, probe_rank int"
    )
    assigned = probed.where(F.col("probe_rank") == 1).select("cell", "vec_id", "embedding")
    probe = probed.select("cell", "vec_id", "embedding")
    keep = TOP_K + KNN_PARTIAL_PAD

    def compare(key, lpdf, rpdf):
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "cosine": []}).astype(
                {"vec_id": "int64", "neighbor_id": "int64", "cosine": "float64"}
            )
        l_ids = lpdf["vec_id"].to_numpy(dtype=np.int64)
        r_ids = rpdf["vec_id"].to_numpy(dtype=np.int64)
        l_mat = np.array(lpdf["embedding"].tolist(), dtype=np.float64)
        r_mat = np.array(rpdf["embedding"].tolist(), dtype=np.float64)
        cos = (l_mat @ r_mat.T) / np.outer(
            np.linalg.norm(l_mat, axis=1), np.linalg.norm(r_mat, axis=1)
        )
        cos[l_ids[:, None] == r_ids[None, :]] = -np.inf
        out_q, out_n, out_c = [], [], []
        k = min(keep, cos.shape[1])
        for li in range(cos.shape[0]):
            row = cos[li]
            idx = np.lexsort((r_ids, -row))[:k]
            idx = idx[np.isfinite(row[idx])]
            out_q.append(np.full(len(idx), l_ids[li]))
            out_n.append(r_ids[idx])
            out_c.append(row[idx])
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_c),
            }
        )

    raw = (
        probe.groupby("cell")
        .cogroup(assigned.groupby("cell"))
        .applyInPandas(compare, schema="vec_id long, neighbor_id long, cosine double")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        raw.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("vec_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _knn_graph_ivf_oracle() -> str:
    return f"""
WITH e AS ({_COS_E_SQL}),
cents AS (
  SELECT vec_id - {_IVF_CENTROID_BASE} AS cell,
         list_transform(v, x -> x / nrm) AS cv
  FROM e
  WHERE vec_id >= {_IVF_CENTROID_BASE} AND vec_id < {_IVF_CENTROID_BASE + IVF_CELLS}
),
celldot AS (
  SELECT e.vec_id, c.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_aggregate(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c.cv[i]), 'sum') DESC,
                    c.cell
         ) AS rn
  FROM e, cents c
),
assign AS (
  SELECT vec_id, cell FROM celldot WHERE rn = 1
),
probe AS (
  SELECT vec_id, cell FROM celldot WHERE rn <= {IVF_NPROBE}
),
scores AS (
  SELECT q.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_aggregate(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * b.v[i]), 'sum')
           / (q.nrm * b.nrm) AS cos
  FROM e q
  JOIN probe p ON p.vec_id = q.vec_id
  JOIN assign a ON a.cell = p.cell
  JOIN e b ON b.vec_id = a.vec_id AND b.vec_id <> q.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scores
)
SELECT vec_id, neighbor_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


# --- product-quantization ANN (the memory-compressed tier) -----------------------
# M=16 x 4-dim subspaces with 256-entry codebooks is the standard PQ shape
# (16 bytes/vector). Parameter choice is measured, not guessed: this corpus
# is near-isotropic (the PQ worst case), and sampled-codebook recall@5 on it
# is 0.08 at (M=8, K=16), 0.35 at (M=8, K=256), 0.59 at (M=16, K=256) — the
# finer subspace split is what pays, so the recall floor test has margin.
PQ_M = 16  # subspaces
PQ_SUB = 4  # dims per subspace (PQ_M * PQ_SUB = 64)
PQ_K = 256  # codes per subspace codebook
_PQ_CODE_BASE = 100  # vec_id in [100, 100+PQ_K) donate the codebook entries


def _normalized(mat: "np.ndarray") -> "np.ndarray":
    return mat / np.sqrt((mat**2).sum(axis=1, keepdims=True))


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> "np.ndarray":
    """(PQ_M, PQ_K, PQ_SUB) codebooks: the L2-normalized corpus rows
    [_PQ_CODE_BASE, +PQ_K) sliced per subspace — deterministic (no trained
    state), the IVF-seed convention, so the oracle can rebuild them in
    SQL. Bounded 16-row collect."""
    emb = table(spark, sf_dir, "embeddings")
    rows = (
        emb.where(
            (F.col("vec_id") >= _PQ_CODE_BASE) & (F.col("vec_id") < _PQ_CODE_BASE + PQ_K)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    mat = _normalized(np.array([r["embedding"] for r in rows], dtype=np.float64))
    # (K, M, SUB) -> (M, K, SUB)
    return mat.reshape(PQ_K, PQ_M, PQ_SUB).transpose(1, 0, 2)


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al.): each L2-normalized vector
    is encoded as {PQ_M} one-byte codes (argmin-L2 subvector against a
    {PQ_K}-entry per-subspace codebook) and queries score candidates by
    ADC — the sum of {PQ_M} precomputed query→code distance-table lookups.
    On normalized vectors L2 order == cosine order (|q−x|² = 2−2cos), so
    the recall floor is asserted against ann_brute_force_topk.

    THE memory tier of the ANN family: 16 bytes/vector instead of 512 — at
    100 TB the code table is ~3% of the corpus and scans fully in memory;
    LSH/IVF prune WHICH vectors are touched, PQ shrinks WHAT a touched
    vector costs, and production indexes compose them (IVF-PQ). Plan: two
    bounded collects (16-row codebook, {N_QUERIES}-row queries), driver
    builds the (Q, M, K) distance tables, then ONE map-only Arrow pass
    encodes + ADC-scores each partition and pre-reduces to TOP_K rows per
    query (the ann_brute_force partial-top-k device) before the global
    top-k window. Deterministic: argmin ties to the lowest code, ranking
    ties to the lowest vec_id — the oracle rebuilds codebooks, codes, and
    ADC in pure SQL and hash-matches."""
    cb = _pq_codebooks(spark, sf_dir)  # (M, K, SUB)
    q_ids, q_mat = _query_matrix(spark, sf_dir)
    q_sub = _normalized(q_mat).reshape(len(q_ids), PQ_M, PQ_SUB)
    # tables[q, m, k] = ||q_m − c_{m,k}||²
    tables = ((q_sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=-1)
    bq = spark.sparkContext.broadcast((q_ids, tables, cb))
    emb = table(spark, sf_dir, "embeddings")

    def score(batches):
        ids, tab, books = bq.value
        nq = len(ids)
        run_v = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        run_d = [np.empty(0, dtype=np.float64) for _ in range(nq)]
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            x = _normalized(np.array(pdf["embedding"].tolist(), dtype=np.float64))
            xs = x.reshape(len(b_ids), PQ_M, PQ_SUB)
            # encode: (n, M) codes; np.argmin ties to the LOWEST index,
            # matching the oracle's ORDER BY dist, k
            d_codes = ((xs[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=-1)
            codes = np.argmin(d_codes, axis=-1)  # (n, M)
            # ADC: adc[n, q] = Σ_m tab[q, m, codes[n, m]]
            adc = tab[:, np.arange(PQ_M)[None, :], codes].sum(axis=-1).T  # (n, Q)
            for qi in range(nq):
                keep = b_ids != ids[qi]
                v = np.concatenate([run_v[qi], b_ids[keep]])
                d = np.concatenate([run_d[qi], adc[keep, qi]])
                order = np.lexsort((v, d))[:TOP_K]
                run_v[qi], run_d[qi] = v[order], d[order]
        if any(len(v) for v in run_v):
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, [len(v) for v in run_v]),
                    "vec_id": np.concatenate(run_v),
                    "adc_dist": np.concatenate(run_d),
                }
            )

    scores = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, vec_id long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("vec_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "vec_id",
            (F.round("adc_dist", 6) + F.lit(0.0)).alias("adc_dist"),
            "rank",
        )
    )


def _pq_oracle() -> str:
    """DuckDB rebuild of the whole PQ pipeline: normalized vectors,
    codebooks from the fixed corpus rows, per-subspace argmin codes
    (row_number ties to the lowest k), ADC as a grouped sum of table
    lookups, rank ties to the lowest vec_id."""
    sub = PQ_SUB
    sq = f"list_aggregate(list_transform(generate_series(1, {sub}), j -> (n.u[cb.m * {sub} + j] - cb.c[j]) * (n.u[cb.m * {sub} + j] - cb.c[j])), 'sum')"
    sq_q = sq.replace("n.u", "q.u")
    return f"""
WITH e AS ({_COS_E_SQL}),
n AS (
  SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM e
),
cb AS (
  SELECT m.range AS m, vec_id - {_PQ_CODE_BASE} AS k,
         list_transform(generate_series(1, {sub}), j -> u[m.range * {sub} + j]) AS c
  FROM n, range(0, {PQ_M}) m
  WHERE vec_id >= {_PQ_CODE_BASE} AND vec_id < {_PQ_CODE_BASE + PQ_K}
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT n.vec_id, cb.m, cb.k,
           row_number() OVER (PARTITION BY n.vec_id, cb.m ORDER BY {sq}, cb.k) AS rn
    FROM n, cb) WHERE rn = 1
),
adc AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, sum({sq_q}) AS dist
  FROM n q
  JOIN codes c ON c.vec_id <> q.vec_id
  JOIN cb ON cb.m = c.m AND cb.k = c.k
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
  FROM adc
)
SELECT query_id, vec_id, round(dist, 6) + 0.0 AS adc_dist, rank
FROM ranked WHERE rank <= {TOP_K}
"""


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the two-level composition production ANN indexes actually
    ship (FAISS IndexIVFPQ) — IVF prunes WHICH vectors a query touches
    (each query probes its {IVF_NPROBE}/{IVF_CELLS} nearest cells), PQ
    shrinks WHAT a touched vector costs (ADC over {PQ_M}-byte codes
    instead of the raw {PQ_M * PQ_SUB} floats). At 100 TB: the inverted
    file is cell-partitioned parquet (the ann_ivf_indexed layout), each
    cell stores codes not vectors, so a probe reads nprobe/cells of a
    corpus that is itself ~{PQ_M + 8}/{PQ_M * PQ_SUB * 4} the raw bytes —
    the two reductions multiply.

    One map-only Arrow pass per partition: assign cell (argmax cosine vs
    the {IVF_CELLS} unit centroids, ties to the lowest cell like np.argmax
    and the oracle's row_number), mask candidates per query by its probe
    set, PQ-encode the survivors, ADC-score, pre-reduce to TOP_K per
    partition. ONE window shuffle of ≤ k·Q rows/partition finishes. Both
    quantizers are deterministic corpus slices, so the oracle rebuilds
    cells, probes, codes, and ADC relationally and hash-matches."""
    cents = _ivf_centroids(spark, sf_dir)
    cb = _pq_codebooks(spark, sf_dir)  # (M, K, SUB)
    q_ids, q_mat = _query_matrix(spark, sf_dir)
    q_norms = np.linalg.norm(q_mat, axis=1)
    q_cells = np.argsort(-(q_mat / q_norms[:, None]) @ cents.T, axis=1)[:, :IVF_NPROBE]
    q_sub = _normalized(q_mat).reshape(len(q_ids), PQ_M, PQ_SUB)
    tables = ((q_sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=-1)
    bq = spark.sparkContext.broadcast((q_ids, q_cells, tables, cb, cents))
    emb = table(spark, sf_dir, "embeddings")

    def score(batches):
        ids, cells, tab, books, c = bq.value
        nq = len(ids)
        run_v = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        run_d = [np.empty(0, dtype=np.float64) for _ in range(nq)]
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            raw = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            b_cell = np.argmax(_normalized(raw) @ c.T, axis=1)
            xs = _normalized(raw).reshape(len(b_ids), PQ_M, PQ_SUB)
            d_codes = ((xs[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=-1)
            codes = np.argmin(d_codes, axis=-1)  # (n, M)
            adc = tab[:, np.arange(PQ_M)[None, :], codes].sum(axis=-1).T  # (n, Q)
            for qi in range(nq):
                keep = np.isin(b_cell, cells[qi]) & (b_ids != ids[qi])
                v = np.concatenate([run_v[qi], b_ids[keep]])
                d = np.concatenate([run_d[qi], adc[keep, qi]])
                order = np.lexsort((v, d))[:TOP_K]
                run_v[qi], run_d[qi] = v[order], d[order]
        if any(len(v) for v in run_v):
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, [len(v) for v in run_v]),
                    "vec_id": np.concatenate(run_v),
                    "adc_dist": np.concatenate(run_d),
                }
            )

    scores = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id long, vec_id long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("vec_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "vec_id",
            (F.round("adc_dist", 6) + F.lit(0.0)).alias("adc_dist"),
            "rank",
        )
    )


def _ivfpq_oracle() -> str:
    """IVF cell/probe CTEs (from _ivf_oracle) composed with the PQ
    codebook/code/ADC CTEs (from _pq_oracle): candidates are the vectors
    whose cell is in the query's probe set, scored by ADC."""
    sub = PQ_SUB
    sq = f"list_aggregate(list_transform(generate_series(1, {sub}), j -> (n.u[cb.m * {sub} + j] - cb.c[j]) * (n.u[cb.m * {sub} + j] - cb.c[j])), 'sum')"
    sq_q = sq.replace("n.u", "q.u")
    return f"""
WITH e AS ({_COS_E_SQL}),
n AS (
  SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM e
),
cents AS (
  SELECT vec_id - {_IVF_CENTROID_BASE} AS cell,
         list_transform(v, x -> x / nrm) AS cv
  FROM e
  WHERE vec_id >= {_IVF_CENTROID_BASE} AND vec_id < {_IVF_CENTROID_BASE + IVF_CELLS}
),
celldot AS (
  SELECT e.vec_id, c.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_aggregate(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c.cv[i]), 'sum') DESC,
                    c.cell
         ) AS rn
  FROM e, cents c
),
assign AS (
  SELECT vec_id, cell FROM celldot WHERE rn = 1
),
qprobe AS (
  SELECT vec_id, cell FROM celldot WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
cb AS (
  SELECT m.range AS m, vec_id - {_PQ_CODE_BASE} AS k,
         list_transform(generate_series(1, {sub}), j -> u[m.range * {sub} + j]) AS c
  FROM n, range(0, {PQ_M}) m
  WHERE vec_id >= {_PQ_CODE_BASE} AND vec_id < {_PQ_CODE_BASE + PQ_K}
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT n.vec_id, cb.m, cb.k,
           row_number() OVER (PARTITION BY n.vec_id, cb.m ORDER BY {sq}, cb.k) AS rn
    FROM n, cb) WHERE rn = 1
),
adc AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, sum({sq_q}) AS dist
  FROM n q
  JOIN qprobe qp ON qp.vec_id = q.vec_id
  JOIN assign a ON a.cell = qp.cell AND a.vec_id <> q.vec_id
  JOIN codes c ON c.vec_id = a.vec_id
  JOIN cb ON cb.m = c.m AND cb.k = c.k
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
  FROM adc
)
SELECT query_id, vec_id, round(dist, 6) + 0.0 AS adc_dist, rank
FROM ranked WHERE rank <= {TOP_K}
"""


# --- hybrid retrieval: reciprocal-rank fusion of sparse + dense legs --------------
# The RAG-stack staple (Cormack/Clarke/Büttcher, SIGIR 2009): run BM25
# (sparse) and cosine ANN (dense) retrieval, fuse by reciprocal rank —
# rrf(d) = Σ_legs 1/(K + rank_leg(d)) over the legs where d appears.
#
# Determinism: fusion consumes only the legs' INTEGER ranks (each leg ranks
# by its round-6 score with doc_id tiebreak — the existing BM25/ANN
# contracts), and the RRF score is a fixed two-term sum of exact rational
# doubles, so the fused ordering is bit-identical cross-engine.
#
# Scale (100 TB): each leg is its own proven scale shape (BM25: map-only
# scoring + 1-row stats broadcast; dense: partition-parallel scoring with
# partial top-k, or any indexed ANN tier as a drop-in). Fusion itself
# touches 2·CAND rows — a full-outer join of two ≤CAND-row frames.

RRF_K = 60
HYBRID_CAND = 20  # candidates per leg (the BM25 leg's own top-k)
HYBRID_TOP = 10
_HYBRID_QUERY_VEC = 0  # dense-leg query: embedding of vec_id 0


def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jetstream_spark.queries.text import q_bm25_topk

    lex = q_bm25_topk(spark, sf_dir)  # (doc_id, dl, bm25) — ≤ HYBRID_CAND rows
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    lex_ranked = lex.select(
        "doc_id", F.row_number().over(wl).alias("rank_lex")
    ).filter(F.col("rank_lex") <= HYBRID_CAND)

    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    nrm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    normed = emb.select("doc_id", "v", nrm.alias("nrm"))
    q = normed.filter(F.col("doc_id") == _HYBRID_QUERY_VEC).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    scored = (
        normed.filter(F.col("doc_id") != _HYBRID_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            F.round(dot / (F.col("nrm") * F.col("qnrm")), 6).alias("cosine"),
        )
    )
    wd = Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))
    dense_ranked = scored.select(
        "doc_id", F.row_number().over(wd).alias("rank_dense")
    ).filter(F.col("rank_dense") <= HYBRID_CAND)

    fused = lex_ranked.join(dense_ranked, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_dense",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_dense")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id")).limit(HYBRID_TOP)


def _hybrid_oracle() -> str:
    from jetstream_spark.queries.text import _bm25_oracle

    return f"""
WITH lex AS ({_bm25_oracle()}),
lex_ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
  FROM lex QUALIFY rank_lex <= {HYBRID_CAND}
), e AS ({_COS_E_SQL}),
dense AS (
  SELECT b.vec_id AS doc_id,
         round(list_aggregate(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * b.v[i]), 'sum')
               / (q.nrm * b.nrm), 6) AS cosine
  FROM e q JOIN e b ON b.vec_id <> {_HYBRID_QUERY_VEC}
  WHERE q.vec_id = {_HYBRID_QUERY_VEC}
), dense_ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank_dense
  FROM dense QUALIFY rank_dense <= {HYBRID_CAND}
), fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.rank_lex, d.rank_dense,
         round(coalesce(1.0 / ({RRF_K} + l.rank_lex), 0.0)
               + coalesce(1.0 / ({RRF_K} + d.rank_dense), 0.0), 6) AS rrf_score
  FROM lex_ranked l FULL OUTER JOIN dense_ranked d ON l.doc_id = d.doc_id
)
SELECT doc_id, rank_lex, rank_dense, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {HYBRID_TOP}
"""


# --- MMR: maximal-marginal-relevance diversified top-k ---------------------------
# Carbonell/Goldstein (SIGIR 1998): greedily re-rank a candidate pool so
# each pick maximizes λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) — relevance
# minus redundancy. The de-dup step every retrieval-augmented pipeline
# runs between ANN and the context window.
#
# The greedy recurrence is inherently sequential in k, but each round is
# a BOUNDED relational step over the CAND-row candidate pool (a max-agg
# penalty join + a 1-row argmax), so the engine unrolls MMR_K rounds as
# lazy DataFrame ops — no collect, no UDF; the oracle unrolls the same
# rounds as chained CTEs. All scores pass through round(·, 6) BEFORE the
# argmax in both engines, so tie-breaks (score desc, doc_id) agree.
#
# Scale (100 TB): the candidate pool comes from any ANN tier (top-CAND),
# so round cost is O(CAND²) pair sims — independent of corpus size; at
# production k the pool frame would be localCheckpoint'ed once (here it
# is cached) and the k rounds never touch the corpus again.

MMR_LAMBDA = 0.7
MMR_K = 5
MMR_CAND = 20
_MMR_QUERY_VEC = 0


def _mmr_base(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(cand, pairs): top-MMR_CAND candidates by round-6 cosine to the query
    vector, and their pairwise round-6 cosines."""
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    nrm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    normed = emb.select("doc_id", "v", nrm.alias("nrm"))
    q = normed.filter(F.col("doc_id") == _MMR_QUERY_VEC).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    dot_q = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    cand = (
        normed.filter(F.col("doc_id") != _MMR_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select("doc_id", "v", "nrm", F.round(dot_q / (F.col("nrm") * F.col("qnrm")), 6).alias("qsim"))
        .orderBy(F.col("qsim").desc(), F.col("doc_id"))
        .limit(MMR_CAND)
        .cache()
    )
    a = cand.select(
        F.col("doc_id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = cand.select(
        F.col("doc_id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot_ab = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", F.round(dot_ab / (F.col("na") * F.col("nb")), 6).alias("sim"))
        .cache()
    )
    return cand.select("doc_id", "qsim"), pairs


def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand, pairs = _mmr_base(spark, sf_dir)
    lam, one_m = MMR_LAMBDA, 1 - MMR_LAMBDA
    picks: list[DataFrame] = []
    remaining = cand
    for r in range(1, MMR_K + 1):
        if r == 1:
            scored = remaining.select(
                "doc_id", F.round(F.lit(lam) * F.col("qsim"), 6).alias("mmr_score")
            )
        else:
            s_ids = picks[0].select("doc_id")
            for p in picks[1:]:
                s_ids = s_ids.unionByName(p.select("doc_id"))
            pen = (
                pairs.join(s_ids, pairs["b"] == s_ids["doc_id"])
                .groupBy("a")
                .agg(F.max("sim").alias("mx"))
            )
            scored = remaining.join(pen, remaining["doc_id"] == pen["a"]).select(
                remaining["doc_id"],
                F.round(
                    F.lit(lam) * F.col("qsim") - F.lit(one_m) * F.col("mx"), 6
                ).alias("mmr_score"),
            )
        pick = (
            scored.orderBy(F.col("mmr_score").desc(), F.col("doc_id"))
            .limit(1)
            .select(F.lit(r).alias("sel_round"), "doc_id", "mmr_score")
            # lineage cut (the BPE-trainer round pattern): each pick is a
            # 1-row frame referenced by every later round's penalty join —
            # without the cut, round r's plan embeds rounds 1..r-1's plans
            # recursively and stage count grows super-linearly in k
            .localCheckpoint()
        )
        picks.append(pick)
        remaining = remaining.join(pick.select("doc_id"), "doc_id", "left_anti")
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def _mmr_oracle() -> str:
    lam, one_m = MMR_LAMBDA, 1 - MMR_LAMBDA
    rounds = []
    for r in range(2, MMR_K + 1):
        prev = f"selcum{r - 1}"
        rounds.append(f"""sel{r} AS (
  SELECT {r} AS sel_round, c.doc_id,
         round({lam!r} * c.qsim - {one_m!r} * pen.mx, 6) AS mmr_score
  FROM cand c
  JOIN (SELECT a AS doc_id, max(sim) AS mx FROM pairs
        WHERE b IN (SELECT doc_id FROM {prev}) GROUP BY a) pen USING (doc_id)
  WHERE c.doc_id NOT IN (SELECT doc_id FROM {prev})
  ORDER BY mmr_score DESC, c.doc_id LIMIT 1
), selcum{r} AS (
  SELECT doc_id FROM {prev} UNION ALL SELECT doc_id FROM sel{r}
)""")
    sels = ",\n".join(rounds)
    union = "\nUNION ALL\n".join(
        f"SELECT sel_round, doc_id, mmr_score FROM sel{r}" for r in range(1, MMR_K + 1)
    )
    return f"""
WITH e AS ({_COS_E_SQL}),
cand AS (
  SELECT b.vec_id AS doc_id, b.v, b.nrm,
         round(list_aggregate(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * b.v[i]), 'sum')
               / (b.nrm * q.nrm), 6) AS qsim
  FROM e q JOIN e b ON b.vec_id <> {_MMR_QUERY_VEC}
  WHERE q.vec_id = {_MMR_QUERY_VEC}
  ORDER BY qsim DESC, doc_id LIMIT {MMR_CAND}
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         round(list_aggregate(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]), 'sum')
               / (a.nrm * b.nrm), 6) AS sim
  FROM cand a JOIN cand b ON a.doc_id <> b.doc_id
),
sel1 AS (
  SELECT 1 AS sel_round, doc_id, round({lam!r} * qsim, 6) AS mmr_score
  FROM cand ORDER BY mmr_score DESC, doc_id LIMIT 1
), selcum1 AS (
  SELECT doc_id FROM sel1
),
{sels}
{union}
"""


# --- greedy k-center coreset selection ------------------------------------------
# Gonzalez (1985) farthest-point traversal: start from a seed, repeatedly
# add the point FARTHEST from the selected set (distance = min over
# selected centers). The classic 2-approximation for k-center, and the
# geometric-diversity data-selection pass a training pipeline runs when
# it wants a small subset COVERING the embedding space (active-learning
# seed sets, eval-panel selection) — complements MMR (query-relative
# diversity) and corpus_budget_selection (quality/budget greedy) with a
# corpus-global geometric criterion.
#
# Engine shape: the selected set lives as ONE 1-row frame holding the
# center vectors as an array (grows by one vector per round); each round
# is ONE map-only pass over the checkpointed corpus (broadcast
# nested-loop join against the 1-row centers frame, array_min over the
# per-center cosine distances) + a 1-row TakeOrdered argmax — ZERO
# shuffles per round, driver traffic one row per round. At 100 TB this
# is K linear scans of a cached normalized corpus; the broadcast state
# is K·dim doubles. The oracle unrolls the same rounds as chained CTEs
# using least(prev_mind, dist_new) — equivalent because per-distance
# round(·, 6) happens BEFORE the min in both engines and min is
# associative, so tie-breaks (mind desc, vec_id) agree bit-for-bit.

KC_K = 6  # selected coreset size (seed + 5 greedy rounds)


def _kc_dot(v, cv):
    return F.aggregate(F.zip_with(v, cv, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    nrm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    # the corpus frame is re-scanned every round — checkpoint once
    pts = emb.select("vec_id", "v", nrm.alias("nrm")).localCheckpoint(eager=False)
    seed = pts.orderBy("vec_id").limit(1).localCheckpoint(eager=False)
    picks = [
        seed.select(
            F.lit(1).alias("sel_round"), "vec_id", F.lit(0.0).alias("radius")
        )
    ]
    cent = seed.select(
        F.array(F.col("v")).alias("cvs"), F.array(F.col("nrm")).alias("cns")
    ).localCheckpoint(eager=False)
    for r in range(2, KC_K + 1):
        mind = F.array_min(
            F.zip_with(
                "cvs",
                "cns",
                lambda cv, cn: F.round(
                    F.lit(1.0) - _kc_dot(F.col("v"), cv) / (F.col("nrm") * cn), 6
                ),
            )
        )
        pick = (
            pts.crossJoin(F.broadcast(cent))
            .select("vec_id", "v", "nrm", mind.alias("mind"))
            .orderBy(F.col("mind").desc(), "vec_id")
            .limit(1)
            # 1-row lineage cut per round (the MMR/BPE pattern)
            .localCheckpoint(eager=False)
        )
        picks.append(
            pick.select(F.lit(r).alias("sel_round"), "vec_id", F.col("mind").alias("radius"))
        )
        cent = (
            cent.crossJoin(pick)
            .select(
                F.concat("cvs", F.array(F.col("v"))).alias("cvs"),
                F.concat("cns", F.array(F.col("nrm"))).alias("cns"),
            )
            .localCheckpoint(eager=False)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def _kcenter_oracle() -> str:
    dot = (
        "list_aggregate(list_transform(generate_series(1, len(p.v)), i -> p.v[i] * c.v[i]), 'sum')"
    )
    parts = [
        f"c1 AS (SELECT vec_id, v, nrm FROM e ORDER BY vec_id LIMIT 1),",
        "s1 AS (SELECT 1 AS sel_round, vec_id, 0.0 AS radius FROM c1),",
        f"m1 AS (SELECT p.vec_id, p.v, p.nrm,\n"
        f"  round(1.0 - {dot} / (p.nrm * c.nrm), 6) AS mind\n"
        f"  FROM e p, c1 c),",
    ]
    for r in range(2, KC_K + 1):
        prev = f"m{r - 1}"
        parts.append(
            f"p{r} AS (SELECT vec_id, v, nrm, mind FROM {prev} ORDER BY mind DESC, vec_id LIMIT 1),\n"
            f"s{r} AS (SELECT {r} AS sel_round, vec_id, mind AS radius FROM p{r}),\n"
            f"m{r} AS (SELECT p.vec_id, p.v, p.nrm,\n"
            f"  least(p.mind, round(1.0 - {dot} / (p.nrm * c.nrm), 6)) AS mind\n"
            f"  FROM {prev} p, p{r} c),"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT sel_round, vec_id, radius FROM s{r}" for r in range(1, KC_K + 1)
    )
    body = "\n".join(parts).rstrip(",")
    return f"WITH e AS ({_COS_E_SQL}),\n{body}\n{union}"


# --- binary sign-signature Hamming ANN -------------------------------------------
# The 1-bit-per-dimension memory tier BELOW product quantization: sign
# binarization keeps cos(x, q) ≈ cos(π·hamming/d) (the SimHash/LSH
# identity), stores a 64-dim vector in 8 BYTES, and scores with XOR +
# popcount — the cheapest rerank-ready first pass a vector store runs
# (binary embeddings as shipped by every major embedding API). The
# signature packs into TWO int64 halves (32 bits each) rather than one,
# keeping every intermediate inside signed-64 range in BOTH engines
# (DuckDB promotes a 1<<63 sum to HUGEINT — a silent type fork).
# Scale shape: signature build is map-only; the 10 query signatures
# broadcast; scoring is codegen XOR/popcount per row + the partial
# top-k window the ANN family already uses. Recall vs the exact cosine
# top-k is pinned in tests.

_HAM_SIG_LO = (
    "aggregate(transform(slice(v, 1, 32), (x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)),"
    " 0L, (a, b) -> a + b)"
)
_HAM_SIG_HI = (
    "aggregate(transform(slice(v, 33, 32), (x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)),"
    " 0L, (a, b) -> a + b)"
)


def _hamming_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    return emb.select(
        "vec_id",
        F.expr(_HAM_SIG_LO).alias("lo"),
        F.expr(_HAM_SIG_HI).alias("hi"),
    )


def q_ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = _hamming_sigs(spark, sf_dir)
    q = sigs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    ham = (
        F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
        + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))
    ).cast("int")
    scored = (
        sigs.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", ham.alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "hamming", "rank")
    )


def _hamming_oracle() -> str:
    def sig(lo: int) -> str:
        return (
            f"CAST(list_aggregate(list_transform(generate_series({lo}, {lo + 31}), "
            f"i -> CASE WHEN v[i] > 0 THEN (CAST(1 AS BIGINT) << (i - {lo})) "
            f"ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT)"
        )

    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), sig AS (
  SELECT vec_id, {sig(1)} AS lo, {sig(33)} AS hi FROM e
), scored AS (
  SELECT q.vec_id AS query_id, b.vec_id,
         CAST(bit_count(xor(q.lo, b.lo)) + bit_count(xor(q.hi, b.hi)) AS INTEGER) AS hamming
  FROM sig q JOIN sig b ON b.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, hamming, rank FROM ranked WHERE rank <= {TOP_K}
"""


# --- linear-time MMD two-sample drift test ---------------------------------------
# Gretton et al. (JMLR 2012) MMD_l: the O(n) unbiased estimator of
# squared maximum mean discrepancy between two embedding populations —
# h_j = k(x1,x2) + k(y1,y2) − k(x1,y2) − k(x2,y1) averaged over disjoint
# sample quads. THE kernel two-sample test an embedding pipeline runs to
# detect distribution drift between crawl snapshots / encoder versions;
# complements split_drift_psi (binned scalar features) with a test over
# the raw vector geometry.
#
# Quad formation is MAP-SIDE: with dense vec_ids the j-th quad is the
# four vectors with vec_id in [4j, 4j+4) — x = even positions, y = odd —
# so the whole test is one groupBy(j)-equivalent 4-way node-scale join +
# one scalar aggregate; no pairwise blow-up, no sort (a production run
# with sparse ids would zipWithIndex once first). RBF kernel with fixed
# bandwidth scales gamma = g/dim for g in MMD_GAMMAS (the fixed-grid
# alternative to the median heuristic, which is cross-engine-fragile).
# Per-quad h is quantized to integer micro-units before the mean, so
# accumulation order cannot move the estimate (the NB/LSH pattern).

MMD_GAMMAS = (0.5, 1.0, 2.0)  # × 1/dim


def _sqdist(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def q_embedding_drift_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    quad = emb.select(
        F.floor(F.col("vec_id") / 4).alias("j"),
        F.pmod(F.col("vec_id"), F.lit(4)).alias("pos"),
        "v",
    )

    # r14 (guide §2.1/§6): quad assembly was a 4-way self-join on j whose
    # three-gamma output union re-executed it — 12 corpus scans and 9
    # corpus-scale leg broadcasts per run (an OOM shape at real scale).
    # Now ONE groupBy(j) pivot: map-side partials collapse each quad
    # before the single exchange (dense ids land the 4 legs in the same
    # input split). Legs are struct-wrapped so a present-but-NULL vector
    # stays distinguishable from a missing leg: the all-legs-present
    # filter reproduces the old INNER join exactly (NULL v still counted
    # in n_quads, its h NULL-skipped by sum — same as before).
    def leg(pos: int, name: str):
        return F.first(
            F.when(F.col("pos") == pos, F.struct(F.col("v"))), ignorenulls=True
        ).alias(name)

    legs = (
        quad.groupBy("j")
        .agg(leg(0, "l_x1"), leg(2, "l_x2"), leg(1, "l_y1"), leg(3, "l_y2"))
        .where(
            F.col("l_x1").isNotNull()
            & F.col("l_x2").isNotNull()
            & F.col("l_y1").isNotNull()
            & F.col("l_y2").isNotNull()
        )
        .select(
            F.col("l_x1.v").alias("x1"),
            F.col("l_x2.v").alias("x2"),
            F.col("l_y1.v").alias("y1"),
            F.col("l_y2.v").alias("y2"),
        )
    )
    dim = F.size("x1")
    aggs = []
    for i, g in enumerate(MMD_GAMMAS):
        gam = F.lit(g) / dim
        h = (
            F.exp(-gam * _sqdist("x1", "x2"))
            + F.exp(-gam * _sqdist("y1", "y2"))
            - F.exp(-gam * _sqdist("x1", "y2"))
            - F.exp(-gam * _sqdist("x2", "y1"))
        )
        aggs.append(F.sum(F.round(h * 1e6).cast("long")).alias(f"s{i}"))
    sums = legs.agg(F.count(F.lit(1)).alias("n_quads"), *aggs)
    # One row per gamma WITHOUT re-executing the aggregate per row: the
    # old 3-way union re-ran the whole subtree for each output row.
    rows = F.array(
        *[
            F.struct(
                F.lit(float(g)).alias("gamma_scale"),
                F.col("n_quads").alias("n_quads"),
                F.round(F.col(f"s{i}") / 1e6 / F.col("n_quads"), 6).alias(
                    "mmd2_lin"
                ),
            )
            for i, g in enumerate(MMD_GAMMAS)
        ]
    )
    return sums.select(F.explode(rows).alias("r")).select("r.*")


def _mmd_oracle() -> str:
    def sq(a: str, b: str) -> str:
        return (
            f"list_aggregate(list_transform(generate_series(1, len({a})), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')"
        )

    hs = [
        (
            f"exp(-(CAST({g} AS DOUBLE) / len(x1)) * {sq('x1', 'x2')})"
            f" + exp(-(CAST({g} AS DOUBLE) / len(x1)) * {sq('y1', 'y2')})"
            f" - exp(-(CAST({g} AS DOUBLE) / len(x1)) * {sq('x1', 'y2')})"
            f" - exp(-(CAST({g} AS DOUBLE) / len(x1)) * {sq('x2', 'y1')})"
        )
        for g in MMD_GAMMAS
    ]
    sums = ", ".join(
        f"sum(CAST(round(({h}) * 1e6) AS BIGINT)) AS s{i}" for i, h in enumerate(hs)
    )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({g} AS DOUBLE) AS gamma_scale, n_quads,"
        f" round(s{i} / 1e6 / n_quads, 6) AS mmd2_lin FROM sums"
        for i, g in enumerate(MMD_GAMMAS)
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), quad AS (
  SELECT vec_id // 4 AS j, vec_id % 4 AS pos, v FROM e
), q4 AS (
  SELECT a.j, a.v AS x1, b.v AS x2, c.v AS y1, d.v AS y2
  FROM quad a JOIN quad b ON a.j = b.j AND b.pos = 2
              JOIN quad c ON a.j = c.j AND c.pos = 1
              JOIN quad d ON a.j = d.j AND d.pos = 3
  WHERE a.pos = 0
), sums AS (
  SELECT count(*) AS n_quads, {sums} FROM q4
)
{union}
"""


QUERIES = [
    QuerySpec("ann_hamming_topk", q_ann_hamming_topk, _hamming_oracle(), "binary sign-signature Hamming ANN (XOR+popcount over packed int64 halves)", ("similarity",)),
    QuerySpec("embedding_drift_mmd", q_embedding_drift_mmd, _mmd_oracle(), "linear-time MMD two-sample drift test over embedding quads (3 RBF bandwidths)", ("similarity", "monitoring")),
    QuerySpec("kcenter_coreset", q_kcenter_coreset, _kcenter_oracle(), "greedy k-center (farthest-point) coreset selection over embeddings (unrolled rounds, zero shuffles per round)", ("similarity", "sampling")),
    QuerySpec("mmr_diverse_topk", q_mmr_diverse_topk, _mmr_oracle(), "MMR diversified re-ranking of the ANN candidate pool (unrolled greedy rounds)", ("similarity", "search")),
    QuerySpec("hybrid_search_rrf", q_hybrid_search_rrf, _hybrid_oracle(), "hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine legs", ("similarity", "search")),
    QuerySpec("knn_graph", q_knn_graph, Q_KNN_GRAPH_ORACLE, "exact top-k neighbor graph via blocked cogroup + partial top-k", ("similarity",)),
    QuerySpec("knn_graph_ivf", q_knn_graph_ivf, _knn_graph_ivf_oracle(), "approximate kNN graph restricted to IVF cells (one cell-key cogroup shuffle)", ("similarity",)),
    QuerySpec("ann_brute_force_topk", q_ann_brute_force, Q_ANN_ORACLE, "exact cosine top-k (numpy block products)", ("similarity",)),
    QuerySpec("ann_lsh_topk", q_ann_lsh, _lsh_oracle(), "random-hyperplane LSH ANN (approximate scale path)", ("similarity",)),
    QuerySpec("ann_lsh_indexed", q_ann_lsh_indexed, _lsh_oracle(), "LSH ANN through the materialized bucket-partitioned index", ("similarity",)),
    QuerySpec("ann_ivf_topk", q_ann_ivf, _ivf_oracle(), "IVF coarse-quantizer ANN (approximate scale path)", ("similarity",)),
    QuerySpec("ann_ivf_indexed", q_ann_ivf_indexed, _ivf_oracle(), "IVF ANN through the materialized cell-partitioned inverted file", ("similarity",)),
    QuerySpec("ann_pq_topk", q_ann_pq_topk, _pq_oracle(), "product-quantization ANN: byte codes + ADC table scoring (the memory-compressed tier)", ("similarity",)),
    QuerySpec("ann_ivfpq_topk", q_ann_ivfpq_topk, _ivfpq_oracle(), "IVF-PQ: cell-pruned probe scored over PQ codes (the composed production index)", ("similarity",)),
    QuerySpec("embedding_norms", q_embedding_norms, Q_EMB_NORMS_ORACLE, "vector norm/stats ops", ("similarity",)),
    QuerySpec("embedding_downproject", q_embedding_downproject, Q_EMB_DOWNPROJECT_ORACLE, "adjacent-pair dim reduction", ("similarity",)),
    QuerySpec("embedding_quantize_int8", q_embedding_quantize_int8, Q_EMB_QUANTIZE_ORACLE, "symmetric int8 quantization + reconstruction error", ("similarity",)),
    QuerySpec("embedding_covariance", q_embedding_covariance, Q_EMB_COVARIANCE_ORACLE, "one-pass distributed covariance matrix (mergeable X^T X partials)", ("similarity",)),
    QuerySpec("embedding_pca_project", q_embedding_pca_project, None, "PCA projection: distributed covariance -> driver eigh -> broadcast map-only projection (rows-only; numpy-equality tested)", ("similarity",)),
    QuerySpec("embedding_outliers", q_embedding_outliers, None, "Mahalanobis outlier top-N: covariance partials -> driver inverse -> map-only scoring (rows-only; numpy-equality tested)", ("similarity", "monitoring")),
]
