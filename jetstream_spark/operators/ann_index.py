"""Physical LSH-bucketed ANN index — the materialized 100 TB probe path.

`jetstream_spark.queries.similarity.q_ann_lsh` computes sign-buckets on the
fly, which is honest for a one-shot query but rescans 100% of the corpus per
probe. This module materializes the layout the docstring promises: the
embeddings table written ONCE partitioned by LSH bucket id
(Hive-style `bucket=<id>/` directories), so a probe's
`WHERE bucket IN (<probe set>)` is a PARTITION FILTER — Spark prunes the
non-matching directories at planning time and the scan physically reads only
the probed subset (asserted by plan test in tests/test_ann_index.py).

At 100 TB: the index write is one full pass + one shuffle on bucket id; every
subsequent probe reads hamming<=2 probe sets = 22/64 of the partitions (and
with more planes, a vanishing fraction). Bucket skew is bounded because
random hyperplanes split the sphere evenly; residual skew lands on AQE.

The bucket function is pure JVM (zip_with/aggregate HOFs over SQL literal
plane rows — whole-stage codegen, no Python workers at index-build time) and
agrees with the numpy kernel in similarity.py: both compute
sign(dot(v, plane_b)) with float64 arithmetic on the same seeded planes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jetstream_spark.queries.similarity import (
    IVF_CELLS,
    IVF_NPROBE,
    LSH_PLANES,
    LSH_PROBE_RADIUS,
    LSH_SEED,
    N_QUERIES,
    TOP_K,
    _IVF_CENTROID_BASE,
    _query_matrix,
)
from jetstream_spark.tables import table


def index_is_fresh(index_path: str, sf_dir: str) -> bool:
    """Build-once/probe-many contract: rebuild only when the corpus
    changed, decided by fingerprint VALUE (operators/freshness.py) rather
    than mtime ordering — survives mtime-preserving regenerations."""
    import os

    from jetstream_spark.operators import freshness

    return freshness.index_is_fresh(
        index_path, os.path.join(sf_dir, "embeddings.parquet")
    )


def _stamp(index_path: str, sf_dir: str) -> None:
    import os

    from jetstream_spark.operators import freshness

    freshness.write_source_fingerprint(
        index_path, os.path.join(sf_dir, "embeddings.parquet")
    )


def lsh_planes(dim: int = 64) -> np.ndarray:
    """The deterministic hyperplane matrix shared with q_ann_lsh."""
    return np.random.RandomState(LSH_SEED).randn(LSH_PLANES, dim)


def lsh_bucket_expr(planes: np.ndarray, emb_col: str = "embedding") -> Column:
    """bucket = Σ_b [dot(v, plane_b) > 0] << b, as pure JVM HOF arithmetic."""
    dbl = F.transform(emb_col, lambda x: x.cast("double"))
    bucket: Column = F.lit(0)
    for b in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(v)) for v in planes[b]])
        dot = F.aggregate(
            F.zip_with(dbl, plane, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        bucket = bucket + F.when(dot > F.lit(0.0), F.lit(1 << b)).otherwise(F.lit(0))
    return bucket.cast("int")


def build_lsh_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """One pass over embeddings → parquet partitioned by bucket id.

    partitionBy gives Hive-style bucket=<id>/ directories: the unit of
    partition pruning for every later probe. (This is directory
    partitioning, not .bucketBy table bucketing — probes filter on bucket
    VALUES, which is exactly what directory pruning serves; bucketBy would
    only help bucket-equi-joins.)
    """
    emb = table(spark, sf_dir, "embeddings")
    (
        emb.withColumn("bucket", lsh_bucket_expr(lsh_planes()))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(index_path)
    )
    _stamp(index_path, sf_dir)


def probe_buckets(q_buckets: np.ndarray) -> list[int]:
    """Union of buckets within hamming<=LSH_PROBE_RADIUS of any query bucket."""
    popcount = np.array([bin(i).count("1") for i in range(1 << LSH_PLANES)])
    probe: set[int] = set()
    for qb in q_buckets:
        ham = popcount[np.bitwise_xor(np.arange(1 << LSH_PLANES), int(qb))]
        probe.update(np.nonzero(ham <= LSH_PROBE_RADIUS)[0].tolist())
    return sorted(probe)


def probe_lsh_index(spark: SparkSession, sf_dir: str, index_path: str) -> DataFrame:
    """Top-k cosine over ONLY the probed partitions of the materialized index.

    Produces the same (query_id, vec_id, cosine, rank) result as q_ann_lsh —
    the bucket-membership semantics are identical; only the physical access
    path differs (partition-pruned scan vs full-corpus rescan).
    """
    import pandas as pd

    planes = lsh_planes()
    q_ids, q_mat = _query_matrix(spark, sf_dir)
    q_norms = np.linalg.norm(q_mat, axis=1)
    q_buckets = (np.sign(q_mat @ planes.T) > 0) @ (1 << np.arange(LSH_PLANES))
    union = probe_buckets(q_buckets)
    popcount = np.array([bin(i).count("1") for i in range(1 << LSH_PLANES)])
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_norms, q_buckets, popcount))

    # bucket IN (...) is a partition filter: only bucket=<id>/ dirs are read.
    idx = spark.read.parquet(index_path).where(F.col("bucket").isin(union))

    def score(batches):
        ids, mat, norms, buckets, pc = bq.value
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            b_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            b_bucket = pdf["bucket"].to_numpy(dtype=np.int64)
            b_norms = np.linalg.norm(b_mat, axis=1)
            out = []
            for qi in range(len(ids)):
                ham = pc[np.bitwise_xor(b_bucket, int(buckets[qi]))]
                mask = (ham <= LSH_PROBE_RADIUS) & (b_ids != ids[qi])
                if mask.any():
                    cos = (b_mat[mask] @ mat[qi]) / (b_norms[mask] * norms[qi])
                    out.append(
                        pd.DataFrame({"query_id": ids[qi], "vec_id": b_ids[mask], "cosine": cos})
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    scores = idx.select("vec_id", "embedding", "bucket").mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


# --- IVF (coarse-quantizer) physical index ---------------------------------------


def ivf_centroids(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """The deterministic unit-norm centroid matrix shared with q_ann_ivf
    (corpus rows vec_id in [100, 100+IVF_CELLS))."""
    emb = table(spark, sf_dir, "embeddings")
    rows = (
        emb.where(
            (F.col("vec_id") >= _IVF_CENTROID_BASE)
            & (F.col("vec_id") < _IVF_CENTROID_BASE + IVF_CELLS)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    cents = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def ivf_cell_expr(cents: np.ndarray, emb_col: str = "embedding") -> Column:
    """cell = argmax_c dot(v, unit_centroid_c) — per-vector positive scaling
    doesn't move the argmax, so no normalization of v is needed. JVM-side:
    an array of the IVF_CELLS dot products, argmax via array_position of the
    max (first-match tie rule, same as numpy argmax)."""
    dbl = F.transform(emb_col, lambda x: x.cast("double"))
    dots = []
    for c in range(cents.shape[0]):
        cent = F.array(*[F.lit(float(v)) for v in cents[c]])
        dots.append(
            F.aggregate(F.zip_with(dbl, cent, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        )
    arr = F.array(*dots)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def build_ivf_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """One pass + one shuffle-free write: embeddings parquet-partitioned by
    IVF cell id (the inverted file). A probe's `cell IN (<nprobe cells>)`
    is a partition filter — it reads nprobe/IVF_CELLS of the data."""
    emb = table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(spark, sf_dir)
    (
        emb.withColumn("cell", ivf_cell_expr(cents))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(index_path)
    )
    _stamp(index_path, sf_dir)


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Resolve (and build if stale/absent) the canonical inverted-file
    location for a corpus dir; returns the index path. Shared by the batch
    query surface and the streaming probe."""
    import os
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    index_path = os.path.join(tempfile.gettempdir(), f"jetstream_ivf_index_{tag}")
    if not index_is_fresh(index_path, sf_dir):
        build_ivf_index(spark, sf_dir, index_path)
    return index_path


def probe_ivf_index(spark: SparkSession, sf_dir: str, index_path: str) -> DataFrame:
    """Top-k cosine over only the probed cells of the materialized inverted
    file; same result as q_ann_ivf, partition-pruned physical access."""
    cents = ivf_centroids(spark, sf_dir)
    q_ids, q_mat = _query_matrix(spark, sf_dir)
    return probe_ivf_with(spark, cents, q_ids, q_mat, index_path)


def probe_ivf_with(spark: SparkSession, cents, q_ids, q_mat, index_path: str) -> DataFrame:
    """The probe core, parameterized on the query matrix — shared by the
    batch query (fixed probe vectors) and the streaming probe (each
    micro-batch's incoming vectors). Only the nprobe cells' partitions are
    read; the query matrix broadcasts."""
    import pandas as pd

    q_norms = np.linalg.norm(q_mat, axis=1)
    q_cells = np.argsort(-(q_mat / q_norms[:, None]) @ cents.T, axis=1)[:, :IVF_NPROBE]
    union = sorted({int(c) for row in q_cells for c in row})
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_norms, q_cells))

    idx = spark.read.parquet(index_path).where(F.col("cell").isin(union))

    def score(batches):
        ids, mat, norms, cells = bq.value
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            b_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            b_cell = pdf["cell"].to_numpy(dtype=np.int64)
            b_norms = np.linalg.norm(b_mat, axis=1)
            out = []
            for qi in range(len(ids)):
                mask = np.isin(b_cell, cells[qi]) & (b_ids != ids[qi])
                if mask.any():
                    cos = (b_mat[mask] @ mat[qi]) / (b_norms[mask] * norms[qi])
                    out.append(
                        pd.DataFrame({"query_id": ids[qi], "vec_id": b_ids[mask], "cosine": cos})
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    scores = idx.select("vec_id", "embedding", "cell").mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
