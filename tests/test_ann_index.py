"""The materialized LSH index must (a) physically partition by bucket id,
(b) plan probes as partition-pruned scans (PartitionFilters on bucket —
the claim behind 'a probe touches only matching buckets' at 100 TB),
(c) return exactly what the on-the-fly q_ann_lsh returns."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from jetstream_spark.operators.ann_index import (
    build_lsh_index,
    lsh_planes,
    probe_buckets,
    probe_lsh_index,
)
from jetstream_spark.queries.similarity import LSH_PLANES, q_ann_lsh
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "lsh_index")
    build_lsh_index(spark, SF_DIR, path)
    return path


def test_index_is_bucket_partitioned_on_disk(index_path):
    dirs = [d for d in os.listdir(index_path) if d.startswith("bucket=")]
    assert len(dirs) > 1, "index must be split into bucket=<id>/ partitions"
    assert all(0 <= int(d.split("=")[1]) < (1 << LSH_PLANES) for d in dirs)


def test_probe_scan_is_partition_pruned(spark, index_path):
    some_buckets = [3, 5, 12]
    probed = spark.read.parquet(index_path).where(F.col("bucket").isin(some_buckets))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # Partition pruning happens at the file index: the bucket IN-filter must
    # appear as a PartitionFilter (not a post-scan data filter).
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "bucket" in pf_line and "IN (3,5,12)".replace(" ", "") in pf_line.replace(" ", "")
    # and the pruned scan returns exactly the rows of those buckets
    full = spark.read.parquet(index_path)
    expected = full.where(F.col("bucket").isin(some_buckets)).count()
    assert probed.count() == expected
    assert probed.count() < full.count(), "probe must read a strict subset"


def test_bucket_assignment_matches_numpy_kernel(spark, index_path):
    """JVM HOF bucket function == numpy sign-bucket computation."""
    planes = lsh_planes()
    rows = spark.read.parquet(index_path).select("vec_id", "embedding", "bucket").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    expect = (np.sign(mat @ planes.T) > 0) @ (1 << np.arange(LSH_PLANES))
    got = np.array([r["bucket"] for r in rows])
    assert (got == expect).all()


def test_probe_buckets_radius():
    """probe set = all buckets within hamming<=2 (1 + 6 + 15 = 22 per query)."""
    assert len(probe_buckets(np.array([0]))) == 22
    assert probe_buckets(np.array([0]))[:4] == [0, 1, 2, 3]


def test_indexed_probe_equals_on_the_fly(spark, index_path):
    indexed = {tuple(r) for r in probe_lsh_index(spark, SF_DIR, index_path).collect()}
    onthefly = {tuple(r) for r in q_ann_lsh(spark, SF_DIR).collect()}
    assert indexed == onthefly


# --- IVF inverted file -----------------------------------------------------------

from jetstream_spark.operators.ann_index import (  # noqa: E402
    build_ivf_index,
    ivf_centroids,
    probe_ivf_index,
)
from jetstream_spark.queries.similarity import IVF_CELLS, q_ann_ivf  # noqa: E402


@pytest.fixture(scope="module")
def ivf_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "ivf_index")
    build_ivf_index(spark, SF_DIR, path)
    return path


def test_ivf_index_is_cell_partitioned_and_pruned(spark, ivf_path):
    dirs = [d for d in os.listdir(ivf_path) if d.startswith("cell=")]
    assert len(dirs) > 1
    assert all(0 <= int(d.split("=")[1]) < IVF_CELLS for d in dirs)
    probed = spark.read.parquet(ivf_path).where(F.col("cell").isin([1, 4]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cell" in pf_line and "IN (1,4)".replace(" ", "") in pf_line.replace(" ", "")
    assert probed.count() < spark.read.parquet(ivf_path).count()


def test_ivf_cell_assignment_matches_numpy(spark, ivf_path):
    cents = ivf_centroids(spark, SF_DIR)
    rows = spark.read.parquet(ivf_path).select("vec_id", "embedding", "cell").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    expect = np.argmax((mat / norms) @ cents.T, axis=1)
    got = np.array([r["cell"] for r in rows])
    assert (got == expect).all()


def test_ivf_indexed_probe_equals_on_the_fly(spark, ivf_path):
    indexed = {tuple(r) for r in probe_ivf_index(spark, SF_DIR, ivf_path).collect()}
    onthefly = {tuple(r) for r in q_ann_ivf(spark, SF_DIR).collect()}
    assert indexed == onthefly


def test_knn_graph_consistent_with_brute_force(spark):
    """The kNN graph restricted to the probe vectors must equal
    ann_brute_force_topk exactly (same order contract, different
    topology: blocked cogroup vs broadcast query matrix)."""
    from jetstream_spark.queries.similarity import (
        N_QUERIES,
        q_ann_brute_force,
        q_knn_graph,
    )

    sf = "/root/testdata/sf0.001"
    graph = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in q_knn_graph(spark, sf).collect()
        if r["vec_id"] < N_QUERIES
    }
    brute = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in q_ann_brute_force(spark, sf).collect()
    }
    assert graph == brute and len(brute) > 0
