"""Clustering operators: the oracle proves engine parity; these pin the
SEMANTICS — SemDeDup's pair set must be a subset of the exact all-pairs
scan (it is the same threshold, restricted to same-cell pairs), and the
cell assignment must be the true argmax a reference numpy computation
finds."""

from __future__ import annotations

import numpy as np

from jetstream_spark.queries.clustering import (
    _cents_frame,
    _e_frame,
    assign_cells,
    q_kmeans_cluster_stats,
    q_semdedup_pairs,
)
from jetstream_spark.queries.dedup import q_dedup_embedding_cosine
from tests.conftest import SF_DIR


def test_semdedup_pairs_subset_of_exact(spark):
    sem = {
        (r["vec_a"], r["vec_b"]) for r in q_semdedup_pairs(spark, SF_DIR).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in q_dedup_embedding_cosine(spark, SF_DIR).collect()
    }
    assert sem, "within-cluster scan found no pairs at all"
    assert sem <= exact, f"SemDeDup invented pairs the exact scan lacks: {sem - exact}"
    # and it must actually be an approximation worth having: nontrivial recall
    assert len(sem) / len(exact) >= 0.1


def test_assignment_is_true_argmax(spark):
    e = _e_frame(spark, SF_DIR)
    cents = _cents_frame(spark, SF_DIR)
    got = {r["vec_id"]: r["cell"] for r in assign_cells(e, cents).collect()}

    c_mat = np.array(
        [r["cv"] for r in sorted(cents.collect(), key=lambda r: r["cell"])],
        dtype=np.float64,
    )
    rows = e.select("vec_id", "v").collect()
    for r in rows:
        dots = c_mat @ np.array(r["v"], dtype=np.float64)
        assert got[r["vec_id"]] == int(np.argmax(dots)), f"vec {r['vec_id']}"


def test_kmeans_stats_shapes(spark):
    stats = q_kmeans_cluster_stats(spark, SF_DIR).collect()
    n_corpus = _e_frame(spark, SF_DIR).count()
    assert sum(r["n_vecs"] for r in stats) == n_corpus  # every vector assigned once
    for r in stats:
        assert -1.0 <= r["cohesion"] <= 1.0
        assert r["centroid_shift"] >= 0.0
