"""Connected components (hash-to-min + large-star/small-star) unit tests."""

from __future__ import annotations

import random

import pytest

from jetstream_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["label"] for r in connected_components(df, **kw).collect()}


def _labels_star(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["label"] for r in connected_components_star(df, **kw).collect()}


def test_two_cliques_and_a_chain(spark):
    # clique {1,2,3}, clique {10,11}, chain 20-21-22-23 (diameter 3)
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    got = _labels(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_direction_insensitive(spark):
    # same component regardless of edge orientation
    assert _labels(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_bridged_cliques_merge(spark):
    # two near-cliques joined by one bridge edge collapse to one component
    edges = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)]
    got = _labels(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 6


def test_self_loop_is_singleton(spark):
    assert _labels(spark, [(4, 4)]) == {4: 4}


def test_diameter_cap_escalates_to_star(spark):
    """Hitting the hash-to-min round cap must fall through to the
    large-star/small-star variant, not raise: a 200-node path graph
    (diameter 200) through the PUBLIC entry point with a tiny cap still
    yields one component labeled by its min node."""
    n = 200
    edges = [(i, i + 1) for i in range(n)]
    got = _labels(spark, edges, max_iter=3)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_long_chain_converges_within_diameter(spark):
    n = 12
    edges = [(i, i + 1) for i in range(n)]
    got = _labels(spark, edges, max_iter=n + 2)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


# --- large-star/small-star variant -------------------------------------------------


def test_star_matches_hash_to_min_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(25)]
        assert _labels_star(spark, edges) == _labels(spark, edges, max_iter=40)


def test_star_basic_shapes(spark):
    assert _labels_star(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}
    assert _labels_star(spark, [(4, 4)]) == {4: 4}
    got = _labels_star(spark, [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)])
    assert set(got.values()) == {1} and len(got) == 6


def test_star_beats_diameter_on_long_chains(spark):
    """A 120-node path has diameter 119 — far past hash-to-min's default
    25-round cap — but the star variant's O(log² n) rounds finish well
    inside ITS default cap."""
    n = 120
    edges = [(i, i + 1) for i in range(n)]
    got = _labels_star(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == n + 1
