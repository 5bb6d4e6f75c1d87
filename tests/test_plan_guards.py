"""Engine-wide physical-plan guards over the WHOLE query registry.

Two scale anti-patterns must never silently reappear in a declared query:

- `CartesianProduct` — an unconstrained pairwise join is a corpus-squared
  scan at 100 TB. (Broadcast nested-loop joins against literally
  constant-size frames — 1-row stats, the |domains| mixture, the k-row
  centroid table — are fine and NOT flagged here.)
- `Exchange RoundRobinPartitioning` — a blind full-table reshuffle; every
  deliberate repartition in the engine is hash-based on a key, and the
  shingle gate only fires when the scan yields fewer splits than cores.

Plans are taken WITHOUT executing the final job (sparkPlan, not the
adaptive executed plan), so the sweep stays cheap; iterative builders that
run driver-side rounds during construction are exercised too — their
per-round actions at sf0.001 cost little.
"""

from __future__ import annotations

import pytest

from jetstream_spark.queries import all_queries
from tests.conftest import SF_DIR

# builders whose construction runs multi-round jobs — covered by their own
# dedicated plan audits (PLANS.md) and tests; excluded here to keep the
# sweep fast, not because they are exempt from the rules
_SKIP = {
    "kmeans_train",        # K rounds of driver-iterated Lloyd updates
    "bpe_learn_merges",    # iterative merge selection
    "bpe_encode_stats",    # depends on learned merges
    "dedup_components",    # iterative hash-to-min
    "dedup_keep_canonical",  # builds on components
    "cluster_aware_split",   # builds on components
    "pagerank_copurchase",   # per-round checkpoints detach lineage anyway
    "ann_lsh_indexed",     # materialized-index build side effects
    "ann_ivf_indexed",
    "dedup_incremental",   # bucketed-index build side effects
    "knn_graph_ivf",
}

# no exemptions: every deliberate spread repartition in the engine is
# hash-based (doc_id), so RoundRobinPartitioning must never appear
_RR_ALLOWED: set[str] = set()


@pytest.mark.parametrize("name", [n for n in all_queries() if n not in _SKIP])
def test_no_cartesian_or_roundrobin(spark, name):
    spec = all_queries()[name]
    df = spec.build(spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian join\n{plan[:2000]}"
    if name not in _RR_ALLOWED:
        assert "RoundRobinPartitioning" not in plan, (
            f"{name}: blind round-robin reshuffle\n{plan[:2000]}"
        )
