"""Plan-shape guards for the r14 single-pass rewrites.

Each optimization below collapsed repeated corpus subtrees (union branches,
agg+broadcast round-trips, self-joins) into one pass; these tests pin the
scan counts so a refactor cannot silently reintroduce the duplicated work.
Counted on the pre-AQE sparkPlan at sf0.001 — the duplication these guard
against is static plan structure, not a runtime artifact.
"""

from __future__ import annotations

import re

import pytest

from jetstream_spark.queries import all_queries
from tests.conftest import SF_DIR


def _scan_counts(df) -> tuple[int, int]:
    plan = df._jdf.queryExecution().sparkPlan().toString()
    return (
        len(re.findall(r"Scan parquet", plan)),
        len(re.findall(r"Scan ExistingRDD", plan)),
    )


@pytest.mark.parametrize(
    "name,max_parquet",
    [
        # one events scan feeds the daily grid; baseline stats are windows
        ("cusum_changepoint", 1),
        # totals/entropy are windows over the tiny transition frame
        ("markov_transitions", 1),
        # both layout audits melted into one exploded pass (orders + the
        # scale-bounds subquery)
        ("zorder_layout", 2),
        # 3-row output explodes an array over ONE corpus aggregate
        ("weak_label_analysis", 1),
        # quad assembly is one groupBy(j) pivot, not a 4-way self-join;
        # per-gamma rows explode over the 1-row sum frame
        ("embedding_drift_mmd", 1),
        # grand total and chi-square ride whole-frame windows
        ("benford_audit", 1),
        # conversion total rides a whole-frame window over the
        # per-channel aggregate
        ("attribution_last_touch", 1),
        # risk-set total is a whole-frame window over the per-lifetime
        # frame (spans scan + the pruned horizon scan remain)
        ("survival_km_retention", 2),
        # mixture totals are windows over the |domains| frame; the tiny
        # mix frame is checkpointed once per run
        ("domain_temperature_sample", 1),
        # every L0 class row melts into its 4 level keys (floor-composition
        # identity) — one corpus scan, no per-level re-scans
        ("k_anonymity_audit", 1),
        # the CMS sketch re-aggregates the checkpointed vocab-scale exact
        # frame — no second corpus explode, no corpus x D shuffle
        ("cms_heavy_hitters", 0),
        # the <=2K-row sketch + 1-row exact frames are checkpointed; no
        # branch re-derives the corpus distinct/sort chain
        ("sketch_theta_setops", 0),
    ],
)
def test_single_pass_scan_counts(spark, name, max_parquet):
    df = all_queries()[name].build(spark, SF_DIR)
    n_parquet, _ = _scan_counts(df)
    assert n_parquet <= max_parquet, (
        f"{name}: {n_parquet} parquet scans (expected <= {max_parquet}) — "
        "a duplicated corpus subtree has crept back in"
    )


def test_hbos_single_broadcast_no_per_feature_joins(spark):
    """hbos_outliers: the three per-feature bin-count broadcast joins were
    replaced by ONE 30-column conditional aggregate crossed in once."""
    df = all_queries()["hbos_outliers"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("BroadcastHashJoin") == 0, plan[:2000]
    # 1-row stats frames (nn/edges upstream of binning, + the ONE bin-count
    # aggregate) each arrive via a constant-size broadcast nested loop
    assert plan.count("BroadcastNestedLoopJoin") <= 3, plan[:2000]


def test_basket_lift_rules_single_basket_materialization(spark):
    """basket_lift_rules: the basket frame is lazily checkpointed, so the
    lineitem corpus appears ZERO times in the final plan (all consumers
    read the in-run checkpoint) instead of four pruned copies."""
    df = all_queries()["basket_lift_rules"].build(spark, SF_DIR)
    n_parquet, n_rdd = _scan_counts(df)
    assert n_parquet == 0, f"corpus re-scanned {n_parquet}x past the checkpoint"
    assert n_rdd >= 3, "expected the checkpointed basket frame under each consumer"
