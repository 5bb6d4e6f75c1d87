"""The declared query catalog.

Every operator capability from SURVEY.md §2 (reference operators S1-S27 where
batch-expressible, the §2.2 relational surface, and the §2.3 LLM-data-pipeline
extensions) is declared here as a named QuerySpec: a Spark DataFrame builder
plus, where SQL-expressible, a DuckDB oracle SQL string computing the same
result (same column names — the driver hashes values after sorting columns by
name).
"""

from __future__ import annotations

from jetstream_spark.queries.spec import QuerySpec


# Names the driver should check FIRST. The driver verifies the first ~50
# registry entries in declaration order, so this window is re-curated every
# round under a HARD rule (pinned by tests/test_registry_priority.py):
#   1. never-driver-checked entries ALWAYS lead the window — a new operator
#      debuts with driver evidence in its debut round, no exceptions;
#   2. then entries whose code changed this round (declared in
#      _CODE_CHANGED below so the rotation test can exempt them);
#   3. then the rest, OLDEST driver evidence first — every in-window entry
#      must be at least as stale as every out-of-window entry (pinned by
#      tests/test_registry_priority.py::test_window_is_oldest_evidence_first).
# Round-11 rotation (VERDICT r10 #1: finish the evidence-freshness
# story): the 2 r6-stale overflow entries named by the r10 window lead
# (embedding_quantize_int8, tfidf_top_terms), then ALL 46 entries whose
# latest driver evidence is r7, in their r7 driver order, then the
# OLDEST 2 of the 49 r8-stale entries in their r8 driver order
# (profile_entropy, funnel_steps_strict) — exactly 50. After this round
# nothing in the ledger is older than r8 and the rotation is
# steady-state (~50 due per round against 50 slots).

# Entries whose engine/oracle CODE changed this round: they re-enter the
# window ahead of the staleness order so the change gets driver evidence
# in the round it ships. Reset this tuple each round.
_CODE_CHANGED = ()  # r11 touches no query module (maintenance/metrics/bench only)

_PRIORITY = (
    # ---- r6-latest driver evidence (joint-stalest), r6 driver order ----
    # the two entries the r10 window could not fit (named overflow,
    # VERDICT r9 #1 / r10 #1) — first-in-line by the standing rule
    "embedding_quantize_int8",
    "tfidf_top_terms",
    # ---- r7-latest driver evidence (the stalest block), r7 driver order ----
    "kcenter_coreset",
    "seasonal_anomaly",
    "dp_noisy_counts",
    "kcore_decomposition",
    "cusum_changepoint",
    "sketch_quantile_bottomk",
    "markov_transitions",
    "embedding_drift_mmd",
    "ann_hamming_topk",
    "weak_label_analysis",
    "zorder_layout",
    "gini_concentration",
    "benford_audit",
    "rfm_segmentation",
    "basket_lift_rules",
    "ab_sequential_sprt",
    "survival_km_retention",
    "sketch_theta_setops",
    "mutual_information",
    "skyline_parts",
    "hybrid_search_rrf",
    "mmr_diverse_topk",
    "adamic_adar_linkpred",
    "k_anonymity_audit",
    "ohlc_bars",
    "textrank_keywords",
    "attribution_last_touch",
    "dedup_embedding_lsh",
    "label_propagation",
    "decontaminate_splits",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_share",
    "intersect_repeat_buyers",
    "date_functions",
    "distinct_agg",
    "topk_brand_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "ordered_string_agg",
    "above_nation_avg",
    "user_journey",
    "monthly_density",
    "bool_aggs",
    "window_rank_customers",
    "window_order_gaps",
    # ---- r8-latest driver evidence (oldest 2), r8 driver order ----
    "profile_entropy",
    "funnel_steps_strict",
    # ================= driver window boundary (50) ==================
    # r12 window: the remaining 47 r8-stale entries lead (in r8 driver
    # order), then the oldest r9-stale entries fill out the 50.
    # Everything else follows in module order.
)


def all_queries() -> dict[str, QuerySpec]:
    # imports deferred so a syntax error in one domain doesn't break the rest
    from jetstream_spark.queries import clustering, dedup, eventlog, multimodal, profiling, quality, relational, relational2, relational3, relational4, relational5, sampling, similarity, sketches, text, tokenizer

    collected: dict[str, QuerySpec] = {}
    for module in (relational, relational2, relational3, relational4, relational5, eventlog, dedup, similarity, clustering, sketches, text, quality, multimodal, sampling, tokenizer, profiling):
        for spec in module.QUERIES:
            assert spec.name not in collected, f"duplicate query name {spec.name}"
            collected[spec.name] = spec
    missing = [n for n in _PRIORITY if n not in collected]
    assert not missing, f"_PRIORITY names not declared: {missing}"
    registry = {name: collected[name] for name in _PRIORITY}
    registry.update({n: s for n, s in collected.items() if n not in registry})
    return registry
