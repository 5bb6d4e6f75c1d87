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
# Round-7 rotation: no never-checked entries (all 160 have evidence);
# dedup_embedding_lsh re-enters because its band width became N-adaptive
# this round (VERDICT r6 #3); then the 15 r3-stale entries, then the 34
# oldest r4-stale entries — exactly 50.

# Entries whose engine/oracle CODE changed this round: they re-enter the
# window ahead of the staleness order so the change gets driver evidence
# in the round it ships. Reset this tuple each round.
_CODE_CHANGED = (
    "dedup_embedding_lsh",  # r7: _RHP_R now derived from corpus count (log2 N)
    "label_propagation",  # r7: per-round label join now explicitly broadcast
)

_PRIORITY = (
    # ---- never driver-checked (new in r7) — must lead the window ----
    "kcenter_coreset",
    "naive_bayes_domain",
    "seasonal_anomaly",
    "dp_noisy_counts",
    "kcore_decomposition",
    "cusum_changepoint",
    "sketch_quantile_bottomk",
    "markov_transitions",
    "embedding_drift_mmd",
    "ann_hamming_topk",
    "hbos_outliers",
    "kneser_ney_perplexity",
    "weak_label_analysis",
    "zorder_layout",
    "gini_concentration",
    "benford_audit",
    "rfm_segmentation",
    "basket_lift_rules",
    "ab_sequential_sprt",
    "survival_km_retention",
    "sketch_theta_setops",
    "fingerprint_winnowing",
    "mutual_information",
    "skyline_parts",
    "hybrid_search_rrf",
    "mmr_diverse_topk",
    "adamic_adar_linkpred",
    "k_anonymity_audit",
    "ohlc_bars",
    "textrank_keywords",
    "attribution_last_touch",
    # ---- code changed this round (r7) ----
    "dedup_embedding_lsh",
    "label_propagation",
    # ---- r3-latest driver evidence (stalest), driver order ----
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
    # ---- r4-latest driver evidence, driver order (oldest first) ----
    "window_rank_customers",
    "window_order_gaps",
    # ================= driver window boundary (50) ==================
    # Still r4-stale, first in line for the r8 window:
    # latest_order_per_customer, regexp_extract_ids, timeseries_gapfill,
    # ewma_hourly,
    # scd2_user_tiers, retention_cohorts, rate_anomaly,
    # ab_test_conversion, dedup_span_scrub,
    # dedup_containment_kmv, dedup_common_spans, dedup_ngram_jaccard,
    # dedup_minhash_lsh, dedup_simhash, dedup_two_tier,
    # knn_graph, knn_graph_ivf,
    # embedding_covariance, kmeans_train, phrase_search, bpe_pair_counts,
    # bigram_perplexity,
    # multimodal_resize,
    # multimodal_video_frames, multimodal_audio_stats, negative_samples,
    # domain_temperature_sample, split_drift_psi,
    # cluster_aware_split, weighted_sample, decontaminate_bloom,
    # corpus_budget_selection, profile_columns, profile_numeric,
    # profile_histogram, profile_skew, fk_integrity, hll_distinct,
    # fuzzy_join_names, pagerank_copurchase, triangle_count,
    # degree_profile, quantile_norm — then the r5 block.
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
