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
# Round-12 rotation (VERDICT r11 #2: steady-state continues): the 47
# remaining entries whose latest driver evidence is r8 lead, in their r8
# driver order, then the OLDEST 3 of the 50 r9-stale entries in their r9
# driver order (profile_columns_fast, kneser_ney_perplexity,
# hbos_outliers) — exactly 50. After this round the evidence histogram
# reads r9:47 / r10:50 / r11:50 / r12:50 and the ~50-due-per-round
# rotation stays steady-state.

# Entries whose engine/oracle CODE changed this round: they re-enter the
# window ahead of the staleness order so the change gets driver evidence
# in the round it ships. Reset this tuple each round.
_CODE_CHANGED = ()  # r12 touches no query module (maintenance/bench only)

_PRIORITY = (
    # ---- r8-latest driver evidence (the stalest block), r8 driver order ----
    "pmi_collocations",
    "dup_ratio_by_source",
    "naive_bayes_domain",
    "kmeans_train",
    "latest_order_per_customer",
    "regexp_extract_ids",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ab_test_conversion",
    "timeseries_gapfill",
    "ewma_hourly",
    "negative_samples",
    "scd2_user_tiers",
    "phrase_search",
    "domain_temperature_sample",
    "profile_columns",
    "profile_numeric",
    "profile_histogram",
    "profile_skew",
    "fk_integrity",
    "hll_distinct",
    "fuzzy_join_names",
    "pagerank_copurchase",
    "triangle_count",
    "degree_profile",
    "quantile_norm",
    "rate_anomaly",
    "split_drift_psi",
    "knn_graph_ivf",
    "dedup_containment_kmv",
    "embedding_covariance",
    "knn_graph",
    "weighted_sample",
    "multimodal_audio_stats",
    "multimodal_video_frames",
    "multimodal_resize",
    "retention_cohorts",
    "bigram_perplexity",
    "cluster_aware_split",
    "dedup_span_scrub",
    "dedup_two_tier",
    "dedup_common_spans",
    "decontaminate_bloom",
    "corpus_budget_selection",
    "bpe_pair_counts",
    "bpe_learn_merges",
    # ---- r9-latest driver evidence (oldest 3), r9 driver order ----
    "profile_columns_fast",
    "kneser_ney_perplexity",
    "hbos_outliers",
    # ================= driver window boundary (50) ==================
    # r13 window: the remaining 47 r9-stale entries lead (in r9 driver
    # order), then the oldest r10-stale entries fill out the 50.
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
