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
# Round-10 rotation (VERDICT r9 #1: finish the stale-evidence ledger —
# 52 entries are due against the 50-slot window, so the round is
# debut-free and code-change-free on query modules): the 4 r5-stale
# overflow entries named by the r9 window lead, then the OLDEST 46 of
# the 48 r6-stale entries in their r6 driver order — exactly 50. The
# LAST TWO in r6 order (embedding_quantize_int8, tfidf_top_terms)
# overflow to the r11 window — they must lead r11's stale tier (still
# the joint-stalest evidence then), followed by the r7-stale block.

# Entries whose engine/oracle CODE changed this round: they re-enter the
# window ahead of the staleness order so the change gets driver evidence
# in the round it ships. Reset this tuple each round.
_CODE_CHANGED = ()  # r10 touches no query module (bench guard + streaming only)

_PRIORITY = (
    # ---- r5-latest driver evidence (joint-stalest), r5 driver order ----
    # the four entries the r9 window could not fit (named overflow,
    # VERDICT r8 #2 / r9 #1) — first-in-line by the standing rule
    "sample_split",
    "doc_packing",
    "embedding_downproject",
    "hopping_window_hourly",
    # ---- r6-latest driver evidence (the stalest block), r6 driver order ----
    "zipf_alpha",
    "quality_classifier_lr",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "multimodal_phash_dedup",
    "dedup_substring_spans",
    "ab_bootstrap_ci",
    "wordpiece_encode_stats",
    "training_shards",
    "dedup_exact",
    "salted_join_revenue",
    "bm25_topk",
    "dedup_containment",
    "q2_min_cost_supplier",
    "q4_priority_checking",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_by_linestatus",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q20_excess_shippers",
    "q13_order_count_distribution",
    "q11_revenue_concentration",
    "q21_sole_blame_suppliers",
    "q22_idle_rich_customers",
    "cms_heavy_hitters",
    "kmeans_cluster_stats",
    "semdedup_pairs",
    "curation_pipeline",
    "quality_gopher_rules",
    "unigram_perplexity",
    "domain_mix_weights",
    "importance_weights_dsir",
    "sessionization",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_lsh_indexed",
    "ann_ivf_indexed",
    "vocab_top_terms",
    "text_pii_scrub",
    "stratified_sample",
    "dedup_components",
    "dedup_keep_canonical",
    "dedup_incremental",
    # ================= driver window boundary (50) ==================
    # r11 window must LEAD with the two overflow r6-stale entries
    # (embedding_quantize_int8, tfidf_top_terms), then the r7-stale
    # block. Everything else follows in module order.
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
