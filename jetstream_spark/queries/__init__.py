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
#   2. then entries whose code changed this round;
#   3. then the rest, oldest driver evidence first.
# Round-6 rotation: the 7 r5 additions (zero driver evidence — VERDICT r5
# "What's wrong" #1) plus any r6 additions lead; then the two r2-stale
# displaced entries; then the two queries whose code changes this round
# (bm25 single-tokenization fix, containment df ceiling); then the oldest
# r3-evidence entries in driver order, to exactly 50.
_PRIORITY = (
    # ---- never driver-checked (r6 additions first, then r5 additions) ----
    "dedup_embedding_lsh",    # r6: random-hyperplane banding, integer sign bits
    "zipf_alpha",             # r6: rank-frequency power-law fit (corpus health)
    "quality_classifier_lr",  # r6: trained LR quality filter, unrolled-GD oracle
    "label_propagation",      # r6: sync LPA communities, min-label tie-break
    "ann_pq_topk",            # product-quantization ANN: codes + ADC tables
    "ann_ivfpq_topk",         # IVF-PQ composition: cell-pruned probe over codes
    "multimodal_phash_dedup", # perceptual-hash image dedup (aHash over PNG round-trip)
    "dedup_substring_spans",  # ExactSubstr: cross-doc verbatim runs, interval-merged
    "ab_bootstrap_ci",        # deterministic Poisson-bootstrap lift CI
    "wordpiece_encode_stats", # greedy longest-match encoder (recursive-CTE oracle)
    "training_shards",        # deterministic seeded global shuffle manifest
    # ---- r2-only driver evidence (displaced from the r5 window) ----
    "dedup_exact",
    "salted_join_revenue",
    # ---- code changed this round (r6) ----
    "bm25_topk",          # r6: token array projected once (VERDICT r5 #2)
    "dedup_containment",  # r6: opt-in df stop-shingle ceiling (VERDICT r5 #3)
    # ---- r3-latest driver evidence, driver order (oldest first) ----
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
    "embedding_quantize_int8",
    "tfidf_top_terms",
    "decontaminate_splits",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_share",
    # ================= driver window boundary (50) ==================
    # Displaced this round (all r3-driver-green, rotate back next round):
    # q18_large_orders, q19_disjunctive, user_journey, distinct_agg,
    # bool_aggs, ordered_string_agg, intersect_repeat_buyers,
    # topk_brand_revenue, above_nation_avg, monthly_density, date_functions
    # — these and everything else follow in module order.
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
