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
# Round-13 rotation (VERDICT r12 #1: steady-state continues): the 47
# remaining entries whose latest driver evidence is r9 lead, in their r9
# driver order, then the OLDEST 3 of the 50 r10-stale entries in their
# r10 driver order (sample_split, doc_packing, embedding_downproject) —
# exactly 50. After this round the evidence histogram reads r10:47 /
# r11:50 / r12:50 / r13:50 and the ~50-due-per-round rotation is
# steady-state for a third consecutive round.

# Entries whose engine/oracle CODE changed this round: they re-enter the
# window ahead of the staleness order so the change gets driver evidence
# in the round it ships. Reset this tuple each round.
# r13 (optimization round): every query whose PLAN changed — directly
# (profile_columns_approx single-scan, dedup_substring_spans one-exchange
# df>=2, textrank broadcast rounds, pagerank nodes-from-deg + lazy cuts)
# or through a shared helper (learn_bpe lazy cuts -> all three tokenizer
# consumers; connected_components fused convergence -> the three
# components consumers). All were re-verified against the oracle at
# sf0.001 + sf0.01 (and the two float-sum rank loops at sf0.1 too)
# before this declaration; the driver re-hashes them this round.
_CODE_CHANGED = (
    "profile_columns_approx",
    "dedup_substring_spans",
    "bpe_learn_merges",
    "bpe_encode_stats",
    "wordpiece_encode_stats",
    "pagerank_copurchase",
    "textrank_keywords",
    "dedup_components",
    "dedup_keep_canonical",
    "dedup_two_tier",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "mutual_information",
)

_PRIORITY = (
    # ---- code-changed this round (rotation rule 2): the 11 entries not
    # already due by staleness; evicted to make room were the 3 r10-stale
    # fillers (sample_split, doc_packing, embedding_downproject) and the
    # 8 youngest r9-stale entries (the three multimodal_* rows,
    # text_lang_id, text_fingerprint, text_repetition, embedding_norms,
    # text_quality_score) — in-window non-changed evidence stays r9 ==
    # the stalest out-of-window evidence, so the oldest-first invariant
    # holds ----
    "dedup_substring_spans",
    "bpe_learn_merges",
    "wordpiece_encode_stats",
    "pagerank_copurchase",
    "textrank_keywords",
    "dedup_components",
    "dedup_keep_canonical",
    "dedup_two_tier",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "mutual_information",
    # ---- r9-latest driver evidence (the stalest block), r9 driver order;
    # profile_columns_approx and bpe_encode_stats are ALSO code-changed ----
    "fingerprint_winnowing",
    "profile_columns_approx",
    "embedding_pca_project",
    "bpe_encode_stats",
    "compression_ratio",
    "embedding_outliers",
    "cube_segment_priority",
    "range_frame_window",
    "ntile_quartiles",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "replay_scan",
    "subscribe_filter",
    "monotonic_delivery",
    "per_key_ordering",
    "asof_join_purchases",
    "anti_join_idle_customers",
    "window_running_revenue",
    "rollup_revenue",
    "set_symdiff_buyers",
    "full_outer_nation_activity",
    "percentiles_price",
    "unpivot_measures",
    "dedup_embedding_cosine",
    "semi_join_late_orders",
    "grouping_sets_status",
    "range_join_part_pairs",
    "pivot_segment_revenue",
    "scalar_functions",
    "tumbling_window_hourly",
    "json_props_stats",
    "conversion_funnel",
    "ann_brute_force_topk",
    "doc_chunking",
    "null_semantics",
    "variant_props_stats",
    "geomean_value",
    "text_token_count",
    # ================= driver window boundary (50) ==================
    # r14 window: the 8 evicted r9-stale entries (text_quality_score,
    # embedding_norms, text_repetition, text_lang_id, text_fingerprint,
    # multimodal_metadata/byte_stats/frame_sample) lead, then the 50
    # r10-stale entries in r10 driver order, then the oldest r11-stale
    # entries fill out the 50.
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
