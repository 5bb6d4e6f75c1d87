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
# Round-8 rotation (VERDICT r7 #2: the window MUST surface the 43
# r4-stale entries — the oldest evidence block — so the new-operator
# batch was capped at 5 to leave room): 5 never-checked debuts, then the
# 2 entries whose code changed this round, then ALL 43 r4-stale entries
# in their r4 driver order (kmeans_train sits in the code-changed tier —
# it is one of the 43, so the stale tier lists 42), then the first
# r5-stale entry — exactly 50.

# Entries whose engine/oracle CODE changed this round: they re-enter the
# window ahead of the staleness order so the change gets driver evidence
# in the round it ships. Reset this tuple each round.
_CODE_CHANGED = (
    # r8 plan-only changes that could not displace the mandated r4-stale
    # block (VERDICT r7 #2) — re-verified locally in r8 (sf0.01 oracle +
    # sf0.001 suite parity), queued first-in-line for this window:
    "kneser_ney_perplexity",  # r8: tokenize-once (6 corpus scans -> 4)
    "hbos_outliers",  # r8: tokenize-once feature frame (7 scans -> 1)
    "fingerprint_winnowing",  # r8: tokenize-once (8 scans -> 1)
    # r9 review refactor: the HLL estimator tail + zint fold are now
    # SHARED expressions between the md5 oracle form and the xxhash64
    # production twin (the parity contract is structural instead of
    # copy-synchronized). Plan and values are unchanged, but the rule is
    # code-changed -> in-window.
    "profile_columns_approx",
)

_PRIORITY = (
    # ---- never driver-checked (new in r9) — must lead the window ----
    # rows-only by declaration (xxhash64 has no DuckDB analogue); the
    # driver records the rows-only check, correctness is pinned by the
    # register-parity + error-bound tests in tests/test_r9_ops.py
    "profile_columns_fast",
    # ---- code changed (see _CODE_CHANGED) ----
    "kneser_ney_perplexity",
    "hbos_outliers",
    "fingerprint_winnowing",
    "profile_columns_approx",
    # ---- r5-latest driver evidence (the stalest block), r5 driver order ----
    # 49 entries are r5-stale; 45 fit after the debut + code-changed tiers,
    # so the LAST FOUR in r5 order (sample_split, doc_packing,
    # embedding_downproject, hopping_window_hourly) overflow to the r10
    # window — they must lead r10's stale tier (still the joint-stalest
    # evidence then).
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
    "text_quality_score",
    "embedding_norms",
    "text_repetition",
    "text_lang_id",
    "text_fingerprint",
    "multimodal_metadata",
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    # ================= driver window boundary (50) ==================
    # r10 window must LEAD with the four overflow r5-stale entries named
    # above, then the r6 block. Everything else follows in module order.
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
