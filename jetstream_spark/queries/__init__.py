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
# round: (1) queries whose only driver evidence is oldest, (2) queries whose
# code changed this round, (3) the rest ordered oldest-evidence-first.
# Round-4 rotation (final): 39 never-driver-checked r4 queries lead —
# the late profiling/temporal/graph/experiment batch first, then the
# earlier r4 additions — followed by the longest-unchecked r1-only
# queries and the changed-code dedup/ANN entries; exactly 50. Every
# displaced entry sits immediately below the boundary, is r2/r3-driver-
# green, and carries dedicated pytest e2e coverage (plan assertions,
# property tests, or reference-equality tests) noted at its line.
_PRIORITY = (
    # ---- NEW in r4 (profiling batch): never driver-checked ----
    "ab_test_conversion",     # two-proportion z-test over md5 arms
    "timeseries_gapfill",     # dense hourly resample + LOCF
    "ewma_hourly",            # normalized EWMA via HOF weighted fold
    "negative_samples",       # deterministic contrastive negative draws
    "scd2_user_tiers",        # changelog -> SCD2 versioned dimension
    "phrase_search",          # positional-postings exact phrase search
    "domain_temperature_sample",  # temperature-flattened domain mixture
    "profile_columns",        # per-column null/distinct profile
    "profile_numeric",        # numeric min/max/avg/stddev profile
    "profile_histogram",      # equal-width per-column histograms
    "profile_skew",           # join-key skew: top share + p99/avg
    "fk_integrity",           # referential-integrity orphan audit
    "hll_distinct",           # deterministic integer-scaled HLL sketch
    "fuzzy_join_names",       # edit-distance join, lossless blocking
    "pagerank_copurchase",    # 3-round PageRank, unrolled-CTE oracle
    "triangle_count",         # compact-forward triangles + clustering
    "degree_profile",         # log2 degree distribution
    "quantile_norm",          # percentile-rank + winsorization
    # ---- NEW in r4 (late additions): never driver-checked ----
    "rate_anomaly",           # hourly event-rate z-score anomalies
    "split_drift_psi",        # PSI drift between train/test splits
    "kmeans_train",           # iterative Lloyd trainer, unrolled-SQL oracle
    "knn_graph_ivf",          # approximate kNN graph within IVF cells
    "dedup_containment_kmv",  # KMV-sketch approximate containment tier
    "bm25_topk",              # BM25 lexical retrieval, map-only scoring
    "embedding_covariance",   # one-pass distributed covariance partials
    "embedding_pca_project",  # covariance -> driver eigh -> map projection (rows-only)
    # ---- NEW in r4: never driver-checked ----
    "dedup_containment",      # directed quote-inclusion pairs, inverted count join
    "knn_graph",              # exact top-k neighbor graph, blocked cogroup
    "weighted_sample",        # Efraimidis–Spirakis quality-weighted sample
    "bpe_learn_merges",       # iterative distributed BPE trainer (rows-only)
    "bpe_encode_stats",       # vocab-encoded per-doc BPE stats (rows-only)
    "multimodal_audio_stats",  # real WAV round-trip (wave encode / RIFF decode)
    "multimodal_video_frames",  # real animated-GIF frame extraction (LZW)
    "multimodal_resize",      # real PNG decode -> NN thumbnail resample
    "retention_cohorts",      # daily cohort retention triangle
    "bigram_perplexity",      # stupid-backoff LM, model-as-table join scoring
    "cluster_aware_split",    # leakage-free split on near-dup cluster ids
    "dedup_span_scrub",       # boilerplate span REMOVAL, interval merging
    "dedup_two_tier",         # exact-rep tier then MinHash over reps
    "dedup_common_spans",     # C4-style span-level boilerplate detection
    "decontaminate_bloom",    # bloom-bitmap decontam, map-only train probe
    "corpus_budget_selection",  # global greedy token budget, no global sort
    "bpe_pair_counts",        # BPE merge-candidate counts over the vocab table
    # ---- r1-only driver evidence: the longest unchecked (range_frame /
    # ---- ntile displaced below for the new profiling pair — the window
    # ---- family keeps rank/gaps/latest in-window)
    "regexp_extract_ids",
    "window_rank_customers",
    "window_order_gaps",
    "latest_order_per_customer",
    # ---- code changed this round (r4): shingle-shuffle gate, partial
    # ---- top-k kernel, component convergence/escalation, index freshness ----
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # ================= driver window boundary (~50) ==================
    "dedup_components",
    # ann_brute_force_topk + dedup_incremental displaced for ab_test /
    # triangle_count: both r3-driver-green; the r4 changes to each carry
    # dedicated pytests (partial-top-k bound+agreement; bucketed-probe
    # plan assertion + fingerprint freshness) and fresh local oracles
    "dedup_incremental",
    "ann_brute_force_topk",
    # ann_lsh/ivf_indexed + doc_chunking + dedup_keep_canonical displaced
    # for the never-checked scd2/phrase/temperature/negative batch: all
    # r3-driver-green with dedicated pytest e2e (index freshness + plan
    # assertions; UDTF; left-anti over the components output)
    "dedup_keep_canonical",
    "cube_segment_priority",
    "dedup_embedding_cosine",
    "range_frame_window",
    "ntile_quartiles",
    "ann_lsh_indexed",
    "ann_ivf_indexed",
    "doc_chunking",           # the UDTF + LATERAL surface
    "semi_join_late_orders",
    "grouping_sets_status",
    "range_join_part_pairs",
    "null_semantics",
    "pivot_segment_revenue",
    "variant_props_stats",    # the rarer VARIANT surface (json cousin demoted)
    "geomean_value",          # the grouped-agg pandas UDAF surface
    "compression_ratio",      # rows-only zlib quality signal (zlib-equality tested)
    "embedding_outliers",     # rows-only Mahalanobis tail (numpy-equality tested)
    "text_token_count",
    "text_quality_score",
    # r2-green entries displaced by the seventeen new r4 queries. Families
    # keep in-window representatives (text: token_count/quality_score +
    # the bpe pair; multimodal: the three r4 real-decode queries;
    # sampling: weighted_sample/budget/bloom; similarity: knn_graph +
    # changed ANN block). dedup_exact demoted: r3-green, md5 path
    # untouched by the shingle-gate change.
    "scalar_functions",
    "tumbling_window_hourly",
    "json_props_stats",
    "conversion_funnel",
    "embedding_norms",
    "text_repetition",
    "text_lang_id",
    "text_fingerprint",
    "multimodal_metadata",
    "multimodal_byte_stats",
    "dedup_exact",
    "multimodal_frame_sample",
    "sample_split",
    "doc_packing",
    "embedding_downproject",
    # r2-green entries deferred to the tail — each has strong independent
    # pytest e2e coverage (S-operator pipelines, salted-join equality,
    # as-of join) or a fresh r3-green family cousin (q1/q3/q5 vs q2-q22)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "salted_join_revenue",
    "replay_scan",
    "subscribe_filter",
    "monotonic_delivery",
    "per_key_ordering",
    "asof_join_purchases",
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
