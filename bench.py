"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced through the noop sink (full materialization, no
driver-side collect cost). First a warmup pass of q1 amortizes JVM/codegen
startup out of the per-query numbers.

PROTOCOL — flag disposition (the mechanical escalation path; every step
is committed machinery, not judgment). The round VMs oscillate 1-2x on
their serial/Python axes at minute scale (r8 post-mortem), so a raw
would-be flag is evidence of SOMETHING, but not yet of an engine
regression. A flag is dispositioned in three steps:

  1. IN-RUN: the sampler itself retests — adaptive_min re-samples with a
     block-store release (clean retest), then apply_second_window
     re-measures every surviving flag minutes later in a second window.
     Burst flags die here; whatever survives is reproducible ON THIS
     host TODAY.
  2. BAND CHECK: a surviving flag on UNTOUCHED code whose value sits
     inside the query's committed cross-round band (_history_band:
     settled-host rows only, self-flagged values excluded, per-query
     reset at the last code change) is the environment revisiting its
     own recorded range — reported as within_band evidence, never
     silently dropped. Code-changed queries skip this step: they always
     hard-flag.
  3. SETTLED A/B: a flag that survives 1-2 is attributed by a worktree
     A/B against the last official commit — mechanized as
     `python tools/probe_queries.py --ab <commit> <queries...>` (the
     executed BENCH_AB_r09.json protocol): the baseline commit is
     checked out into a worktree, the CURRENT probe tool is copied in
     (identical measurement bytes both sides), and alternating
     HEAD/baseline windows run as fresh processes across the same span
     of host weather. Engine regression := the HEAD floor across its
     windows > 1.15x the baseline floor (ab_verdict); if the old code's
     floor is just as slow, it is the host, and the flag is cleared
     with the A/B JSON as committed evidence. A regression verdict the
     tool annotates low_power (<3 windows/side) or drift_suspect
     (adjacent-pair median disagrees with the floor rule) is NOT
     final: run_ab SELF-ESCALATES by extending the alternating run to
     6 windows before printing its verdict (needs_escalation — the r12
     window-4 incident mechanized; a 2+2 verdict was believed over its
     own printed flag until the 3+3 rerun cleared both arms).

tests/test_bench_guard.py pins steps 1-2 (the r8 six-flag shape, band
direction/exclusion rules, the uniform-1.5x adversarial probe) plus
step 3's annotations and self-escalation rule; the r9 A/B artifact
documents step 3's executed form.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jetstream_spark.queries import all_queries
from jetstream_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_running_revenue",
    "rollup_revenue",
    "replay_scan",
    "sessionization",
    "asof_join_purchases",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_brute_force_topk",
    "text_quality_score",
    "text_fingerprint",
    "multimodal_byte_stats",
]

# Timed and REPORTED every run (visible cost), but kept out of the headline
# total so round-over-round totals stay comparable: the heavy exact baselines
# plus queries added after the headline set was frozen.
EXTRAS = [
    "dedup_ngram_jaccard",   # exact quadratic-worst-case baseline (PPJoin-pruned)
    "dedup_embedding_cosine",  # exact blocked all-pairs (low-threshold regime)
    "variant_props_stats",
    "hopping_window_hourly",
    "doc_packing",
    "sample_split",
    "salted_join_revenue",
    "ann_lsh_indexed",       # r3: index build + partition-pruned probe
    "ann_ivf_indexed",       # r3: inverted-file build + nprobe-cell probe
    "vocab_top_terms",       # r3: explode + distributed top-k
    "dedup_components",      # r3: pair graph → connected components (iterative)
    "dedup_incremental",     # r3: batch probe of the materialized band index
    "embedding_quantize_int8",  # r3: map-only int8 rewrite
    "tfidf_top_terms",       # r3: tf-idf + broadcast vocab join + top-k
    "unigram_perplexity",    # r3: broadcast unigram LM + per-doc scoring
    "importance_weights_dsir",  # r3: hashed-ngram log-ratio weights
    "q6_forecast_revenue",   # r3: full-pushdown scan-filter-agg (TPC-H Q6)
    "q9_product_profit",     # r3: 4-way join profit rollup (TPC-H Q9)
    "q21_sole_blame_suppliers",  # r3: EXISTS/NOT-EXISTS self-join on the fact
    "semdedup_pairs",        # r3: within-cluster cosine dedup (SemDeDup)
    "knn_graph",             # r4: exact top-k neighbor graph (blocked cogroup)
    "weighted_sample",       # r4: A-Res weighted sample via TakeOrdered
    "dedup_containment",     # r4: exact directed containment (Σdf² inverted join;
                             # perf-weak-by-design corpus like the jaccard baseline —
                             # DuckDB needs 55 s for the same sf0.1 join, we do it in ~13)
    "dedup_containment_kmv",  # r4: KMV containment sketch tier (K-bounded probe)
    "bm25_topk",             # r4: map-only BM25 scoring + TakeOrdered
    "embedding_covariance",  # r4: one-pass X^T X partial reduction
    "knn_graph_ivf",         # r4: approximate kNN graph within IVF cells
    "kmeans_train",          # r4: 3-round iterative Lloyd trainer
    "rate_anomaly",          # r4: hourly rate z-score monitor
    "pagerank_copurchase",   # r4: 3-round iterative broadcast-rank joins
    "fuzzy_join_names",      # r4: lossless-blocked edit-distance join
    "hll_distinct",          # r4: integer-scaled HLL register build
    "phrase_search",         # r4: positional posting-list intersection
    "scd2_user_tiers",       # r4: changelog -> SCD2 run collapse
    "profile_columns",       # r4: wide multi-distinct profiling scan
    "ann_pq_topk",           # r5: PQ codes + ADC (memory-compressed tier)
    "ann_ivfpq_topk",        # r5: IVF-PQ composition (cell-pruned ADC)
    "multimodal_phash_dedup",  # r5: aHash image dedup over PNG round-trips
    "dedup_substring_spans",  # r5: ExactSubstr char-window spans
    "training_shards",       # r5: seeded global-shuffle manifest
    "ab_bootstrap_ci",       # r5: 200-replica Poisson bootstrap CI
    "bpe_learn_merges",      # r5: 24-round iterative BPE trainer
    "dedup_embedding_lsh",   # r6: random-hyperplane banding + verify (0.9 tier)
    "zipf_alpha",            # r6: vocab rank-frequency OLS fit
    "quality_classifier_lr",  # r6: 3-round GD logistic quality filter
    "sketch_theta_setops",   # r7: KMV/theta sketch set algebra vs exact
    "fingerprint_winnowing",  # r7: MOSS winnowing + df-capped pairing
    "skyline_parts",         # r7: grid-pruned Pareto frontier
    "hybrid_search_rrf",     # r7: BM25 + dense RRF fusion
    "mmr_diverse_topk",      # r7: 5-round MMR greedy re-rank
    "mutual_information",    # r7: MI/NMI dependency audit (3 pairs)
    "adamic_adar_linkpred",  # r7: query-node AA wedge scoring
    "k_anonymity_audit",     # r7: generalization-lattice privacy audit
    "ohlc_bars",             # r7: OHLC downsample (ordered pass + agg)
    "textrank_keywords",     # r7: co-occurrence graph + 3 weighted PR rounds
    "attribution_last_touch",  # r7: one per-user ordered attribution pass
    "kcenter_coreset",       # r7: greedy farthest-point rounds (map-only)
    "naive_bayes_domain",    # r7: NB train + corpus scoring (integer scores)
    "seasonal_anomaly",      # r7: STL-lite decomposition + 3σ flags
    "label_propagation",     # r7: LPA rounds (broadcast-label fix evidence)
    "dp_noisy_counts",       # r7: DP Laplace release (agg + codegen)
    "kcore_decomposition",   # r7: 3-round k-core peel (shrinking edges)
    "cusum_changepoint",     # r7: two-sided CUSUM drift windows
    "sketch_quantile_bottomk",  # r7: bottom-k quantile sketch vs exact
    "markov_transitions",    # r7: per-user lag pass + |types|^2 matrix
    "embedding_drift_mmd",   # r7: linear-time MMD over vector quads
    "ann_hamming_topk",      # r7: XOR+popcount binary-signature ANN
    "hbos_outliers",         # r7: histogram outlier score (2 aggs + map)
    "kneser_ney_perplexity",  # r7: KN bigram scoring (model-table joins)
    "weak_label_analysis",   # r7: LF diagnostics (one wide aggregate)
    "zorder_layout",         # r7: Morton-key layout audit (bit codegen)
    "gini_concentration",    # r7: integer-cent rank-weighted Gini
    "benford_audit",         # r7: first-digit law audit (9-key agg)
    "rfm_segmentation",      # r7: RFM quintile cell table
    "basket_lift_rules",     # r7: pair-rule mining off the basket frame
    "ab_sequential_sprt",    # r7: Wald LLR walk (per-arm ordered window)
    "survival_km_retention",  # r7: KM curve (user-span agg + tiny frame)
    "profile_columns_approx",  # r8: deterministic-HLL column profile (256 regs/col)
    "profile_entropy",       # r8: per-column Shannon entropy (one freq agg)
    "funnel_steps_strict",   # r8: ordered 3-step funnel (single-exchange fold)
    "pmi_collocations",      # r8: adjacent-bigram PMI top-k (one pair exchange)
    "dup_ratio_by_source",   # r8: per-source dup health (one (source,hash) agg)
    "profile_columns_fast",  # r9: xxhash64 twin of profile_columns_approx
]

REGRESSION_FACTOR = 1.15
# Sub-half-second timings swing ±25% run-to-run on this machine (measured:
# doc_packing 0.45-0.55 s across settled runs) — a 1.15× factor below that
# floor would only ever flag noise.
REGRESSION_FLOOR_S = 0.5


def _latest_driver_bench(current_sf, here: str | None = None) -> dict | None:
    """The latest parseable BENCH_r*.json the driver recorded at this SF —
    the round-over-round comparison point. 'Latest' is the highest ROUND
    NUMBER parsed from the filename (lexicographic sort would put BENCH_r10
    before BENCH_r2)."""
    import glob
    import re

    here = here or os.path.dirname(os.path.abspath(__file__))

    def round_no(p):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), key=round_no)
    # newest parseable round wins; a driver capture that failed to parse
    # (parsed: null + raw tail, as in BENCH_r04) falls through to the next
    # older round instead of silently disabling the guard
    for path in reversed(paths):
        try:
            with open(path) as f:
                data = json.load(f)
            data = data.get("parsed") or data
            if not data.get("queries"):
                continue  # unparsed driver wrapper
            if data.get("sf") != current_sf:
                return None
            return data
        except (OSError, ValueError):
            continue
    return None


def _prev_bench_queries(current_sf, here: str | None = None) -> dict:
    """Per-query baselines for the regression guard — headline timings from
    the latest driver BENCH_r*.json, extras from the SAME RUN's full detail.

    The r6 guard miss (VERDICT r6 #2): the compact BENCH_r* line carries
    only headline timings, and extras used to be back-filled from whatever
    BENCH_DETAIL.json sat on disk — which can be a DIFFERENT run on a
    DIFFERENT host (the end-of-round snapshot bench) than the BENCH_r* file
    the host_shift calibration was computed against. pagerank's baseline
    came from a 1.76×-slower host while the shift said 1.146×, so a genuine
    +21%-looking drift never crossed the threshold. Extras now only merge
    from a detail record whose (sf, calibration_s) matches the chosen
    BENCH_r* file — i.e. provably the same run — searched first in the
    append-only BENCH_HISTORY.jsonl (every bench run appends its detail),
    then in BENCH_DETAIL.json. No same-run detail ⇒ extras carry no
    baseline rather than a wrong-host one."""
    here = here or os.path.dirname(os.path.abspath(__file__))
    official = _latest_driver_bench(current_sf, here)
    if official is None:
        return {}
    merged = {**(official.get("queries") or {}), **(official.get("extras") or {})}
    cal = official.get("calibration_s")

    def same_run(det: dict) -> bool:
        return det.get("sf") == current_sf and det.get("calibration_s") == cal

    candidates: list[dict] = []
    try:
        with open(os.path.join(here, "BENCH_HISTORY.jsonl")) as f:
            for line in f:
                try:
                    candidates.append(json.loads(line))
                except ValueError:
                    continue
    except OSError:
        pass
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json")) as f:
            candidates.append(json.load(f))
    except (OSError, ValueError):
        pass
    for det in reversed(candidates):
        if same_run(det):
            for k, v in {**(det.get("queries") or {}), **(det.get("extras") or {})}.items():
                merged.setdefault(k, v)
            break
    return merged


def _prev_calibration(current_sf, here: str | None = None) -> dict:
    """All host-probe baselines the previous official round recorded.
    Rounds before r8 carry only the parallel probe; the serial/python
    probes return None until a baseline exists (their ratios then join
    the shift from the next round on)."""
    official = _latest_driver_bench(current_sf, here)
    if not official:
        return {}
    return {
        "parallel": official.get("calibration_s"),
        "serial": official.get("calibration_serial_s"),
        "python": official.get("calibration_python_s"),
    }


def bench_calibration(spark) -> float:
    """Host-speed probe: a fixed CPU-bound job that depends on NOTHING in
    this repo (range scan + xxhash64 fold under whole-stage codegen), so
    its round-over-round ratio measures the MACHINE, not the engine.
    Rounds run on freshly-provisioned VMs (uptime resets between rounds)
    whose per-core throughput varies by 1.3-1.5x; without this probe a
    uniformly slower host reads as an across-the-board 'regression'.

    min-of-4 (r9, was 2): the probes are ~0.1-1.5 s jobs sampled at the
    END of a ~30-min session — the r9 run read the parallel probe at
    1.89x its baseline while the cross-query median said 0.87x and every
    query ran faster, and a noisy-HIGH probe silently loosens the whole
    guard (shift multiplies every threshold). Same job, more samples:
    the baseline stays comparable, the upward tail shrinks."""
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        # bit_xor fold: overflow-free under ANSI mode, still one codegen pass
        spark.range(150_000_000).selectExpr("xxhash64(id) AS h").groupBy().agg(
            {"h": "bit_xor"}
        ).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def bench_calibration_serial(spark) -> float:
    """SERIAL host probe (r8): this box class can lose 2x on the
    single-thread axis (single-core turbo, JIT compile speed, per-task
    latency) while the parallel probe reads FASTER — measured r8:
    parallel probe 0.182 s vs r7's 0.215 while single-partition window
    shapes (cusum, skyline) ran 2x slower ON IDENTICAL r7 CODE. One
    1-partition sort of 3M hashed rows = one long single-thread task;
    its round-over-round ratio measures the serial axis."""
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        (
            spark.range(3_000_000, numPartitions=1)
            .selectExpr("xxhash64(id) AS h")
            .sortWithinPartitions("h")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.time() - t0)
    return round(best, 3)


def bench_calibration_python(spark) -> float:
    """PYTHON/ARROW host probe (r8): the ingest pipeline and every
    mapInPandas kernel ride the Python-worker + Arrow-transfer axis,
    which degrades independently of JVM throughput (r8: ingest 62k ev/s
    on identical r7 code vs 83k recorded by r7 — host, not engine). One
    pass-through mapInPandas over 2M rows x 32 partitions measures
    worker dispatch + Arrow round-trip."""
    import pandas as _pd  # noqa: F401 (worker-side import sanity)

    def _ident(batches):
        yield from batches

    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        (
            spark.range(2_000_000, numPartitions=32)
            .mapInPandas(_ident, "id long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.time() - t0)
    return round(best, 3)


def host_shift_factor(
    timings: dict,
    prev: dict,
    cal_now: float | None,
    cal_prev,
    serial_now: float | None = None,
    serial_prev: float | None = None,
    python_now: float | None = None,
    python_prev: float | None = None,
    detail: dict | None = None,
) -> float:
    """How much slower this host is than the one that recorded the previous
    round's bench. Preferred signal: the calibration-probe ratio (exact,
    engine-independent). Fallback when the previous round predates the
    probe: the MEDIAN now/prev ratio across all compared queries — a
    single genuine regression cannot move the median of ~50 pairs, while a
    uniform host slowdown moves every pair identically. Shifts under 5%
    are treated as noise (factor 1.0); the factor is reported in the
    output so a reader sees both the raw and normalized picture."""
    signals: dict[str, float] = {}
    if cal_now and cal_prev:
        signals["probe_parallel"] = cal_now / cal_prev
    if serial_now and serial_prev:
        signals["probe_serial"] = serial_now / serial_prev
    if python_now and python_prev:
        signals["probe_python"] = python_now / python_prev
    ratios = []
    for name, now in timings.items():
        p = prev.get(name)
        if p is None or name.endswith("_build_s"):
            continue
        if name.endswith("_per_sec"):
            if now > 0:
                ratios.append(p / now)
        elif p >= REGRESSION_FLOOR_S and p > 0:
            ratios.append(now / p)
    # the capped cross-query median is a FALLBACK signal, not a peer of
    # the probes (ADVICE r8: an unconditional median could normalize away
    # a genuinely uniform engine regression up to the 1.5 cap even when
    # all three probes read 1.0). It joins only when (a) ANY probe axis
    # lacks a baseline — a partial baseline set is treated the same as
    # none (ADVICE r9 #3: with exactly one axis baselined, a host shift
    # on an un-probed axis with flat present probes used to exclude the
    # median entirely, hard-flagging pure host drift with no backstop) —
    # or (b) a probe corroborates that the host really shifted (>5% on
    # some probed axis) — then the median may capture residual drift on
    # an axis the probes undersample. The 1.5 cap and the per-query 1.15
    # factor on top still apply.
    all_axes_baselined = (
        bool(cal_now and cal_prev)
        and bool(serial_now and serial_prev)
        and bool(python_now and python_prev)
    )
    probes_corroborate = signals and max(signals.values()) > 1.05
    if len(ratios) >= 8 and (not all_axes_baselined or probes_corroborate):
        ratios.sort()
        # when the probes are the ADMISSION ticket (every axis has a
        # baseline), the median may only exceed the worst probe by a
        # residual margin — a probe drifting 1.06 must not re-admit a
        # 1.5 median, or a mild real host shift could launder a large
        # uniform engine regression (the ADVICE r8 hole, second order)
        cap = (
            min(1.5, max(signals.values()) * 1.15)
            if all_axes_baselined
            else 1.5
        )
        signals["median_capped"] = min(ratios[len(ratios) // 2], cap)
    if detail is not None:
        detail["signals"] = {k: round(v, 3) for k, v in signals.items()}
        detail["winner"] = max(signals, key=signals.get) if signals else None
    if not signals:
        return 1.0
    shift = max(signals.values())
    return round(shift, 3) if shift > 1.05 else 1.0


def adaptive_min(
    sample,
    prev: float | None,
    release,
    factor: float = REGRESSION_FACTOR,
    floor: float = REGRESSION_FLOOR_S,
    max_extra: int = 4,
) -> tuple[float, int]:
    """The bench's per-query sampling policy, extracted so the guard's
    behavior is unit-testable (tests/test_bench_guard.py): min-of-2, plus
    up to ``max_extra`` adaptive re-samples while the result would flag a
    regression vs ``prev`` AND samples are still converging (>3%
    improvement). The FIRST re-sample is preceded by ``release()`` — the
    clean-retest (r7 kmeans_train post-mortem): a query measured late in
    the extras loop runs against ~30 queries of accumulated
    block-store/GC pressure that an idle rerun of the same code doesn't
    show, so a would-be flag gets one measurement from a released
    session before it can stick. Steady-state queries never pay either
    the release or the extras. Returns (best_seconds, extras_used)."""
    best = min(sample(), sample())
    extra, strikes = 0, 0
    while (
        prev is not None
        and prev >= floor
        and best > prev * factor
        and strikes < 2
        and extra < max_extra
    ):
        if extra == 0:
            release()
        s = sample()
        # two-strike exit (r8): a single non-improving sample is not
        # proof of steady state — two CONSECUTIVE cold samples can agree
        # (measured: dedup_ngram_jaccard 13.4 s, 13.4 s, then 4.8 s once
        # codegen warmed on a slow-JIT host), and the old single-strike
        # exit recorded the cold plateau as a regression
        strikes = 0 if s < best * 0.97 else strikes + 1
        best = min(best, s)
        extra += 1
    return best, extra


def apply_second_window(timings: dict, extras: dict, flagged, remeasure) -> list:
    """Second-window confirmation (r8): this VM class oscillates on its
    serial/Python axis at MINUTE scale — two back-to-back full bench runs
    on an idle host flagged DISJOINT query sets (run 1: jaccard/minhash/
    theta/ingest; run 2: winnowing/MMR/MI/kcenter — none shared), which is
    the signature of environment bursts, not engine regressions (a real
    regression reproduces). So a would-be flag must survive a SECOND
    measurement window, minutes after the first: each flagged metric is
    re-measured once (wall-time queries keep the min across windows;
    throughput metrics keep the max), and only flags that persist reach
    the report. ``remeasure(name)`` returns the second-window value or
    None when the metric cannot be re-run; returns the names actually
    re-measured (for the detail record)."""
    redone = []
    for name in sorted(flagged):
        val = remeasure(name)
        if val is None:
            continue
        redone.append(name)
        tgt = timings if name in timings else extras
        if name.endswith("_per_sec"):
            tgt[name] = max(tgt[name], val)
        else:
            tgt[name] = min(tgt[name], val)
    return redone


# Queries whose most recent engine-code change predates history rows
# recording their run's code-changed set (the "code_changed" key exists
# from r10 on). A band row that cannot be classified as pre- or
# post-change for these queries is NOT band evidence: pre-change rows
# measured OLD code, so a regression that reverts the optimization
# would sit inside the stale band and be demoted to oscillation
# (ADVICE r9 #2). The set is additive-only and shrinks in effect as
# legacy rows age out of the 6-row band window.
_BAND_PRE_LOG_CHANGED = frozenset({
    "dedup_embedding_lsh",  # r7: N-adaptive band width
    "label_propagation",  # r7: broadcast label join
    "fingerprint_winnowing",  # r8: tokenize-once
    "hbos_outliers",  # r8: tokenize-once feature frame
    "kmeans_train",  # r8: persisted frame + two-tier round reduce
    "kneser_ney_perplexity",  # r8: tokenize-once
    "naive_bayes_domain",  # r8: tokenize-once checkpoint
    "profile_columns_approx",  # r9: shared estimator expressions
})


def _history_band(current_sf, here: str | None = None, last_n: int = 6, min_samples: int = 3) -> dict:
    """{query: (lo, hi, n)} over the last ``last_n`` committed bench runs
    at this SF (BENCH_HISTORY.jsonl, which the current run has not yet
    appended to). This is the query's settled cross-round oscillation
    band: the r8 post-mortem showed every 'regression' the driver flagged
    sat INSIDE the value range this host had already recorded for the
    same code across r6-r8 (e.g. weak_label_analysis 0.83-1.17 s,
    textrank 1.55-2.72 s), while the single-previous-run baseline
    happened to be the band's minimum — the r7 official run caught all
    six serial-axis queries at their historical minima SIMULTANEOUSLY.
    Bands with fewer than ``min_samples`` committed values carry no
    evidence and are omitted.

    Two staleness guards (ADVICE r9):
      1. rows benched on a recognized-slow host (their recorded
         host_shift > 1.05) contribute NO band evidence — their raw
         values are inflated by a shift that was computed as a global
         max-of-axes, so they were unflagged only because of shift
         normalization, and as band_hi they would hide a later genuine
         regression of up to that ratio from a settled host. (Excluded
         rather than divided back: the global shift is not a per-query
         factor — queries off the shifted axis would be over-corrected,
         e.g. dividing the r9 1.894x-host row would put skyline_parts'
         band floor at 0.34 s against a real settled ~0.6 s.)
      2. values older than a query's most recent CODE change are not
         evidence for it: rows record their run's code-changed set (the
         "code_changed" key), a row declaring the query changed resets
         its accumulation (that row measured the new code), and for
         queries in _BAND_PRE_LOG_CHANGED legacy rows without the key
         are skipped outright."""
    here = here or os.path.dirname(os.path.abspath(__file__))
    rows: list[dict] = []
    try:
        with open(os.path.join(here, "BENCH_HISTORY.jsonl")) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except ValueError:
                    continue
    except OSError:
        return {}
    rows = [r for r in rows if r.get("sf") == current_sf][-last_n:]
    vals: dict[str, list] = {}
    for r in rows:
        # a value the run ITSELF flagged as a regression is not band
        # evidence — without this exclusion the band self-poisons: a
        # genuine regression's first flagged run would write its slow
        # value into history, and the next run would find it inside the
        # band and demote the same real regression to "oscillation"
        flagged = set(r.get("regressions") or ())
        if (r.get("host_shift") or 1.0) > 1.05:
            continue  # slow-host row: raw values inflated, not band evidence
        changed = r.get("code_changed")
        legacy_row = changed is None  # predates code-change recording
        for k, v in {**(r.get("queries") or {}), **(r.get("extras") or {})}.items():
            if not isinstance(v, (int, float)) or k in flagged:
                continue
            if legacy_row and k in _BAND_PRE_LOG_CHANGED:
                continue  # unclassifiable: may have measured pre-change code
            if not legacy_row and k in changed:
                vals[k] = []  # this row measured NEW code; older values did not
            vals.setdefault(k, []).append(float(v))
    return {
        k: (min(vs), max(vs), len(vs))
        for k, vs in vals.items()
        if len(vs) >= min_samples
    }


# Bench metrics (non-registry names) whose ENGINE path changed this
# round — same semantics as the registry's _CODE_CHANGED (no band
# suppression this round; history rows record the change so older band
# values reset), kept separate because the rotation test requires
# _CODE_CHANGED names to sit inside the driver window and these are not
# registry entries. Reset each round.
# r13: the r12 maintenance-lease declaration is retired (band re-formed
# from three settled r12 rows, 28.1-31.9k ev/s; lease A/B neutral at
# 1.034, BENCH_AB_r12_maint.json) — but the r13 takeover-flock work
# (ADVICE r12 #1) ALSO made the per-tick ownership re-assert atomic
# (touch_owner_if_held: one flock open/lock/close per tick and per
# heartbeat, maintenance.py), which runs inside the ticks the
# maintenance-tax measurement samples. Same declaration discipline as
# r12: a regression there must hard-flag, not band-absorb; the A/B
# against the pre-round commit is the attribution evidence
# (BENCH_AB_r13_maint.json). Plain ingest and fan-out are untouched.
_BENCH_CODE_CHANGED = ("ingest_under_maintenance_events_per_sec",)


def _code_changed_queries() -> frozenset:
    """Queries whose engine/oracle code changed this round (declared in
    the registry for the driver-window rotation) — band suppression must
    never apply to them: cross-round band values measured OLD code, so a
    change that restores an old-slow behavior has to hard-flag."""
    try:
        from jetstream_spark.queries import _CODE_CHANGED

        return frozenset(_CODE_CHANGED) | frozenset(_BENCH_CODE_CHANGED)
    except Exception:
        return frozenset(_BENCH_CODE_CHANGED)


def find_regressions(
    timings: dict,
    current_sf,
    shift: float = 1.0,
    resamples: dict | None = None,
    here: str | None = None,
    band_out: dict | None = None,
) -> dict:
    """Queries >1.15× slower than the previous round at the same SF after
    host-speed normalization (throughput metrics: >1.15× lower). Returns
    {name: {"prev", "now", "extra_samples", "host_shift"}} with prev
    reported raw (un-normalized): every flagged entry carries its own
    evidence — how many adaptive re-samples confirmed the number and what
    host normalization was applied — so a reader can tell a confirmed
    engine regression from a burst the sampler couldn't shake.

    Band rule (r9, from the r8 six-flag post-mortem): a would-be flag on
    UNTOUCHED code whose value sits inside the query's committed
    cross-round band (_history_band) is environment oscillation by
    definition — a real regression produces a value the host has never
    recorded for this code — so it is reported in ``band_out`` as
    evidence (never silently dropped) instead of hard-flagging. Queries
    declared code-changed this round are exempt: they always hard-flag."""
    prev = _prev_bench_queries(current_sf, here)
    band = _history_band(current_sf, here)
    changed = _code_changed_queries()
    resamples = resamples or {}
    regressions = {}

    def entry(name, p, now):
        return {
            "prev": p,
            "now": now,
            "extra_samples": resamples.get(name, 0),
            "host_shift": shift,
        }

    def within_band(name, now) -> bool:
        if name in changed or name not in band:
            return False
        lo, hi, n = band[name]
        # band values are settled-host normalized (_history_band), so the
        # current raw reading is normalized by THIS run's shift before the
        # comparison (rates deflate on a slow host, seconds inflate)
        adj = now * shift if name.endswith("_per_sec") else now / shift
        inside = adj >= lo if name.endswith("_per_sec") else adj <= hi
        if inside and band_out is not None:
            band_out[name] = {
                "now": now,
                "band_lo": lo,
                "band_hi": hi,
                "band_n": n,
            }
        return inside

    for name, now in timings.items():
        p = prev.get(name)
        if p is None:
            continue
        if name.endswith("_build_s"):
            continue  # rebuild-vs-fresh varies with testdata regen; not a probe cost
        if name.endswith("_per_sec"):
            if now < p / (shift * REGRESSION_FACTOR) and not within_band(name, now):
                regressions[name] = entry(name, p, now)
        elif (
            p >= REGRESSION_FLOOR_S
            and now > p * shift * REGRESSION_FACTOR
            and not within_band(name, now)
        ):
            regressions[name] = entry(name, p, now)
    return regressions


def _events_as_frames(spark, sf_dir: str, limit: int | None = None):
    """events rows recast as commit frames — shared by the ingest and
    delivery benches."""
    from pyspark.sql import functions as F

    from jetstream_spark.tables import table

    ev = table(spark, sf_dir, "events")
    if limit is not None:
        ev = ev.orderBy("event_id").limit(limit)
    return ev.select(
        F.lit("commit").alias("kind"),
        F.concat(F.lit("did:plc:user"), F.col("user_id")).alias("did"),
        F.col("event_id").alias("seq"),
        F.concat(F.lit("rev"), F.col("event_id")).alias("rev"),
        F.lit(False).alias("too_big"),
        F.array(
            F.struct(
                F.lit("create").alias("action"),
                F.concat(F.lit("app.bsky.feed.post/rkey"), F.col("event_id")).alias("path"),
                F.concat(F.lit("bafy"), F.col("event_id")).alias("cid"),
                F.col("props").alias("record_json"),
                F.concat(F.lit("bafy"), F.col("event_id")).alias("record_cid"),
            )
        ).alias("ops"),
        F.lit(None).cast("struct<active:boolean,did:string,seq:bigint,time:string,status:string>").alias("account"),
        F.lit(None).cast("struct<did:string,handle:string,seq:bigint,time:string>").alias("identity"),
    )


def bench_ingest_pipeline(spark, sf_dir: str) -> tuple[float, int, dict]:
    """The jetstream standing pipeline at bench scale: events rows recast
    as commit frames → normalize → distributed sequencer → wire frames →
    noop sink. Returns (seconds, events, conservation). The events/s figure
    is the comparable number to the reference's capacity limits
    (BASELINE.md: 5k/s live delivery, 50k/s replay per subscriber).

    Conservation under load (VERDICT r6 #7, the reference's observability-
    as-testing posture): the same ConsumerMetrics instance the serving
    scrape exposes observes every timed pass, and its processed/sequenced/
    persisted counters are asserted against the INDEPENDENT input count
    (3 passes × n frames) plus the wire-stage output count — a dropped or
    duplicated event anywhere in normalize → sequence → wire fails the
    bench, not just a unit test. One CommitBatch-shaped span per pass is
    captured so the bench artifact also records the tracing surface."""
    from jetstream_spark.atproto.normalize import normalize_frames
    from jetstream_spark.atproto.sequencer import sequence_events
    from jetstream_spark.atproto.wire import to_wire
    from jetstream_spark.operators.observability import ConsumerMetrics
    from jetstream_spark.operators.tracing import StageTracer

    frames = _events_as_frames(spark, sf_dir)
    n = frames.count()
    metrics = ConsumerMetrics(socket_url="bench-ingest")
    tracer = StageTracer(service="bench-ingest")
    # min-of-3: the first pass pays Python-worker spawn for the CBOR decode
    # kernel (session warmup, not per-batch cost in a standing pipeline),
    # and the r4→r5 −11% swing on identical sequencer code showed two
    # samples still let one bursty pass set the floor on this host
    best = float("inf")
    passes = 3
    wire_n = 0
    pass_secs: list[float] = []
    for i in range(passes):
        t0 = time.time()
        normalized = normalize_frames(frames)
        sequenced, last, cached = sequence_events(normalized, last_time_us=0, wall_clock_us=1_000_000)
        to_wire(sequenced).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        pass_secs.append(round(dt, 3))
        best = min(best, dt)
        # accounting OUTSIDE the timed window: the standing pipeline pays
        # one tiny label-agg per microbatch, but the bench floor should
        # measure the data path the reference's ceilings describe
        with tracer.span("CommitBatch", pass_no=i, events=n):
            metrics.observe_batch(sequenced, dt, last)
            if i == passes - 1:
                wire_n = to_wire(sequenced).count()
        cached.unpersist()
    processed = sum(metrics.events_processed.values())
    conservation = {
        "events_in": passes * n,
        "processed": processed,
        "sequenced": metrics.events_sequenced_total,
        "persisted": metrics.events_persisted_total,
        "wire_frames_per_pass": wire_n,
        "spans": len(tracer.recent(limit=10)),
        # measurement protocol alongside the number (the fan-out treatment,
        # VERDICT r10 #2): the committed record shows which pass set the
        # floor, so a history row's provenance is auditable
        "pass_secs": pass_secs,
        "runs": passes,
        "agg": "min",
    }
    if not (
        processed
        == metrics.events_sequenced_total
        == metrics.events_persisted_total
        == passes * n
        and wire_n == n
    ):
        raise AssertionError(f"ingest conservation violated: {conservation}")
    return best, n, conservation


def pick_burst(bursts: list[dict]) -> dict:
    """Headline burst selection for the fan-out bench: the best COMPLETE
    measured burst by per-sub rate, falling back to the best measured
    partial rate (never a fabricated 0.0) when no burst delivered
    everything. The warmup burst is never eligible — it exists to absorb
    streaming-query start + first-tick listing + Python-worker spawn, the
    same costs the query protocol amortizes with its warmup pass."""
    measured = [b for b in bursts if not b.get("warmup")]
    rated = [b for b in measured if b["complete"]] or measured
    return max(rated, key=lambda b: b["events_per_sec_per_sub"])


def bench_delivery_fanout(
    spark, sf_dir: str, n_subs: int = 10, cap: int = 20000, n_bursts: int = 3
) -> dict:
    """Sustained fan-out through the SHARED live tail (serving/hub.py): ten
    concurrent subscribers attached to one LiveTailHub, one ingested burst,
    one streaming tick fanning the shared ordered slice to every
    subscriber. Returns delivered counts + events/s, the number comparable
    to the reference's 5k events/s per-subscriber live-delivery ceiling
    (BASELINE.md). Measures delivery only — ingest is timed separately by
    bench_ingest_pipeline.

    Measurement protocol (VERDICT r9 #2 — the one bench metric still
    oscillating 11.6k-28.4k/sub within a round now gets the query
    treatment): one WARMUP burst absorbs first-tick costs and is reported
    but never rated; then ``n_bursts`` measured bursts, each preceded by
    the block-store release the query sampler uses, with the headline
    rate = the best complete measured burst (max across windows, the
    throughput analogue of min-of-N). The result carries runs/agg so the
    committed history records the protocol alongside the number, and the
    per-sub floor accumulating in BENCH_HISTORY.jsonl feeds the
    rate-direction band (a dip above the committed floor is oscillation
    evidence; below it hard-flags — tests/test_bench_guard.py)."""
    import shutil
    import tempfile

    from jetstream_spark.atproto import log as eventlog
    from jetstream_spark.atproto.normalize import normalize_frames
    from jetstream_spark.atproto.subscribe import Subscription
    from jetstream_spark.serving.hub import LiveTailHub

    work = tempfile.mkdtemp(prefix="jetstream_fanout_")
    log_dir = os.path.join(work, "log")
    os.makedirs(log_dir, exist_ok=True)
    hub = LiveTailHub(spark, log_dir, os.path.join(work, "ckpt"))
    counts = [0] * n_subs
    orderly = [True] * n_subs
    last_seen = [0] * n_subs

    def make_emit(i: int):
        def emit(rows: list) -> None:
            for r in rows:
                if r["time_us"] <= last_seen[i]:
                    orderly[i] = False
                last_seen[i] = r["time_us"]
            counts[i] += len(rows)

        return emit

    try:
        # subscribers attach BEFORE any data exists: registration catch-up
        # is a no-op and delivery happens on the shared tick path
        for i in range(n_subs):
            hub.register(Subscription(cursor=0), make_emit(i))
        q = hub.start()
        normalized = normalize_frames(_events_as_frames(spark, sf_dir, limit=cap)).cache()
        n = normalized.count()
        # warmup burst + max-of-n_bursts (see the protocol note in the
        # docstring): delivery is one streaming tick, so a single GC pause
        # or host-contention spike would otherwise masquerade as a
        # throughput regression. Each burst is recorded as its own
        # (elapsed, delivered) pair; burst 0 is the warmup.
        bursts: list[dict] = []
        for burst in range(n_bursts + 1):
            if burst > 0:
                # the query sampler's clean-retest release: measured
                # bursts run against a drained block store, not against
                # the previous burst's GC debt. The release also drops
                # normalized's cache — its recompute lands in the UNTIMED
                # ingest below, never inside the timed tick.
                _release_memory(spark)
            before = sum(counts)
            eventlog.ingest_batch(
                normalized,
                log_dir,
                wall_clock_us=(burst + 1) * 1_000_000,
                batch_id=burst,
            )
            t0 = time.time()
            q.processAllAvailable()
            elapsed = time.time() - t0
            got = sum(counts) - before
            bursts.append(
                {
                    "warmup": burst == 0,
                    "sec": round(elapsed, 3),
                    "delivered": got,
                    "complete": got == n * n_subs,
                    "events_per_sec_per_sub": round(got / n_subs / elapsed, 1)
                    if elapsed > 0
                    else 0.0,
                }
            )
        normalized.unpersist()
        delivered = sum(counts)
        best_burst = pick_burst(bursts)
        best = best_burst["events_per_sec_per_sub"]
        return {
            "n_events": n,
            "n_subs": n_subs,
            "delivered": delivered,
            "complete": delivered == (n_bursts + 1) * n * n_subs,
            "ordered": all(orderly),
            "sec": best_burst["sec"],
            "bursts": bursts,
            "events_per_sec_total": round(best * n_subs, 1),
            "events_per_sec_per_sub": best,
            "runs": n_bursts,  # measured bursts (one warmup burst excluded)
            "agg": "max",
        }
    finally:
        hub.stop()
        shutil.rmtree(work, ignore_errors=True)


def bench_ingest_under_maintenance(spark, sf_dir: str, cap: int = 20000, n_batches: int = 8) -> dict:
    """VERDICT r10 #6: the maintenance TAX as a committed number — the
    ingest write path measured WITH the standing retention ticker active
    over the same log, instead of a rehearsal note. Eight batches land in
    four hour buckets (two files per bucket, so every sealed bucket is a
    compaction target) while a MaintenanceLoop on a short interval trims
    expired buckets (ttl = 2 h on the injected clock) and compacts sealed
    ones CONCURRENTLY with the timed writes. The rate divides ingested
    events by the summed ingest_batch wall time only — the ticker's cost
    shows up exactly as it would in production: as contention on the
    shared session. Conservation is asserted after a deterministic final
    trim: surviving buckets hold exactly their ingested rows, strictly
    monotonic time_us (the ticker dropped nothing unexpired, duplicated
    nothing). The per-sub rate accumulates its own committed floor band
    in BENCH_HISTORY.jsonl like every extras metric."""
    import shutil
    import tempfile

    from jetstream_spark.atproto import log as eventlog
    from jetstream_spark.atproto.log import US_PER_HOUR
    from jetstream_spark.atproto.maintenance import MaintenanceLoop
    from jetstream_spark.atproto.normalize import normalize_frames

    work = tempfile.mkdtemp(prefix="jetstream_ingmaint_")
    log_dir = os.path.join(work, "log")
    normalized = normalize_frames(_events_as_frames(spark, sf_dir, limit=cap)).cache()
    n = normalized.count()
    ttl_hours = 2
    clock = {"now": US_PER_HOUR}  # the loop sees the ingest clock, not wall time
    loop = MaintenanceLoop(
        spark,
        log_dir,
        ttl_us=ttl_hours * US_PER_HOUR,
        interval_s=0.25,
        now_fn=lambda: clock["now"],
    )
    batch_secs: list[float] = []
    try:
        loop.start()
        for b in range(n_batches):
            hour = 1 + b // 2  # two batches per bucket -> sealed buckets fragment
            wall = hour * US_PER_HOUR + (b % 2) * 1_000_000
            t0 = time.time()
            eventlog.ingest_batch(normalized, log_dir, wall_clock_us=wall, batch_id=b)
            eventlog.mark_batch_done(log_dir, b)  # the pipeline's exactly-once marker
            batch_secs.append(time.time() - t0)
            clock["now"] = wall  # seals hour-1..hour buckets behind the writer
    finally:
        stopped = loop.stop()
        normalized.unpersist()
    # deterministic close: whatever the ticker got to, one explicit final
    # trim fixes the surviving set for the conservation check
    final_now = clock["now"]
    eventlog.trim_events(spark, log_dir, now_us=final_now, ttl_us=ttl_hours * US_PER_HOUR)
    cutoff_bucket = (final_now - ttl_hours * US_PER_HOUR) // US_PER_HOUR
    surviving_batches = sum(
        1 for b in range(n_batches) if (1 + b // 2) >= cutoff_bucket
    )
    rows = eventlog.read_log(spark, log_dir)
    got = rows.count()
    distinct = rows.select("time_us").distinct().count()
    conserved = got == distinct == surviving_batches * n
    if not conserved or stopped != "stopped":
        raise AssertionError(
            f"ingest-under-maintenance conservation violated: rows={got} "
            f"distinct={distinct} expected={surviving_batches * n} loop={stopped}"
        )
    # batch 0 absorbs first-write costs (Python-worker spawn, codegen) the
    # standing pipeline pays once per process, not per batch — excluded
    # from the rate like the fan-out warmup burst, recorded alongside
    ingest_sec = sum(batch_secs[1:])
    shutil.rmtree(work, ignore_errors=True)
    return {
        "n_events": (n_batches - 1) * n,
        "sec": round(ingest_sec, 3),
        "warmup_sec": round(batch_secs[0], 3),
        "batch_secs": [round(s, 3) for s in batch_secs],
        "events_per_sec": round((n_batches - 1) * n / ingest_sec, 1) if ingest_sec > 0 else 0.0,
        "ticks": loop.counters["ticks"],
        "partitions_trimmed": loop.counters["partitions_trimmed"],
        "buckets_compacted": loop.counters["buckets_compacted"],
        "tick_errors": loop.counters["errors"],
        "runs": n_batches - 1,  # measured batches (warmup batch excluded)
        "agg": "sum",  # sustained multi-batch wall, not min-of-N
    }


# --- one-sample sf1 scale check ------------------------------------------------
SF1_REPLICAS = 10
SF1_QUERIES = [
    # the join-strategy-sensitive shapes: verify threshold-chosen joins and
    # AQE behavior hold when orders/customer stop being broadcast-sized
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "window_running_revenue",
    "dedup_exact",
    # dedup_minhash_lsh measured here and EXCLUDED deliberately: replica
    # scaling turns every doc into a 10-copy exact-dup group (45 within-
    # group pairs each -> 250k output pairs vs ~500 at sf0.1, 98.6 s), so
    # pair-output operators scale quadratically in replicas BY DATA
    # CONSTRUCTION, not by plan regression -- the anomaly detector would
    # flag corpus semantics, not the engine. dedup_exact keeps the dedup
    # family's scan/shuffle cost in the sample without the pair blow-up,
    # and dedup_two_tier IS the operator built for this corpus shape:
    # it labels all 10x docs in ~4 s warm (vs one-tier's 98.6 s) because
    # the near-dup pass runs over distinct-content representatives only.
    "dedup_two_tier",
    # r4: windowed/iterative additions whose cost must scale linearly in
    # events (user count grows with replicas, per-user work constant)
    "scd2_user_tiers",
    "hll_distinct",
    # r5: the heavy new operator families get a scaling datapoint too —
    # iterative graph (per-round broadcast + one keyed shuffle), lexical
    # scoring (map-only HOF + TakeOrdered), and the wide multi-distinct
    # profile. dedup_containment_kmv was measured here once and EXCLUDED
    # for the same reason as dedup_minhash_lsh above: the probe is
    # K-bounded PER DOC, but candidate volume is Σ df_kmv·df over shared
    # sketch values, and replica scaling multiplies every df by the
    # replica count — candidate pairs grow ~quadratically in replicas BY
    # DATA CONSTRUCTION (measured minutes at sf1 vs 2 s at sf0.1), which
    # benchmarks corpus semantics, not the engine. A real 10x corpus
    # grows df sub-linearly; an exact-duplicate-replicated one maximizes
    # it. dedup_two_tier above carries the dedup family's scaling story
    # on exactly this corpus shape.
    "pagerank_copurchase",
    "bm25_topk",
    "profile_columns",
    # r6: the iterative BPE trainer — corpus-linear initial word count, then
    # 24 driver-coordinated rounds over the vocab-sized frame whose cost is
    # set by Heaps-law DISTINCT words (replicas add none), so expect
    # sub-linear growth. dedup_substring_spans was considered and EXCLUDED
    # for the dedup_minhash_lsh reason above: replica scaling makes EVERY
    # window a cross-doc duplicate, so the hits frame inflates from
    # "repeated windows only" (sparse at sf0.1) to "all windows" — interval
    # merge over 100% of corpus positions benchmarks the replica
    # construction, not the engine; its sample_mod knob is the at-scale
    # lever and is covered by tests/test_dedup_knobs.py.
    "bpe_learn_merges",
    # r7 (VERDICT r6 #4): the r6 iterative additions. LR is per-round ONE
    # fused avg-aggregate over the (replica-linear) documents feature frame
    # — expect linear; LPA is 3 rounds of label join + two keyed exchanges
    # over the copurchase graph (nodes/edges replica-linear, per-node
    # degree constant) — expect near-linear like pagerank.
    "quality_classifier_lr",
    "label_propagation",
    # dedup_embedding_lsh gets a REAL scaling point because the replica
    # corpus rotates+sign-flips each replica's vectors (orthogonal
    # transform, see scale_embeddings): pair outputs stay linear instead
    # of the 45-pairs-per-vector exact-copy blow-up, and the N-adaptive
    # band width (r: 14 → 18 at 10×N) is exercised at two scales.
    "dedup_embedding_lsh",
    # r7: the replica-safe new operators — user/event/part key domains
    # offset per replica, so these are genuine 10×-row linear probes:
    # theta sketches over 10× the user-days, OHLC over 10× events (same
    # bars), skyline over 10× parts (frontier work ∝ survivors), hybrid
    # retrieval over 10× docs+vectors (both legs map-only/linear), MI
    # over 10× rows into the same category key space.
    # fingerprint_winnowing EXCLUDED for the dedup_minhash_lsh reason:
    # replicas make every fingerprint a 10-doc cross-replica duplicate,
    # so pair output inflates by construction (and the df≤10 ceiling sits
    # exactly at the replica count — the measurement would benchmark the
    # cap boundary, not the engine). adamic_adar_linkpred EXCLUDED: key
    # offsetting makes the sf1 graph 10 DISJOINT copies and the fixed
    # query nodes live only in replica 0, so its work is flat by
    # construction, not a scaling signal.
    "sketch_theta_setops",
    "ohlc_bars",
    "skyline_parts",
    "hybrid_search_rrf",
    "mutual_information",
    # textrank: replica docs repeat the same text, so the co-occurrence
    # VOCABULARY and edge set are replica-invariant (Heaps-law like BPE) —
    # expect sub-linear (pair counts scale, the graph/rounds do not).
    # attribution: per-user ordered pass, users replica-linear — expect
    # linear like scd2.
    "textrank_keywords",
    "attribution_last_touch",
    # r7 fourth batch: all three are replica-safe — kcenter scans 10× the
    # (orthogonally-transformed) vectors with the same K map-only rounds
    # (expect linear); NB's model size is vocab-bound (replica-invariant,
    # Heaps-law like BPE) while token counts scale 10× (expect linear in
    # the scoring join); seasonal_anomaly keeps the same (type, hour)
    # bucket grid with 10× the counts per bucket (expect flat-to-linear,
    # dominated by the events scan).
    "kcenter_coreset",
    "naive_bayes_domain",
    "seasonal_anomaly",
    # kcore: replica key-offsetting makes 10 disjoint graph copies with the
    # SAME degree profile, so K is unchanged and the peel runs identically
    # per copy — a clean linear probe of the per-round degree exchange +
    # broadcast semijoins. cusum: same (type, day) grid, 10× counts —
    # flat-to-linear like seasonal_anomaly.
    "kcore_decomposition",
    "cusum_changepoint",
    # markov: pair volume is events-linear, matrix fixed — expect linear.
    # mmd: quad volume is vectors-linear, kernel per quad constant —
    # expect linear (the orthogonal replica transform changes the
    # cross-replica geometry but X/Y stay same-distributed within quads).
    "markov_transitions",
    "embedding_drift_mmd",
    # hamming ANN: signature build + scoring are vectors-linear with 10
    # broadcast queries — expect linear. KN: model tables are
    # bigram-type-bound (Heaps-law, replica-invariant like BPE) while the
    # eval stream scales 10× — expect linear in the scoring join.
    "ann_hamming_topk",
    "kneser_ney_perplexity",
    # weak-label: one map pass + one wide agg over 10x docs — linear.
    # zorder: map-only key arithmetic + a 32-key agg over 10x orders —
    # linear, and the scan-fraction table itself must stay IDENTICAL
    # (replica values repeat, so min/max zone maps per bucket are fixed).
    "weak_label_analysis",
    "zorder_layout",
    # benford: map-only digit extraction + a fixed 9-key agg over 10x
    # orders — linear scan-bound. rfm: one orders agg + three ntiles over
    # the (replica-linear) customer frame — the single-partition ntile is
    # the documented oracle-parity form, so this row also watches its
    # cost stay sane as n grows. gini EXCLUDED: same single-partition
    # rank form but over customer×replicas with an exact integer
    # rank-weighted sum — the rfm row already carries that shape.
    "benford_audit",
    "rfm_segmentation",
    # basket: pair volume is order-linear (per-order quadratic bounded by
    # basket size, the copurchase argument) — expect linear. sprt: one
    # user-scale window over 10x users — linear.
    "basket_lift_rules",
    "ab_sequential_sprt",
    # r8 (VERDICT r7 #7): the remaining batch-F/G operators get scaling
    # rows so every registry family has an sf1 datapoint. All are
    # bounded-aggregate shapes: KM is a user-span agg into a
    # |distinct lifetimes|-row curve (events-scan-bound — previously
    # excluded as redundant with seasonal, but a committed datapoint
    # beats an argument); dp_noisy_counts is one grouped agg + map-only
    # noise; hbos is two stats aggs + map-only scoring + TakeOrdered.
    "survival_km_retention",
    "dp_noisy_counts",
    "hbos_outliers",
    # r8 debuts with a genuine scaling story: the HLL profile's register
    # build is scan-linear into a fixed |cols|x256 state (expect linear,
    # scan-bound); the strict funnel is one user-keyed exchange + a
    # per-user fold over replica-linear users (expect linear, the
    # sessionization bound).
    "profile_columns_approx",
    "funnel_steps_strict",
    # r14 (VERDICT r13 #9): sessionization's 8↔32-core ratio reads ~1.0 at
    # sf0.1 (0.4 s — per-job scheduling overhead is the floor there), so the
    # driver's scaling block cannot discriminate parallelism from overhead
    # for it; at 10× the events the user-keyed exchange + per-user ordered
    # fold has real work and the ratio becomes meaningful. q1 and
    # window_running_revenue (the other two flat-ratio sub-second rows)
    # already have sf1 datapoints above. users are replica-linear — expect
    # linear like funnel_steps_strict, the same shape.
    "sessionization",
    # r9 (VERDICT r8 #4): the remaining r8 debuts. PMI is one map-side
    # zip_with bigram exchange into a bigram-type-bound (Heaps-law,
    # replica-invariant) pair table — expect sub-linear like textrank;
    # entropy is a (column, value) count agg into a value-domain-bound
    # frame (replica values repeat) — expect linear, scan-bound; dup
    # ratio is one hash agg + one 20-key source rollup — linear.
    "pmi_collocations",
    "profile_entropy",
    "dup_ratio_by_source",
    # r9 debut: the xxhash64 production twin — same register topology as
    # profile_columns_approx minus the 11-per-row md5 string pipeline;
    # the VERDICT r8 #3 gate is sf1 time <= the exact profile_columns row
    "profile_columns_fast",
]


def ensure_scaled_sf1(spark, base_dir: str) -> str:
    """A 10× replica-scaled copy of the base SF built once under /tmp:
    every replica offsets each key domain by (max key + 1), preserving
    referential integrity (lineitem→orders→customer, part, supplier,
    events), so join selectivities scale linearly. Cached behind the same
    source-fingerprint freshness contract as the materialized indexes."""
    import tempfile

    from pyspark.sql import functions as F

    from jetstream_spark.operators import freshness
    from jetstream_spark.tables import table

    out = os.path.join(tempfile.gettempdir(), "jetstream_sf1_scaled")
    src = os.path.join(base_dir, "lineitem.parquet")
    if freshness.index_is_fresh(out, src):
        return out
    os.makedirs(out, exist_ok=True)

    def key_step(tbl: str, col: str) -> int:
        return table(spark, base_dir, tbl).agg(F.max(col)).collect()[0][0] + 1

    steps = {
        "orderkey": key_step("orders", "o_orderkey"),
        "custkey": key_step("customer", "c_custkey"),
        "partkey": key_step("part", "p_partkey"),
        "suppkey": key_step("supplier", "s_suppkey"),
        "event_id": key_step("events", "event_id"),
        "user_id": key_step("events", "user_id"),
        "doc_id": key_step("documents", "doc_id"),
        "vec_id": key_step("embeddings", "vec_id"),
    }
    reps = spark.range(SF1_REPLICAS).withColumnRenamed("id", "rep")

    def scale(tbl: str, offsets: dict[str, str]) -> None:
        df = table(spark, base_dir, tbl).crossJoin(F.broadcast(reps))
        for col, domain in offsets.items():
            df = df.withColumn(col, F.col(col) + F.col("rep") * F.lit(steps[domain]))
        df.drop("rep").write.mode("overwrite").parquet(
            os.path.join(out, f"{tbl}.parquet")
        )

    def copy(tbl: str) -> None:
        table(spark, base_dir, tbl).write.mode("overwrite").parquet(
            os.path.join(out, f"{tbl}.parquet")
        )

    copy("region")
    copy("nation")

    def scale_embeddings() -> None:
        """Replica-scale the vector corpus with a per-replica ORTHOGONAL
        transform (cyclic component rotation + deterministic per-(rep, i)
        sign flips): within-replica dot products — the corpus's entire
        pairwise geometry, including the LSH twin-planting contract — are
        preserved exactly, while cross-replica cosines collapse to
        ~N(0, 1/√64) noise. Exact-copy replicas would make every vector a
        10-way cosine-1.0 dup group (45 cross pairs each — the quadratic
        corpus-construction trap documented for dedup_minhash_lsh);
        orthogonal replicas keep pair outputs linear in replicas, so
        dedup_embedding_lsh gets a REAL 10× scaling datapoint."""
        emb = table(spark, base_dir, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        df = emb.crossJoin(F.broadcast(reps))
        shift = F.pmod(F.col("rep") * 11, F.lit(dim))
        rotated = F.concat(
            F.slice("embedding", shift + 1, F.lit(dim) - shift),
            F.slice("embedding", F.lit(1), shift),
        )
        flipped = F.transform(
            rotated,
            lambda x, i: x
            * F.when(
                F.pmod(F.xxhash64(F.concat_ws("-", F.col("rep"), i)), 2) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        )
        df.select(
            (F.col("vec_id") + F.col("rep") * F.lit(steps["vec_id"])).alias("vec_id"),
            flipped.alias("embedding"),
        ).write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    scale_embeddings()
    scale("customer", {"c_custkey": "custkey"})
    scale("supplier", {"s_suppkey": "suppkey"})
    scale("part", {"p_partkey": "partkey"})
    scale("orders", {"o_orderkey": "orderkey", "o_custkey": "custkey"})
    scale(
        "lineitem",
        {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    )
    scale("events", {"event_id": "event_id", "user_id": "user_id"})
    scale("documents", {"doc_id": "doc_id"})
    open(os.path.join(out, "_SUCCESS"), "w").close()
    freshness.write_source_fingerprint(out, src)
    return out


def _phase(msg: str) -> None:
    """Progress marker on STDERR (stdout stays the one JSON line). The r5
    OOM post-mortem needed stage numbers to guess which block died — these
    lines make any future crash attributable to a phase/query directly."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _release_memory(spark) -> None:
    """Between phases: drop cached frames and nudge both collectors. A
    single bench session runs ~60 query builds + a 10x sf1 block in one
    JVM; operators cache/localCheckpoint frames whose blocks are only
    freed when the ContextCleaner processes the Python-side GC of the
    DataFrame handle, and that cleanup lags the allocation rate (r5: heap
    exhaustion inside the sf1 block at 8g). clearCache is correctness-
    neutral: every cache in the engine is an in-query optimization, and
    materialized indexes live on parquet, not in the block store."""
    import gc

    spark.catalog.clearCache()
    gc.collect()  # releases DataFrame handles -> ContextCleaner queue
    spark.sparkContext._jvm.System.gc()  # drain weak refs / free blocks


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # local[32] is ONE JVM acting as driver + all 32 executor threads: the
    # 8g dev default is 256 MB/thread, far below any production executor.
    # 24g models a sane 0.75 GB/thread and is what a real cluster would
    # give each executor many times over. Explicit env still wins.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("jetstream_spark_bench")
    specs = all_queries()

    # warmup: JVM + codegen + parquet footer caches + Python UDF workers
    _phase("warmup")
    specs["q1_pricing_summary"].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    specs["multimodal_frame_sample"].build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Materialized-index queries follow a build-once/probe-many contract;
    # a round-start testdata regeneration invalidates the source fingerprint,
    # so the FIRST invocation pays the index build. Warm them here so the
    # timed samples below measure the steady probe path (the number that
    # scales at probe time), and report the build separately so the cost
    # isn't hidden (r3→r4 lesson: the build landing inside min-of-2 showed
    # up as a phantom 2-3x probe 'regression').
    _phase("index warm")
    t0 = time.time()
    # The three index builds are independent (distinct index dirs, no
    # session-conf mutation), and each is a multi-stage job whose tail
    # leaves most of local[32] idle — overlap them from a small thread
    # pool so the next build's tasks back-fill the current one's
    # stragglers (guide §2.6). Job descriptions are thread-local, so each
    # build stays correctly labelled in the UI (this relies on PySpark's
    # pinned-thread mode, the default since 3.2 — if PYSPARK_PIN_THREAD=false
    # the labels can leak across the three builds; cosmetic only, the wall
    # metric is unaffected). The metric is unchanged:
    # wall-clock until ALL three indexes are built and probed once.
    from concurrent.futures import ThreadPoolExecutor

    def _warm_one(name: str) -> None:
        spark.sparkContext.setJobDescription(f"bench: index warm {name}")
        specs[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(_warm_one, ("ann_lsh_indexed", "ann_ivf_indexed", "dedup_incremental")))
    index_warm_s = round(time.time() - t0, 3)

    # Headline queries: min of 2 runs. Measured on this box, the first
    # execution of a query pays Python-worker spawn + codegen + shuffle-file
    # cache effects worth 1.5-3x (dedup_minhash_lsh: 7.6 s cold, 2.3-2.8 s
    # settled over 4 consecutive runs), and a single sample under transient
    # machine load once recorded a 12 s outlier for the same plan. min-of-2
    # reports steady-state engine cost — the number that scales.
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    prev_q = _prev_bench_queries(sf_val)
    resample_counts: dict[str, int] = {}

    def timed(name: str) -> float:
        """One query's reported time via the adaptive_min policy (min-of-2,
        warmup-tail extras, clean-retest release before the first extra —
        full rationale on adaptive_min). The pre-sample gc.collect drops
        references to the previous query's frames: several operators hold
        localCheckpoint blocks alive until Python GC releases the
        DataFrame, and accumulated blocks bleed memory pressure into later
        queries' timings."""
        import gc

        gc.collect()

        def sample() -> float:
            t0 = time.time()
            specs[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        best, extra = adaptive_min(sample, prev_q.get(name), lambda: _release_memory(spark))
        if extra:
            resample_counts[name] = extra
        return round(best, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        _phase(f"headline {name}")
        timings[name] = timed(name)

    _phase("ingest pipeline")
    _release_memory(spark)
    ingest_sec, ingest_events, conservation = bench_ingest_pipeline(spark, sf_dir)
    timings["ingest_pipeline"] = round(ingest_sec, 3)

    total = round(sum(timings.values()), 3)
    timings["ingest_events_per_sec"] = round(ingest_events / ingest_sec, 1)  # rate, not in total

    # Extras get the same min-of-2 treatment (a cold dedup_embedding_cosine
    # measured 3.8x its settled time; the 1.15x regression guard would flag
    # pure warmup noise on single samples).
    extras: dict[str, float] = {}
    for name in EXTRAS:
        _phase(f"extra {name}")
        extras[name] = timed(name)

    # delivery fan-out through the shared live tail (vs the reference's
    # 5k events/s per-subscriber live ceiling)
    _phase("delivery fanout")
    _release_memory(spark)
    fanout = bench_delivery_fanout(spark, sf_dir)
    extras["delivery_fanout_events_per_sec"] = fanout["events_per_sec_per_sub"]

    # the ingest write path WITH the standing retention ticker active —
    # the maintenance tax as a committed, floor-banded number
    _phase("ingest under maintenance")
    _release_memory(spark)
    ingmaint = bench_ingest_under_maintenance(spark, sf_dir)
    extras["ingest_under_maintenance_events_per_sec"] = ingmaint["events_per_sec"]
    extras["index_warm_build_s"] = index_warm_s  # build-side cost, probe-many amortized

    # one sf1 sample (default-gate SF only): the same plans at 10× the
    # rows, where orders/customer leave broadcast range — a >2× per-query
    # anomaly vs linear scaling means a join strategy or AQE regression
    sf1: dict = {}
    if sf == "0.1":
        _phase("sf1 replica build")
        _release_memory(spark)
        sf1_dir = ensure_scaled_sf1(spark, sf_dir)
        for name in SF1_QUERIES:
            _phase(f"sf1 {name}")
            # min-of-2 (r9, was single-shot): sf1 rows land in the
            # committed history that the variance criteria read, and a
            # single 20-s sample on this host class can catch a
            # minute-scale burst (label_propagation recorded 93.8 s in a
            # burst window vs 18.6-27.2 s across four same-day settled
            # probes of identical code) — one re-sample is the cheapest
            # way to keep host weather out of the scaling record
            best = float("inf")
            for _ in range(2):
                _release_memory(spark)  # 10x data: clean block store per sample
                t0 = time.time()
                specs[name].build(spark, sf1_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            sf1[name] = round(best, 3)
        sf1["replicas"] = SF1_REPLICAS

    _phase("calibration")
    _release_memory(spark)  # probe the host, not 30 min of block-store/GC debris
    calibration_s = bench_calibration(spark)
    calibration_serial_s = bench_calibration_serial(spark)
    calibration_python_s = bench_calibration_python(spark)
    prev_cal = _prev_calibration(sf_val)
    shift_detail: dict = {}
    shift = host_shift_factor(
        {**timings, **extras},
        prev_q,
        calibration_s,
        prev_cal.get("parallel"),
        serial_now=calibration_serial_s,
        serial_prev=prev_cal.get("serial"),
        python_now=calibration_python_s,
        python_prev=prev_cal.get("python"),
        detail=shift_detail,
    )
    within_band: dict = {}
    regressions = find_regressions(
        {**timings, **extras}, sf_val, shift, resamples=resample_counts,
        band_out=within_band,
    )
    second_window: list = []
    if regressions:
        _phase(f"second-window confirm: {sorted(regressions)}")
        _release_memory(spark)

        def remeasure(name: str):
            if name in ("ingest_pipeline", "ingest_events_per_sec"):
                sec2, n2, _ = bench_ingest_pipeline(spark, sf_dir)
                timings["ingest_pipeline"] = min(timings["ingest_pipeline"], round(sec2, 3))
                # rate is recomputed from the kept (best) pass time
                return round(n2 / sec2, 1) if name == "ingest_events_per_sec" else None
            if name == "delivery_fanout_events_per_sec":
                f2 = bench_delivery_fanout(spark, sf_dir)
                if f2["events_per_sec_per_sub"] > fanout["events_per_sec_per_sub"]:
                    # keep the kept window's FULL record: the compact stdout
                    # line and detail["delivery_fanout"] read this dict, and
                    # a cleared burst flag used to leave them showing the
                    # burst-depressed first window while extras carried the
                    # remeasured rate (observed live: 6,175 printed vs
                    # 17,784 rated in this round's fifth window)
                    fanout.update(f2)
                return f2["events_per_sec_per_sub"]
            if name == "ingest_under_maintenance_events_per_sec":
                m2 = bench_ingest_under_maintenance(spark, sf_dir)
                if m2["events_per_sec"] > ingmaint["events_per_sec"]:
                    ingmaint.update(m2)  # same record-consistency rule
                return m2["events_per_sec"]
            if name in timings or name in extras:
                return timed(name)
            return None

        second_window = apply_second_window(timings, extras, regressions, remeasure)
        within_band = {}
        regressions = find_regressions(
            {**timings, **extras}, sf_val, shift, resamples=resample_counts,
            band_out=within_band,
        )
        total = round(
            sum(v for k, v in timings.items() if k != "ingest_events_per_sec"), 3
        )
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extras": extras,
        "delivery_fanout": fanout,
        "ingest_under_maintenance": ingmaint,  # write path + standing ticker, conservation asserted
        "ingest_conservation": conservation,  # processed = sequenced = persisted, asserted
        "sf1_sample": sf1,
        "regressions": regressions,
        "within_band": within_band,  # would-be flags inside the committed cross-round band (environment oscillation, evidence kept)
        "second_window_remeasured": second_window,  # flags re-tested minutes later
        "host_shift": shift,  # >1: this VM is uniformly slower than last round's
        "host_shift_detail": shift_detail,  # which signal won (probe vs median)
        # this run's code-changed set, recorded so future bands can drop
        # per-query values older than the query's most recent code change
        # (ADVICE r9 #2 — see _history_band)
        "code_changed": sorted(_code_changed_queries()),
        "calibration_s": calibration_s,
        "calibration_serial_s": calibration_serial_s,  # r8: single-thread axis
        "calibration_python_s": calibration_python_s,  # r8: Python/Arrow axis
        "sf": sf_val,
        "runs": 2,  # min-of-2 since r3 (+1 adaptive on would-be flags since r4)
        "agg": "min",
    }
    # Full detail goes to a committed repo file; stdout gets ONE compact
    # line (headline timings + rates + regression names). The r4 driver
    # capture truncated the all-in-one line into unparseable JSON — the
    # perf gate rests on this line staying small.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    # append-only run history: lets a future guard match extras baselines
    # to the SAME RUN as the official BENCH_r* record by (sf, calibration_s)
    # even after BENCH_DETAIL.json is overwritten by a later local run
    with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
        f.write(json.dumps(detail, sort_keys=True) + "\n")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "ingest_events_per_sec": timings["ingest_events_per_sec"],
                "delivery_fanout_events_per_sec": fanout["events_per_sec_per_sub"],
                "regressions": sorted(regressions),
                "within_band": sorted(within_band),
                "host_shift": shift,
                "calibration_s": calibration_s,
                "calibration_serial_s": calibration_serial_s,
                "calibration_python_s": calibration_python_s,
                "sf": sf_val,
                "runs": 2,
                "agg": "min",
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
