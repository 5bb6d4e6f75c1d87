"""Semantic pins for the round-7 operators — the oracle proves
cross-engine parity; these pin the operators' OWN guarantees:

- theta sketch: estimator error inside the 1/sqrt(k) regime, set-algebra
  consistency (intersection <= min, union >= max, inclusion-exclusion).
- winnowing: pair symmetry/bounds, similarity in (0, 1].
- skyline: EXACT equivalence with the naive dominance definition,
  recomputed independently in pandas (the engine runs grid-prune + ordered
  pass — a different algorithm).
- MMR: first pick is the relevance argmax; the diversified set is
  strictly more diverse (lower max pairwise cosine) than vanilla top-k.
- hybrid RRF: every fused row's score re-derives from its integer ranks.
- mutual information: information-theoretic bounds (0 <= MI <= min(H),
  0 <= NMI <= 1).
"""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_DIR

SF01 = "/root/testdata/sf0.01"


def test_theta_sketch_error_and_algebra(spark):
    from jetstream_spark.queries.sketches import KMV_K, q_sketch_theta_setops

    rows = {r["setop"]: r for r in q_sketch_theta_setops(spark, SF01).collect()}
    assert set(rows) == {"click", "purchase", "union", "intersect", "diff_a_minus_b"}
    # 5-sigma KMV bound: rel error ~ 1/sqrt(k-1) per sketch; pairwise ops
    # inherit the same order. Deterministic data, so this is a pin.
    bound = 5.0 / math.sqrt(KMV_K - 1)
    for name, r in rows.items():
        assert abs(r["rel_error"]) <= bound, (name, r)
        assert r["kmv_estimate"] > 0
    assert rows["intersect"]["kmv_estimate"] <= min(
        rows["click"]["kmv_estimate"], rows["purchase"]["kmv_estimate"]
    )
    assert rows["union"]["kmv_estimate"] >= max(
        rows["click"]["kmv_estimate"], rows["purchase"]["kmv_estimate"]
    )
    # exact side: inclusion-exclusion must hold exactly
    assert (
        rows["union"]["exact_count"]
        == rows["click"]["exact_count"]
        + rows["purchase"]["exact_count"]
        - rows["intersect"]["exact_count"]
    )
    assert (
        rows["diff_a_minus_b"]["exact_count"]
        == rows["click"]["exact_count"] - rows["intersect"]["exact_count"]
    )


def test_winnowing_pair_bounds(spark):
    from jetstream_spark.queries.text import q_fingerprint_winnowing

    got = q_fingerprint_winnowing(spark, SF01).collect()
    assert got, "sf0.01 corpus has near-dup docs; winnowing must pair some"
    for r in got:
        assert r["doc_a"] < r["doc_b"]
        assert 1 <= r["shared_fp"] <= min(r["fp_a"], r["fp_b"])
        assert 0.0 < r["winnow_sim"] <= 1.0


def test_skyline_matches_naive_dominance(spark):
    from jetstream_spark.queries.relational4 import q_skyline_parts

    got = sorted(
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in q_skyline_parts(spark, SF_DIR).collect()
    )
    parts = pd.read_parquet(f"{SF_DIR}/part.parquet")[
        ["p_partkey", "p_retailprice", "p_size"]
    ]
    pts = list(parts.itertuples(index=False, name=None))
    naive = sorted(
        (k, pr, sz)
        for (k, pr, sz) in pts
        if not any(
            qp <= pr and qs >= sz and (qp < pr or qs > sz) for (_, qp, qs) in pts
        )
    )
    assert got == naive


def test_mmr_first_pick_and_diversity(spark):
    from jetstream_spark.queries.similarity import (
        MMR_K,
        _mmr_base,
        q_mmr_diverse_topk,
    )

    cand, pairs = _mmr_base(spark, SF01)
    cand_rows = cand.collect()
    pair_sim = {(r["a"], r["b"]): r["sim"] for r in pairs.collect()}
    got = sorted(q_mmr_diverse_topk(spark, SF01).collect(), key=lambda r: r["sel_round"])
    assert [r["sel_round"] for r in got] == list(range(1, MMR_K + 1))
    # round 1 = relevance argmax (ties by doc_id)
    best = min(cand_rows, key=lambda r: (-r["qsim"], r["doc_id"]))
    assert got[0]["doc_id"] == best["doc_id"]
    # picks are distinct candidates
    sel = [r["doc_id"] for r in got]
    assert len(set(sel)) == MMR_K
    # diversified set is never LESS diverse than vanilla top-k (the synthetic
    # embeddings are near-orthogonal, so equality is possible — strictness
    # would over-fit the fixture)
    topk = [
        r["doc_id"]
        for r in sorted(cand_rows, key=lambda r: (-r["qsim"], r["doc_id"]))[:MMR_K]
    ]

    def max_pair(ids):
        return max(pair_sim[(x, y)] for x in ids for y in ids if x != y)

    assert max_pair(sel) <= max_pair(topk)
    # exact greedy optimality: re-derive the whole trajectory independently
    # from the (already round-6) relevance and pair sims
    from jetstream_spark.queries.similarity import MMR_LAMBDA

    qsim = {r["doc_id"]: r["qsim"] for r in cand_rows}
    chosen: list[int] = []
    for r in got:
        pool = [d for d in qsim if d not in chosen]
        if not chosen:
            scored = {d: MMR_LAMBDA * qsim[d] for d in pool}
        else:
            scored = {
                d: MMR_LAMBDA * qsim[d]
                - (1 - MMR_LAMBDA) * max(pair_sim[(d, s)] for s in chosen)
                for d in pool
            }
        best_d = min(pool, key=lambda d: (-scored[d], d))
        assert r["doc_id"] == best_d, (r, best_d)
        assert abs(r["mmr_score"] - scored[best_d]) < 2e-6, r
        chosen.append(best_d)


def test_hybrid_rrf_scores_rederive_from_ranks(spark):
    from jetstream_spark.queries.similarity import RRF_K, q_hybrid_search_rrf

    got = q_hybrid_search_rrf(spark, SF01).collect()
    assert got
    for r in got:
        assert r["rank_lex"] is not None or r["rank_dense"] is not None
        want = round(
            (1.0 / (RRF_K + r["rank_lex"]) if r["rank_lex"] is not None else 0.0)
            + (1.0 / (RRF_K + r["rank_dense"]) if r["rank_dense"] is not None else 0.0),
            6,
        )
        assert abs(r["rrf_score"] - want) < 1e-9, r
    scores = [r["rrf_score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_adamic_adar_recommendation_shape(spark):
    from jetstream_spark.queries.profiling import (
        AA_QUERY_MAX,
        AA_TOP_K,
        q_adamic_adar_linkpred,
    )

    got = q_adamic_adar_linkpred(spark, SF01).collect()
    assert got
    by_u: dict[int, list] = {}
    for r in got:
        assert r["u"] <= AA_QUERY_MAX
        assert r["v"] != r["u"]
        assert r["aa_score"] > 0 and r["common_neighbors"] >= 1
        by_u.setdefault(r["u"], []).append(r)
    for u, rows in by_u.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= AA_TOP_K
        scores = [r["aa_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_k_anonymity_lattice_monotone(spark):
    from jetstream_spark.queries.profiling import _KANON_LEVELS, q_k_anonymity_audit

    rows = {r["level"]: r for r in q_k_anonymity_audit(spark, SF01).collect()}
    order = [lvl for lvl, _ in _KANON_LEVELS]
    assert set(rows) == set(order)
    # generalizing (coarser QI) can only merge classes: k non-decreasing,
    # class count non-increasing, risky mass non-increasing
    for a, b in zip(order, order[1:]):
        assert rows[b]["k_anonymity"] >= rows[a]["k_anonymity"]
        assert rows[b]["n_classes"] <= rows[a]["n_classes"]
        assert rows[b]["risky_rows"] <= rows[a]["risky_rows"]
    for r in rows.values():
        assert r["k_satisfied"] == (r["k_anonymity"] >= 5)


def test_ohlc_bars_invariants(spark):
    from jetstream_spark.queries.eventlog import q_ohlc_bars

    got = q_ohlc_bars(spark, SF01).collect()
    assert got
    total = 0
    for r in got:
        assert r["low"] <= min(r["open"], r["close"])
        assert r["high"] >= max(r["open"], r["close"])
        assert r["low"] <= r["mean_value"] <= r["high"]
        assert r["n_events"] >= 1
        total += r["n_events"]
    events = pd.read_parquet(f"{SF01}/events.parquet")
    assert total == len(events)  # bars partition the stream


def test_textrank_rank_mass_and_vocab(spark):
    from jetstream_spark.queries.text import (
        TR_MIN_LEN,
        TR_TOP_N,
        q_textrank_keywords,
    )

    got = q_textrank_keywords(spark, SF01).collect()
    assert len(got) == TR_TOP_N
    for r in got:
        assert len(r["word"]) >= TR_MIN_LEN
        assert r["textrank"] > 0
    ranks = [r["textrank"] for r in got]
    assert ranks == sorted(ranks, reverse=True)


def test_attribution_conserves_conversions(spark):
    from jetstream_spark.queries.eventlog import (
        _ATTR_TOUCH,
        q_attribution_last_touch,
    )

    got = q_attribution_last_touch(spark, SF01).collect()
    channels = {r["channel"] for r in got}
    assert channels <= set(_ATTR_TOUCH) | {"direct"}
    events = pd.read_parquet(f"{SF01}/events.parquet")
    n_purch = int((events["event_type"] == "purchase").sum())
    assert sum(r["n_conversions"] for r in got) == n_purch  # every purchase credited once
    assert abs(sum(r["share"] for r in got) - 1.0) < 1e-4


def test_mutual_information_bounds(spark):
    from jetstream_spark.queries.profiling import _MI_PAIRS, q_mutual_information

    rows = q_mutual_information(spark, SF01).collect()
    assert len(rows) == len(_MI_PAIRS)
    for r in rows:
        assert r["h_x"] >= 0 and r["h_y"] >= 0
        # MI <= min(H(X), H(Y)) with round-6 slack
        assert -1e-6 <= r["mi"] <= min(r["h_x"], r["h_y"]) + 1e-6, r
        assert -1e-6 <= r["nmi"] <= 1 + 1e-6


def test_kcenter_greedy_matches_numpy(spark):
    """Exact farthest-point-traversal equivalence, recomputed independently
    in numpy over the same round-6 distance quantization."""
    import numpy as np

    from jetstream_spark.queries.similarity import KC_K, q_kcenter_coreset

    got = sorted(q_kcenter_coreset(spark, SF01).collect(), key=lambda r: r["sel_round"])
    assert [r["sel_round"] for r in got] == list(range(1, KC_K + 1))
    emb = pd.read_parquet(f"{SF01}/embeddings.parquet").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.sqrt((V * V).sum(axis=1))
    sel = [int(ids[0])]  # seed = smallest vec_id
    mind = None
    radii = [0.0]
    for _ in range(2, KC_K + 1):
        c = V[list(ids).index(sel[-1])]
        cn = nrm[list(ids).index(sel[-1])]
        d = np.round(1.0 - (V @ c) / (nrm * cn), 6)
        mind = d if mind is None else np.minimum(mind, d)
        # argmax with (mind desc, vec_id asc) tie-break
        best = max(range(len(ids)), key=lambda i: (mind[i], -ids[i]))
        sel.append(int(ids[best]))
        radii.append(float(mind[best]))
    assert [r["vec_id"] for r in got] == sel
    for r, rad in zip(got, radii):
        assert abs(r["radius"] - rad) < 2e-6, (r, rad)
    # coverage radii never increase after the seed round
    rs = [r["radius"] for r in got[1:]]
    assert all(a >= b for a, b in zip(rs, rs[1:]))


def test_naive_bayes_confusion_matches_numpy(spark):
    """Full model + scoring recomputed independently in pandas; the
    confusion matrix must agree cell-for-cell, and train accuracy must
    beat the 20-class chance floor by 3x."""
    import math
    import re
    from collections import Counter, defaultdict

    from jetstream_spark.queries.quality import q_naive_bayes_domain

    got = {(r["true_source"], r["pred_source"]): r["n_docs"]
           for r in q_naive_bayes_domain(spark, SF01).collect()}
    docs = pd.read_parquet(f"{SF01}/documents.parquet")
    toks = {
        row.doc_id: [t for t in re.split(r"[^a-z0-9]+", row.text.lower()) if t]
        for row in docs.itertuples()
    }
    src = dict(zip(docs["doc_id"], docs["source"]))
    classes = sorted(set(src.values()))
    cnt = defaultdict(Counter)  # class -> token counts
    tot = Counter()
    for d, ts in toks.items():
        cnt[src[d]].update(ts)
        tot[src[d]] += len(ts)
    vocab = {t for ts in toks.values() for t in ts}
    V = len(vocab)
    prior = {c: round(math.log((docs["source"] == c).sum() / len(docs)) * 1e6) for c in classes}
    ll = {
        (t, c): round(math.log((cnt[c][t] + 1.0) / (tot[c] + V)) * 1e6)
        for t in vocab
        for c in classes
    }
    conf = Counter()
    for d, ts in toks.items():
        if not ts:
            continue  # zero-token docs drop out of scoring
        scores = {c: prior[c] + sum(ll[(t, c)] for t in ts) for c in classes}
        pred = min(classes, key=lambda c: (-scores[c], c))
        conf[(src[d], pred)] += 1
    assert got == dict(conf)
    n_right = sum(n for (t, p), n in got.items() if t == p)
    n_all = sum(got.values())
    assert n_all == sum(1 for ts in toks.values() if ts)
    assert n_right / n_all >= 3.0 / len(classes)


def test_seasonal_anomaly_decomposition(spark):
    """The decomposition must reassemble (n == trend + seasonal + residual
    up to round-6), per-(type,hod) seasonal terms must be constant, and
    the 3-sigma flags must be rare."""
    from jetstream_spark.queries.eventlog import SEAS_Z, q_seasonal_anomaly

    rows = q_seasonal_anomaly(spark, SF01).collect()
    assert rows
    # decomposition identity (all components rounded to 6dp)
    for r in rows:
        assert abs((r["trend"] + r["seasonal"] + r["residual"]) - r["n"]) < 3e-6, r
    # the seasonal term is a per-(type, hour-of-day) constant
    seas = {}
    for r in rows:
        key = (r["event_type"], r["hour_bucket"][11:13])
        assert seas.setdefault(key, r["seasonal"]) == r["seasonal"], (key, r)
    # buckets are unique per (type, hour) and flags are tail events
    keys = {(r["event_type"], r["hour_bucket"]) for r in rows}
    assert len(keys) == len(rows)
    n_anom = sum(1 for r in rows if r["is_anomaly"])
    assert 0 < n_anom < 0.05 * len(rows), n_anom


def test_dp_noise_is_laplace_calibrated(spark):
    from jetstream_spark.queries.profiling import _DP_EPS, q_dp_noisy_counts

    rows = q_dp_noisy_counts(spark, SF01).collect()
    assert rows
    cust = pd.read_parquet(f"{SF01}/customer.parquet")
    assert sum(r["true_n"] for r in rows) == len(cust)  # release covers everyone
    errs = [r["abs_err"] for r in rows]
    # Laplace(b=1/eps): E|noise| = b. Hash-derived noise over >=100 cells
    # must land near it (generous 3x band — this is a mechanism pin, not
    # a statistical test).
    b = 1.0 / _DP_EPS
    assert b / 3 <= sum(errs) / len(errs) <= 3 * b
    for r in rows:
        assert r["eps"] == _DP_EPS
        assert abs(abs(r["noisy_n"] - r["true_n"]) - r["abs_err"]) < 2e-6


def test_kcore_matches_pandas_peel(spark):
    from jetstream_spark.queries.profiling import (
        _KCORE_FRAC,
        _KCORE_ROUNDS,
        q_kcore_decomposition,
    )

    got = {r["part_key"]: (r["core_degree"], r["k_used"]) for r in
           q_kcore_decomposition(spark, SF01).collect()}
    li = pd.read_parquet(f"{SF01}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    m = li.merge(li, on="l_orderkey")
    e = m[m["l_partkey_x"] != m["l_partkey_y"]][["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    import math

    k = math.ceil(e.groupby("l_partkey_x").size().mean() * _KCORE_FRAC)
    for _ in range(_KCORE_ROUNDS):
        deg = e.groupby("l_partkey_x").size()
        keep = set(deg[deg >= k].index)
        e = e[e["l_partkey_x"].isin(keep) & e["l_partkey_y"].isin(keep)]
    want = e.groupby("l_partkey_x").size().to_dict()
    assert got == {n: (d, k) for n, d in want.items()}


def test_cusum_matches_direct_recursion(spark):
    """The engine computes CUSUM via the prefix-sum/running-min
    factorization; re-derive it here with the textbook max(0, ·)
    recursion — the two must agree everywhere."""
    from collections import defaultdict

    from jetstream_spark.queries.eventlog import q_cusum_changepoint

    rows = sorted(
        q_cusum_changepoint(spark, SF01).collect(),
        key=lambda r: (r["event_type"], r["day"]),
    )
    assert rows
    ev = pd.read_parquet(f"{SF01}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    daily = ev.groupby(["event_type", "day"]).size().rename("n").reset_index()
    flags = 0
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day")
        ref = grp.head(0)
        d0 = grp["day"].min()
        ref = grp[grp["day"] < d0 + pd.Timedelta(days=7)]
        mu, sd = ref["n"].mean(), ref["n"].std(ddof=0)
        sp = sm = 0.0
        mine = [r for r in rows if r["event_type"] == et]
        assert len(mine) == len(grp)
        for r, (_, row) in zip(mine, grp.iterrows()):
            sp = max(0.0, sp + round(row["n"] - mu - 0.5 * sd, 6))
            sm = max(0.0, sm + round(mu - row["n"] - 0.5 * sd, 6))
            assert r["day"] == row["day"].strftime("%Y-%m-%d")
            assert abs(r["cusum_pos"] - sp) < 5e-6, (et, r, sp)
            assert abs(r["cusum_neg"] - sm) < 5e-6, (et, r, sm)
            flags += bool(r["is_change"])
    # CUSUM latches: once drift trips h·sigma the statistic stays elevated
    # until an (out-of-scope) reset, so flags form contiguous late episodes
    # — present in this drifting fixture, but never the majority of days.
    assert 0 < flags < 0.5 * len(rows)


def test_quantile_sketch_merge_and_rank_error(spark):
    """Mergeability is EXACT for a bottom-k-by-hash sample: sketch(A ∪ B)
    == sketch(merge(sketch(A), sketch(B))). And the estimator's rank
    error obeys the order-statistics bound."""
    import math

    from pyspark.sql import functions as F

    from jetstream_spark.queries.sketches import (
        QSK_K,
        QSK_PS,
        bottomk_sample,
        q_sketch_quantile_bottomk,
    )
    from jetstream_spark.tables import table

    li = table(spark, SF01, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
        F.col("l_extendedprice").alias("x"),
    )
    full = {r["k"] for r in bottomk_sample(li, "k").collect()}
    a = bottomk_sample(li.where(F.col("k") % 2 == 0), "k").select("k", "x", "h")
    b = bottomk_sample(li.where(F.col("k") % 2 == 1), "k").select("k", "x", "h")
    merged = {
        r["k"]
        for r in a.unionByName(b).orderBy("h", "k").limit(QSK_K).collect()
    }
    assert merged == full
    # rank-error bound: F_full(est) within p ± 5·sqrt(p(1-p)/K)
    rows = {r["p"]: r for r in q_sketch_quantile_bottomk(spark, SF01).collect()}
    xs = sorted(r["x"] for r in li.select("x").collect())
    import bisect

    n = len(xs)
    for p in QSK_PS:
        est = rows[p]["est"]
        f_est = bisect.bisect_right(xs, est) / n
        tol = 5 * math.sqrt(p * (1 - p) / QSK_K)
        assert abs(f_est - p) <= tol, (p, f_est, tol)
        assert rows[p]["exact"] > 0 and rows[p]["rel_err"] >= 0


def test_markov_rows_are_a_stochastic_matrix(spark):
    import math
    from collections import defaultdict

    from jetstream_spark.queries.eventlog import q_markov_transitions

    rows = q_markov_transitions(spark, SF01).collect()
    by_prev = defaultdict(list)
    for r in rows:
        by_prev[r["prev_type"]].append(r)
    ev = pd.read_parquet(f"{SF01}/events.parquet")
    n_pairs = len(ev) - ev["user_id"].nunique()
    assert sum(r["n_trans"] for r in rows) == n_pairs  # every adjacency counted once
    for prev, grp in by_prev.items():
        assert abs(sum(r["p_trans"] for r in grp) - 1.0) < 1e-4  # row-stochastic
        ent = grp[0]["state_entropy"]
        assert all(r["state_entropy"] == ent for r in grp)
        # entropy bounded by log of the support size
        assert -1e-6 <= ent <= math.log(len(grp)) + 1e-6


def test_mmd_matches_numpy_and_is_null_under_same_distribution(spark):
    import math

    import numpy as np

    from jetstream_spark.queries.similarity import MMD_GAMMAS, q_embedding_drift_mmd

    got = {r["gamma_scale"]: r for r in q_embedding_drift_mmd(spark, SF01).collect()}
    emb = pd.read_parquet(f"{SF01}/embeddings.parquet").sort_values("vec_id")
    V = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    dim = len(next(iter(V.values())))
    n_j = 0
    sums = {g: 0 for g in MMD_GAMMAS}
    j = 0
    while True:
        ids = [4 * j, 4 * j + 1, 4 * j + 2, 4 * j + 3]
        if not all(i in V for i in ids):
            break
        x1, y1, x2, y2 = (V[i] for i in ids)
        for g in MMD_GAMMAS:
            gam = g / dim
            k = lambda a, b: math.exp(-gam * float(((a - b) ** 2).sum()))
            h = k(x1, x2) + k(y1, y2) - k(x1, y2) - k(x2, y1)
            sums[g] += round(h * 1e6)
        n_j += 1
        j += 1
    for g in MMD_GAMMAS:
        r = got[g]
        assert r["n_quads"] == n_j
        want = round(sums[g] / 1e6 / n_j, 6)
        assert abs(r["mmd2_lin"] - want) < 2e-6, (g, r["mmd2_lin"], want)
        # X and Y come from the SAME synthetic distribution: the unbiased
        # estimator must sit near 0 (null regime), inside 5/sqrt(n).
        assert abs(r["mmd2_lin"]) <= 5.0 / math.sqrt(n_j), r


def test_hamming_ann_recall_vs_exact(spark):
    """Sign-signature Hamming must track exact cosine: recall@5 well above
    chance, and every Hamming score re-derives from the raw vectors."""
    import numpy as np

    from jetstream_spark.queries.similarity import (
        N_QUERIES,
        TOP_K,
        q_ann_brute_force,
        q_ann_hamming_topk,
    )

    got = q_ann_hamming_topk(spark, SF01).collect()
    assert len(got) == N_QUERIES * TOP_K
    emb = pd.read_parquet(f"{SF01}/embeddings.parquet")
    V = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    for r in got:
        want = int(((V[r["query_id"]] > 0) != (V[r["vec_id"]] > 0)).sum())
        assert r["hamming"] == want, r
    exact = q_ann_brute_force(spark, SF01).collect()
    ex_sets = {}
    ham_sets = {}
    for r in exact:
        ex_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in got:
        ham_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(len(ex_sets[q] & ham_sets[q]) for q in ex_sets) / (N_QUERIES * TOP_K)
    # measured 0.24 on this near-orthogonal synthetic fixture — 24x the
    # TOP_K/N ≈ 0.01 chance floor (1-bit/dim keeps ~cos order, not values;
    # production reranks the Hamming shortlist exactly)
    assert recall >= 0.15, recall


def test_hbos_scores_rederive_and_flag_shells(spark):
    import math

    from jetstream_spark.queries.quality import HBOS_BINS, HBOS_TOP, q_hbos_outliers

    got = q_hbos_outliers(spark, SF01).collect()
    assert len(got) == HBOS_TOP
    scores = [r["hbos_score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    for r in got:
        for b in ("b1", "b2", "b3"):
            assert 0 <= r[b] <= HBOS_BINS - 1
    # maximum possible score is 3·ln(N) (singleton bins in all features)
    n_docs = len(pd.read_parquet(f"{SF01}/documents.parquet"))
    assert all(0 < s <= 3 * math.log(n_docs) + 1e-6 for s in scores)


def test_kneser_ney_is_a_distribution_and_beats_backoff_on_seen(spark):
    """p_kn must be a proper conditional distribution (sums to 1 over the
    vocab for a seen predecessor), and KN's discounting must price seen
    bigrams below the raw MLE (mass reserved for novel continuations)."""
    import math
    import re
    from collections import Counter, defaultdict

    from jetstream_spark.queries.quality import KN_D, q_kneser_ney_perplexity
    from jetstream_spark.queries.sampling import TRAIN_PCT

    rows = q_kneser_ney_perplexity(spark, SF01).collect()
    assert rows
    for r in rows:
        assert r["n_bigrams"] >= 1 and r["ppl"] > 0
        # ppl = exp(unrounded avg_nll); re-deriving from the ROUNDED
        # avg_nll perturbs by up to ppl·5e-7
        assert abs(r["ppl"] - math.exp(r["avg_nll"])) < r["ppl"] * 2e-6 + 1e-5
        assert 0.0 <= r["seen_rate"] <= 1.0
    # rebuild the model in pure python and check the distribution property
    import hashlib

    docs = pd.read_parquet(f"{SF01}/documents.parquet")

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100

    bc = Counter()
    for row in docs.itertuples():
        if bucket(row.doc_id) >= TRAIN_PCT:
            continue
        ts = [t for t in re.split(r"[^a-z0-9]+", row.text.lower()) if t]
        bc.update(zip(ts, ts[1:]))
    pred_c1 = defaultdict(int)
    pred_n2 = defaultdict(int)
    cont = defaultdict(int)
    vocab = set()
    for row in docs.itertuples():
        if bucket(row.doc_id) < TRAIN_PCT:
            vocab.update(t for t in re.split(r"[^a-z0-9]+", row.text.lower()) if t)
    for (w1, w2), c in bc.items():
        pred_c1[w1] += c
        pred_n2[w1] += 1
        cont[w2] += 1
    B, V = len(bc), len(vocab)
    # pick the highest-frequency predecessor; sum p_kn over the FULL vocab
    w1 = max(pred_c1, key=pred_c1.get)
    c1, n2 = pred_c1[w1], pred_n2[w1]
    total = 0.0
    for w2 in vocab:
        c2 = bc.get((w1, w2), 0)
        p_cont = (cont.get(w2, 0) + 1) / (B + V)
        total += max(c2 - KN_D, 0) / c1 + (KN_D * n2 / c1) * p_cont
    # the +1 continuation smoothing adds V/(B+V)·(D·n2/c1) of extra mass
    # beyond the textbook identity; allow it explicitly
    slack = (KN_D * n2 / c1) * (V / (B + V))
    assert abs(total - 1.0) <= slack + 1e-6, (total, slack)
    # discount identity for seen bigrams (c >= 1 > D): the price moves off
    # MLE by exactly (interpolated continuation mass) - (discount taken) —
    # positive for high-continuation words, negative otherwise, never
    # below the pure continuation floor
    for (a, b2), c in list(bc.items())[:200]:
        c1a, n2a = pred_c1[a], pred_n2[a]
        p_mle = c / c1a
        lam = KN_D * n2a / c1a
        p_c = (cont[b2] + 1) / (B + V)
        p_kn = max(c - KN_D, 0) / c1a + lam * p_c
        assert abs(p_kn - (p_mle - KN_D / c1a + lam * p_c)) < 1e-12
        assert p_kn >= lam * p_c - 1e-12


def test_weak_label_table_rederives_from_pandas(spark):
    """Full LF table recomputed from the quality features in pandas —
    cell-for-cell equality, plus the Snorkel sanity: conflicts ⊆ overlaps
    ⊆ coverage."""
    from jetstream_spark.queries.quality import _WL_LFS, q_weak_label_analysis
    from jetstream_spark.queries.text import q_quality_score

    got = {r["lf"]: r for r in q_weak_label_analysis(spark, SF01).collect()}
    assert set(got) == set(_WL_LFS)
    q = q_quality_score(spark, SF01).toPandas()

    def vote(row, lf):
        if lf == "lf_wordcount":
            return 1 if 20 <= row.n_tokens <= 200 else (0 if row.n_tokens < 5 else -1)
        if lf == "lf_stopword":
            return 1 if 0.1 <= row.stopword_ratio <= 0.6 else (0 if row.stopword_ratio > 0.8 else -1)
        return 1 if row.alnum_ratio >= 0.6 else (0 if row.alnum_ratio < 0.3 else -1)

    n = len(q)
    for lf in _WL_LFS:
        others = [o for o in _WL_LFS if o != lf]
        votes = overlaps = conflicts = correct = 0
        for row in q.itertuples():
            v = vote(row, lf)
            if v == -1:
                continue
            votes += 1
            ov = [vote(row, o) for o in others]
            if any(x != -1 for x in ov):
                overlaps += 1
            if any(x != -1 and x != v for x in ov):
                conflicts += 1
            if v == (1 if row.quality_score >= 0.5 else 0):
                correct += 1
        r = got[lf]
        assert r["n_votes"] == votes
        assert abs(r["coverage"] - round(votes / n, 6)) < 1e-9
        assert abs(r["overlaps"] - round(overlaps / n, 6)) < 1e-9
        assert abs(r["conflicts"] - round(conflicts / n, 6)) < 1e-9
        assert abs(r["accuracy"] - round(correct / votes, 6)) < 1e-9
        assert r["conflicts"] <= r["overlaps"] <= r["coverage"]


def test_zorder_beats_linear_on_the_unclustered_dimension(spark):
    """The point of the operator: linear layout cannot prune the second
    dimension (scan fraction 1.0), Z-order prunes BOTH; and Z-order's
    single-column penalty stays bounded."""
    from jetstream_spark.queries.profiling import q_zorder_layout

    rows = {r["layout"]: r for r in q_zorder_layout(spark, SF01).collect()}
    lin, z = rows["linear"], rows["zorder"]
    assert lin["n_buckets"] == z["n_buckets"] == 32
    assert lin["y_band_scan_frac"] == 1.0  # zone maps useless off-key
    assert z["y_band_scan_frac"] <= 0.5  # Morton buckets prune the band
    assert z["x_band_scan_frac"] <= 0.5  # and keep x pruning useful
    assert lin["x_band_scan_frac"] <= z["x_band_scan_frac"]  # linear is optimal on-key
    for r in rows.values():
        assert 0 < r["avg_bbox_area"] <= 1.0


def test_gini_matches_numpy_and_bounds(spark):
    import numpy as np

    from jetstream_spark.queries.profiling import q_gini_concentration

    r = q_gini_concentration(spark, SF01).collect()[0]
    cust = pd.read_parquet(f"{SF01}/customer.parquet")[["c_custkey"]]
    orders = pd.read_parquet(f"{SF01}/orders.parquet")
    rev = orders.groupby("o_custkey")["o_totalprice"].sum()
    cents = np.array(
        sorted(round(rev.get(k, 0.0) * 100) for k in cust["c_custkey"]), dtype=np.int64
    )
    n = len(cents)
    i = np.arange(1, n + 1, dtype=np.int64)
    g = 2.0 * float((i * cents).sum()) / (n * float(cents.sum())) - (n + 1.0) / n
    assert r["n_customers"] == n
    assert abs(r["gini"] - round(g, 6)) < 2e-6
    assert 0.0 <= r["gini"] < 1.0


def test_benford_digits_and_chi(spark):
    import math

    from jetstream_spark.queries.profiling import q_benford_audit

    rows = q_benford_audit(spark, SF01).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_freq"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_freq"] for r in rows) - 1.0) < 1e-4
    chi = {r["chi_square"] for r in rows}
    assert len(chi) == 1  # dataset statistic broadcast onto every row
    for r in rows:
        assert abs(r["benford_freq"] - round(math.log10(1 + 1 / r["digit"]), 6)) < 1e-9
    # chi re-derives from the reported per-digit rows (round-4 slack)
    n = sum(r["n"] for r in rows)
    want = sum(
        n * (r["n"] / n - math.log10(1 + 1 / r["digit"])) ** 2
        / math.log10(1 + 1 / r["digit"])
        for r in rows
    )
    assert abs(chi.pop() - want) < 1e-2


def test_rfm_cells_partition_the_buyers(spark):
    from jetstream_spark.queries.relational4 import RFM_Q, q_rfm_segmentation

    rows = q_rfm_segmentation(spark, SF01).collect()
    orders = pd.read_parquet(f"{SF01}/orders.parquet")
    n_buyers = orders["o_custkey"].nunique()
    assert sum(r["n_customers"] for r in rows) == n_buyers  # cells partition buyers
    for r in rows:
        assert 1 <= r["r_q"] <= RFM_Q and 1 <= r["f_q"] <= RFM_Q and 1 <= r["m_q"] <= RFM_Q
        assert r["avg_monetary"] > 0
    # each quintile of each dimension holds ~n/Q customers (ntile balance)
    for dim in ("r_q", "f_q", "m_q"):
        per = {}
        for r in rows:
            per[r[dim]] = per.get(r[dim], 0) + r["n_customers"]
        assert set(per) == set(range(1, RFM_Q + 1))
        assert max(per.values()) - min(per.values()) <= 1
    # monetary quintile is monotone in average monetary value
    by_m = {}
    for r in rows:
        by_m.setdefault(r["m_q"], []).append(r["avg_monetary"])
    tops = [max(v) for _, v in sorted(by_m.items())]
    assert all(a < b for a, b in zip(tops, tops[1:]))


def test_basket_rules_rederive_from_pandas(spark):
    from jetstream_spark.queries.profiling import (
        _BASKET_MIN_AB,
        _BASKET_TOP,
        q_basket_lift_rules,
    )

    got = q_basket_lift_rules(spark, SF01).collect()
    assert 0 < len(got) <= _BASKET_TOP
    li = pd.read_parquet(f"{SF01}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    baskets = li.drop_duplicates().groupby("l_orderkey")["l_partkey"].apply(set)
    n_orders = len(baskets)
    from collections import Counter

    item = Counter()
    pair = Counter()
    for ps in baskets:
        for p in ps:
            item[p] += 1
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair[(a, b)] += 1
    lifts = [r["lift"] for r in got]
    assert lifts == sorted(lifts, reverse=True)
    for r in got:
        key = (r["part_a"], r["part_b"])
        assert pair[key] == r["n_ab"] >= _BASKET_MIN_AB
        assert abs(r["support"] - round(r["n_ab"] / n_orders, 6)) < 1e-9
        assert abs(r["confidence"] - round(r["n_ab"] / item[r["part_a"]], 6)) < 1e-9
        want_lift = round(r["n_ab"] * n_orders / (item[r["part_a"]] * item[r["part_b"]]), 6)
        assert abs(r["lift"] - want_lift) < 2e-6
        assert r["lift"] > 1.0  # top rules must show positive association


def test_sprt_walk_matches_direct_replay(spark):
    """Replay the Wald walk in pure python (same md5 arms, same user
    order) — boundary crossing index and decision must agree."""
    import hashlib
    import math

    from jetstream_spark.queries.eventlog import (
        AB_CONV_VALUE,
        SPRT_ALPHA,
        SPRT_BETA,
        SPRT_P0,
        SPRT_P1,
        q_ab_sequential_sprt,
    )

    got = {r["arm"]: r for r in q_ab_sequential_sprt(spark, SF01).collect()}
    ev = pd.read_parquet(f"{SF01}/events.parquet")
    conv = ev[(ev["event_type"] == "purchase") & (ev["value"] > AB_CONV_VALUE)]
    converted = set(conv["user_id"])
    c1, c0 = math.log(SPRT_P1 / SPRT_P0), math.log((1 - SPRT_P1) / (1 - SPRT_P0))
    ln_a = math.log((1 - SPRT_BETA) / SPRT_ALPHA)
    ln_b = math.log(SPRT_BETA / (1 - SPRT_ALPHA))
    walks = {"A": [], "B": []}
    for uid in sorted(ev["user_id"].unique()):
        arm = "A" if int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 2 == 0 else "B"
        walks[arm].append(1 if uid in converted else 0)
    for arm, xs in walks.items():
        llr, first, dec = 0.0, None, "continue"
        cx = 0
        for n, x in enumerate(xs, 1):
            cx += x
            llr = cx * c1 + (n - cx) * c0
            if first is None and llr >= ln_a:
                first, dec = n, "accept_h1"
            if first is None and llr <= ln_b:
                first, dec = n, "accept_h0"
        r = got[arm]
        assert r["n_users"] == len(xs) and r["conversions"] == sum(xs)
        assert abs(r["llr_final"] - round(llr, 6)) < 2e-6
        assert r["first_cross_n"] == first and r["decision"] == dec


def test_km_curve_properties(spark):
    from jetstream_spark.queries.eventlog import q_survival_km_retention

    rows = sorted(q_survival_km_retention(spark, SF01).collect(), key=lambda r: r["t_days"])
    assert rows
    ev = pd.read_parquet(f"{SF01}/events.parquet")
    n_users = ev["user_id"].nunique()
    assert rows[0]["n_at_risk"] <= n_users
    assert sum(r["churned"] + r["censored"] for r in rows) == n_users  # everyone exits once
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))  # monotone non-increasing
    # risk set shrinks by exactly the prior exits
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_at_risk"] == prev["n_at_risk"] - prev["churned"] - prev["censored"]
    # KM recurrence re-derivation
    s = 1.0
    for r in rows:
        if r["churned"] > 0:
            s *= 1.0 - r["churned"] / r["n_at_risk"]
        assert abs(r["survival"] - round(s, 6)) < 2e-6, r
