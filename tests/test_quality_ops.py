"""Corpus-curation operators against crafted content — the synthetic
documents corpus can't prove rule semantics (e.g. which Gopher rule
fired, that OOV text scores worse than in-distribution text, that small
domains get upweighted, that DSIR separates target-like docs), so each
operator is pinned on fixtures where the expected verdicts are known."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from jetstream_spark.queries.quality import (
    Q_GOPHER_ORACLE,
    domain_mix,
    dsir_weights,
    gopher_rules,
    unigram_perplexity_scores,
)

GOOD = "the quick brown fox jumps over a lazy dog and then the dog naps " * 3  # 39 words, stopwords, short words


def test_gopher_rules_verdicts(spark):
    rows = [
        (1, GOOD),                                    # passes everything
        (2, "too short to pass the word count"),      # fails word count only
        (3, ("supercalifragilistic " * 25) + "the a"),  # mean word len too high
        (4, ("fox dog cat bat rat hen pig cow owl fox dog cat bat rat hen "
             "pig cow owl fox dog cat bat elk")),     # no stopword hits
        (5, ("12 34 56 78 90 " * 5) + "the a is to of it in and"),  # alpha frac too low
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}

    assert got[1]["pass_gopher"]
    assert all(got[1][c] for c in ("pass_word_count", "pass_mean_word_len", "pass_alpha_frac", "pass_stopwords"))

    assert not got[2]["pass_word_count"] and not got[2]["pass_gopher"]
    assert got[2]["pass_mean_word_len"] and got[2]["pass_stopwords"]

    assert not got[3]["pass_mean_word_len"] and not got[3]["pass_gopher"]
    assert got[3]["mean_word_len"] > 10

    assert not got[4]["pass_stopwords"] and not got[4]["pass_gopher"]
    assert got[4]["n_stopword_hits"] < 2 and got[4]["pass_word_count"]

    assert not got[5]["pass_alpha_frac"] and not got[5]["pass_gopher"]
    assert got[5]["alpha_word_frac"] < 0.8


def test_gopher_rules_cross_engine_on_failing_rows(spark):
    """The corpus is uniform word-soup, so the oracle comparison mostly
    exercises the all-pass path; pin both engines on rows where each rule
    actually fails."""
    rows = [(i + 1, t) for i, t in enumerate([
        GOOD,
        "tiny doc",
        "onomatopoeically " * 30,
        "fox dog cat " * 10,
        "1 2 3 4 5 6 7 8 9 0 " * 3 + "the is a of",
        "",
    ])]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got_spark = sorted(map(tuple, gopher_rules(sdf).collect()))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    got_duck = sorted(map(tuple, con.execute(Q_GOPHER_ORACLE).fetchall()))
    assert got_spark == got_duck


def test_unigram_perplexity_oov_scores_worse(spark):
    train = spark.createDataFrame(
        [(100 + i, "en", "alpha beta gamma delta alpha beta") for i in range(5)],
        "doc_id long, lang string, text string",
    )
    evals = spark.createDataFrame(
        [
            (1, "en", "alpha beta alpha beta"),       # fully in-distribution
            (2, "en", "alpha beta zzz qqq"),          # half OOV
            (3, "en", "zzz qqq xxx www"),             # fully OOV
        ],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: r for r in unigram_perplexity_scores(train, evals).collect()}
    assert got[1]["avg_nll"] < got[2]["avg_nll"] < got[3]["avg_nll"]
    assert got[1]["ppl"] < got[2]["ppl"] < got[3]["ppl"]
    # terciles: 3 eval docs in one lang → one doc per bucket, ordered by nll
    assert got[1]["ppl_bucket"] == "head"
    assert got[2]["ppl_bucket"] == "middle"
    assert got[3]["ppl_bucket"] == "tail"
    # fully-OOV doc: every token scores the same smoothed floor -ln(1/(T+V))
    import math
    t_total, v_size = 30, 4  # 5 docs × 6 tokens; vocab {alpha,beta,gamma,delta}
    assert got[3]["avg_nll"] == pytest.approx(math.log(t_total + v_size), abs=1e-6)


def test_domain_mix_upweights_small_domains(spark):
    rows = [(i, "w " * 90, "big") for i in range(9)] + [(9, "w " * 90, "small")]
    df = spark.createDataFrame(
        [(d, t.strip(), s) for d, t, s in rows], "doc_id long, text string, source string"
    )
    got = {r["source"]: r for r in domain_mix(df).collect()}
    assert got["big"]["token_share"] == pytest.approx(0.9, abs=1e-6)
    assert got["small"]["token_share"] == pytest.approx(0.1, abs=1e-6)
    # temperature 0.5: weights ∝ sqrt(share) → 0.75 / 0.25
    assert got["big"]["mix_weight"] == pytest.approx(0.75, abs=1e-6)
    assert got["small"]["mix_weight"] == pytest.approx(0.25, abs=1e-6)
    assert got["small"]["mix_weight"] > got["small"]["token_share"]  # upweighted
    assert sum(r["mix_weight"] for r in got.values()) == pytest.approx(1.0, abs=1e-5)


def test_dsir_weights_separate_target_like_docs(spark):
    # target (en) speaks {alpha,beta}; background (de) speaks {zonk,quux}
    rows = (
        [(i, "en", "alpha beta alpha beta alpha") for i in range(10)]
        + [(10 + i, "de", "zonk quux zonk quux zonk") for i in range(10)]
        + [(20, "de", "alpha beta alpha beta alpha"),   # de doc that LOOKS en
           (21, "en", "zonk quux zonk quux zonk")]      # en doc that looks de
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r for r in dsir_weights(df, target_lang="en").collect()}
    # en-vocabulary docs score positive, de-vocabulary negative — regardless
    # of their own lang label (the weight is about content, not label)
    assert got[0]["dsir_logweight"] > 0
    assert got[20]["dsir_logweight"] > 0
    assert got[10]["dsir_logweight"] < 0
    assert got[21]["dsir_logweight"] < 0
    # identical content ⇒ identical weight
    assert got[20]["dsir_logweight"] == pytest.approx(got[0]["dsir_logweight"], abs=1e-6)
