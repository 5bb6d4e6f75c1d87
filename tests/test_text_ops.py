"""Text operators against crafted content the synthetic corpus lacks —
the PII scrubber must actually find and redact PII-shaped spans (the
driver's oracle check on documents only proves the all-zeros case),
and Spark's Java regex must agree with the oracle's RE2 on spans that
actually match."""

from __future__ import annotations

import duckdb
import pandas as pd

from jetstream_spark.queries.text import Q_PII_ORACLE, pii_scrub
from tests.conftest import SF_DIR


def test_pii_scrub_redacts_real_spans(spark):
    rows = [
        (1, "Contact Alice.Smith+spam@Example.ORG or call 5551234567 now"),
        (2, "no pii here, just 12345 (too short) and plain words"),
        (3, "two mails: a@b.io c.d@e-f.co.uk and runs 000111222 999888777666"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}

    assert got[1]["n_emails"] == 1 and got[1]["n_long_numbers"] == 1
    assert "<email>" in got[1]["scrubbed_text"] and "<num>" in got[1]["scrubbed_text"]
    assert "alice" not in got[1]["scrubbed_text"]
    assert "5551234567" not in got[1]["scrubbed_text"]

    assert got[2]["n_emails"] == 0 and got[2]["n_long_numbers"] == 0
    assert got[2]["scrubbed_text"] == rows[1][1].lower()
    assert got[2]["scrubbed_len"] == len(rows[1][1])

    assert got[3]["n_emails"] == 2 and got[3]["n_long_numbers"] == 2
    assert got[3]["scrubbed_text"].count("<email>") == 2
    assert got[3]["scrubbed_text"].count("<num>") == 2


def test_pii_scrub_cross_engine_on_matching_spans(spark):
    """The driver's oracle comparison runs on a corpus with zero PII-shaped
    spans, which would hide a Java-regex/RE2 divergence; this pins the two
    engines to identical output on rows where the patterns actually fire."""
    rows = [
        (1, "Reach me at first.last@sub.example.co or +1 4085551234567."),
        (2, "ids: 123456 1234567890 12345 end"),
        (3, "a@b.cd then x.y-z@host.io, card 4111111111111111"),
        (4, "nothing to scrub"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got_spark = sorted(
        map(tuple, pii_scrub(sdf).drop("scrubbed_text").collect())
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    got_duck = sorted(map(tuple, con.execute(Q_PII_ORACLE).fetchall()))
    assert got_spark == got_duck


def test_bm25_rare_term_dominates_and_matches_python(spark):
    """The rare query term ("dup") must dominate the ranking, and the
    returned scores must equal an independent pure-Python BM25 on the raw
    corpus (Lucene IDF form, same k1/b)."""
    import math
    import re

    import pyarrow.parquet as pq

    from jetstream_spark.queries.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOP_K,
        q_bm25_topk,
    )

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    toks = {
        i: [t for t in re.split("[^a-z0-9]+", txt.lower()) if t]
        for i, txt in zip(tbl["doc_id"], tbl["text"])
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in BM25_QUERY}

    def score(doc):
        s = 0.0
        dl = len(toks[doc])
        for t in BM25_QUERY:
            tf = toks[doc].count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
        return round(s, 6)

    expect = sorted(
        ((score(d), d) for d in toks if score(d) > 0), key=lambda x: (-x[0], x[1])
    )[:BM25_TOP_K]

    got = q_bm25_topk(spark, SF_DIR).collect()
    assert [(r["bm25"], r["doc_id"]) for r in got] == expect
    # the rare discriminative term must put its docs on top
    assert "dup" in toks[got[0]["doc_id"]]


def test_phrase_search_matches_brute_force(spark):
    """Positional-join phrase search == a pure-Python token-aligned scan,
    including the repeated-token phrase's overlap semantics."""
    import re

    import pyarrow.parquet as pq

    from jetstream_spark.queries.text import PHRASE, q_phrase_search

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    expect = {}
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        hits = [
            i
            for i in range(len(toks) - len(PHRASE) + 1)
            if tuple(toks[i : i + len(PHRASE)]) == PHRASE
        ]
        if hits:
            expect[doc_id] = (len(hits), hits[0] + 1)  # 1-based first_pos
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in q_phrase_search(spark, SF_DIR).collect()
    }
    assert got == expect
    assert expect, "fixture must contain the phrase"
