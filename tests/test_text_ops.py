"""Text operators against crafted content the synthetic corpus lacks —
the PII scrubber must actually find and redact PII-shaped spans (the
driver's oracle check on documents only proves the all-zeros case),
and Spark's Java regex must agree with the oracle's RE2 on spans that
actually match."""

from __future__ import annotations

import duckdb
import pandas as pd

from jetstream_spark.queries.text import Q_PII_ORACLE, pii_scrub


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
