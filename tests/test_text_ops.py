"""Text operators against crafted content the synthetic corpus lacks —
the PII scrubber must actually find and redact PII-shaped spans (the
driver's oracle check on documents only proves the all-zeros case)."""

from __future__ import annotations

from jetstream_spark.queries.text import pii_scrub


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
