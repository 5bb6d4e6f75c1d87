"""The tokenization contract (lowercase, split on non-alphanumeric runs,
drop empties) is shared by ~18 oracle-checked queries across text.py,
quality.py, and sampling.py — Spark evaluates it with Java regex +
codegen HOFs, the oracles with DuckDB's RE2. The corpus is plain ASCII
word-soup, so the driver gate never exercises edge shapes (leading/
trailing separators, digit runs, mixed case, empty strings, punctuation
salad). This fuzzes the two engines against each other — and against a
pure-Python reference — over printable ASCII so a regex-semantics
divergence can't hide behind the benign corpus.

(Non-ASCII is deliberately out of contract: Java and RE2 differ on
unicode case folding, and every oracle-checked table is ASCII.)
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jetstream_spark.queries.text import _TOKENS_SQL, _tokens

# printable ASCII incl. regex metacharacters and whitespace variants
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=120,
)


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_ascii_text, min_size=1, max_size=20))
def test_tokenizer_spark_duckdb_python_agree(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got_spark = {
        r["doc_id"]: list(r["toks"])
        for r in sdf.select("doc_id", _tokens().alias("toks")).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    got_duck = {
        doc_id: list(toks)
        for doc_id, toks in con.execute(
            f"SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents"
        ).fetchall()
    }
    for doc_id, text in rows:
        expect = _py_tokens(text)
        assert got_spark[doc_id] == expect, f"spark diverged on {text!r}"
        assert got_duck[doc_id] == expect, f"duckdb diverged on {text!r}"
