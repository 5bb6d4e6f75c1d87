"""Every declared query must value-match its DuckDB oracle (the driver's
correctness gate, run here at sf0.001 for speed; the driver uses sf0.01).

Comparison mirrors the driver: sort columns by name, canonicalize values,
order-insensitive row multiset equality.
"""

from __future__ import annotations

import pandas as pd
import pytest

from jetstream_spark.queries import all_queries
from tests.conftest import SF_DIR

SPECS = all_queries()


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]

    def canon(v):
        # Dtype-strict: float 5.0 != int 5, matching the driver's hash
        # (see tools/verify_oracle.py canon_val for the full rationale).
        if v is None:
            return "\x00NULL"
        if isinstance(v, float):
            if pd.isna(v):
                return "\x00NULL"
            return repr(float(v))
        return str(v)

    return sorted(tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None))


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.build(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible operator): must run, stable schema
        assert len(sdf) >= 0
        assert list(sdf.columns)
        return
    odf = duck.execute(spec.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: column names differ"
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs oracle {len(odf)}"
    assert canonical_rows(sdf) == canonical_rows(odf), f"{name}: values differ"


# --- rows-only golden pin -----------------------------------------------------
# compression_ratio is rows-only because DuckDB has no zlib, but its output is
# fully deterministic, so the engine result is pinned by content hash. The
# corpus is built IN-CODE (seeded) rather than from /root/testdata, which the
# driver regenerates between rounds — the pin must not depend on external data.
# (The other two rows-only entries, embedding_pca_project/embedding_outliers,
# are pinned by exact numpy-reference equality tests instead: their outputs
# are eigendecomposition-derived, so an independent REFERENCE IMPLEMENTATION
# is a stronger check than a frozen hash — see COVERAGE.md.)
COMPRESSION_GOLDEN_SHA256 = (
    "7a9766e1bbf6260c867c9ac441b452e00fd47c35d4df4b663b1a48cc4faeb8b0"
)


def test_compression_ratio_golden_hash(spark, tmp_path):
    import hashlib
    import random

    from jetstream_spark.queries.profiling import q_compression_ratio

    rng = random.Random(13)
    words = ["the", "quick", "brown", "fox", "data", "spark", "join", "query", "stream", "event"]
    docs = []
    for i in range(40):
        if i % 4 == 0:
            text = "boilerplate " * (10 + i)  # highly compressible
        else:
            text = " ".join(
                rng.choice(words) + str(rng.randrange(1000)) for _ in range(60 + i)
            )
        docs.append((i, text, "en", "fixture", len(text)))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = canonical_rows(q_compression_ratio(spark, str(tmp_path)).toPandas())
    assert len(rows) == 40
    got = hashlib.sha256(repr(rows).encode()).hexdigest()
    # a mismatch means either an engine change to the operator's output or a
    # different zlib build (compressed LENGTH is zlib-version-dependent) —
    # both worth a human look
    assert got == COMPRESSION_GOLDEN_SHA256
