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
