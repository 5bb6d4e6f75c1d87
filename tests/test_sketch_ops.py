"""Count-min sketch semantics: the oracle proves engine parity on the
top-20 output; this pins the CMS guarantee itself — the estimate can
never undercount, for ANY term, and collides-with-nothing terms are
exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from jetstream_spark.queries.sketches import CMS_TOP_N, cms_estimates


def test_cms_never_undercounts_any_term(spark):
    # skewed stream: one heavy term, a mid tier, and a long unique tail
    rows = (
        [("heavy",)] * 500
        + [(f"mid{i % 7}",) for i in range(140)]
        + [(f"tail{i}",) for i in range(400)]
    )
    terms = spark.createDataFrame(rows, "term string")
    got = cms_estimates(terms).collect()
    assert len(got) == CMS_TOP_N
    by_term = {r["term"]: r for r in got}
    # every reported estimate respects the CMS one-sided error bound
    for r in got:
        assert r["cms_estimate"] >= r["exact_count"], r
        assert r["overcount"] == r["cms_estimate"] - r["exact_count"]
    # the heavy hitter is found and counted exactly or over, never under
    assert by_term["heavy"]["exact_count"] == 500
    assert by_term["heavy"]["cms_estimate"] >= 500
    # with 1047 distinct terms in 4x1024 buckets, the min-over-rows estimate
    # for the heavy term should be tight (probability of all 4 rows
    # colliding on it is negligible; deterministic given the md5 hashes)
    assert by_term["heavy"]["cms_estimate"] == 500
