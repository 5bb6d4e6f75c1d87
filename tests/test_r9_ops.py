"""Semantic pins for the round-9 operator — profile_columns_fast, the
engine-only (xxhash64) production twin of profile_columns_approx
(VERDICT r8 #3). It is rows-only in the driver registry (xxhash64 has no
DuckDB analogue), so these tests ARE its correctness contract:

- register-level parity: on the same input both forms produce register
  tables of identical shape ((column, bucket) keyed, bucket in [0, m),
  rho in [1, rho_max], <= m registers per column), and their estimates
  agree within the combined 2-sketch error bound — the two hash streams
  are independent, so agreement pins the shared estimator topology, not
  hash-coincidence.
- exact-count parity: n_rows/n_nulls (plain counts, not sketched) agree
  EXACTLY with the md5 form and the exact profile.
- error bound: the same per-column 3-sigma and mean bounds vs the EXACT
  profile that pin the md5 form (tests/test_r8_ops.py).
"""

from __future__ import annotations

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

# same estimator, same m=256 registers: per-sketch 3-sigma ~ 0.20 (the
# r8 pin); two independent sketches of the same set differ by at most
# the sum of their deviations
APPROX_PER_COL_BOUND = 0.20
APPROX_MEAN_BOUND = 0.08
TWIN_AGREE_BOUND = 2 * APPROX_PER_COL_BOUND


def _keyed_registers(spark, sf_dir, use_xxhash):
    """Each form's (column, bucket) -> m_j register table. The xxhash
    branch runs THE production keyed stage (profiling._fast_hll_keyed —
    a private re-derivation could drift from the code it claims to pin);
    the md5 branch re-derives independently (its true cross-check is the
    DuckDB oracle, so an independent copy here is the right shape)."""
    from pyspark.sql import functions as F

    from jetstream_spark.queries import profiling as P
    from jetstream_spark.tables import table

    li = table(spark, sf_dir, "lineitem")
    if use_xxhash:
        keyed = P._fast_hll_keyed(li).where(F.col("bucket").isNotNull())
        return keyed.groupBy("column_name", "bucket").agg(
            F.max("rho").alias("m_j")
        )
    stack = ", ".join(f"'{c}', {expr}" for c, expr, _ in P._CANON_COLS)
    up = li.selectExpr(f"stack({len(P._CANON_COLS)}, {stack}) AS (column_name, v)")
    h = F.conv(
        F.substring(F.md5(F.col("v").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(h, P._APPROX_HLL_P)
    keyed = (
        up.where(F.col("v").isNotNull())
        .select(
            "column_name",
            h.bitwiseAND(F.lit(P._APPROX_HLL_M - 1).cast("long")).alias("bucket"),
            w.alias("w"),
        )
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(P._APPROX_RHO_MAX)).otherwise(
                P._APPROX_RHO_MAX - F.length(F.bin("w"))
            ),
        )
    )
    return keyed.groupBy("column_name", "bucket").agg(F.max("rho").alias("m_j"))


def test_fast_register_table_shape_parity(spark):
    """Both hash streams must fill the SAME register topology: bucket in
    [0, m), rho in [1, rho_max], <= m registers per column, identical
    column sets."""
    from jetstream_spark.queries import profiling as P

    for use_xxhash in (False, True):
        regs = _keyed_registers(spark, SF001, use_xxhash).collect()
        cols = {r["column_name"] for r in regs}
        assert cols == {c for c, _, _ in P._CANON_COLS}
        per_col: dict[str, int] = {}
        for r in regs:
            assert 0 <= r["bucket"] < P._APPROX_HLL_M, r
            assert 1 <= r["m_j"] <= P._APPROX_RHO_MAX, r
            per_col[r["column_name"]] = per_col.get(r["column_name"], 0) + 1
        assert all(n <= P._APPROX_HLL_M for n in per_col.values())


def test_fast_agrees_with_md5_twin_and_exact_counts(spark):
    from jetstream_spark.queries.profiling import (
        q_profile_columns_approx,
        q_profile_columns_fast,
    )

    md5 = {r["column_name"]: r for r in q_profile_columns_approx(spark, SF01).collect()}
    fast = {r["column_name"]: r for r in q_profile_columns_fast(spark, SF01).collect()}
    assert set(md5) == set(fast)
    for c, f in fast.items():
        m = md5[c]
        # the non-sketched counts are exact in both forms
        assert f["n_rows"] == m["n_rows"], c
        assert f["n_nulls"] == m["n_nulls"], c
        # independent hash streams, shared estimator: estimates agree
        # within the combined deviation of two sketches
        rel = abs(f["approx_distinct"] - m["approx_distinct"]) / max(
            m["approx_distinct"], 1.0
        )
        assert rel <= TWIN_AGREE_BOUND, (c, f["approx_distinct"], m["approx_distinct"])


def test_fast_error_bound_vs_exact(spark):
    """The md5 form's r8 error pins, verbatim, against the xxhash64 form."""
    from jetstream_spark.queries.profiling import (
        q_profile_columns,
        q_profile_columns_fast,
    )

    exact = {r["column_name"]: r for r in q_profile_columns(spark, SF01).collect()}
    fast = {r["column_name"]: r for r in q_profile_columns_fast(spark, SF01).collect()}
    errs = []
    for c, a in fast.items():
        e = exact[c]
        assert a["n_rows"] == e["n_rows"]
        assert a["n_nulls"] == e["n_nulls"]
        err = abs(a["approx_distinct"] - e["n_distinct"]) / e["n_distinct"]
        errs.append(err)
        assert err <= APPROX_PER_COL_BOUND, (c, a["approx_distinct"], e["n_distinct"])
    assert sum(errs) / len(errs) <= APPROX_MEAN_BOUND


def test_fast_plan_is_engine_only(spark):
    """The production form's point: no md5/conv string pipeline in the
    plan — the hash is one codegen'd xxhash64 expression."""
    from jetstream_spark.queries.profiling import q_profile_columns_fast

    plan = q_profile_columns_fast(spark, SF001)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "md5" not in plan and "conv(" not in plan
