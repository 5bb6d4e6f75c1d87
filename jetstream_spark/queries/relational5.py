"""The remaining TPC-H plan shapes (SURVEY.md §2.2) — Q2, Q4, Q6, Q8, Q9,
Q12, Q15, Q16, Q17, Q20 — adapted to this dataset's slim schema (no
partsupp table, no shipmode/commitdate/receiptdate columns). With these the
full 22-query TPC-H pattern inventory is covered across relational*.py.

Adaptation choices (engine-exact by construction):

- Q2/Q9/Q16/Q20 need ``partsupp``; the supplier↔part relation is derived
  from ``lineitem`` instead (who actually shipped what), and "supply cost"
  becomes the minimum observed unit price ``min(l_extendedprice /
  l_quantity)`` — min is order-independent and the per-row division is the
  same IEEE double in both engines, so cross-engine equality joins on it
  are safe (unlike avg-of-sums, whose accumulation order varies).
- Q4/Q12 need receipt/commit dates or shipmode; lateness becomes
  ``l_shipdate > o_orderdate + 60 days`` and the mode axis becomes
  ``l_linestatus``.
- Q17/Q20 thresholds compare against fractions of quantity aggregates;
  ``l_quantity`` is integral in this dataset so those sums are EXACT in
  double regardless of accumulation order — strict inequalities are
  deterministic across engines.

Scale notes (100 TB): every fact-side join here shuffles once on its
natural key; only fixed-cardinality dims (region, nation) carry broadcast
hints — supplier/part/customer joins are governed by
autoBroadcastJoinThreshold per the module-wide policy (VERDICT r2 #4).
The Q2/Q15/Q17/Q20 "aggregate then join back" shapes reuse the same
partitioning key on both sides of the join-back (partkey / suppkey), so
the second shuffle is avoided or co-partitioned under AQE.

Reference semantics: jetstream (the reference) has no relational surface;
this module is engine-superset coverage declared in SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table


# --- Q2: min-cost supplier (correlated min + join-back) ----------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: for each size-15 part, the EUROPE supplier(s) whose
    minimum observed unit price (from lineitem; partsupp doesn't exist here)
    equals the part's overall EUROPE minimum. The correlated scalar min is
    expressed as a min-over-partition window rather than agg + join-back:
    Catalyst does NOT reuse the duplicated aggregate subtree of a
    self-join-back (verified on the executed plan), so the window form
    halves the scan count and rides the same p_partkey shuffle."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = supp.join(
        F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(eu_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(unit).alias("offer_price"))
    )
    best = F.min("offer_price").over(Window.partitionBy("p_partkey"))
    return (
        offers.withColumn("best_price", best)
        .filter(F.col("offer_price") == F.col("best_price"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("offer_price", 2).alias("offer_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_ORACLE = """
WITH offers AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS offer_price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_size = 15
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  GROUP BY ALL
),
best AS (SELECT p_partkey, min(offer_price) AS best_price FROM offers GROUP BY p_partkey)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_brand,
       round(offer_price, 2) AS offer_price
FROM offers JOIN best USING (p_partkey)
WHERE offer_price = best_price
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- Q4: order priority checking (EXISTS semi join) --------------------------
def q4_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted: count Q1-1996 orders per priority having at least
    one line shipped more than 60 days after the order date (the
    commitdate/receiptdate lateness test re-expressed on l_shipdate).
    EXISTS becomes a left-semi hash join on l_orderkey."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 60).cast("timestamp")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Q6: forecasting revenue change (pure scan-filter-agg) -------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 verbatim (all columns exist): one parquet scan with every
    predicate pushed down (PushedFilters shows shipdate range + quantity),
    a two-column ReadSchema, and a single partial+final agg — the minimal
    plan for the shape; there is nothing to shuffle but one double."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- Q8: national market share (two nation roles, conditional share) ---------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 adapted: NATION_2's share of ASIA-customer revenue on
    PROMO-type parts, per order year. nation joins twice under two roles
    (supplier nation for the share numerator, customer nation→region for
    the market filter) — both broadcast (25 rows, fixed cardinality)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("mkt_nationkey"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(asia_nations), cust.c_nationkey == F.col("mkt_nationkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), supp.s_nationkey == F.col("sn_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(0.0)) / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_2'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY o_year
ORDER BY o_year
"""


# --- Q9: product type profit (cost proxy, nation x year) ---------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: profit on 'red *' parts per supplier nation and
    order year; supply cost (no partsupp) is proxied as 10% of
    p_retailprice per unit. The Spark expression tree mirrors the oracle's
    exactly so per-row doubles are bit-identical; only the 2-dp round
    absorbs summation-order ulps."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey", "p_retailprice"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_ORACLE = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# --- Q12: shipping classes vs order priority (conditional counts) ------------
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (l_linestatus stands in for l_shipmode): per line
    status of 1997 shipments, how many lines belong to critical
    (URGENT/HIGH) vs other orders. Integer CASE-sums CAST to BIGINT in the
    oracle — DuckDB integer sums are HUGEINT and would materialize as
    float64 in pandas otherwise."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --- Q15: top supplier (view + global max join-back) -------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum Q1-1996 revenue. The revenue
    'view' is aggregated once, its 2-dp round is applied BEFORE the global
    max so both engines compare identical rounded values, and the 1-row max
    joins back as a broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(rev), 2).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q16: supplier diversity per part attribute (distinct-count + anti join) -
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct shippers (from lineitem; no partsupp)
    per (brand, type, size) for a size subset, excluding Brand#4 and PROMO
    parts and excluding negative-balance suppliers (the 'complaints' anti
    join). countDistinct shuffles once on the group key."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q17: small-quantity revenue (correlated avg threshold) ------------------
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if Brand#4 orders below half
    the part's average quantity were dropped. l_quantity is integral, so
    per-part avg = exact-int-sum / count is bit-identical in both engines
    and the strict < threshold cannot straddle an ulp. The correlated avg
    is an avg-over-partition window (one scan, one l_partkey shuffle)
    instead of agg + join-back, whose duplicated subtree Catalyst would
    compute twice."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    brand_li = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    half_avg = F.avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.5
    return (
        brand_li.withColumn("half_avg_qty", half_avg)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_ORACLE = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#4'
),
avg_qty AS (
  SELECT l_partkey, avg(l_quantity) * 0.5 AS half_avg_qty
  FROM brand_li GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM brand_li JOIN avg_qty USING (l_partkey)
WHERE l_quantity < half_avg_qty
"""


# --- Q20: excess shippers (nested agg + semi join chain) ---------------------
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: EUROPE suppliers that shipped more than twice the
    fair per-supplier share of some 'small *' part during 1996 (the
    availqty>half-of-shipped test re-expressed on shipped quantities; no
    partsupp). Quantity sums are exact (integral), so the 2x-fair-share
    strict inequality is engine-deterministic. The part totals come from a
    window over the per-(part,supplier) aggregate — one lineitem scan and
    one shuffle chain (partkey+suppkey agg, then partkey window) instead of
    an agg + join-back whose duplicated subtree Catalyst computes twice —
    and the qualifying-supplier set reaches supplier as a left-semi join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    small_parts = (
        table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small")).select("p_partkey")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    per_sp = (
        li.join(small_parts, li.l_partkey == small_parts.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        per_sp.withColumn("part_qty", F.sum("sp_qty").over(w))
        .withColumn("n_shippers", F.count(F.lit(1)).over(w))
        .filter(F.col("sp_qty") > 2.0 * (F.col("part_qty") / F.col("n_shippers")))
        .select("l_suppkey")
    )
    eu_keys = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey"
    )
    return (
        supp.join(F.broadcast(eu_keys), supp.s_nationkey == F.col("n_nationkey"))
        .join(excess, supp.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
WITH per_sp AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
per_part AS (
  SELECT l_partkey, sum(sp_qty) AS part_qty, count(*) AS n_shippers
  FROM per_sp GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_sp JOIN per_part USING (l_partkey)
  WHERE sp_qty > 2.0 * (part_qty / n_shippers)
)
ORDER BY s_suppkey
"""


QUERIES = [
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_ORACLE, "correlated min + join-back (TPC-H Q2)", ("relational", "subquery")),
    QuerySpec("q4_priority_checking", q4_priority_checking, Q4_ORACLE, "EXISTS semi join w/ date inequality (TPC-H Q4)", ("relational", "subquery")),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE, "full-pushdown scan-filter-agg (TPC-H Q6)", ("relational", "filter")),
    QuerySpec("q8_market_share", q8_market_share, Q8_ORACLE, "dual-role dims + conditional share (TPC-H Q8)", ("relational", "join")),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_ORACLE, "multi-join profit rollup (TPC-H Q9)", ("relational", "join")),
    QuerySpec("q12_priority_by_linestatus", q12_priority_by_linestatus, Q12_ORACLE, "conditional counts by class (TPC-H Q12)", ("relational", "agg")),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_ORACLE, "view + global-max join-back (TPC-H Q15)", ("relational", "subquery")),
    QuerySpec("q16_supplier_diversity", q16_supplier_diversity, Q16_ORACLE, "distinct-count + NOT IN anti join (TPC-H Q16)", ("relational", "agg")),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_ORACLE, "correlated avg threshold (TPC-H Q17)", ("relational", "subquery")),
    QuerySpec("q20_excess_shippers", q20_excess_shippers, Q20_ORACLE, "nested agg + semi join chain (TPC-H Q20)", ("relational", "subquery")),
]
