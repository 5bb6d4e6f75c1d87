"""Relational surface, batch 2 — deeper TPC-H shapes and the remaining
SQL-surface categories (grouping sets, percentiles, ordered string agg,
unpivot, scalar subqueries, disjunctive pushdown)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table


# --- Q7 shape: nation-pair trade volume ---------------------------------------
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flows between two specific nations by year — double-dim
    broadcast join with a disjunctive pair predicate."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    n1 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), sup.s_nationkey == F.col("s_nk"))
        .where(
            ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
        )
    )
    return joined.groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume")
    )


Q7_ORACLE = """
SELECT cust_nation, supp_nation, ship_year,
       round(sum(volume), 2) AS volume
FROM (
  SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
         year(l_shipdate) AS ship_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY 1, 2, 3
"""


# --- Q10 shape: returned-item ranking ------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q14 shape: conditional-aggregate share ---------------------------------------
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation ratio (promo revenue / total revenue)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0)) / F.sum(rev), 6
            ).alias("promo_share_pct")
        )
    )


Q14_ORACLE = """
SELECT round(100 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- Q18 shape: HAVING on aggregated join -------------------------------------------
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold (HAVING), joined back
    to the customer — agg-then-join keeps the having filter before the
    wide join (Catalyst would push it anyway; written explicitly)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


Q18_ORACLE = """
SELECT c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- Q19 shape: disjunctive multi-predicate join -------------------------------------
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate spanning both join sides — Catalyst extracts
    the common conjuncts and pushes what it can."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30)) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50)) & (F.col("l_quantity") >= 15))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("matched_lines"),
    )


Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS matched_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 15)
"""


# --- grouping sets ---------------------------------------------------------------------
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status, priority), (status), ()) — the
    general form behind rollup/cube."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


Q_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS order_count,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


# --- percentiles ------------------------------------------------------------------------
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99_price"),
    )


Q_PERCENTILES_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_price,
       round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
FROM lineitem
GROUP BY l_returnflag
"""


# --- ordered string aggregation -----------------------------------------------------------
def q_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic listagg: distinct sorted collection then join —
    collect_set order is undefined, so sort explicitly (same contract as
    the oracle's ORDER BY inside string_agg)."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("customers"),
        )
    )


Q_STRING_AGG_ORACLE = """
SELECT n_regionkey,
       string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_regionkey
"""


# --- unpivot ----------------------------------------------------------------------------
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of per-part measures."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot(
        "p_partkey", ["retailprice", "size"], "measure", "value"
    ).withColumn("value", F.round("value", 2))


Q_UNPIVOT_ORACLE = """
SELECT p_partkey, 'retailprice' AS measure, round(p_retailprice, 2) AS value FROM part
UNION ALL
SELECT p_partkey, 'size' AS measure, round(CAST(p_size AS DOUBLE), 2) AS value FROM part
"""


# --- scalar subquery shape ---------------------------------------------------------------
def q_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with balance above their nation's average — correlated
    scalar subquery, planned as a broadcast agg-join (no per-row subquery
    execution, unlike a naive engine)."""
    cust = table(spark, sf_dir, "customer")
    nation_avg = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), cust.c_nationkey == F.col("nk"))
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("above_avg_customers"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
    )


Q_ABOVE_AVG_ORACLE = """
SELECT c_nationkey,
       count(*) AS above_avg_customers,
       round(max(c_acctbal), 2) AS max_acctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_nationkey = c.c_nationkey)
GROUP BY c_nationkey
"""


# --- user journey: ordered list aggregation over events -----------------------------------
def q_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First five event types per user in time order — ordered collect via
    window (one shuffle on user_id; collect_list over an ordered window
    preserves frame order)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
    return (
        ev.withColumn("journey", F.array_join(F.collect_list("event_type").over(w), ">"))
        .withColumn("rn", rn)
        .withColumn("n_events", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .where(F.col("rn") == F.least(F.col("n_events"), F.lit(5)))
        .select("user_id", "journey")
    )


Q_USER_JOURNEY_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS journey
FROM ordered
WHERE rn <= 5
GROUP BY user_id
"""


QUERIES = [
    QuerySpec("q7_nation_volume", q7_nation_volume, Q7_ORACLE, "nation-pair volume (TPC-H Q7)", ("join",)),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_ORACLE, "returned-item ranking (TPC-H Q10)", ("join", "topk")),
    QuerySpec("q14_promo_share", q14_promo_share, Q14_ORACLE, "conditional-agg ratio (TPC-H Q14)", ("agg",)),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_ORACLE, "HAVING + join-back (TPC-H Q18)", ("agg", "join")),
    QuerySpec("q19_disjunctive", q19_disjunctive, Q19_ORACLE, "disjunctive multi-predicate join (TPC-H Q19)", ("join",)),
    QuerySpec("grouping_sets_status", q_grouping_sets, Q_GROUPING_SETS_ORACLE, "explicit GROUPING SETS", ("agg",)),
    QuerySpec("percentiles_price", q_percentiles, Q_PERCENTILES_ORACLE, "exact interpolated percentiles", ("agg",)),
    QuerySpec("ordered_string_agg", q_ordered_string_agg, Q_STRING_AGG_ORACLE, "deterministic listagg", ("agg",)),
    QuerySpec("unpivot_measures", q_unpivot_measures, Q_UNPIVOT_ORACLE, "wide-to-long unpivot", ("scalar",)),
    QuerySpec("above_nation_avg", q_above_nation_avg, Q_ABOVE_AVG_ORACLE, "correlated scalar subquery shape", ("join", "agg")),
    QuerySpec("user_journey", q_user_journey, Q_USER_JOURNEY_ORACLE, "ordered list agg over events", ("window", "eventlog")),
]
