"""Subquery-heavy relational shapes (SURVEY.md §2.2 joins/aggregations):
the four TPC-H plan patterns the earlier modules don't cover, adapted to
this dataset's slim schema (no partsupp/phone/receipt dates).

- q13-style: outer join with an ON-clause filter + two-level aggregation
  (order-count distribution).
- q11-style: aggregate filtered against a GLOBAL scalar subquery
  (revenue-concentration threshold).
- q21-style: doubly-correlated EXISTS + NOT EXISTS self-join on the fact
  table (sole-blame suppliers).
- q22-style: scalar-subquery threshold + anti join + aggregate
  (idle rich customers).

Scale notes (100 TB): the q21 shape is three legs of the SAME fact table
joined on its natural key (l_orderkey) — expressed as semi/anti joins so
every leg shuffles once on the key and co-partitions; no broadcast of any
fact-sized side, no correlated per-row re-execution (Catalyst decorrelates
EXISTS into joins). The scalar subqueries reduce to one row and reach the
main plan as broadcast exchanges. customer/orders/lineitem joins follow
the module-wide policy: only fixed-cardinality dims get broadcast hints;
everything that grows with SF is governed by autoBroadcastJoinThreshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table


# --- q13 shape: outer join with ON-filter + double aggregation ---------------
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 adapted: LEFT JOIN customers to their non-urgent orders
    (the filter must live in the JOIN condition — moving it to WHERE would
    silently drop order-less customers), count per customer, then the
    distribution of those counts. Reference semantics: jetstream has no
    relational surface; this is engine-superset coverage (SURVEY.md §2.2)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count(col): NULLs don't count
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- q11 shape: aggregate vs global scalar subquery --------------------------
Q11_MULTIPLE = 1.5  # parts earning >1.5x the average per-part revenue


def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: parts whose revenue exceeds {Q11_MULTIPLE}x the
    AVERAGE per-part revenue (a fraction-of-total cutoff returns nothing as
    part cardinality grows with SF; a multiple of the average is
    scale-stable). The threshold is a 1-row aggregate over the grouped
    subquery that joins back as a broadcast — the global-scalar-subquery
    plan shape, no driver-side collect."""
    lineitem = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = lineitem.groupBy("l_partkey").agg(F.sum(rev).alias("part_rev"))
    threshold = per_part.agg((F.avg("part_rev") * Q11_MULTIPLE).alias("cutoff"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_rev") > F.col("cutoff"))
        .select("l_partkey", F.round("part_rev", 2).alias("part_revenue"))
        .orderBy(F.desc("part_revenue"), "l_partkey")
    )


Q11_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS part_rev
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, round(part_rev, 2) AS part_revenue
FROM per_part
WHERE part_rev > (SELECT avg(part_rev) * {Q11_MULTIPLE} FROM per_part)
ORDER BY part_revenue DESC, l_partkey
"""


# --- q21 shape: correlated EXISTS + NOT EXISTS self-joins --------------------
def q21_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (returnflag stands in for the receipt-date lateness
    marker): suppliers with a returned ('R') lineitem in a multi-supplier
    order where NO other supplier's line was returned — the sole-blame
    pattern. EXISTS(same order, other supplier) AND NOT EXISTS(same order,
    other supplier, also 'R'), counted per supplier.

    All three lineitem legs join on l_orderkey (one co-partitioned shuffle
    key); semi/anti joins keep the plan set-based — no correlated
    re-execution, no fact broadcast."""
    lineitem = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    l1 = lineitem.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    blamed = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        blamed.join(supplier, F.col("l1.l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l1.l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_ORACLE = """
SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


# --- q22 shape: scalar-subquery threshold + anti join + aggregate ------------
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: customers richer than the positive-balance average
    (scalar subquery → broadcast) who never placed an URGENT order
    (NOT EXISTS → left-anti), aggregated by market segment."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    rich = customer.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle_rich = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return (
        idle_rich.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES = [
    QuerySpec("q13_order_count_distribution", q13_order_count_distribution, Q13_ORACLE, "outer join w/ ON-filter + double agg (TPC-H Q13)", ("relational", "join")),
    QuerySpec("q11_revenue_concentration", q11_revenue_concentration, Q11_ORACLE, "global scalar-subquery HAVING (TPC-H Q11)", ("relational", "subquery")),
    QuerySpec("q21_sole_blame_suppliers", q21_sole_blame_suppliers, Q21_ORACLE, "correlated EXISTS + NOT EXISTS self-join (TPC-H Q21)", ("relational", "subquery")),
    QuerySpec("q22_idle_rich_customers", q22_idle_rich_customers, Q22_ORACLE, "scalar subquery + anti join (TPC-H Q22)", ("relational", "subquery")),
]
