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

    r14 (guide §6/§2.3): the EXISTS/NOT-EXISTS legs used to be a semi +
    anti self-join — THREE lineitem scans and three l_orderkey exchanges.
    Both quantifiers are per-order facts about supplier SETS, so one scan
    derives them exactly: per (l_orderkey, l_suppkey) note whether the
    supplier has a returned line (map-side partial agg), then per order
    count suppliers and returned-suppliers. An 'R' line of supplier s is
    blamed iff another supplier exists in the order (n_supp >= 2) and no
    OTHER supplier has a returned line (returned-supplier set == {{s}},
    i.e. n_ret == 1 and s is its one member — recovered as max(suppkey)
    over returned suppliers, no extra pass). numwait counts DISTINCT
    qualifying orders, and a qualifying order has exactly ONE blamed
    supplier, so each order row contributes exactly one count — identical
    to the oracle's count(DISTINCT l1.l_orderkey). One lineitem scan, two
    narrowing exchanges ((orderkey, suppkey) partials then orderkey),
    broadcast supplier join."""
    lineitem = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    per_supp = lineitem.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("ret").alias("n_ret"),
        F.max(F.when(F.col("ret") == 1, F.col("l_suppkey"))).alias("blamed_supp"),
    )
    blamed = per_order.where((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    return (
        blamed.join(F.broadcast(supplier), F.col("blamed_supp") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
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


# --- skyline (Pareto frontier) -----------------------------------------------
# The classic preference query (Börzsönyi/Kossmann/Stocker, "The Skyline
# Operator", ICDE 2001): parts that are Pareto-optimal for (MIN
# p_retailprice, MAX p_size) — no other part is at most as expensive AND
# at least as large with one strict improvement.
#
# The engine does NOT run the textbook O(N²) dominance join. Two stages,
# both declarative:
#   1. grid prune — bucket prices on a fixed grid (one 1-row min/max
#      broadcast); a per-bucket max-size running maximum over STRICTLY
#      earlier buckets is hard dominance evidence (earlier-bucket prices
#      are strictly smaller), so any point at or below that running max
#      is dominated and dropped map-side. Soundness does not depend on
#      the bucket boundaries (any consistent bucketing only ever drops
#      provably-dominated points), so no cross-engine float contract is
#      needed for the grid. Survivors ≈ frontier + same-bucket stragglers.
#   2. exact pass — group survivors by price (max size per price), one
#      ordered running max over the price groups: a point is on the
#      frontier iff it is its price-group max and strictly above every
#      earlier group's max. The frontier is closed under stage-1 pruning
#      (a frontier point is dominated by nobody, so it always survives),
#      and every dominated survivor is dominated by a frontier member,
#      so the two-stage result equals the textbook definition — which is
#      exactly what the oracle states as a NOT EXISTS, making engine and
#      oracle INDEPENDENT formulations of the same spec.
#
# Scale (100 TB): stage 1 is a linear scan + a 256-row broadcast; the
# stage-2 ordered scan runs over grid-pruned survivors only (bounded by
# |frontier| + O(points per boundary bucket), not N). For d>2 criteria
# the same grid-prune feeds a block-nested-loop verify; the 2-D case
# needs no pairwise work at all.

_SKY_BUCKETS = 256


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    parts = table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    rng = parts.groupBy().agg(
        F.min("p_retailprice").alias("mn"), F.max("p_retailprice").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(_SKY_BUCKETS)
    bucketed = parts.crossJoin(F.broadcast(rng)).select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.least(
            F.floor((F.col("p_retailprice") - F.col("mn")) / width).cast("int"),
            F.lit(_SKY_BUCKETS - 1),
        ).alias("b"),
    )
    bmax = bucketed.groupBy("b").agg(F.max("p_size").alias("bmax"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bprev = bmax.select("b", F.max("bmax").over(wb).alias("prev_bmax"))  # ≤256 rows
    # r14 (guide §6/§2.4): survivors feeds both the exact-pass group frame
    # and the final frontier join, and each consumer used to re-derive the
    # whole grid-prune chain (rng + bucketed + bmax + bprev) — eight part
    # scans per run. Survivors are frontier-sized (frontier + same-bucket
    # stragglers), so one lazy in-run localCheckpoint (the basket/pagerank
    # pattern) runs the chain once: part scans 8 → 3 (rng, bmax, the
    # survivors materialization), everything downstream reads the
    # checkpoint blocks.
    survivors = (
        bucketed.join(F.broadcast(bprev), "b")
        .filter(F.col("prev_bmax").isNull() | (F.col("p_size") > F.col("prev_bmax")))
        .select("p_partkey", "p_retailprice", "p_size")
        .localCheckpoint(eager=False)
    )
    grp = survivors.groupBy("p_retailprice").agg(F.max("p_size").alias("grp_max"))
    wp = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    frontier = grp.select(
        "p_retailprice", "grp_max", F.max("grp_max").over(wp).alias("prev_max")
    ).filter(F.col("prev_max").isNull() | (F.col("grp_max") > F.col("prev_max")))
    return (
        survivors.join(frontier, "p_retailprice")
        .filter(F.col("p_size") == F.col("grp_max"))
        .select("p_partkey", "p_retailprice", "p_size")
    )


Q_SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


# --- RFM segmentation --------------------------------------------------------------
RFM_Q = 5  # quintiles


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation of the
    buying customer base — the classic CRM cell table (555 = champions,
    111 = lost). Per customer: last order day, order count, revenue;
    each scored 1..{RFM_Q} by ntile with (metric, custkey) tie-break so
    the binning is engine-exact; output is the |cells| ≤ {RFM_Q}³
    segment table with counts and average monetary value.

    The three ntiles are single-partition windows over the n-customer
    frame — the oracle-parity form (quantile_norm precedent); the
    production swap at 1e9 customers is percentile-threshold binning
    (one 1-row quantile frame broadcast, map-only scoring). The cell
    rollup collapses map-side to ≤{RFM_Q}³ rows."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    # monetary in integer CENTS: prices carry two decimals, so the true
    # per-customer sum is never at a half-cent — round(sum*100) is ulp-safe
    # where round(sum, 2) can flip at a .xx5 boundary, and the cell average
    # becomes an exact BIGINT mean (caught by the sf0.001 driver check)
    per = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"),
    )
    r_q = F.ntile(RFM_Q).over(Window.orderBy("last_day", "custkey"))
    f_q = F.ntile(RFM_Q).over(Window.orderBy("freq", "custkey"))
    m_q = F.ntile(RFM_Q).over(Window.orderBy("cents", "custkey"))
    scored = per.select(
        "custkey", "cents", r_q.alias("r_q"), f_q.alias("f_q"), m_q.alias("m_q")
    )
    # round at the INTEGER-CENT level: a cell mean can sit at exactly
    # half a cent, which is representable as a double (n.5) and rounds
    # away-from-zero identically in both engines — whereas rounding the
    # /100 quotient differs (Spark rounds the shortest-decimal string,
    # DuckDB the binary value; 2537150.175 split .17 vs .18 at sf0.001)
    avg_c = F.round(F.avg("cents")).cast("long")
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (avg_c / F.lit(100.0)).alias("avg_monetary"),
    )


Q_RFM_ORACLE = f"""
WITH per AS (
  SELECT o_custkey AS custkey,
         max(CAST(o_orderdate AS DATE)) AS last_day,
         count(*) AS freq,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), scored AS (
  SELECT custkey, cents,
         ntile({RFM_Q}) OVER (ORDER BY last_day, custkey) AS r_q,
         ntile({RFM_Q}) OVER (ORDER BY freq, custkey) AS f_q,
         ntile({RFM_Q}) OVER (ORDER BY cents, custkey) AS m_q
  FROM per
)
SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(round(avg(cents)) AS BIGINT) / 100.0 AS avg_monetary
FROM scored GROUP BY 1, 2, 3
"""


QUERIES = [
    QuerySpec("rfm_segmentation", q_rfm_segmentation, Q_RFM_ORACLE, "RFM quintile segmentation cell table (engine-exact ntile binning)", ("relational", "analytics")),
    QuerySpec("skyline_parts", q_skyline_parts, Q_SKYLINE_ORACLE, "skyline / Pareto frontier (min price, max size) via grid prune + ordered exact pass", ("relational", "skyline")),
    QuerySpec("q13_order_count_distribution", q13_order_count_distribution, Q13_ORACLE, "outer join w/ ON-filter + double agg (TPC-H Q13)", ("relational", "join")),
    QuerySpec("q11_revenue_concentration", q11_revenue_concentration, Q11_ORACLE, "global scalar-subquery HAVING (TPC-H Q11)", ("relational", "subquery")),
    QuerySpec("q21_sole_blame_suppliers", q21_sole_blame_suppliers, Q21_ORACLE, "correlated EXISTS + NOT EXISTS self-join (TPC-H Q21)", ("relational", "subquery")),
    QuerySpec("q22_idle_rich_customers", q22_idle_rich_customers, Q22_ORACLE, "scalar subquery + anti join (TPC-H Q22)", ("relational", "subquery")),
]
