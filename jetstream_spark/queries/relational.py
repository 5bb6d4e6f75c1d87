"""Relational operator surface (SURVEY.md §2.2).

The reference has no joins/aggregations/windows (verified: SURVEY.md §2.2,
all 13 Go files); this module declares the full relational surface the engine
exposes instead, as pure Spark built-ins over the TPC-H-ish tables, each with
a DuckDB oracle. Scale notes per query:

- Fact-to-fact joins (lineitem⋈orders) shuffle on the join key — both sides
  are pre-partitioned by Catalyst's hash partitioning; AQE handles skew.
- region/nation are FIXED-SIZE dims (5/25 rows at every SF) — those are the
  only tables broadcast unconditionally. customer/supplier/part GROW with
  scale: a forced broadcast hint would override the autoBroadcastJoinThreshold
  (32 MB, session.py) and OOM executors at the 100 TB design point, so their
  join strategy is left to the size-based threshold + AQE — at small SF Spark
  still picks broadcast-hash on its own; at scale it degrades safely to
  shuffle-hash on the join key.
- Aggregations all do partial (map-side) aggregation automatically.
- Top-k = orderBy().limit(k) → Spark plans TakeOrderedAndProject (no global
  sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table


# --- q1: scan + filter + hash aggregate (TPC-H Q1 shape) -------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushed-down date filter + 8-way hash agg with partial aggregation.

    Reference parity: the reference's only 'aggregation' is metrics counters
    (pkg/consumer/metrics.go:8-57); this is the engine's analytical superset.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT
  l_returnflag, l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  round(avg(l_quantity), 4)                                          AS avg_qty,
  round(avg(l_extendedprice), 4)                                     AS avg_price,
  round(avg(l_discount), 6)                                          AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- q3: 3-way join + agg + deterministic top-k ----------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer(broadcastable) ⋈ orders ⋈ lineitem, group, top-10.

    Top-k is tie-broken on (revenue desc, o_orderdate, l_orderkey) so the
    limit is deterministic for the oracle hash.
    """
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "revenue")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --- q5: 6-way join (broadcast dims) + agg ---------------------------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region→nation broadcast chain; customer and supplier co-located on
    nationkey; fact join shuffles once on orderkey."""
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q5_ORACLE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --- semi join --------------------------------------------------------------
def q_semi_join_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one late-shipped line (EXISTS → left-semi join).

    The reference's closest analogue is set-membership filtering
    (cmd/jetstream/server.go:119-129 ≈ semi-join against a literal set).
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 90).cast("timestamp")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q_SEMI_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
"""


# --- anti join ---------------------------------------------------------------
def q_anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (NOT EXISTS → left-anti join), counted
    per nation."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    idle = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("idle_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("idle_acctbal"),
        )
    )


Q_ANTI_ORACLE = """
SELECT n_name, count(*) AS idle_customers, round(sum(c_acctbal), 2) AS idle_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""


# --- window: ranking ---------------------------------------------------------
def q_window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by acctbal per nation — row_number with a deterministic
    (acctbal desc, custkey) tiebreak. One shuffle on the partition key."""
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.withColumn("rank_in_nation", F.row_number().over(w))
        .where(F.col("rank_in_nation") <= 3)
        .select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rank_in_nation",
        )
    )


Q_WINDOW_RANK_ORACLE = """
SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal, rank_in_nation
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rank_in_nation
  FROM customer
)
WHERE rank_in_nation <= 3
"""


# --- window: running aggregate ----------------------------------------------
def q_window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative order value per customer over time (analytic frame
    UNBOUNDED PRECEDING..CURRENT ROW). Deterministic order: (date, orderkey)."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


Q_WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


# --- window: lag/lead ---------------------------------------------------------
def q_window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days since the customer's previous order (lag) — integer output, no
    float hashing concerns."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .where(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date")).alias("days_since_prev"),
        )
    )


Q_WINDOW_LAG_ORACLE = """
SELECT o_custkey, o_orderkey, days_since_prev
FROM (
  SELECT o_custkey, o_orderkey,
         datediff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS days_since_prev
  FROM orders
)
WHERE days_since_prev IS NOT NULL
"""


# --- rollup -------------------------------------------------------------------
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (n_name, order year): per-nation-per-year, per-nation, grand
    total. Partial aggregation applies to grouping sets too."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("order_year"), "o_totalprice")
    )
    return joined.rollup("n_name", "order_year").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )


Q_ROLLUP_ORACLE = """
SELECT n_name, order_year,
       round(sum(o_totalprice), 2) AS total_revenue,
       count(*) AS order_count
FROM (
  SELECT n_name, year(o_orderdate) AS order_year, o_totalprice
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
)
GROUP BY ROLLUP (n_name, order_year)
"""


# --- cube ----------------------------------------------------------------------
def q_cube_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (mktsegment, orderpriority) — all 4 grouping sets."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return joined.cube("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


Q_CUBE_ORACLE = """
SELECT c_mktsegment, o_orderpriority,
       count(*) AS order_count,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
"""


# --- set operations -------------------------------------------------------------
def q_set_ops_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference of 1996 vs 1999 buyers — exercises EXCEPT and
    UNION (distinct) set semantics."""
    orders = table(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return (
            orders.where(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("custkey"))
            .distinct()
        )

    a, b = buyers(1996), buyers(1999)
    return a.exceptAll(b).union(b.exceptAll(a)).distinct()


Q_SET_OPS_ORACLE = """
WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996),
     b AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1999)
(SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
UNION
(SELECT custkey FROM b EXCEPT SELECT custkey FROM a)
"""


def q_intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers buying in both 1996 and 1997."""
    orders = table(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return orders.where(F.year("o_orderdate") == year).select(F.col("o_custkey").alias("custkey")).distinct()

    return buyers(1996).intersect(buyers(1997))


Q_INTERSECT_ORACLE = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
"""


# --- scalar functions ------------------------------------------------------------
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface in one projection (reference's scalar
    usage is split/parse/sprintf — consumer.go:195-196, persist.go:105-107;
    this is the engine's superset)."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.split(F.col("p_name"), " ").getItem(0).alias("name_first_word"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.abs(F.col("p_size") - 25).alias("size_dist_25"),
    )


Q_SCALAR_ORACLE = """
SELECT p_partkey,
       upper(p_name)                       AS name_upper,
       length(p_name)                      AS name_len,
       split_part(p_name, ' ', 1)          AS name_first_word,
       concat_ws('/', p_brand, p_type)     AS brand_type,
       substr(p_type, 1, 3)                AS type_prefix,
       round(p_retailprice * 1.1, 2)       AS price_with_tax,
       p_size % 7                          AS size_mod7,
       abs(p_size - 25)                    AS size_dist_25
FROM part
"""


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction + truncation, grouped monthly order stats."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.quarter("o_orderdate").alias("order_quarter"),
            "o_totalprice",
        )
        .groupBy("order_year", "order_month", "order_quarter")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("monthly_revenue"),
        )
    )


Q_DATE_ORACLE = """
SELECT year(o_orderdate)    AS order_year,
       month(o_orderdate)   AS order_month,
       quarter(o_orderdate) AS order_quarter,
       count(*)             AS order_count,
       round(sum(o_totalprice), 2) AS monthly_revenue
FROM orders
GROUP BY 1, 2, 3
"""


# --- distinct aggregation ----------------------------------------------------------
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (expand-based two-phase distinct agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.count(F.lit(1)).alias("line_count"),
    )


Q_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS distinct_suppliers,
       count(DISTINCT l_partkey) AS distinct_parts,
       count(*) AS line_count
FROM lineitem
GROUP BY l_returnflag
"""


# --- top-k ---------------------------------------------------------------------------
def q_topk_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 brands by line revenue: agg then TakeOrderedAndProject.
    Deterministic tiebreak on brand name."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("brand_revenue"))
        .orderBy(F.col("brand_revenue").desc(), "p_brand")
        .limit(15)
    )


Q_TOPK_ORACLE = """
SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS brand_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY brand_revenue DESC, p_brand
LIMIT 15
"""


# --- theta / range join -----------------------------------------------------------------
def q_range_join_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-brand part pairs with |size delta| ≤ 2 — equi on brand (hash
    join) + range residual, per-brand pair counts. At 100 TB the equi key
    bounds the blow-up; a pure theta join would be a cross product."""
    part = table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("a_key"), F.col("p_brand").alias("brand"), F.col("p_size").alias("a_size")
    )
    b = part.select(F.col("p_partkey").alias("b_key"), F.col("p_brand").alias("b_brand"), F.col("p_size").alias("b_size"))
    pairs = a.join(
        b,
        (a.brand == b.b_brand) & (a.a_key < b.b_key) & (F.abs(a.a_size - b.b_size) <= 2),
    )
    return pairs.groupBy("brand").agg(F.count(F.lit(1)).alias("close_pairs"))


Q_RANGE_JOIN_ORACLE = """
SELECT a.p_brand AS brand, count(*) AS close_pairs
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
 AND abs(a.p_size - b.p_size) <= 2
GROUP BY a.p_brand
"""


# --- full outer join ----------------------------------------------------------------------
def q_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of customer-count and supplier-count per nation —
    exercises null-producing outer semantics."""
    cust = table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("customers"))
    sup = table(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("suppliers"))
    joined = cust.join(sup, cust.c_nationkey == sup.s_nationkey, "full_outer")
    return joined.select(
        F.coalesce(cust.c_nationkey, sup.s_nationkey).alias("nationkey"),
        F.coalesce(F.col("customers"), F.lit(0)).alias("customers"),
        F.coalesce(F.col("suppliers"), F.lit(0)).alias("suppliers"),
    )


Q_FULL_OUTER_ORACLE = """
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       coalesce(customers, 0) AS customers,
       coalesce(suppliers, 0) AS suppliers
FROM (SELECT c_nationkey, count(*) AS customers FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey, count(*) AS suppliers FROM supplier GROUP BY 1) s
  ON c.c_nationkey = s.s_nationkey
"""


# --- correlated scalar subquery shape: per-group max join ----------------------------------
def q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's most recent order (argmax via window, deterministic
    tiebreak orderkey desc) — the 'latest row per key' pattern used by the
    reference's per-subscriber head tracking (server.go:113)."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_orderdate"),
            F.round("o_totalprice", 2).alias("latest_totalprice"),
        )
    )


Q_LATEST_ORACLE = """
SELECT o_custkey,
       o_orderkey AS latest_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate,
       round(o_totalprice, 2) AS latest_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
"""


QUERIES = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE, "scan+filter+hash agg (TPC-H Q1)", ("agg",)),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE, "3-way join + agg + top-k (TPC-H Q3)", ("join", "topk")),
    QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume, Q5_ORACLE, "6-way join (TPC-H Q5)", ("join",)),
    QuerySpec("semi_join_late_orders", q_semi_join_priority, Q_SEMI_ORACLE, "left-semi join (EXISTS)", ("join",)),
    QuerySpec("anti_join_idle_customers", q_anti_join_idle_customers, Q_ANTI_ORACLE, "left-anti join (NOT EXISTS)", ("join",)),
    QuerySpec("window_rank_customers", q_window_rank_customers, Q_WINDOW_RANK_ORACLE, "row_number ranking window", ("window",)),
    QuerySpec("window_running_revenue", q_window_running_revenue, Q_WINDOW_RUNNING_ORACLE, "running-sum frame window", ("window",)),
    QuerySpec("window_order_gaps", q_window_order_gaps, Q_WINDOW_LAG_ORACLE, "lag analytic window", ("window",)),
    QuerySpec("rollup_revenue", q_rollup_revenue, Q_ROLLUP_ORACLE, "ROLLUP grouping sets", ("agg",)),
    QuerySpec("cube_segment_priority", q_cube_segment_priority, Q_CUBE_ORACLE, "CUBE grouping sets", ("agg",)),
    QuerySpec("set_symdiff_buyers", q_set_ops_active_customers, Q_SET_OPS_ORACLE, "EXCEPT + UNION set ops", ("setop",)),
    QuerySpec("intersect_repeat_buyers", q_intersect_repeat_buyers, Q_INTERSECT_ORACLE, "INTERSECT set op", ("setop",)),
    QuerySpec("scalar_functions", q_scalar_functions, Q_SCALAR_ORACLE, "string/math scalar functions", ("scalar",)),
    QuerySpec("date_functions", q_date_functions, Q_DATE_ORACLE, "date part extraction + agg", ("scalar", "agg")),
    QuerySpec("distinct_agg", q_distinct_agg, Q_DISTINCT_ORACLE, "exact distinct aggregation", ("agg",)),
    QuerySpec("topk_brand_revenue", q_topk_parts_by_revenue, Q_TOPK_ORACLE, "agg + TakeOrdered top-k", ("topk",)),
    QuerySpec("range_join_part_pairs", q_range_join_part_pairs, Q_RANGE_JOIN_ORACLE, "equi+range theta join", ("join",)),
    QuerySpec("full_outer_nation_activity", q_full_outer_nation_activity, Q_FULL_OUTER_ORACLE, "full outer join", ("join",)),
    QuerySpec("latest_order_per_customer", q_latest_order_per_customer, Q_LATEST_ORACLE, "argmax-per-key window", ("window",)),
]
