"""Relational surface, batch 3 — pivot, time densification, window-frame
variants (range frames, ntile, first/last), regexp extraction, boolean
aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


# --- pivot (long → wide) ------------------------------------------------------
def q_pivot_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders revenue per nation pivoted by market segment — explicit value
    list keeps the plan single-pass (no distinct-scan for columns)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    piv = (
        j.groupBy("c_nationkey")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    cols = [F.col("c_nationkey")] + [
        F.coalesce(F.col(s), F.lit(0.0)).alias(f"rev_{s.lower()}") for s in SEGMENTS
    ]
    return piv.select(*cols)


_PIVOT_COLS = ",\n       ".join(
    f"coalesce(round(sum(CASE WHEN c_mktsegment = '{s}' THEN o_totalprice END), 2), 0.0) AS rev_{s.lower()}"
    for s in SEGMENTS
)
Q_PIVOT_ORACLE = f"""
SELECT c_nationkey,
       {_PIVOT_COLS}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


# --- time densification (calendar spine) ----------------------------------------
def q_monthly_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per month over a generated month spine — months with zero
    orders appear with 0 (the standard reporting densification; the spine
    is generated, not scanned)."""
    orders = table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-08-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    )
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start")
    ).agg(F.count(F.lit(1)).alias("orders"))
    return (
        spine.join(monthly, "month_start", "left")
        .select(
            F.date_format("month_start", "yyyy-MM").alias("month"),
            F.coalesce(F.col("orders"), F.lit(0)).alias("orders"),
        )
    )


Q_DENSITY_ORACLE = """
WITH spine AS (
  SELECT unnest(generate_series(DATE '1995-01-01', DATE '2001-08-01', INTERVAL 1 MONTH)) AS month_start
), monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, count(*) AS orders
  FROM orders GROUP BY 1
)
SELECT strftime(spine.month_start, '%Y-%m') AS month,
       coalesce(monthly.orders, 0) AS orders
FROM spine LEFT JOIN monthly USING (month_start)
"""


# --- range frame window -----------------------------------------------------------
def q_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: for each order, count of the customer's orders within
    ±30 days (value-based frame, not row-based)."""
    orders = table(spark, sf_dir, "orders")
    day = 86400
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-30, 30)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_within_30d"),
    )


Q_RANGE_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey,
       count(*) OVER (
         PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND INTERVAL 30 DAY FOLLOWING
       ) AS orders_within_30d
FROM orders
"""


# --- ntile + first/last value ------------------------------------------------------
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acctbal quartiles per nation + the nation's richest/poorest customer
    key carried on every row (first/last over full-partition frame)."""
    cust = table(spark, sf_dir, "customer")
    order_w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    full = order_w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(order_w).alias("balance_quartile"),
        F.first("c_custkey").over(full).alias("richest_custkey"),
        F.last("c_custkey").over(full).alias("poorest_custkey"),
    )


Q_NTILE_ORACLE = """
SELECT c_nationkey, c_custkey,
       ntile(4) OVER w AS balance_quartile,
       first_value(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_custkey,
       last_value(c_custkey)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
"""


# --- regexp extraction ---------------------------------------------------------------
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer id parsed back out of the formatted name + word extraction
    from part names (regexp scalar surface)."""
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long").alias("parsed_id"),
        (F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long") == F.col("c_custkey")).alias(
            "id_roundtrips"
        ),
        F.regexp_replace("c_name", r"\d", "#").alias("masked_name"),
    )


Q_REGEXP_ORACLE = """
SELECT c_custkey,
       CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS parsed_id,
       CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) = c_custkey AS id_roundtrips,
       regexp_replace(c_name, '\\d', '#', 'g') AS masked_name
FROM customer
"""


# --- boolean aggregates ----------------------------------------------------------------
def q_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and/bool_or/count_if per order status."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
        F.bool_or(F.col("o_totalprice") > 400_000).alias("any_above_400k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("urgent_orders"),
        F.count(F.lit(1)).alias("n"),
    )


Q_BOOL_AGGS_ORACLE = """
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000) AS all_above_1k,
       bool_or(o_totalprice > 400000) AS any_above_400k,
       count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent_orders,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus
"""


# --- NULL semantics across join/agg boundaries ----------------------------------------
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NULL contract, end to end: left-join misses produce NULLs;
    count(col) skips them while count(*) doesn't; avg ignores them;
    coalesce substitutes; null-safe equality (<=>) treats NULL = NULL as
    true. Declared because NULL bugs are where engines quietly diverge."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "left")
    return j.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_order_rows"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(
            F.when(F.col("o_orderkey").isNotNull(), F.col("c_custkey"))
        ).alias("n_with_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_order_total"),
        F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias("sum_coalesced"),
        F.count_if(F.col("o_orderstatus").eqNullSafe(F.lit(None).cast("string"))).alias("n_missing"),
    )


Q_NULL_SEMANTICS_ORACLE = """
SELECT c_mktsegment,
       count(DISTINCT c_custkey) AS n_customers,
       count(o_orderkey) AS n_order_rows,
       count(*) AS n_rows,
       count(DISTINCT CASE WHEN o_orderkey IS NOT NULL THEN c_custkey END) AS n_with_orders,
       round(avg(o_totalprice), 2) AS avg_order_total,
       round(sum(coalesce(o_totalprice, 0.0)), 2) AS sum_coalesced,
       count(CASE WHEN o_orderstatus IS NOT DISTINCT FROM NULL THEN 1 END) AS n_missing
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


# --- skew-salted join (operator equivalence, oracle-checked) ---------------------------
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through operators/skew.py::salted_join —
    the hot-key mitigation (large side salted N ways, small side replicated
    N×). The oracle is the PLAIN join: salting must be invisible in the
    result, which is exactly the property that makes it safe to deploy on
    a skewed key at 100 TB."""
    from jetstream_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, on="o_orderkey", salt_partitions=8)
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q_SALTED_JOIN_ORACLE = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


QUERIES = [
    QuerySpec("null_semantics", q_null_semantics, Q_NULL_SEMANTICS_ORACLE, "NULL contract across join/agg (count/avg/coalesce/<=>)", ("join", "agg")),
    QuerySpec("salted_join_revenue", q_salted_join_revenue, Q_SALTED_JOIN_ORACLE, "skew-salted join == plain join (operator equivalence)", ("join",)),
    QuerySpec("pivot_segment_revenue", q_pivot_segment_revenue, Q_PIVOT_ORACLE, "long-to-wide pivot", ("agg",)),
    QuerySpec("monthly_density", q_monthly_density, Q_DENSITY_ORACLE, "calendar-spine densification", ("scalar", "join")),
    QuerySpec("range_frame_window", q_range_frame_window, Q_RANGE_FRAME_ORACLE, "value-based RANGE window frame", ("window",)),
    QuerySpec("ntile_quartiles", q_ntile_quartiles, Q_NTILE_ORACLE, "ntile + first/last value windows", ("window",)),
    QuerySpec("regexp_extract_ids", q_regexp_extract, Q_REGEXP_ORACLE, "regexp extract/replace scalars", ("scalar",)),
    QuerySpec("bool_aggs", q_bool_aggs, Q_BOOL_AGGS_ORACLE, "bool_and/bool_or/count_if aggregates", ("agg",)),
]
