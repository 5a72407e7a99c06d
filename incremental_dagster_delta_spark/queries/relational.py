"""Relational capability-surface queries (SURVEY.md §2.4).

The reference implements no joins/aggregations/windows (SURVEY.md §2.4);
the equivalent capability in this engine is Spark's own relational algebra.
These queries pin that surface against the DuckDB oracle and double as the
bench headline set.

Determinism rules used throughout (so the driver's value-hash matches):

- money / price arithmetic is done in DECIMAL (exact, order-insensitive)
  and only the final value is cast to DOUBLE;
- averages are written explicitly as exact-decimal-sum / count;
- top-k queries order by an exact value with a unique key tiebreak.

Scale notes: dimension tables (region/nation/supplier) are broadcast; fact
joins shuffle on their join keys and AQE handles skew/coalescing. Filters
are expressed directly on scan columns so they push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

DEC = "decimal(18,2)"


def _dec(c: str):
    return F.col(c).cast(DEC)


# --- q_pricing_summary: TPC-H Q1 shape — wide agg with exact arithmetic ----


@query(
    "q_pricing_summary",
    tags=("agg",),
    bench=True,
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast(DEC) + _dec("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- q_region_revenue: TPC-H Q5 shape — multi-join with broadcast dims -----


@query(
    "q_region_revenue",
    tags=("join", "agg"),
    bench=True,
    oracle="""
    SELECT
      n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_region_revenue(spark, sf_dir):
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = t(spark, sf_dir, "lineitem")
    supplier = F.broadcast(t(spark, sf_dir, "supplier"))
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# --- q_top_orders: TPC-H Q3 shape — join + agg + deterministic top-k -------


@query(
    "q_top_orders",
    tags=("join", "agg", "topk"),
    bench=True,
    oracle="""
    SELECT
      o_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      strftime(ANY_VALUE(o_orderdate), '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY o_orderkey
    ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) DESC, o_orderkey
    LIMIT 10
    """,
)
def q_top_orders(spark, sf_dir):
    customer = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    lineitem = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.sum(revenue).alias("_rev"),
            F.date_format(F.any_value(F.col("o_orderdate")), "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("_rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.col("_rev").cast("double").alias("revenue"), "orderdate")
    )


# --- window functions -------------------------------------------------------


@query(
    "q_window_running",
    tags=("window",),
    bench=True,
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_window_running(spark, sf_dir):
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        )
    )


@query(
    "q_rank_in_group",
    tags=("window",),
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS price_rank
    FROM part
    """,
)
def q_rank_in_group(spark, sf_dir):
    from pyspark.sql.window import Window

    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.dense_rank().over(w).cast("long").alias("price_rank"),
    )


# --- joins: semi / anti -----------------------------------------------------


@query(
    "q_semi_join",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_semi_join(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .join(t(spark, sf_dir, "orders"), F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "q_new_file_antijoin",
    tags=("join", "reference:I1"),
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    """,
)
def q_new_file_antijoin(spark, sf_dir):
    """Set-difference new-item detection (reference sensors.py:53) as a
    left-anti join: rows in `current` with no match in `seen`. The `seen`
    side is filtered to 'F'-status orders so both sides return a non-empty
    set (every customer has *some* order at sf0.01, which made the
    unfiltered variant a vacuous 0-row check)."""
    seen = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        t(spark, sf_dir, "customer")
        .join(seen, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# --- set ops / distinct / top-k --------------------------------------------


@query(
    "q_set_ops",
    tags=("setop",),
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     UNION
     SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_ops(spark, sf_dir):
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    a = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = customer.where(F.col("c_acctbal") > 5000).select("c_custkey")
    c = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return a.union(b).distinct().exceptAll(c.distinct())


@query(
    "q_distinct",
    tags=("agg",),
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark, sf_dir):
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_topk",
    tags=("topk",),
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def q_topk(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


# --- rollup ------------------------------------------------------------------


@query(
    "q_rollup_agg",
    tags=("agg",),
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup_agg(spark, sf_dir):
    customer = t(spark, sf_dir, "customer")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region"))
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
            F.count("*").alias("n_customers"),
        )
    )


# --- pivot-style conditional aggregation ------------------------------------


@query(
    "q_pivot_counts",
    tags=("agg",),
    oracle="""
    SELECT CAST(DATE '1970-01-01' + CAST(epoch_us(ts) // 86400000000 AS INT) AS VARCHAR)
               AS event_date,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
    FROM events GROUP BY 1
    """,
)
def q_pivot_counts(spark, sf_dir):
    """Conditional-aggregation pivot over event types per UTC day.

    The day key is derived with integer arithmetic on epoch microseconds
    (``unix_micros(ts) div 86_400e6`` → date) rather than
    ``date_trunc``/``date_format`` so the result is identical under ANY
    ``spark.sql.session.timeZone`` — the instant→wall rendering path was the
    one environment-sensitive surface in the whole registry (r2 verdict).
    The DuckDB oracle mirrors the same epoch-day arithmetic.
    """
    e = t(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == et, 1).otherwise(0)).alias(f"n_{et}")
        for et in ["click", "view", "purchase", "signup", "error"]
    ]
    epoch_day = F.expr("unix_micros(ts) div 86400000000").cast("int")
    event_date = F.date_add(F.lit("1970-01-01").cast("date"), epoch_day).cast("string")
    return e.groupBy(event_date.alias("event_date")).agg(*aggs)


# --- SQL front-end -----------------------------------------------------------

_SQL_FRONTEND = """
    SELECT n_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
"""


@query("q_sql_frontend", tags=("sql",), oracle=_SQL_FRONTEND)
def q_sql_frontend(spark, sf_dir):
    """The spark.sql path (SURVEY.md §2.4): testdata tables registered as
    temp views, query text identical to the oracle — proving the ANSI-SQL
    front-end surface end-to-end through Catalyst."""
    from incremental_dagster_delta_spark.tables import register_views

    register_views(spark, sf_dir, ["supplier", "nation"])
    return spark.sql(_SQL_FRONTEND)
