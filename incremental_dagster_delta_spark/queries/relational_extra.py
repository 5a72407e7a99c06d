"""Additional relational coverage: window-function battery, array
expression battery, and two more TPC-H-shaped queries (min-cost-per-group
and NOT-IN filtering)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incremental_dagster_delta_spark.queries.registry import query, t


@query(
    "q_window_battery",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS spend_quartile,
           CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(last_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS DOUBLE) AS last_price,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_battery(spark, sf_dir):
    """ntile / first_value / last_value / windowed count in one pass —
    all share the per-customer ordering, so Catalyst evaluates them in a
    single Window operator (one shuffle on o_custkey)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_part = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("long").alias("spend_quartile"),
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
        F.last("o_totalprice").over(w_full).cast("double").alias("last_price"),
        F.count("*").over(w_part).cast("long").alias("n_orders"),
    )


@query(
    "q_array_funcs",
    tags=("array", "scalar"),
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(ROUND(embedding[1], 4) AS DOUBLE) AS first_val,
           CAST(ROUND(list_aggregate(embedding[1:8], 'sum'), 4) AS DOUBLE) AS head_sum,
           CAST(ROUND(list_aggregate(embedding, 'max'), 4) AS DOUBLE) AS max_val,
           CAST(ROUND(list_sort(embedding)[1], 4) AS DOUBLE) AS min_via_sort,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array expression battery over ArrayType(FloatType): element
    access, slice+fold, max, sort, filter-count — all codegen'd, no UDF.
    Sums run in double on both engines; results rounded to 4."""
    e = t(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(emb_d, 1), 4).cast("double").alias("first_val"),
        F.round(
            F.aggregate(F.slice(emb_d, 1, 8), F.lit(0.0), lambda a, x: a + x), 4
        ).cast("double").alias("head_sum"),
        F.round(F.array_max(emb_d), 4).cast("double").alias("max_val"),
        F.round(F.element_at(F.array_sort(emb_d), 1), 4).cast("double").alias("min_via_sort"),
        F.size(F.filter(emb_d, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "q_min_cost_supplier",
    tags=("join", "window"),
    oracle="""
    SELECT l_partkey, l_suppkey,
           CAST(ROUND(min_cost, 4) AS DOUBLE) AS min_cost
    FROM (
      SELECT l_partkey, l_suppkey,
             CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE) AS unit_cost,
             MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))
               OVER (PARTITION BY l_partkey) AS min_cost
      FROM lineitem
      WHERE l_quantity > 0
    )
    WHERE unit_cost = min_cost AND l_partkey < 200
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-group minimum selection via a window min
    rather than a correlated subquery re-scan — one shuffle on the group
    key, no second pass over the fact table. Unit cost is a single
    double division (no accumulation), so double math is deterministic
    on both engines; decimal division would differ in result scale."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    unit = F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")
    w = Window.partitionBy("l_partkey")
    scored = li.select(
        "l_partkey", "l_suppkey", unit.alias("unit_cost")
    ).withColumn("min_cost", F.min("unit_cost").over(w))
    return (
        scored.where((F.col("unit_cost") == F.col("min_cost")) & (F.col("l_partkey") < 200))
        .select("l_partkey", "l_suppkey", F.round("min_cost", 4).cast("double").alias("min_cost"))
    )


@query(
    "q_notin_filter",
    tags=("join", "setop"),
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey NOT IN (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 40
    )
    """,
)
def q_notin_filter(spark, sf_dir):
    """NOT IN as a null-safe anti join (the testdata keys are non-null,
    so NOT IN ≡ NOT EXISTS here; Catalyst plans a left-anti join). The
    subquery is narrowed so the answer is non-empty at sf0.01."""
    returned = (
        t(spark, sf_dir, "lineitem")
        .where((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 40))
        .select("l_partkey")
    )
    return (
        t(spark, sf_dir, "part")
        .join(returned, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    )
