"""Warehouse-maintenance query shapes: SCD Type-2 history and MERGE upsert.

The reference's write path gets row-level upserts from Delta transactions
(``/root/reference/ingest_example/delta_io.py:112-116``); the *query*
shapes a warehouse user builds on top of them — slowly-changing-dimension
history and MERGE INTO reconciliation — are pure relational programs, so
they live here as oracle-checked qids (the engine-side write-path twin is
``tableio.merge_partition``, pinned by tests/test_merge.py).

Both are deterministic reconstructions from the TPC-H-ish tables: change
events are derived from the tables themselves (keys mod N), so Spark and
DuckDB replay the identical history with no RNG and no side files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

# --- SCD Type-2 --------------------------------------------------------------

# Two deterministic change waves over the customer dimension: every 7th
# key changes market segment in 1995, every 21st changes again in 1998 —
# so %21 keys carry a 3-version chain, %7 keys a 2-version chain.
_SCD2_SQL = """
    WITH ev AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment,
             '1992-01-01' AS valid_from
      FROM customer
      UNION ALL
      SELECT c_custkey, 'SEG-MOVED1-' || CAST(c_custkey AS VARCHAR), '1995-06-01'
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, 'SEG-MOVED2-' || CAST(c_custkey AS VARCHAR), '1998-01-01'
      FROM customer WHERE c_custkey % 21 = 0
    )
    SELECT custkey, segment, valid_from,
           lead(valid_from) OVER w AS valid_to,
           lead(valid_from) OVER w IS NULL AS is_current
    FROM ev
    WINDOW w AS (PARTITION BY custkey ORDER BY valid_from)
"""


@query("q_scd2_merge", tags=("warehouse",), bench=True, oracle=_SCD2_SQL)
def q_scd2_merge(spark, sf_dir):
    """SCD Type-2 dimension history: union the initial snapshot with the
    change-event waves, then close each version with the next version's
    effective date (``lead`` over the per-key timeline). One shuffle on
    the dimension key; at 100 TB the dimension is the small table by
    definition, and incremental maintenance appends only the changed
    keys' rows — the full-history window never re-runs over unchanged
    keys (their lead() is unaffected). ISO date strings order
    lexically = chronologically, so no timezone semantics are involved.
    """
    from pyspark.sql.window import Window

    c = t(spark, sf_dir, "customer")
    initial = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").alias("valid_from"),
    )
    wave1 = c.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.concat(F.lit("SEG-MOVED1-"), F.col("c_custkey").cast("string")).alias("segment"),
        F.lit("1995-06-01").alias("valid_from"),
    )
    wave2 = c.where(F.col("c_custkey") % 21 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.concat(F.lit("SEG-MOVED2-"), F.col("c_custkey").cast("string")).alias("segment"),
        F.lit("1998-01-01").alias("valid_from"),
    )
    ev = initial.unionByName(wave1).unionByName(wave2)
    w = Window.partitionBy("custkey").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w)
    return ev.select(
        "custkey",
        "segment",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# --- MERGE INTO upsert --------------------------------------------------------

_UPSERT_SQL = """
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ),
    source AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice + 1.5 AS o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' AND o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    )
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
           COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
           CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                WHEN s.o_orderkey IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action
    FROM target t FULL JOIN source s ON t.o_orderkey = s.o_orderkey
"""


@query("q_upsert_merge", tags=("warehouse",), oracle=_UPSERT_SQL)
def q_upsert_merge(spark, sf_dir):
    """MERGE INTO as a query: a snapshot (orders before 1997) reconciled
    against a change feed (repriced updates for every 10th key + all
    post-1997 inserts) via one full-outer join on the key — matched rows
    take the source version, unmatched-target rows are kept, and
    unmatched-source rows are inserts; ``merge_action`` tags which arm
    fired. This is exactly the join Delta's MERGE plans under the hood.
    At 100 TB the change feed is normally ≪ the snapshot, so the full
    outer degrades to a broadcast-able right side; when both sides are
    huge the join shuffles once on the key — no row explosion, and AQE
    handles key skew. Write-path twin: ``tableio.merge_partition``.
    """
    o = t(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    target = o.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.where((F.col("o_orderdate") < cutoff) & (F.col("o_orderkey") % 10 == 0)).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1.5).alias("o_totalprice"),
    )
    inserts = o.where(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    source = updates.unionByName(inserts)
    tt, ss = target.alias("t"), source.alias("s")
    joined = tt.join(ss, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "full")
    return joined.select(
        F.coalesce(F.col("s.o_orderkey"), F.col("t.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("s.o_orderstatus"), F.col("t.o_orderstatus")).alias("o_orderstatus"),
        F.coalesce(F.col("s.o_totalprice"), F.col("t.o_totalprice")).alias("o_totalprice"),
        F.when(F.col("t.o_orderkey").isNull(), F.lit("insert"))
        .when(F.col("s.o_orderkey").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("merge_action"),
    )


@query(
    "q_column_stats",
    tags=("warehouse",),
    oracle="""
    SELECT 'l_quantity' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv,
           CAST(ROUND(MIN(l_quantity), 4) AS DOUBLE) AS min_val,
           CAST(ROUND(MAX(l_quantity), 4) AS DOUBLE) AS max_val,
           CAST(ROUND(AVG(l_quantity), 4) AS DOUBLE) AS avg_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_extendedprice) AS BIGINT),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           CAST(ROUND(MIN(l_extendedprice), 4) AS DOUBLE),
           CAST(ROUND(MAX(l_extendedprice), 4) AS DOUBLE),
           CAST(ROUND(AVG(l_extendedprice), 4) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_discount) AS BIGINT),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           CAST(ROUND(MIN(l_discount), 4) AS DOUBLE),
           CAST(ROUND(MAX(l_discount), 4) AS DOUBLE),
           CAST(ROUND(AVG(l_discount), 4) AS DOUBLE)
    FROM lineitem
    """,
)
def q_column_stats(spark, sf_dir):
    """ANALYZE-style column statistics (row/non-null/NDV/min/max/avg) for
    the optimizer's cost model — the warehouse cataloging pass. All three
    columns' stats come from ONE scan: a single groupBy().agg() computes
    every aggregate, then a stack() unpivot reshapes to one row per
    column. Exact NDV here (hash-checkable); at 100 TB swap
    count_distinct for approx_count_distinct and keep the same plan
    shape."""
    li = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.round(F.min(c), 4).cast("double").alias(f"{c}__min_val"),
            F.round(F.max(c), 4).cast("double").alias(f"{c}__max_val"),
            F.round(F.avg(c), 4).cast("double").alias(f"{c}__avg_val"),
        ]
    wide = li.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__n_rows, {c}__n_nonnull, {c}__ndv, {c}__min_val, {c}__max_val, {c}__avg_val"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(column_name, n_rows, n_nonnull, ndv, min_val, max_val, avg_val)"
        )
    )
