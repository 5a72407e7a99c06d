"""_distributed_ntile: bit-equivalence with SQL ntile for any total
order, including ties, descending keys, and n < buckets — plus the
plan property it exists for (no un-partitioned Window over the data)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incremental_dagster_delta_spark.queries.analytics import _distributed_ntile


def _case(spark, rows, nt, order_cols_fn):
    df = spark.createDataFrame(rows, "id long, key long")
    got = {
        r["id"]: r["bucket"]
        for r in _distributed_ntile(df, nt, order_cols_fn(), "bucket").collect()
    }
    expect = {
        r["id"]: r["bucket"]
        for r in df.select(
            "id", F.ntile(nt).over(Window.orderBy(*order_cols_fn())).cast("long").alias("bucket")
        ).collect()
    }
    assert got == expect


def test_matches_window_ntile_with_ties(spark):
    # 103 rows, heavy key ties (key = i % 7), id tiebreak
    rows = [(i, i % 7) for i in range(103)]
    _case(spark, rows, 4, lambda: [F.col("key"), F.col("id")])


def test_matches_window_ntile_desc(spark):
    rows = [(i, (i * 13) % 11) for i in range(57)]
    _case(spark, rows, 5, lambda: [F.col("key").desc(), F.col("id")])


def test_fewer_rows_than_buckets(spark):
    rows = [(0, 9), (1, 3), (2, 7)]
    _case(spark, rows, 4, lambda: [F.col("key"), F.col("id")])


def test_no_unpartitioned_window_over_data(spark):
    """The point of the helper: the data-bearing window must be
    partitioned (by _pid); the only global-order windows run over the
    numPartitions-row offsets table. Assert every windowspecdefinition
    that orders by data columns also carries the _pid partition."""
    df = spark.createDataFrame([(i, i % 7) for i in range(103)], "id long, key long")
    out = _distributed_ntile(df, 4, [F.col("key"), F.col("id")], "bucket")
    plan = str(out._jdf.queryExecution().analyzed)
    for line in plan.split("\n"):
        if "row_number()" in line:
            assert "_pid" in line.split("windowspecdefinition")[1][:80], line
