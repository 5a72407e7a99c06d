"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``incremental_dagster_delta_spark.queries``;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incremental_dagster_delta_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q5-shaped multi-join + aggregation (broadcast dims, pushed
    filters) — the widest single exercise of the relational surface.
    """
    from incremental_dagster_delta_spark.queries.relational import q_region_revenue

    return q_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; non-SQL-expressible ops are omitted
    (driver records a rows-only check for those)."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
