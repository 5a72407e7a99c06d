"""Sketch / pre-filter operators: the approximate-and-pruning patterns
used when exact full-shuffle answers stop being affordable at 100 TB.

- **HLL distinct counts** (`approx_count_distinct`): register merges are
  commutative, so results are deterministic for fixed data regardless of
  partitioning — but approximate, so the qid reports sketch and exact
  side by side and is checked rows-only (error bound asserted in tests).
- **Semi-join pre-filter**: reduce the probe side's shuffle volume by
  semi-joining it against the (small, broadcast) filtered build-key set
  before the wide join — the hand-rolled form of Spark's runtime filter
  injection (`spark.sql.optimizer.runtime.bloomFilter.enabled`; the
  bloom aggregate itself is not exposed as a public function in this
  build). The pre-filter only removes rows the join would drop anyway,
  so the result stays exact and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t


@query("q_approx_sketches", oracle=None, tags=("sketch", "agg"))
def q_approx_sketches(spark, sf_dir):
    """HLL approximate distinct vs exact, per event_type (rows-only: the
    sketch is approximate by design; tests assert |approx-exact|/exact
    stays within the configured rsd bound)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "q_prefilter_semi_join",
    tags=("sketch", "join"),
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderkey
    """,
)
def q_prefilter_semi_join(spark, sf_dir):
    """Probe-side pruning before the wide join: broadcast the filtered
    build keys, left-semi the fact table against them (map-side, no
    shuffle of dropped rows), then run the exact join + aggregation on
    the survivors. Removes ~80% of lineitem rows from the join shuffle
    here; the pattern generalizes to runtime bloom filters when the key
    set outgrows the broadcast threshold."""
    urgent = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    keys = F.broadcast(urgent.select("o_orderkey").distinct())
    pruned = t(spark, sf_dir, "lineitem").join(
        keys, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    return (
        pruned.join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))
    )
