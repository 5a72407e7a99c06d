"""Change-data-capture flavored operators: snapshot diffing.

Delta's change data feed answers "what changed between versions"; for
plain snapshots the same answer is one full-outer join on the key with
content-hash comparison — ``added`` / ``removed`` / ``changed`` rows,
unchanged rows dropped. At 100 TB both snapshots shuffle once on the
key (or zero times if both are bucketed on it), and comparing md5
digests instead of full rows keeps the join payload at ~16 bytes per
side regardless of row width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

# deterministic synthetic "next version" of documents:
#   doc_id % 17 == 0 → deleted, doc_id % 13 == 0 → text edited,
#   doc_id % 19 == 0 → re-keyed copy inserted (a new row)
_NEW_VERSION_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
    FROM documents WHERE doc_id % 17 <> 0
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 19 = 0
"""


def _new_version(d: DataFrame) -> DataFrame:
    survived = d.where(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.concat("text", F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    inserted = d.where(F.col("doc_id") % 19 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return survived.unionByName(inserted)


@query(
    "q_table_diff",
    tags=("cdc", "incremental"),
    oracle=f"""
    WITH new_v AS ({_NEW_VERSION_SQL}),
    old_h AS (SELECT doc_id, md5(text) AS h FROM documents),
    new_h AS (SELECT doc_id, md5(text) AS h FROM new_v)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM old_h o FULL OUTER JOIN new_h n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h
    """,
)
def q_table_diff(spark, sf_dir):
    """Snapshot diff (CDF-without-a-log): full-outer join of content
    digests on the key → added / removed / changed rows only."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    old_h = d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
    new_h = _new_version(d).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    j = old_h.alias("o").join(
        new_h.alias("n"), F.col("o.doc_id") == F.col("n.doc_id"), "full_outer"
    )
    return (
        j.select(
            F.coalesce("o.doc_id", "n.doc_id").alias("doc_id"),
            F.when(F.col("o.doc_id").isNull(), "added")
            .when(F.col("n.doc_id").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            F.col("o.h").alias("oh"),
            F.col("n.h").alias("nh"),
        )
        .where(
            F.col("oh").isNull() | F.col("nh").isNull() | (F.col("oh") != F.col("nh"))
        )
        .select("doc_id", "change_type")
    )


@query(
    "q_cdc_apply",
    tags=("cdc", "warehouse", "incremental"),
    oracle="""
    WITH snapshot AS (
      -- all price math in exact DECIMAL: ROUND over a DOUBLE diverges
      -- between engines on half-cent boundaries (Spark rounds the
      -- shortest decimal rendering, DuckDB the binary value — a 1-cent
      -- flip caught by the driver-faithful harness, r5)
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
      FROM orders WHERE o_orderkey % 4 <> 3
    ),
    changelog AS (
      -- inserts: the keys missing from the snapshot
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
             'I' AS op, 1 AS seq
      FROM orders WHERE o_orderkey % 4 = 3
      UNION ALL
      -- updates: +10% price on keys = 1 (mod 4); 1.1 is a DECIMAL
      -- literal, so the product and its round stay exact
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DECIMAL(18,2)),
             'U', 2
      FROM orders WHERE o_orderkey % 4 = 1
      UNION ALL
      -- deletes: keys = 2 (mod 4)
      SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(18,2)), 'D', 3
      FROM orders WHERE o_orderkey % 4 = 2
      UNION ALL
      -- late second update on keys = 5 (mod 8): must win over seq-2 'U'
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 2.0, 2) AS DECIMAL(18,2)),
             'U', 4
      FROM orders WHERE o_orderkey % 8 = 5
    ),
    latest AS (
      SELECT o_orderkey, o_custkey, o_totalprice, op,
             row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rk
      FROM changelog
    ),
    effective AS (SELECT * FROM latest WHERE rk = 1)
    SELECT s.o_orderkey,
           COALESCE(e.o_custkey, s.o_custkey) AS o_custkey,
           CAST(COALESCE(e.o_totalprice, s.o_totalprice) AS DOUBLE) AS o_totalprice
    FROM snapshot s LEFT JOIN effective e USING (o_orderkey)
    WHERE e.op IS NULL OR e.op <> 'D'
    UNION ALL
    SELECT e.o_orderkey, e.o_custkey, CAST(e.o_totalprice AS DOUBLE)
    FROM effective e LEFT JOIN snapshot s USING (o_orderkey)
    WHERE s.o_orderkey IS NULL AND e.op <> 'D'
    """,
)
def q_cdc_apply(spark, sf_dir):
    """Changelog APPLY — the consumer half of CDC (q_table_diff is the
    producer half): fold an I/U/D event stream into a snapshot with
    last-writer-wins by sequence number, including a late second update
    that must supersede an earlier one. Plan: one window over the
    changelog keyed on the primary key picks each key's effective
    operation, then ONE full-outer-shaped merge (left join + anti union)
    against the snapshot — the same single-shuffle shape as
    q_upsert_merge, extended with deletes and op ordering. At 100 TB the
    changelog is a day's CDC feed (orders of magnitude smaller than the
    snapshot) and the join partitions on the same key as the stored
    table, so only the feed shuffles."""
    from pyspark.sql import Window

    from decimal import Decimal

    # exact DECIMAL price math throughout — see the oracle comment
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    snapshot = o.where(F.col("o_orderkey") % 4 != 3)
    changelog = (
        o.where(F.col("o_orderkey") % 4 == 3)
        .select("o_orderkey", "o_custkey", "o_totalprice", F.lit("I").alias("op"), F.lit(1).alias("seq"))
        .unionByName(
            o.where(F.col("o_orderkey") % 4 == 1).select(
                "o_orderkey", "o_custkey",
                F.round(F.col("o_totalprice") * F.lit(Decimal("1.1")), 2)
                .cast("decimal(18,2)")
                .alias("o_totalprice"),
                F.lit("U").alias("op"), F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 4 == 2).select(
                "o_orderkey", "o_custkey", "o_totalprice",
                F.lit("D").alias("op"), F.lit(3).alias("seq"),
            )
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 8 == 5).select(
                "o_orderkey", "o_custkey",
                F.round(F.col("o_totalprice") * F.lit(Decimal("2.0")), 2)
                .cast("decimal(18,2)")
                .alias("o_totalprice"),
                F.lit("U").alias("op"), F.lit(4).alias("seq"),
            )
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
    effective = (
        changelog.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1).drop("rk", "seq")
    )
    eff = effective.withColumnsRenamed(
        {"o_custkey": "e_custkey", "o_totalprice": "e_totalprice"}
    )
    kept = (
        snapshot.join(eff, "o_orderkey", "left")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.coalesce("e_custkey", "o_custkey").alias("o_custkey"),
            F.coalesce("e_totalprice", "o_totalprice").cast("double").alias("o_totalprice"),
        )
    )
    inserted = (
        eff.join(snapshot.select("o_orderkey"), "o_orderkey", "left_anti")
        .where(F.col("op") != "D")
        .select(
            "o_orderkey",
            F.col("e_custkey").alias("o_custkey"),
            F.col("e_totalprice").cast("double").alias("o_totalprice"),
        )
    )
    return kept.unionByName(inserted)
