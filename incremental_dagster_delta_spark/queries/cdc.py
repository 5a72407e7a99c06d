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
