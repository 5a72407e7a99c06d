"""Scale-pattern qids: skew-salted aggregation and the grouped-map
(applyInPandas) surface.

Salting is the manual counterpart to AQE's skew-join splitting: when one
group key carries a disproportionate share of rows, a direct groupBy
funnels it through one reducer. The salted form aggregates on
(key, salt) first — spreading the hot key over N reducers — then merges
the partials. The qid proves the two-stage form is *exactly* equal to
the direct aggregation (the oracle computes the direct form).
"""

# No `from __future__ import annotations` (pandas-typed applyInPandas).
import pandas as pd
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

N_SALTS = 8


@query(
    "q_salted_agg",
    tags=("agg", "skew"),
    oracle="""
    SELECT l_suppkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q_salted_agg(spark, sf_dir):
    """Two-stage salted aggregation: partial agg on (key, salt), then
    merge partials per key. Decimal sums are associative, so the result
    is bit-identical to the direct groupBy the oracle runs."""
    li = t(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)))
    partial = salted.groupBy("l_suppkey", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pq"),
    )
    return partial.groupBy("l_suppkey").agg(
        F.sum("pn").alias("n"),
        F.sum("pq").cast("double").alias("total_qty"),
    )


@query(
    "q_sql_udf",
    tags=("sql", "pandas_udf"),
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def q_sql_udf(spark, sf_dir):
    """UDF registry surface (SURVEY.md §2.4): a vectorized pandas_udf
    registered into the SQL function catalog and invoked from spark.sql
    text. Arrow-batched — not a per-row Python call."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def token_count(texts: pd.Series) -> pd.Series:
        return texts.str.count(" ") + 1

    spark.udf.register("token_count", token_count)
    from incremental_dagster_delta_spark.tables import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql("SELECT doc_id, token_count(text) AS n_tokens FROM documents")


@query(
    "q_grouped_pandas",
    tags=("pandas", "agg"),
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(ROUND(median(n_chars), 4) AS DOUBLE) AS median_chars,
           CAST(ROUND(avg(n_chars), 4) AS DOUBLE) AS mean_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_grouped_pandas(spark, sf_dir):
    """Grouped-map applyInPandas (SURVEY.md §2.4 UDF surface): one pandas
    frame per group, numpy statistics inside — the pattern for per-group
    model scoring / fitting that built-ins can't express. Each group is
    one Arrow batch; group cardinality (5 langs here, usually thousands)
    bounds parallelism, and no group may exceed executor memory."""
    import numpy as np

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        chars = pdf["n_chars"].to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "median_chars": [round(float(np.median(chars)), 4)],
                "mean_chars": [round(float(np.mean(chars)), 4)],
            }
        )

    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").applyInPandas(
        stats, schema="lang string, n_docs long, median_chars double, mean_chars double"
    )
