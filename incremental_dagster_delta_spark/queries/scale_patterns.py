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
import os

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

    # project BEFORE the grouped map: applyInPandas ships every column
    # through Arrow into Python, and the UDF reads only (lang, n_chars)
    # — the unprojected frame paid the text payload's transfer for
    # nothing (r15 review)
    d = t(spark, sf_dir, "documents").select("lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        stats, schema="lang string, n_docs long, median_chars double, mean_chars double"
    )


# --- Z-order layout ---------------------------------------------------------

Z_BITS = 8  # 8 bits per dimension -> 16-bit Morton key
Z_BUCKET_SHIFT = 10  # bucket = z >> 10 -> at most 64 buckets


def _zorder_oracle() -> str:
    """DuckDB replica of ``functions.zorder_key``'s bit interleave —
    the same shift/mask terms, so the check is exact integer math."""
    terms = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(Z_BITS)
    )
    return f"""
    WITH ext AS (
      SELECT MIN(l_partkey) AS min_p, MAX(l_partkey) AS max_p,
             MIN(l_suppkey) AS min_s, MAX(l_suppkey) AS max_s
      FROM lineitem
    ), scaled AS (
      SELECT ((l_partkey - min_p) * 255) // (max_p - min_p) AS x,
             ((l_suppkey - min_s) * 255) // (max_s - min_s) AS y
      FROM lineitem, ext
    ), keyed AS (
      SELECT x, y, ({terms}) AS z FROM scaled
    )
    SELECT CAST(z >> {Z_BUCKET_SHIFT} AS BIGINT) AS z_bucket,
           COUNT(*) AS n,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM keyed
    GROUP BY 1
    """


@query("q_zorder_layout", tags=("layout", "scale"), bench=True, oracle=_zorder_oracle())
def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton) clustering audit: scale (l_partkey, l_suppkey)
    to 8-bit ranks, interleave bits into a 16-bit key
    (``functions.zorder_key`` — pure shift/mask arithmetic, whole-stage
    codegen), and report per-bucket extents. Each bucket covers a
    compact rectangle in BOTH dimensions — the property that lets
    parquet min/max stats skip row groups for predicates on either
    column, which is the data-skipping strategy for high-cardinality
    columns at 100 TB where directory partitioning would explode (the
    file-writing counterpart is ``functions.zorder_write``, exercised in
    tests/test_zorder.py). Min/max scaling uses a 1-row broadcast of the
    global extents, and the integer arithmetic is exact on both engines."""
    from incremental_dagster_delta_spark.functions import zorder_key

    li = t(spark, sf_dir, "lineitem")
    ext = li.agg(
        F.min("l_partkey").alias("min_p"),
        F.max("l_partkey").alias("max_p"),
        F.min("l_suppkey").alias("min_s"),
        F.max("l_suppkey").alias("max_s"),
    )
    scaled = li.crossJoin(F.broadcast(ext)).select(
        F.floor((F.col("l_partkey") - F.col("min_p")) * 255 / (F.col("max_p") - F.col("min_p"))).alias("x"),
        F.floor((F.col("l_suppkey") - F.col("min_s")) * 255 / (F.col("max_s") - F.col("min_s"))).alias("y"),
    )
    keyed = scaled.withColumn("z", zorder_key(F.col("x"), F.col("y"), bits=Z_BITS))
    return keyed.groupBy(
        F.shiftright("z", Z_BUCKET_SHIFT).cast("bigint").alias("z_bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


# --- bucketed co-located join -----------------------------------------------


@query(
    "q_bucketed_join",
    tags=("join", "scale"),
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_join(spark, sf_dir):
    """Fact-fact join over bucketed tables: both sides written
    ``bucketBy(8, orderkey).sortBy(orderkey)``, so the sort-merge join
    reads co-located, pre-sorted buckets and the physical plan contains
    ZERO Exchange operators (asserted in tests/test_plans.py). At 100 TB
    this is the pattern for joins you run repeatedly on the same key:
    pay the shuffle once at layout time, never again at query time. The
    bucketed copies are keyed by (scale-factor dir, PROCESS) and reused
    across calls within a session; the pid in the path matters because
    parallel test workers each run their own Spark JVM with its own
    in-memory catalog — two processes passing the tableExists check and
    overwriting ONE shared external path corrupted each other's bucket
    layout mid-read (r15 review). Values are bit-identical to the plain
    join the oracle runs (decimal revenue arithmetic — associative,
    order-free)."""
    import hashlib

    from incremental_dagster_delta_spark.tables import load_table

    digest = hashlib.sha256(f"{sf_dir}|{os.getpid()}".encode()).hexdigest()[:12]
    base = f"/tmp/spark_graft/bucketed_{digest}"
    specs = {
        f"bj_orders_{digest}": ("orders", "o_orderkey"),
        f"bj_lineitem_{digest}": ("lineitem", "l_orderkey"),
    }
    for tbl, (src, key) in specs.items():
        if not spark.catalog.tableExists(tbl):
            (
                load_table(spark, sf_dir, src)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", f"{base}/{tbl}")
                .format("parquet")
                .mode("overwrite")
                .saveAsTable(tbl)
            )
    o = spark.table(f"bj_orders_{digest}")
    li = spark.table(f"bj_lineitem_{digest}")
    # the merge hint pins the sort-merge strategy (a broadcast would
    # bypass the bucket layout); with both sides bucketed+sorted on the
    # key, SMJ needs neither Exchange nor Sort.
    joined = li.hint("merge").join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
    )


# --- skew-salted join --------------------------------------------------------


@query(
    "q_skew_join",
    tags=("join", "skew"),
    bench=True,
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def q_skew_join(spark, sf_dir):
    """Skew-salted join: the fact side gets a uniform salt, the dimension
    side is replicated once per salt value, and the join key becomes
    (suppkey, salt) — a hot supplier's rows now land on N_SALTS reducers
    instead of one. This is the manual fallback for the skew shape AQE's
    skew-join split also targets, and the right pattern when the dim is
    too big to broadcast but cheap to replicate N× (here: replicate
    supplier 8×, spread a hypothetical mega-supplier's lineitems over 8
    tasks). The oracle runs the PLAIN join — the hash check proves
    salting changes the distribution, never the result (decimal revenue:
    associative, order-free)."""
    li = t(spark, sf_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)).cast("int")
    )
    sup = t(spark, sf_dir, "supplier").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
    )
    # pin a shuffle join: at test SF Catalyst would broadcast the dim (and
    # the salt would be moot); the scenario being modeled is a dim above
    # the broadcast threshold, where the join hashes on (key, salt).
    joined = li.join(
        sup.hint("shuffle_hash"),
        (F.col("l_suppkey") == F.col("s_suppkey")) & (li["_salt"] == sup["_salt"]),
    )
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# Coordinated (join-consistent) sampling (round 11)
# --------------------------------------------------------------------------

COORD_SAMPLE_P = 0.1  # keep an order (and ALL its line items) w.p. 1/10


@query(
    "q_coordinated_sample",
    tags=("scale", "sampling", "join"),
    oracle=f"""
    WITH keep AS (
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':coord'), 1, 8))
              AS BIGINT) / 4294967296.0 < {COORD_SAMPLE_P!r}
    ),
    sampled AS (
      SELECT k.o_orderpriority,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev,
             COUNT(*) AS n_items
      FROM lineitem l
      JOIN keep k ON l.l_orderkey = k.o_orderkey
      GROUP BY 1
    ),
    exact AS (
      SELECT o.o_orderpriority,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    )
    SELECT s.o_orderpriority,
           CAST(s.n_items AS BIGINT) AS sampled_items,
           CAST(ROUND(s.rev, 2) AS DOUBLE) AS sampled_revenue,
           CAST(ROUND(s.rev / {COORD_SAMPLE_P!r}, 2) AS DOUBLE) AS estimated_revenue,
           CAST(ROUND(e.rev, 2) AS DOUBLE) AS exact_revenue
    FROM sampled s JOIN exact e USING (o_orderpriority)
    """,
)
def q_coordinated_sample(spark, sf_dir):
    """Join-consistent sampling — the debug-at-1% pattern that does NOT
    break referential integrity: both sides of the orders⨝lineitem join
    are sampled by the SAME deterministic hash of the JOIN KEY
    (md5_uniform(o_orderkey) < p), so a kept order arrives with ALL its
    line items and the sampled join IS a p-sample of the join — unlike
    independent per-table sampling, where a p² fraction of pairs
    survives and every per-order aggregate is silently truncated.
    Estimates scale by 1/p; the exact side rides along as the audit (at
    100 TB you run only the sampled branch — the filter prunes ~90% of
    BOTH scans before the join shuffle). Deterministic md5 sampling
    means the oracle replays the sample row-for-row: sampled, estimated,
    and exact columns all hash-checked. Sums in DECIMAL, rounded once at
    the edge (the repo's money discipline)."""
    from incremental_dagster_delta_spark.functions import md5_uniform

    o = t(spark, sf_dir, "orders")
    keep = o.where(md5_uniform(F.col("o_orderkey"), F.lit("coord")) < COORD_SAMPLE_P).select(
        "o_orderkey", "o_orderpriority"
    )
    li = t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    )
    sampled = (
        li.join(keep, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum(rev).alias("rev"), F.count("*").alias("n_items"))
    )
    exact = (
        li.join(o.select("o_orderkey", "o_orderpriority"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum(rev).alias("rev_exact"))
    )
    return sampled.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        F.col("n_items").cast("long").alias("sampled_items"),
        F.round(F.col("rev"), 2).cast("double").alias("sampled_revenue"),
        F.round(F.col("rev") / COORD_SAMPLE_P, 2).cast("double").alias("estimated_revenue"),
        F.round(F.col("rev_exact"), 2).cast("double").alias("exact_revenue"),
    )
