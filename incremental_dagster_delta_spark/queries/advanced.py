"""Advanced relational operators beyond the reference's surface
(SURVEY.md §2.4 extension set): as-of join, range join, lead/lag, cube,
string functions, exact quantiles, correlated-subquery SQL.

The as-of join is the showcase "operator Spark lacks, composed from
DataFrame primitives" (option (a) of the custom-operator ladder): a
union + partitioned window with ``last(ignorenulls)`` instead of a
per-key merge — one shuffle on the join key, no skew beyond the key
distribution, no Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incremental_dagster_delta_spark.queries.registry import query, t

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


# --- q_asof_join: most recent click at-or-before each purchase --------------


@query(
    "q_asof_join",
    tags=("join", "asof"),
    bench=True,
    oracle="""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of (point-in-time) join, composed Spark-first: tag clicks and
    purchases, union, and carry the latest click timestamp forward with a
    per-user ordered window (``last`` with ignorenulls). Equal
    timestamps order the click first, matching ASOF's ``<=``. Cost: one
    shuffle on user_id — same as any per-key merge — with no cross
    product and no Python."""
    e = t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("tag"), F.col("ts").alias("click_ts"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("tag"), F.lit(None).cast("timestamp").alias("click_ts"), "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.where(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.date_format("last_click_ts", _TS_FMT).alias("click_ts"),
    )


# --- q_range_join: banded non-equi join against a broadcast dim -------------

_BINS = [(0.0, 10.0, "small"), (10.0, 50.0, "medium"), (50.0, 200.0, "large"), (200.0, 1e9, "huge")]
_BINS_SQL = ", ".join(f"({lo}, {hi}, '{label}')" for lo, hi, label in _BINS)


@query(
    "q_range_join",
    tags=("join", "range"),
    oracle=f"""
    SELECT b.label AS bin_label,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN (VALUES {_BINS_SQL}) AS b(lo, hi, label)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.label
    """,
)
def q_range_join(spark, sf_dir):
    """Range (banded non-equi) join: facts against a tiny broadcast
    range dimension. Compiles to a BroadcastNestedLoopJoin bounded by
    |bins| per row — the right plan when the dim is a handful of bands;
    for large range dims the IVF-style bucket-prejoin in similarity.py
    is the scale pattern."""
    from incremental_dagster_delta_spark.tables import literal_df

    e = t(spark, sf_dir, "events")
    bins = F.broadcast(
        literal_df(spark, _BINS, "lo double, hi double, label string")
    )
    return (
        e.join(bins, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy(F.col("label").alias("bin_label"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


# --- q_lead_lag: offset window functions ------------------------------------


@query(
    "q_lead_lag",
    tags=("window",),
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(lag(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
           CAST(lead(o_totalprice) OVER w AS DOUBLE) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_lead_lag(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
    )


# --- q_cube_agg: CUBE grouping sets -----------------------------------------


@query(
    "q_cube_agg",
    tags=("agg",),
    oracle="""
    SELECT c_mktsegment, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    """,
)
def q_cube_agg(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


# --- q_string_funcs: string expression battery ------------------------------


@query(
    "q_string_funcs",
    tags=("scalar",),
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           concat_ws('/', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_building,
           CAST(length(trim(c_name)) AS BIGINT) AS name_len
    FROM customer
    """,
)
def q_string_funcs(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).cast("long").alias("lev_building"),
        F.length(F.trim(F.col("c_name"))).cast("long").alias("name_len"),
    )


# --- q_quantiles: exact median / p90 per group ------------------------------


@query(
    "q_quantiles",
    tags=("agg",),
    oracle="""
    SELECT event_type,
           CAST(ROUND(median(value), 4) AS DOUBLE) AS median_value,
           CAST(ROUND(quantile_cont(value, 0.9), 4) AS DOUBLE) AS p90_value
    FROM events
    GROUP BY event_type
    """,
)
def q_quantiles(spark, sf_dir):
    """Exact (interpolated) median and p90 — both engines implement
    continuous interpolation; at 100 TB swap to approx_percentile with a
    documented error bound."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.median("value"), 4).cast("double").alias("median_value"),
        F.round(F.percentile("value", F.lit(0.9)), 4).cast("double").alias("p90_value"),
    )


# --- q_exists_sql: correlated subqueries through the SQL front-end ----------

_EXISTS_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_suppkey = s_suppkey
          AND l_quantity >= 49
          AND l_shipdate > TIMESTAMP '2001-06-01 00:00:00'
    )
"""


@query("q_exists_sql", tags=("sql", "join"), oracle=_EXISTS_SQL)
def q_exists_sql(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS through spark.sql — Catalyst
    rewrites them to semi/anti joins (no per-row subquery execution)."""
    from incremental_dagster_delta_spark.tables import register_views

    register_views(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(_EXISTS_SQL)


# --- q_regex_parse: regex extraction / replacement / counting ---------------


@query(
    "q_regex_parse",
    tags=("scalar", "text"),
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '#([0-9]+)$', 1) AS BIGINT) AS name_num,
           regexp_replace(c_name, '[0-9]', '', 'g') AS name_root,
           CASE WHEN regexp_matches(c_name, '#000') THEN 1 ELSE 0 END AS zero_padded,
           CAST(len(regexp_extract_all(c_name, '0')) AS BIGINT) AS n_zeros
    FROM customer
    """,
)
def q_regex_parse(spark, sf_dir):
    """Regex battery — the log/ID-parsing workhorses (extract group,
    global replace, match test, occurrence count), all JVM-side codegen.
    Note the dialect trap pinned here: Spark ``regexp_replace`` is
    global by default, DuckDB needs the explicit ``'g'`` flag."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"#([0-9]+)$", 1).cast("long").alias("name_num"),
        F.regexp_replace("c_name", r"[0-9]", "").alias("name_root"),
        F.when(F.col("c_name").rlike("#000"), 1).otherwise(0).alias("zero_padded"),
        F.regexp_count("c_name", F.lit("0")).cast("long").alias("n_zeros"),
    )


# --- q_grouping_sets: arbitrary grouping-set combinations -------------------

_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM {table}
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query(
    "q_grouping_sets",
    tags=("agg", "sql"),
    oracle=_GROUPING_SETS_SQL.format(table="lineitem"),
)
def q_grouping_sets(spark, sf_dir):
    """Arbitrary GROUPING SETS (the general form cube/rollup
    specialize), with GROUPING() flags disambiguating aggregated-away
    nulls from data nulls. Catalyst expands the sets into one Expand +
    single aggregation — the fact table is scanned once regardless of
    how many sets are requested."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(_GROUPING_SETS_SQL.format(table="li_gs"))


# --- LATERAL correlated subquery ---------------------------------------------

_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey,
           CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
"""


@query("q_lateral_topn", tags=("sql", "join", "subquery"), oracle=_LATERAL_SQL)
def q_lateral_topn(spark, sf_dir):
    """LATERAL correlated subquery (SQL:1999 / Spark 4 lateral join):
    top-2 orders per customer expressed as a per-row subquery instead of
    a window — the form ad-hoc SQL users write, and the identical
    SQL text runs on both engines. Catalyst DECORRELATES it into the
    same shuffle + per-key limit a window formulation plans (no
    nested-loop re-execution per customer row), so the lateral surface
    costs nothing extra at 100 TB; q_rank_in_group is the explicit
    window twin of this query."""
    from incremental_dagster_delta_spark.tables import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_LATERAL_SQL)
