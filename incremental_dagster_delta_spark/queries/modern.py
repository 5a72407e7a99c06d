"""Modern Spark surfaces: Python UDTFs, the VARIANT type, and lateral
position-aware explosion.

- **UDTF document chunking** — the RAG/training chunking step as a
  Python user-defined table function called through SQL ``LATERAL``.
  UDTFs are row-at-a-time Python (the slow path): the codegen'd
  equivalent is ``sequence + transform + explode`` and is what a 100 TB
  chunker should run; the UDTF registers the API surface and the oracle
  proves both produce identical chunks.
- **VARIANT** — Spark 4's binary semi-structured type: ``parse_json``
  once, then typed ``variant_get`` paths without re-parsing the string
  per access (the schema-on-read upgrade over ``get_json_object``).
- **posexplode** — ordinal-preserving array explosion via the lateral
  generator path; positions survive distribution (no window needed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t, TOKS_SQL

_TOKS_SQL = TOKS_SQL  # canonical tokenizer — registry.py
CHUNK = 10  # tokens per chunk


@query(
    "q_udtf_chunks",
    tags=("llm", "udtf", "sql"),
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(CAST(ceil(len(toks) / {CHUNK}.0) AS BIGINT))) AS ci
      FROM d
    )
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_idx,
           array_to_string(toks[ci*{CHUNK}+1:ci*{CHUNK}+{CHUNK}], ' ') AS chunk,
           CAST(least({CHUNK}, len(toks) - ci*{CHUNK}) AS INT) AS n_tokens
    FROM idx
    """,
)
def q_udtf_chunks(spark, sf_dir):
    """Fixed-size document chunking as a SQL ``LATERAL`` Python UDTF."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int")
    class ChunkDoc:
        def eval(self, doc_id, text):
            toks = [tok for tok in text.lower().split(" ") if tok]
            for i in range(0, len(toks), CHUNK):
                c = toks[i : i + CHUNK]
                yield doc_id, i // CHUNK, " ".join(c), len(c)

    spark.udtf.register("chunk_doc", ChunkDoc)
    t(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_chunks")
    return spark.sql(
        "SELECT c.* FROM docs_for_chunks, "
        "LATERAL chunk_doc(docs_for_chunks.doc_id, docs_for_chunks.text) c"
    )


@query(
    "q_variant_json",
    tags=("events", "llm"),
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def q_variant_json(spark, sf_dir):
    """VARIANT path extraction: parse the JSON payload once into the
    binary VARIANT encoding, then typed ``try_variant_get`` access — at
    scale this beats per-access string re-parsing
    (``get_json_object``, kept as q_json_extract for comparison)."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k_value")
        )
        .groupBy("k_value")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_posexplode",
    tags=("array", "text"),
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
           unnest(toks) AS tok
    FROM d
    """,
)
def q_posexplode(spark, sf_dir):
    """Ordinal-preserving token explosion (positions computed in the
    generator, not reconstructed by a window afterwards)."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    return d.select("doc_id", F.posexplode(toks).alias("pos", "tok"))


@query(
    "q_chunk_docs",
    bench=True,
    tags=("llm", "array"),
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(CAST(ceil(len(toks) / {CHUNK}.0) AS BIGINT))) AS ci
      FROM d
    )
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_idx,
           array_to_string(toks[ci*{CHUNK}+1:ci*{CHUNK}+{CHUNK}], ' ') AS chunk,
           CAST(least({CHUNK}, len(toks) - ci*{CHUNK}) AS INT) AS n_tokens
    FROM idx
    """,
)
def q_chunk_docs(spark, sf_dir):
    """The scale-path chunker: identical semantics to ``q_udtf_chunks``
    (same oracle) but fully codegen'd — ``sequence`` of chunk ordinals
    exploded, ``slice``/``array_join`` per chunk, zero Python in the
    row path. This is the form to run at 100 TB; the UDTF twin exists
    for API parity and the shared oracle proves them interchangeable."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    with_toks = d.select("doc_id", toks.alias("toks"))
    n_chunks = F.ceil(F.size("toks") / F.lit(float(CHUNK))).cast("int")
    ords = F.when(
        F.col("n_chunks") > 0, F.sequence(F.lit(0), F.col("n_chunks") - 1)
    ).otherwise(F.array())
    return (
        with_toks.withColumn("n_chunks", n_chunks)
        .select("doc_id", "toks", F.explode(ords).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice("toks", F.col("chunk_idx") * CHUNK + 1, CHUNK), " "
            ).alias("chunk"),
            F.least(F.lit(CHUNK), F.size("toks") - F.col("chunk_idx") * CHUNK)
            .cast("int")
            .alias("n_tokens"),
        )
    )


# --- recursive CTE ------------------------------------------------------------
#
# Spark 4.1 ships WITH RECURSIVE (SPARK-24497): the SQL front-end's
# iterative closure. The engine executes the recursion as a UnionLoop —
# each step one join/projection over the previous frontier — which is
# exactly the contract-and-union shape graph.py builds by hand for
# connected components; here the SQL planner drives the loop. The
# hierarchy is arithmetic (parent(n) = n DIV 2, the binary-heap chain),
# so both engines replay identical integer ops and the recursion depth
# is log2(max doc_id) ~ 9-13 at test SFs.


@query(
    "q_recursive_cte",
    tags=("sql", "modern"),
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT doc_id, doc_id AS cur, 0 AS depth FROM documents
      UNION ALL
      SELECT doc_id, cur // 2, depth + 1 FROM anc WHERE cur > 1
    )
    SELECT depth, COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM anc WHERE cur <= 1
    GROUP BY depth
    """,
)
def q_recursive_cte(spark, sf_dir):
    """Recursive-CTE ancestor walk: every document climbs the
    binary-heap parent chain (parent = id DIV 2) to the root, and the
    result profiles the hierarchy by depth. Exercises the SQL
    front-end's WITH RECURSIVE end-to-end on the engine.

    Scale shape: the recursion runs O(log N) UnionLoop steps; each step
    is a narrow projection+filter over the previous frontier (no join
    here — the parent is computed, not looked up), so the total work is
    N·log N rows of arithmetic with every step map-only. A lookup-based
    hierarchy (parent column in a table) would make each step one
    hash-join against the broadcast/bucketed parent table — same loop,
    one join per level, the standard org-chart/BOM closure plan. The
    DuckDB oracle runs the identical recursion (integer DIV on both
    engines), so the driver hash-match pins the full closure."""
    from incremental_dagster_delta_spark.tables import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT doc_id, doc_id AS cur, 0 AS depth FROM documents
          UNION ALL
          SELECT doc_id, cur DIV 2 AS cur, depth + 1 AS depth FROM anc WHERE cur > 1
        )
        SELECT depth, COUNT(*) AS n_docs,
               MIN(doc_id) AS min_doc,
               MAX(doc_id) AS max_doc
        FROM anc WHERE cur <= 1
        GROUP BY depth
        """
    )


# --- SQL pipe syntax ------------------------------------------------------------
#
# Spark 4 ships the SQL pipe operators (|>, SPARK-49555): linear
# dataflow-ordered SQL — each stage reads top-to-bottom like the
# DataFrame API while staying pure SQL text. Parity surface: the SAME
# logical plan must come out of the pipe form as the nested-SELECT form
# the oracle runs.


@query(
    "q_sql_pipe",
    tags=("sql", "modern"),
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F' AND l_discount > 0.02
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    """,
)
def q_sql_pipe(spark, sf_dir):
    """The TPC-H-ish priority rollup written in Spark 4 pipe syntax:
    scan |> join |> filter |> aggregate |> filter, one stage per line in
    dataflow order. The parser desugars to the exact relational algebra
    of the classic nested form (the DuckDB oracle), so Catalyst sees the
    same plan — pushdown, broadcast choice, and partial aggregation all
    apply unchanged; syntax is the only thing under test, which is the
    point: the front-end guarantees no plan tax."""
    from incremental_dagster_delta_spark.tables import register_views

    register_views(spark, sf_dir, ["lineitem", "orders"])
    return spark.sql(
        """
        FROM lineitem
        |> JOIN orders ON l_orderkey = o_orderkey
        |> WHERE o_orderstatus = 'F' AND l_discount > 0.02
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
           GROUP BY o_orderpriority
        |> WHERE n_items > 10
        """
    )


# --- collation-aware comparison ---------------------------------------------------
#
# Spark 4 ships collations (SPARK-46830): comparison/grouping semantics
# attached to the STRING TYPE instead of wrapping every predicate in
# lower()/upper() — which pushes down better (a lower(col) = 'x' filter
# defeats column stats; a collated equality doesn't) and can't be
# forgotten on one join arm. The qid mixes case deterministically, then
# groups and filters under UTF8_LCASE; the oracle is the classic
# lower()-everything form — identical results prove the semantics.


@query(
    "q_collation_group",
    tags=("sql", "modern"),
    oracle="""
    SELECT lower(mixed) AS event_type_ci,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS mixed,
             value
      FROM events
    )
    WHERE lower(mixed) <> 'error'
    GROUP BY lower(mixed)
    """,
)
def q_collation_group(spark, sf_dir):
    """Case-insensitive grouping and filtering via the UTF8_LCASE
    collation on a deterministically case-mixed column (even event ids
    uppercased). The grouped representative under a collation is
    whichever spelling the engine keeps — not deterministic — so the
    output key is lower()'d on BOTH engines; the collation still does
    the real work (the GROUP BY and the <> filter run collated, no
    lower() in the grouping key on the Spark side). Scale note: same
    one-aggregation plan as any groupBy — collations change comparison
    semantics, not plan shape; the win at scale is filter pushdown
    surviving (no function wrapped around the column)."""
    from incremental_dagster_delta_spark.tables import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT lower(mixed COLLATE UTF8_LCASE) AS event_type_ci,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                      ELSE event_type END AS mixed,
                 value
          FROM events
        )
        WHERE mixed COLLATE UTF8_LCASE <> 'error'
        GROUP BY mixed COLLATE UTF8_LCASE
        """
    )


# --- MAP-type battery -------------------------------------------------------------
#
# The MAP column type with its higher-order functions (map_from_entries,
# map_filter, transform_values, map explode) — the schema shape
# feature-store rows and sparse per-entity counters actually use. The
# map is built per user from real aggregates, transformed JVM-side, and
# exploded back to rows for the (order-insensitive) driver compare;
# DuckDB builds the same map with map_from_entries and unnests it.


@query(
    "q_map_funcs",
    tags=("sql", "functions"),
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT user_id,
             map_from_entries(list_sort(list(
               {'k': event_type, 'v': cnt}
             ))) AS counts
      FROM per GROUP BY user_id
    )
    SELECT user_id, u.key AS event_type, u.value * 2 AS doubled
    FROM m, unnest(map_entries(counts)) AS t(u)
    WHERE u.value >= 3
    """,
)
def q_map_funcs(spark, sf_dir):
    """Per-user event-type counters carried as a MAP column: built with
    map_from_entries over sorted (type, count) structs, thresholded with
    map_filter, scaled with transform_values — all JVM higher-order
    functions, zero Python — then exploded back to rows. At scale the
    map column is the point: one row per ENTITY with a bounded-enum map
    beats one row per (entity, type) for storage locality and
    single-pass feature reads; the transforms are map-only. Entry order
    inside a map is engine-internal, so both engines SORT the entry
    structs before building and the compare happens on exploded rows."""
    e = t(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("event_type"), F.col("cnt"))))
        ).alias("counts")
    )
    kept = m.select(
        "user_id",
        F.transform_values(
            F.map_filter("counts", lambda k, v: v >= F.lit(3)),
            lambda k, v: v * 2,
        ).alias("counts"),
    )
    return kept.select(
        "user_id", F.explode("counts").alias("event_type", "doubled")
    )


# --- generator null semantics --------------------------------------------------
#
# explode vs explode_outer is the LEFT JOIN vs INNER JOIN of the
# generator world: whether a parent row with an EMPTY or NULL array
# survives the flatten. Pipelines silently lose rows when they pick the
# wrong one (chunking a corpus with explode drops every empty document
# from ALL downstream accounting); this battery pins both semantics
# against DuckDB's plain unnest (inner) and LEFT JOIN LATERAL unnest
# (outer).


@query(
    "q_generator_nulls",
    tags=("sql", "functions"),
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN []
                  WHEN doc_id % 7 = 0 THEN NULL
                  ELSE list_filter(string_split(lower(text), ' '), x -> x <> '')[1:3]
             END AS arr
      FROM documents
    ),
    inner_side AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(DISTINCT doc_id) AS n_docs,
             CAST(0 AS BIGINT) AS n_null_elements
      FROM (SELECT doc_id, unnest(arr) AS el FROM base)
    ),
    outer_side AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(DISTINCT b.doc_id) AS n_docs,
             CAST(SUM(CASE WHEN u.el IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_elements
      FROM base b LEFT JOIN LATERAL (SELECT unnest(b.arr) AS el) u ON TRUE
    )
    SELECT 'inner' AS mode, * FROM inner_side
    UNION ALL
    SELECT 'outer', * FROM outer_side
    """,
)
def q_generator_nulls(spark, sf_dir):
    """Flatten-semantics battery over a corpus whose arrays are
    deterministically EMPTY (doc_id%5), NULL (doc_id%7), or a 3-token
    prefix: explode (inner — empty/null parents vanish) vs explode_outer
    (outer — parents survive with one NULL element). The counts differ
    by exactly the empty+null parent population, which is the row-loss a
    chunking pipeline built on the wrong generator silently eats. Both
    generators are narrow map-side operators at any scale — the
    semantics, not the plan, are under test."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    arr = (
        F.when(F.col("doc_id") % 5 == 0, F.array().cast("array<string>"))
        .when(F.col("doc_id") % 7 == 0, F.lit(None).cast("array<string>"))
        .otherwise(F.slice(toks, 1, 3))
    )
    base = d.select("doc_id", arr.alias("arr"))
    inner = base.select("doc_id", F.explode("arr").alias("el")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.lit(0).cast("long").alias("n_null_elements"),
    )
    outer = base.select("doc_id", F.explode_outer("arr").alias("el")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum(F.when(F.col("el").isNull(), 1).otherwise(0)).cast("long").alias("n_null_elements"),
    )
    return inner.select(F.lit("inner").alias("mode"), "*").unionByName(
        outer.select(F.lit("outer").alias("mode"), "*")
    )
