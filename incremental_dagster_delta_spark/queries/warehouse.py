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


# --- declarative data-quality expectations -----------------------------------

# (rule_name, SQL predicate counting a VIOLATION). The thresholds are
# deliberately warn-level (tighter than the data's hard invariants) so the
# report carries non-trivial, data-dependent counts — an all-zero report
# would hash-check nothing.
_LINEITEM_RULES = [
    ("lineitem.quantity_at_most_40", "l_quantity > 40"),
    ("lineitem.discount_at_most_5pct", "l_discount > 0.05"),
    ("lineitem.tax_nonnegative", "l_tax < 0"),
    ("lineitem.returnflag_in_domain", "l_returnflag NOT IN ('A','N','R')"),
]
_ORDERS_RULES = [
    ("orders.totalprice_above_5000", "o_totalprice <= 5000"),
    ("orders.orderdate_before_1999", "o_orderdate >= '1999-01-01'"),
]


def _expectations_oracle() -> str:
    per_table = []
    for rule, pred in _LINEITEM_RULES:
        per_table.append(
            f"SELECT '{rule}' AS rule_name,"
            f" CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,"
            " CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem"
        )
    for rule, pred in _ORDERS_RULES:
        per_table.append(
            f"SELECT '{rule}' AS rule_name,"
            f" CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,"
            " CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders"
        )
    per_table.append(
        "SELECT 'orders.orderkey_unique' AS rule_name,"
        " CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations,"
        " CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders"
    )
    per_table.append(
        "SELECT 'lineitem.orderkey_references_orders' AS rule_name,"
        " CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,"
        " CAST(COUNT(*) AS BIGINT) AS n_rows"
        " FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey"
    )
    return " UNION ALL ".join(per_table)


@query("q_expectations", tags=("warehouse", "quality"), bench=True, oracle=_expectations_oracle())
def q_expectations(spark, sf_dir):
    """Declarative data-quality expectation engine (the dbt-test /
    Deequ-style contract check every warehouse and training-data intake
    runs before publishing a table). Each rule is a named predicate; the
    report is (rule_name, n_violations, n_rows).

    Scale shape: ALL rules against one table are evaluated in a SINGLE
    scan via conditional aggregation (sum-of-CASE — map-side combined,
    one 1-row result per table, no shuffle of data rows); uniqueness is
    count-vs-distinct in the same pass; referential integrity is one
    left join on the key (shuffle join at 100 TB; the orphan count
    aggregates map-side). Adding a rule adds a column to the agg, not a
    scan — rule count is O(1) in passes over the data."""
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")

    def _counts(df, rules):
        aggs = [
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(f"v{i}")
            for i, (_, pred) in enumerate(rules)
        ] + [F.count("*").alias("n_rows")]
        wide = df.agg(*aggs)
        stacked = ", ".join(f"'{rule}', v{i}, n_rows" for i, (rule, _) in enumerate(rules))
        return wide.select(
            F.expr(f"stack({len(rules)}, {stacked}) AS (rule_name, n_violations, n_rows)")
        )

    li_report = _counts(li, _LINEITEM_RULES)
    od_report = _counts(od, _ORDERS_RULES)
    unique = od.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("n_violations"),
        F.count("*").alias("n_rows"),
    ).select(F.lit("orders.orderkey_unique").alias("rule_name"), "n_violations", "n_rows")
    ri = (
        li.select("l_orderkey")
        .join(od.select("o_orderkey"), li.l_orderkey == od.o_orderkey, "left")
        .agg(
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.lit("lineitem.orderkey_references_orders").alias("rule_name"),
            "n_violations",
            "n_rows",
        )
    )
    return li_report.unionAll(od_report).unionAll(unique).unionAll(ri)


# --- join-key skew diagnostics -----------------------------------------------

_SKEW_COLS = [("lineitem", "l_suppkey"), ("lineitem", "l_partkey"), ("orders", "o_custkey")]


def _skew_oracle() -> str:
    parts = []
    for tbl, col in _SKEW_COLS:
        parts.append(f"""
        SELECT '{tbl}.{col}' AS key_col,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
               CAST(MAX(kn) AS BIGINT) AS top_key_rows,
               CAST(ROUND(MAX(kn) * 1.0 / COUNT(*), 6) AS DOUBLE) AS top_key_share,
               CAST(ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT {col}), 4) AS DOUBLE) AS avg_rows_per_key
        FROM (SELECT {col}, COUNT(*) OVER (PARTITION BY {col}) AS kn FROM {tbl})
        """)
    return " UNION ALL ".join(parts)


@query("q_skew_report", tags=("warehouse", "scale"), oracle=_skew_oracle())
def q_skew_report(spark, sf_dir):
    """Join-key skew diagnostics — the planning pass that decides whether
    a key needs salting (q_skew_join), AQE skew splitting, or is safe to
    shuffle plainly: per candidate join column, NDV, the hottest key's
    row count and share, and mean rows/key. Per column this is ONE
    grouped count (map-side combined) reduced to a 1-row summary — at
    100 TB the report costs one scan per column (or one multi-aggregate
    scan when columns share a table), and nothing wide ever shuffles."""
    rows = []
    for tbl, col in _SKEW_COLS:
        d = t(spark, sf_dir, tbl)
        per_key = d.groupBy(col).agg(F.count("*").alias("kn"))
        # ndv counts NON-NULL group keys (F.count(col) over the group
        # rows) — the oracle's COUNT(DISTINCT col) excludes NULLs, and a
        # groupBy count("*") would silently count the NULL group as one
        # extra "value" on any nullable join column (r15 review). The
        # NULL group still participates in n_rows and top_key_*: NULL is
        # often the hottest "key" and the diagnostic must surface it.
        rows.append(
            per_key.agg(
                F.lit(f"{tbl}.{col}").alias("key_col"),
                F.sum("kn").cast("long").alias("n_rows"),
                F.count(F.col(col)).cast("long").alias("ndv"),
                F.max("kn").cast("long").alias("top_key_rows"),
                F.round(F.max("kn") / F.sum("kn"), 6).cast("double").alias("top_key_share"),
                F.round(F.sum("kn") / F.count(F.col(col)), 4).cast("double").alias("avg_rows_per_key"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# --- point-in-time (as-of) dimension lookup over SCD2 history ----------------

_PIT_SQL = f"""
    WITH hist AS ({_SCD2_SQL})
    SELECT h.segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN hist h
      ON o.o_custkey = h.custkey
     AND CAST(o.o_orderdate AS DATE) >= CAST(h.valid_from AS DATE)
     AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < CAST(h.valid_to AS DATE))
    WHERE h.segment LIKE 'SEG-MOVED%'
    GROUP BY h.segment
"""


@query("q_pit_join", tags=("warehouse", "join"), oracle=_PIT_SQL)
def q_pit_join(spark, sf_dir):
    """Point-in-time dimension lookup: each order joins the SCD2
    customer-history VERSION that was valid on its order date
    ([valid_from, valid_to) interval containment) — the correct way to
    attribute facts to slowly-changing attributes; joining the current
    dimension instead silently rewrites history. Revenue per moved-to
    segment proves version selection: a %7 customer's pre-1995 orders
    must land on the original segment, not the 1995 one.

    Scale shape: an equi-join on the customer key carries the interval
    predicate as a residual filter — each fact meets only its own key's
    few versions (≤3 here), so there is no range-join explosion, and the
    strategy degrades gracefully: broadcast while the history fits (as
    here), plain shuffle join on the key when it doesn't — the residual
    rides along either way. ISO date strings compare as dates on both
    engines."""
    from incremental_dagster_delta_spark.queries.warehouse import q_scd2_merge

    o = t(spark, sf_dir, "orders")
    hist = q_scd2_merge(spark, sf_dir)
    od = F.col("o_orderdate").cast("date")
    joined = o.join(
        F.broadcast(hist),
        (F.col("o_custkey") == F.col("custkey"))
        & (od >= F.col("valid_from").cast("date"))
        & (F.col("valid_to").isNull() | (od < F.col("valid_to").cast("date"))),
    )
    return (
        joined.where(F.col("segment").startswith("SEG-MOVED"))
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


# --- quarantine split via the quality gate engine ----------------------------

_QUAR_RULES = {
    "qty_le_40": "l_quantity <= 40",
    "disc_le_5pct": "l_discount <= 0.05",
}

_QUAR_ORACLE = """
    SELECT
      CASE WHEN l_quantity <= 40 AND l_discount <= 0.05 THEN 'good' ELSE 'quarantine' END
        AS stream,
      COALESCE(array_to_string(list_sort(
        (CASE WHEN l_quantity <= 40 THEN [] ELSE ['qty_le_40'] END)
        || (CASE WHEN l_discount <= 0.05 THEN [] ELSE ['disc_le_5pct'] END)), ','), '')
        AS violations,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1, 2
"""


@query("q_quarantine_split", tags=("warehouse", "quality"), oracle=_QUAR_ORACLE)
def q_quarantine_split(spark, sf_dir):
    """Quarantine routing via the quality-gate engine (``quality.split``
    — the Dagster asset-check / Delta CHECK parity layer): rows split
    into a clean stream and a quarantine stream that carries the array
    of violated rule names, reported here as counts per (stream,
    violation-set). Tagging is ONE projection over the scan (no per-rule
    jobs — quality.py's contract); the report is one narrow groupBy. The
    oracle recomputes the same routing declaratively, so the hash check
    pins the engine's tagging semantics, including multi-rule rows."""
    from incremental_dagster_delta_spark.quality import split

    frames = split(t(spark, sf_dir, "lineitem"), _QUAR_RULES)
    good = frames.good.select(
        F.lit("good").alias("stream"), F.lit("").alias("violations")
    )
    quar = frames.quarantine.select(
        F.lit("quarantine").alias("stream"),
        F.array_join(F.array_sort("_violations"), ",").alias("violations"),
    )
    return good.unionAll(quar).groupBy("stream", "violations").agg(F.count("*").alias("n"))


# --- deletion vectors ---------------------------------------------------------
#
# Row-level soft deletes without file rewrites: the Delta Lake
# deletion-vector lifecycle (mark → anti-join read → purge → watermark)
# over this engine's parquet+marker table layout. The full protocol and
# crash story live on tableio.DeletionVectors; this qid replays the
# WHOLE lifecycle deterministically and checks the final served state
# against the predicate algebra it must equal.


@query(
    "q_deletion_vectors",
    tags=("sink", "incremental", "warehouse"),
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE NOT (doc_id % 7 = 0 OR doc_id % 11 = 3 OR doc_id % 13 = 5)
    GROUP BY source
    """,
)
def q_deletion_vectors(spark, sf_dir):
    """Deletion-vector lifecycle end-to-end: load documents into a
    source-partitioned table, mark doc_id%7 deleted (batch 1) and
    doc_id%11==3 (batch 2), REPLAY batch 2 (exactly-once marker: no-op)
    and re-mark batch 1's keys under a fresh id (set union: no-op),
    PURGE (bakes both into the files, advances the watermark), then
    mark doc_id%13==5 post-purge (applies via the read anti-join on
    top of the rewritten files). The served aggregate must equal the
    oracle's one-shot predicate — deletes compose across marker-replay,
    set-replay, purge, and post-purge batches exactly like a single
    DELETE WHERE. Scale: each mark is a keys-only append; the read
    anti-join's DV side is small until purge folds it (AQE broadcasts
    it); purge rewrites partitions crash-atomically. Engine seams
    (crash mid-purge, corrupt watermark, empty batch) are pinned in
    tests/test_deletion_vectors.py."""
    import os
    import shutil
    import tempfile

    from incremental_dagster_delta_spark.tableio import DeletionVectors, PartitionedTable

    docs = t(spark, sf_dir, "documents")
    tdir = tempfile.mkdtemp(prefix="qdv_")
    try:
        base = PartitionedTable(spark, os.path.join(tdir, "t"), ["source"])
        base.append_batch(docs, 0)
        dv = DeletionVectors(base, "doc_id")
        dv.mark_deleted(docs.where(F.col("doc_id") % 7 == 0).select("doc_id"), 1)
        dv.mark_deleted(docs.where(F.col("doc_id") % 11 == 3).select("doc_id"), 2)
        dv.mark_deleted(docs.where(F.col("doc_id") % 11 == 3).select("doc_id"), 2)  # marker replay
        dv.mark_deleted(docs.where(F.col("doc_id") % 7 == 0).select("doc_id"), 3)  # set replay
        dv.purge()
        dv.mark_deleted(docs.where(F.col("doc_id") % 13 == 5).select("doc_id"), 4)
        out = (
            dv.read()
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


# --- change data feed ------------------------------------------------------------
#
# Delta CDF / table_changes parity: the row-level change log between
# two versions, derived from the layout itself (b{id}- file prefixes =
# insert versions; DV sidecar batches = delete versions) — no extra
# write-path cost, exactly like Delta's. The deterministic version
# script below makes every change event a pure predicate of doc_id, so
# the DuckDB oracle is the same UNION of predicates.


@query(
    "q_change_data_feed",
    tags=("sink", "incremental", "warehouse", "cdc"),
    oracle="""
    SELECT doc_id, source, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, source, 'delete', 2 FROM documents
    WHERE doc_id % 7 = 0 AND doc_id % 3 IN (0, 1)
    UNION ALL
    SELECT doc_id, source, 'insert', 3 FROM documents WHERE doc_id % 3 = 2
    UNION ALL
    SELECT doc_id, source, 'delete', 4 FROM documents
    WHERE doc_id % 11 = 3 AND NOT (doc_id % 7 = 0 AND doc_id % 3 IN (0, 1))
    """,
)
def q_change_data_feed(spark, sf_dir):
    """Change feed over a scripted five-version history: inserts at
    versions 0/1/3 (doc_id % 3 splits), DV deletes at versions 2
    (doc_id%7) and 4 (doc_id%11==3), one shared version sequence across
    both ledgers. The feed over (0, 4] must emit v1/v3's inserts and
    v2/v4's deletes — where v2's deletes cover only rows ALREADY
    INSERTED (v0∪v1) and v4's exclude rows v2 already deleted (one
    delete event per row lifetime, at the version where the row
    existed — the Delta CDF contract). The oracle states each event set
    as a pure doc_id predicate. Engine seams (collapse refusal, empty
    windows, version-overlap guard) are pinned in
    tests/test_change_feed.py."""
    import os
    import shutil
    import tempfile

    from incremental_dagster_delta_spark.tableio import (
        DeletionVectors,
        PartitionedTable,
        change_feed,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    tdir = tempfile.mkdtemp(prefix="qcdf_")
    try:
        base = PartitionedTable(spark, os.path.join(tdir, "t"), ["source"])
        dv = DeletionVectors(base, "doc_id")
        base.append_batch(docs.where(F.col("doc_id") % 3 == 0), 0)
        base.append_batch(docs.where(F.col("doc_id") % 3 == 1), 1)
        # a real CDC source deletes rows that EXIST: v2 marks the %7 keys
        # already inserted by v0/v1 (marking a not-yet-inserted key would
        # create a born-dead row — visible in neither read() nor the feed)
        dv.mark_deleted(
            docs.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 3 != 2)).select("doc_id"), 2
        )
        base.append_batch(docs.where(F.col("doc_id") % 3 == 2), 3)
        dv.mark_deleted(docs.where(F.col("doc_id") % 11 == 3).select("doc_id"), 4)
        feed = change_feed(base, dv, from_batch=0, to_batch=4)
        return feed.select(
            "doc_id", "source", "_change_type", "_commit_version"
        ).localCheckpoint()
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


# --- bitemporal point-in-time reconstruction -----------------------------------------
#
# SCD2 tracks VALID time only; a bitemporal dimension also tracks
# TRANSACTION time (when the warehouse LEARNED each fact), which is what
# makes late-arriving corrections auditable: "what did we believe on
# Feb 28 about the segment effective Jan 1 1996?" differs from "what do
# we believe now?" exactly when a retro-correction landed in between.
# The change script is deterministic (keys mod N, literal dates), so
# both engines replay the identical bitemporal history.

_BITEMPORAL_EVENTS = """
      SELECT c_custkey AS custkey, c_mktsegment AS segment,
             '1992-01-01' AS valid_from, '2000-01-10' AS tx_time
      FROM customer
      UNION ALL
      SELECT c_custkey, 'SEG-A-' || CAST(c_custkey AS VARCHAR),
             '1995-06-01', '2000-02-15'
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, 'SEG-FIXED-' || CAST(c_custkey AS VARCHAR),
             '1995-06-01', '2000-03-20'
      FROM customer WHERE c_custkey % 21 = 0
"""

# (as-known-at, effective-at) query points: before vs after the
# retro-correction transaction.
_BITEMPORAL_POINTS = [("pre_fix", "2000-02-28", "1996-01-01"), ("post_fix", "2000-12-31", "1996-01-01")]


def _bitemporal_oracle() -> str:
    point_sql = []
    for label, t_known, v_eff in _BITEMPORAL_POINTS:
        point_sql.append(f"""
    SELECT '{label}' AS point_label, custkey, segment, valid_from FROM (
      SELECT custkey, segment, valid_from,
             row_number() OVER (
               PARTITION BY custkey ORDER BY valid_from DESC, tx_time DESC
             ) AS rk
      FROM ev WHERE tx_time <= '{t_known}' AND valid_from <= '{v_eff}'
    ) WHERE rk = 1""")
    return f"WITH ev AS ({_BITEMPORAL_EVENTS})" + " UNION ALL ".join(point_sql)


@query("q_bitemporal", tags=("warehouse", "cdc"), oracle=_bitemporal_oracle())
def q_bitemporal(spark, sf_dir):
    """Bitemporal point-in-time reads at two (as-known-at, effective-at)
    coordinates straddling a retro-correction: pre_fix sees SEG-A for
    every %7 key (the correction hasn't arrived), post_fix sees
    SEG-FIXED supersede it for %21 keys AT THE SAME valid_from — the
    tx_time tiebreak inside equal valid periods is precisely what plain
    SCD2 cannot express. Per query point: filter both time axes, then
    latest-valid-then-latest-learned wins via one per-key window over
    ≤3 version rows (bounded by versions per key, never by table size);
    at 100 TB the dimension shuffles once per point on custkey and the
    fact side is untouched. The same pattern with the window swapped
    for a MAX_BY struct aggregate is the map-combinable variant."""
    c = t(spark, sf_dir, "customer")
    from pyspark.sql.window import Window

    ev = (
        c.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            F.lit("1992-01-01").alias("valid_from"),
            F.lit("2000-01-10").alias("tx_time"),
        )
        .unionByName(
            c.where(F.col("c_custkey") % 7 == 0).select(
                F.col("c_custkey").alias("custkey"),
                F.concat(F.lit("SEG-A-"), F.col("c_custkey").cast("string")).alias("segment"),
                F.lit("1995-06-01").alias("valid_from"),
                F.lit("2000-02-15").alias("tx_time"),
            )
        )
        .unionByName(
            c.where(F.col("c_custkey") % 21 == 0).select(
                F.col("c_custkey").alias("custkey"),
                F.concat(F.lit("SEG-FIXED-"), F.col("c_custkey").cast("string")).alias("segment"),
                F.lit("1995-06-01").alias("valid_from"),
                F.lit("2000-03-20").alias("tx_time"),
            )
        )
    )
    w = Window.partitionBy("custkey").orderBy(
        F.col("valid_from").desc(), F.col("tx_time").desc()
    )
    outs = []
    for label, t_known, v_eff in _BITEMPORAL_POINTS:
        point = (
            ev.where((F.col("tx_time") <= t_known) & (F.col("valid_from") <= v_eff))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select(
                F.lit(label).alias("point_label"), "custkey", "segment", "valid_from"
            )
        )
        outs.append(point)
    out = outs[0]
    for p in outs[1:]:
        out = out.unionByName(p)
    return out


# --- referential-integrity audit ----------------------------------------------------
#
# The warehouse expectation no per-table profile can express: do the
# FOREIGN KEYS actually resolve? Orphan facts inflate joins' null rates
# silently; orphan dimensions are dead weight. One anti-join per edge,
# each pushable to a broadcast/semi form — the audit costs one pass per
# relationship at any scale.


@query(
    "q_fk_audit",
    tags=("warehouse", "quality"),
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
           (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
           ) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           (SELECT COUNT(*) FROM supplier),
           (SELECT COUNT(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
    """,
)
def q_fk_audit(spark, sf_dir):
    """Orphan counts along four FK edges of the star schema — each edge
    one LEFT-ANTI join of child keys against the parent key set. Scale
    shape: the anti-join's parent side is the key column only (column
    pruning reaches the scan) and broadcasts for dimension parents; the
    fact-to-fact edge shuffles once on the key. Zero orphans is the
    healthy reading at every SF — the check's value is that it STAYS
    zero as ingest batches, restores, and purges churn the tables."""
    edges = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for label, child, ck, parent, pk in edges:
        c = t(spark, sf_dir, child)
        p = t(spark, sf_dir, parent).select(F.col(pk).alias("__pk"))
        row = (
            c.select(F.col(ck).alias("__ck"))
            .join(p, F.col("__ck") == F.col("__pk"), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .crossJoin(c.agg(F.count(F.lit(1)).alias("n_child")))
            .select(F.lit(label).alias("fk_edge"), "n_child", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- Benford first-digit audit --------------------------------------------------------
#
# Naturally-occurring monetary amounts follow Benford's law
# (P(d) = log10(1 + 1/d)); synthetic, capped, or fabricated figures
# don't. The classic forensic/data-quality screen: compare the observed
# first-digit distribution of a money column against the Benford
# expectation with a chi-square distance. All nine expected shares are
# embedded as identical decimal literals in both engines.

_BENFORD_P = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}


def _benford_case(expr: str) -> str:
    return "CAST(CASE " + " ".join(
        f"WHEN {expr} = {d} THEN {p!r}" for d, p in _BENFORD_P.items()
    ) + " END AS DOUBLE)"


@query(
    "q_benford",
    tags=("quality", "analytics"),
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), n AS (SELECT COUNT(*) AS n_all FROM digits),
    obs AS (SELECT d, COUNT(*) AS cnt FROM digits GROUP BY d)
    SELECT o.d AS first_digit,
           CAST(o.cnt AS BIGINT) AS n_obs,
           CAST(ROUND(o.cnt / (1.0 * n.n_all), 4) AS DOUBLE) AS p_obs,
           CAST(ROUND({_benford_case("o.d")}, 4) AS DOUBLE) AS p_benford,
           CAST(ROUND(
             (o.cnt - CAST(n.n_all AS DOUBLE) * {_benford_case("o.d")})
             * (o.cnt - CAST(n.n_all AS DOUBLE) * {_benford_case("o.d")})
             / (n.n_all * {_benford_case("o.d")}), 4) AS DOUBLE) AS chi2_term
    FROM obs o, n
    """,
)
def q_benford(spark, sf_dir):
    """First-digit distribution of order totals vs Benford's law, with
    each digit's chi-square contribution (sum them for the screen
    statistic; a digit whose term dominates is where the anomaly
    lives). First digit extracted from the INTEGER part's decimal
    string — identical on both engines, no float log in the hot path;
    the nine Benford shares are shared literals. Scale: one map-side
    projection to a digit column, one 9-group aggregation, one 1-row
    broadcast of N — the cheapest audit in the suite."""
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("long")
        .alias("d")
    )
    n = digits.agg(F.count(F.lit(1)).alias("n_all"))
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("cnt"))
    p_ben = None
    for dd in range(9, 0, -1):
        p = _BENFORD_P[dd]
        p_ben = F.lit(p) if p_ben is None else F.when(F.col("d") == dd, F.lit(p)).otherwise(p_ben)
    exp = F.col("n_all") * p_ben
    return (
        obs.crossJoin(F.broadcast(n))
        .select(
            F.col("d").alias("first_digit"),
            F.col("cnt").cast("long").alias("n_obs"),
            F.round(F.col("cnt") / (1.0 * F.col("n_all")), 4).cast("double").alias("p_obs"),
            F.round(p_ben, 4).cast("double").alias("p_benford"),
            F.round((F.col("cnt") - exp) * (F.col("cnt") - exp) / exp, 4)
            .cast("double")
            .alias("chi2_term"),
        )
    )


# --- functional-dependency profiling ---------------------------------------------------
#
# Key/dependency DISCOVERY (the profiling dual of q_expectations'
# assertions): for candidate A → B dependencies, how many A-values map
# to more than one B? Zero violators means the dependency holds and B
# can live in A's dimension; a high violator share means the modeling
# assumption is wrong. One two-level aggregation per pair.

_FD_PAIRS = [
    ("documents", "source", "lang"),
    ("events", "user_id", "event_type"),
    ("orders", "o_custkey", "o_orderpriority"),
]


def _fd_oracle() -> str:
    parts = []
    for table, a, b in _FD_PAIRS:
        parts.append(f"""
    SELECT '{table}.{a} -> {b}' AS dependency,
           CAST(COUNT(*) AS BIGINT) AS n_determinants,
           CAST(SUM(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           CAST(MAX(n_b) AS BIGINT) AS max_fanout
    FROM (SELECT {a}, COUNT(DISTINCT {b}) AS n_b FROM {table} GROUP BY {a})""")
    return " UNION ALL ".join(parts)


@query("q_fd_profile", tags=("warehouse", "quality"), oracle=_fd_oracle())
def q_fd_profile(spark, sf_dir):
    """Functional-dependency discovery over three candidate A → B pairs:
    count determinant values, the violators (A-values seeing >1 distinct
    B), and the worst fan-out. Scale shape per pair: a (A, B) distinct
    aggregation (map-side combinable) then a |A|-sized rollup — the
    standard two-level profile plan; nothing joins, nothing sorts. At
    100 TB you run this over EVERY plausible pair as one pass each,
    which is exactly how schema-discovery tools budget it."""
    out = None
    for table, a, b in _FD_PAIRS:
        df = t(spark, sf_dir, table)
        per_a = df.groupBy(a).agg(F.count_distinct(b).alias("n_b"))
        row = per_a.agg(
            F.count(F.lit(1)).cast("long").alias("n_determinants"),
            F.sum(F.when(F.col("n_b") > 1, 1).otherwise(0)).cast("long").alias("n_violating"),
            F.max("n_b").cast("long").alias("max_fanout"),
        ).select(F.lit(f"{table}.{a} -> {b}").alias("dependency"), "*")
        out = row if out is None else out.unionByName(row)
    return out


# --- incremental view maintenance with retractions --------------------------------------
#
# The fifth merge algebra, closing the PLANS.md taxonomy: SIGNED
# additive partials. The four existing seams only ever ADD state;
# deletes forced a full recompute ("min/max merge but don't retract").
# A change feed fixes that for the linear aggregates: every insert
# event contributes (+1, +x) and every delete event (−1, −x), so a
# downstream materialized view folds the SIGNED partials per change
# version and never re-reads the base table — classic incremental view
# maintenance (Griffin & Libkin, SIGMOD'95) on the CDF this engine
# already emits.


@query(
    "q_ivm_retractions",
    tags=("warehouse", "incremental", "cdc"),
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE (doc_id % 3 = 1 OR doc_id % 3 = 2)
      AND NOT (doc_id % 7 = 0 AND doc_id % 3 = 1)
      AND NOT (doc_id % 11 = 3 AND doc_id % 3 IN (1, 2)
               AND NOT (doc_id % 7 = 0 AND doc_id % 3 = 1))
    GROUP BY source
    """,
)
def q_ivm_retractions(spark, sf_dir):
    """A per-source (count, Σchars) materialized view maintained purely
    from change-feed events across a scripted history — inserts at
    versions 1 and 3, DV deletes at 2 and 4 — with DELETES RETRACTING:
    each version's partial is the SIGNED aggregate (±1, ±n_chars) of its
    change rows, the view is the sum of partials, and groups folding to
    zero count drop out. The oracle states the equivalent final
    SELECT's predicate algebra over the base table, so the driver
    hash-match proves fold-of-signed-partials ≡ query-on-final-state —
    the IVM correctness property. Scale: each version costs one
    aggregation over ITS OWN change rows (never the accumulated view,
    never the base); the fold input is versions·|sources| rows. This is
    the fifth seam in docs/PLANS.md's taxonomy — signed additive — and
    it is what turns the DV/CDF machinery into maintained downstream
    marts."""
    import os
    import shutil
    import tempfile

    from incremental_dagster_delta_spark.tableio import (
        DeletionVectors,
        PartitionedTable,
        change_feed,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    tdir = tempfile.mkdtemp(prefix="qivm_")
    try:
        base = PartitionedTable(spark, os.path.join(tdir, "t"), ["source"])
        dv = DeletionVectors(base, "doc_id")
        base.append_batch(docs.where(F.col("doc_id") % 3 == 1), 1)
        dv.mark_deleted(
            docs.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 3 == 1)).select("doc_id"),
            2,
        )
        base.append_batch(docs.where(F.col("doc_id") % 3 == 2), 3)
        dv.mark_deleted(docs.where(F.col("doc_id") % 11 == 3).select("doc_id"), 4)
        feed = change_feed(base, dv, from_batch=0, to_batch=4)
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        # one signed partial per (version, source) — each version touches
        # only its own change rows
        partials = feed.groupBy("_commit_version", "source").agg(
            F.sum(sign).alias("dn"),
            F.sum(sign * F.col("n_chars")).alias("dchars"),
        )
        view = (
            partials.groupBy("source")
            .agg(
                F.sum("dn").cast("long").alias("n_docs"),
                F.sum("dchars").cast("long").alias("total_chars"),
            )
            .where(F.col("n_docs") > 0)
        )
        return view.localCheckpoint()
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
