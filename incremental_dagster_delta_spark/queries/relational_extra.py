"""Additional relational coverage: window-function battery, array
expression battery, more TPC-H-shaped queries (min-cost-per-group,
NOT-IN filtering, Q13 custdist), and outer-join surface (left + full)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incremental_dagster_delta_spark.queries.registry import query, t
from incremental_dagster_delta_spark.queries.relational import _dec


@query(
    "q_window_battery",
    tags=("window",),
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS spend_quartile,
           CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(last_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS DOUBLE) AS last_price,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_battery(spark, sf_dir):
    """ntile / first_value / last_value / windowed count in one pass —
    all share the per-customer ordering, so Catalyst evaluates them in a
    single Window operator (one shuffle on o_custkey)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_part = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("long").alias("spend_quartile"),
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
        F.last("o_totalprice").over(w_full).cast("double").alias("last_price"),
        F.count("*").over(w_part).cast("long").alias("n_orders"),
    )


@query(
    "q_array_funcs",
    tags=("array", "scalar"),
    oracle="""
    SELECT vec_id,
           CAST(len(emb) AS BIGINT) AS dim,
           -- + 0.0 normalizes IEEE negative zero: a tiny negative first
           -- element rounds to -0.0 here but +0.0 in Spark (first hit
           -- at sf0.1, vec 1753)
           CAST(ROUND(emb[1], 4) + 0.0 AS DOUBLE) AS first_val,
           CAST(ROUND(list_aggregate(emb[1:8], 'sum'), 4) + 0.0 AS DOUBLE) AS head_sum,
           CAST(ROUND(list_aggregate(emb, 'max'), 4) + 0.0 AS DOUBLE) AS max_val,
           CAST(ROUND(list_sort(emb)[1], 4) + 0.0 AS DOUBLE) AS min_via_sort,
           CAST(len(list_filter(emb, x -> x > 0)) AS BIGINT) AS n_positive
    FROM (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings)
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array expression battery over ArrayType(FloatType): element
    access, slice+fold, max, sort, filter-count — all codegen'd, no UDF.
    Sums run in double on both engines; results rounded to 4."""
    e = t(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # + 0.0 on every rounded float: normalize IEEE negative zero on
        # both engines (oracle comment; retrieval.py PMI precedent)
        (F.round(F.element_at(emb_d, 1), 4) + 0.0).cast("double").alias("first_val"),
        (F.round(
            F.aggregate(F.slice(emb_d, 1, 8), F.lit(0.0), lambda a, x: a + x), 4
        ) + 0.0).cast("double").alias("head_sum"),
        (F.round(F.array_max(emb_d), 4) + 0.0).cast("double").alias("max_val"),
        (F.round(F.element_at(F.array_sort(emb_d), 1), 4) + 0.0).cast("double").alias("min_via_sort"),
        F.size(F.filter(emb_d, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "q_min_cost_supplier",
    tags=("join", "window"),
    oracle="""
    SELECT l_partkey, l_suppkey,
           CAST(min_cost AS DOUBLE) AS min_cost
    FROM (
      SELECT l_partkey, l_suppkey,
             CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE) AS unit_cost,
             MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))
               OVER (PARTITION BY l_partkey) AS min_cost
      FROM lineitem
      WHERE l_quantity > 0
    )
    WHERE unit_cost = min_cost AND l_partkey < 200
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-group minimum selection via a window min
    rather than a correlated subquery re-scan — one shuffle on the group
    key, no second pass over the fact table. Unit cost is a single
    double division (no accumulation), so the IEEE result is
    bit-identical on both engines and compared UNrounded: rounding would
    *introduce* divergence at half-way values (27.657249999999998 →
    Spark HALF_UP on the binary value gives .6572, DuckDB rounds the
    shortest decimal representation and gives .6573)."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    unit = F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")
    w = Window.partitionBy("l_partkey")
    scored = li.select(
        "l_partkey", "l_suppkey", unit.alias("unit_cost")
    ).withColumn("min_cost", F.min("unit_cost").over(w))
    return (
        scored.where((F.col("unit_cost") == F.col("min_cost")) & (F.col("l_partkey") < 200))
        .select("l_partkey", "l_suppkey", F.col("min_cost").cast("double").alias("min_cost"))
    )


@query(
    "q_profit_by_nation_year",
    tags=("join", "agg"),
    bench=True,
    oracle="""
    SELECT n_name,
           strftime(o_orderdate, '%Y') AS o_year,
           CAST(ROUND(SUM(
             CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
             - ps_supplycost * CAST(l_quantity AS DECIMAL(18,2))
           ), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN (
      SELECT p_partkey AS ps_partkey,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(3,2)) AS DECIMAL(18,2))
               AS ps_supplycost
      FROM part WHERE p_name LIKE '%red%'
    ) ps ON ps_partkey = l_partkey
    GROUP BY n_name, o_year
    """,
)
def q_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape: product-profit by nation and order year. The
    testdata has no partsupp table, so supply cost derives from
    part.p_retailprice (deterministic on both engines). supplier/nation/
    part are broadcast; the lineitem↔orders join shuffles on orderkey
    with AQE skew handling — the one unavoidable fact-fact shuffle.
    All money math stays in exact DECIMAL through the sum (a double
    accumulator would be partition-order dependent); the single cast to
    double happens after aggregation."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supplier = F.broadcast(t(spark, sf_dir, "supplier"))
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    ps = F.broadcast(
        t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("red"))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (F.col("p_retailprice").cast("decimal(18,2)") * F.lit("0.6").cast("decimal(3,2)"))
            .cast("decimal(18,2)")
            .alias("ps_supplycost"),
        )
    )
    dec = _dec  # the shared exact-money cast (relational.py)
    profit = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")) - F.col(
        "ps_supplycost"
    ) * dec("l_quantity")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(ps, F.col("ps_partkey") == F.col("l_partkey"))
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


@query(
    "q_funnel_conversion",
    tags=("events", "window"),
    oracle="""
    WITH clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    converted AS (
      SELECT DISTINCT c.user_id
      FROM clicks c JOIN purchases p
        ON p.user_id = c.user_id
       AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM clicks) AS n_clickers,
           (SELECT COUNT(*) FROM converted) AS n_converted
    """,
)
def q_funnel_conversion(spark, sf_dir):
    """Click→purchase funnel within a 1-hour window: the conversion
    check rides the as-of machinery (per-user ordered window carrying
    the last click forward) instead of the oracle's range self-join —
    one shuffle on user_id vs. a quadratic-in-events-per-user join."""
    e = t(spark, sf_dir, "events")
    # clicks tag=2 > purchases tag=1: at EQUAL ts the click must sort
    # AFTER the purchase, or it becomes last_click and the strict
    # ts > last_click filter rejects a conversion the oracle's
    # p.ts > c.ts join counts — the same equal-ts shadow fixed in
    # q_funnel_multistep (r4), left unfixed in this sibling until r15.
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(2).alias("tag"), F.col("ts").alias("click_ts")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("tag"), F.lit(None).cast("timestamp").alias("click_ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click", F.last("click_ts", ignorenulls=True).over(w)
    )
    converted = (
        merged.where(
            (F.col("tag") == 1)
            & F.col("last_click").isNotNull()
            & (F.col("ts") > F.col("last_click"))
            & (F.col("ts") <= F.col("last_click") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("user_id")
        .distinct()
    )
    clickers = clicks.agg(F.count_distinct("user_id").alias("n_clickers"))
    return clickers.crossJoin(converted.agg(F.count("*").alias("n_converted")))


@query(
    "q_excess_shippers",
    tags=("join", "agg", "setop"),
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 50
    )
    """,
)
def q_excess_shippers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped an excess quantity (>50)
    of any 'red' part during 1996. The correlated IN-subquery becomes a
    bottom-up dataflow: filtered fact scan (date predicate pushed to
    parquet) joined to a broadcast part key-set, partial-agg on
    (suppkey, partkey) — map-side combine shrinks the shuffle — then the
    surviving supplier keys, a handful of rows, broadcast back into a
    left-semi join against supplier. No subquery re-scan of lineitem,
    and the semi-join probe side never shuffles."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    red_parts = F.broadcast(
        t(spark, sf_dir, "part").where(F.col("p_name").contains("red")).select("p_partkey")
    )
    excess_keys = (
        li.join(red_parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(excess_keys), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "q_notin_filter",
    tags=("join", "setop"),
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey NOT IN (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 40
    )
    """,
)
def q_notin_filter(spark, sf_dir):
    """NOT IN as a null-safe anti join (the testdata keys are non-null,
    so NOT IN ≡ NOT EXISTS here; Catalyst plans a left-anti join). The
    subquery is narrowed so the answer is non-empty at sf0.01."""
    returned = (
        t(spark, sf_dir, "lineitem")
        .where((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 40))
        .select("l_partkey")
    )
    return (
        t(spark, sf_dir, "part")
        .join(returned, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    )


@query(
    "q_custdist_outer",
    tags=("join", "agg"),
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_custdist_outer(spark, sf_dir):
    """TPC-H Q13 shape: orders-per-customer distribution *including*
    zero-order customers — the canonical left-outer-join-then-count
    pattern (COUNT(col) skips the nulls the outer join manufactures).
    Plan notes for 100 TB: the outer join shuffles both sides on custkey
    (customer is too large to broadcast at scale); the second aggregation
    runs on the tiny (c_count) domain and is all map-side partials."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_daily_activity_outer",
    tags=("join", "agg"),
    oracle="""
    SELECT COALESCE(o.day, e.day) AS day,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_events, 0) AS n_events
    FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, COUNT(*) AS n_orders
          FROM orders GROUP BY 1) o
    FULL OUTER JOIN
         (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
          FROM events GROUP BY 1) e
      ON o.day = e.day
    """,
)
def q_daily_activity_outer(spark, sf_dir):
    """Full outer join of two pre-aggregated daily activity series whose
    date ranges don't overlap (TPC-H order dates vs synthetic event
    days) — every row exercises one of the three outer-join cases.
    Aggregate-then-join: both sides collapse to one row per day BEFORE
    the join, so the full-outer shuffle moves day-counts, not raw rows —
    the only sane order at 100 TB."""
    o = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    return (
        o.join(e, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "q_promo_ratio",
    tags=("agg", "scalar"),
    oracle="""
    SELECT CAST(ROUND(
             100.0 * SUM(CASE WHEN p_name LIKE '%green%'
               THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
               ELSE CAST(0 AS DECIMAL(18,2)) END)
             / SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))),
           4) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    """,
)
def q_promo_ratio(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio in one pass — the
    CASE moves the predicate INTO the aggregate so one scan/join feeds
    both numerator and denominator (two filtered scans would double the
    fact IO). part broadcasts; decimal until the final division."""
    li = t(spark, sf_dir, "lineitem")
    p = F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_name"))
    dec = _dec  # the shared exact-money cast (relational.py)
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    promo = F.when(F.col("p_name").contains("green"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    joined = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    return joined.agg(
        F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4)
        .cast("double")
        .alias("promo_pct")
    )


@query(
    "q_above_avg_customers",
    tags=("agg", "subquery"),
    oracle="""
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND c_custkey % 10 = 0
    """,
)
def q_above_avg_customers(spark, sf_dir):
    """TPC-H Q22 shape: filter by comparison against a scalar-subquery
    aggregate. The scalar collapses to one row and broadcasts as a
    nested-loop build side — the fact scan streams against a constant;
    no driver-side collect of the average. Average compared UNrounded:
    AVG over doubles is order-stable here because DuckDB and Spark both
    sum in double over <50k values with identical results on this data;
    the final projection only emits raw column values, so the filter
    threshold is the single shared derived quantity."""
    c = t(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where((F.col("c_acctbal") > F.col("avg_bal")) & (F.col("c_custkey") % 10 == 0))
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("acctbal"))
    )


@query(
    "q_funnel_multistep",
    tags=("events", "window"),
    oracle="""
    WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    qc AS (
      SELECT DISTINCT c.user_id, c.ts
      FROM c JOIN s ON s.user_id = c.user_id
       AND c.ts > s.ts AND c.ts <= s.ts + INTERVAL 2 HOUR
    ),
    qp AS (
      SELECT DISTINCT p.user_id
      FROM p JOIN qc ON qc.user_id = p.user_id
       AND p.ts > qc.ts AND p.ts <= qc.ts + INTERVAL 2 HOUR
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM s) AS n_step1,
           (SELECT COUNT(DISTINCT user_id) FROM qc) AS n_step2,
           (SELECT COUNT(*) FROM qp) AS n_step3
    """,
)
def q_funnel_multistep(spark, sf_dir):
    """Three-step funnel (signup → click → purchase, each within 2 hours
    of the previous step): generalizes q_funnel_conversion's carry-
    forward trick to CHAINED steps. Correctness hinges on one property:
    carrying the LATEST qualifying previous-step event minimizes the gap
    at each step, so 'last qualifying within window' is exactly EXISTS
    semantics without the oracle's range self-joins. Each chaining stage
    is one shuffle on user_id (union + ordered window) — N-step funnels
    cost N-1 such shuffles, vs N-1 quadratic-per-user range joins."""
    e = t(spark, sf_dir, "events")
    two_h = F.expr("INTERVAL 2 HOUR")

    def step(prev_qualifying, next_type):
        """Events of next_type within 2h after the latest qualifying
        previous-step event. prev/next = (user_id, ts)."""
        # prev sorts AFTER next at equal ts (tag 2 > 1): an equal-ts prev
        # can never qualify (the filter is strict ts > last_prev), but if
        # it became last_prev it would SHADOW an earlier in-window prev
        # that the oracle's range join counts (ADVICE r4) — excluding
        # equal-ts prevs from the carry is exactly EXISTS semantics.
        prev = prev_qualifying.select(
            "user_id", "ts", F.lit(2).alias("tag"), F.col("ts").alias("prev_ts")
        )
        nxt = e.where(F.col("event_type") == next_type).select(
            "user_id", "ts", F.lit(1).alias("tag"), F.lit(None).cast("timestamp").alias("prev_ts")
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = prev.unionByName(nxt).withColumn(
            "last_prev", F.last("prev_ts", ignorenulls=True).over(w)
        )
        return merged.where(
            (F.col("tag") == 1)
            & F.col("last_prev").isNotNull()
            & (F.col("ts") > F.col("last_prev"))
            & (F.col("ts") <= F.col("last_prev") + two_h)
        ).select("user_id", "ts")

    signups = e.where(F.col("event_type") == "signup").select("user_id", "ts")
    q_clicks = step(signups, "click")
    q_purchases = step(q_clicks, "purchase")
    return (
        signups.agg(F.count_distinct("user_id").alias("n_step1"))
        .crossJoin(q_clicks.agg(F.count_distinct("user_id").alias("n_step2")))
        .crossJoin(q_purchases.select("user_id").distinct().agg(F.count("*").alias("n_step3")))
    )


# --- overlapping-interval consolidation --------------------------------------


@query(
    "q_interval_merge",
    tags=("window", "timeseries"),
    bench=True,
    oracle="""
    WITH iv AS (
      SELECT o_custkey AS custkey, o_orderkey AS ok,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + INTERVAL (3 + o_orderkey % 18) DAY AS e
      FROM orders
    ), flagged AS (
      -- ok is a pure tiebreak: two same-day orders can open IDENTICAL
      -- intervals, and without a total order the two window ops below
      -- may see different tie orders (engine-dependent), mis-attaching
      -- a duplicate row to the neighbouring island (the q_dup_span
      -- class of bug). With a unique key in the ORDER BY both passes
      -- see one canonical sequence on every engine.
      SELECT custkey, ok, s, e,
             CASE WHEN s <= MAX(e) OVER (PARTITION BY custkey ORDER BY s, e, ok
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS new_island
      FROM iv
    ), grouped AS (
      SELECT custkey, s, e,
             SUM(new_island) OVER (PARTITION BY custkey ORDER BY s, e, ok
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ), merged AS (
      SELECT custkey, island, MIN(s) AS span_start, MAX(e) AS span_end, COUNT(*) AS n_source
      FROM grouped GROUP BY custkey, island
    )
    SELECT custkey,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(n_source) AS BIGINT) AS n_intervals,
           CAST(SUM(date_diff('day', span_start, CAST(span_end AS DATE))) AS BIGINT) AS covered_days
    FROM merged
    GROUP BY custkey
    """,
)
def q_interval_merge(spark, sf_dir):
    """Overlapping-interval consolidation (gaps-and-islands): each
    order opens a deterministic activity interval; per customer,
    transitively-overlapping intervals merge into spans, and the report
    is (spans, source intervals, covered days). The canonical pattern
    for uptime windows, IP leases, and validity ranges.

    Plan: ONE shuffle on the key, then two frame-bounded window passes
    in the same sort order — a row starts a new island iff it begins
    after the running max end of every earlier interval (running-max
    lag catches intervals that SWALLOW later ones, which a plain
    lag(e) comparison misses). No self-join, no range join: at 100 TB
    this is a single sort per key-partition, the optimal shape for
    interval consolidation."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(
            F.col("o_orderdate").cast("date"), (F.lit(3) + F.col("o_orderkey") % 18).cast("int")
        ).alias("e"),
    )
    # ok = unique tiebreak so both window passes share one canonical
    # order even over duplicate (s, e) intervals — see the oracle note
    order_w = Window.partitionBy("custkey").orderBy("s", "e", "ok")
    prev_max_e = F.max("e").over(order_w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island", F.when(F.col("s") <= prev_max_e, 0).otherwise(1)
    )
    grouped = flagged.withColumn(
        "island",
        F.sum("new_island").over(order_w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = grouped.groupBy("custkey", "island").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count("*").alias("n_source"),
    )
    return merged.groupBy("custkey").agg(
        F.count("*").alias("n_spans"),
        F.sum("n_source").cast("long").alias("n_intervals"),
        F.sum(F.datediff("span_end", "span_start")).cast("long").alias("covered_days"),
    )
