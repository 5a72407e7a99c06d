"""Time-series / reshaping operators: unpivot (melt), gap-filling with
forward fill, and incremental-aggregate maintenance.

- **unpivot** — wide metric columns to long (metric, value) rows; the
  inverse of ``q_pivot_api``. Pure projection after the aggregate: no
  extra shuffle, output is metrics× the aggregate's row count.
- **gap fill + forward fill** — regularize a sparse daily series onto a
  complete day spine, carrying the last observation forward. The spine
  is (days × keys) — both tiny dimensions built from aggregates, so the
  cross join is a broadcast nested loop over metadata-sized inputs, and
  the fill is one window per key. The fact table is touched exactly
  once, pre-aggregated.
- **incremental aggregate maintenance** — the algebra behind every
  incremental materialized view: partial aggregates of disjoint slices
  (here: days before/after a cutover) merge by re-aggregation into
  exactly the full recompute, because (count, sum) are associative and
  commutative. The oracle IS the full recompute, so the driver verifies
  the merge identity itself. avg/stddev maintain the same way via
  (n, sum, sum²); min/max merge but don't retract — deletions need the
  full group re-read (the reference's refresh path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from incremental_dagster_delta_spark.queries.registry import query, t

GAP_THRESHOLD = 150  # value filter that leaves real day-gaps at test SFs
SPLIT_DAY = "2024-01-15"  # incremental-maintenance cutover


@query(
    "q_unpivot",
    tags=("reshape", "agg"),
    oracle="""
    SELECT l_returnflag, metric, value FROM (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             CAST(COUNT(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY 1
    ) UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_items))
    """,
)
def q_unpivot(spark, sf_dir):
    """Wide→long melt of a per-flag aggregate (inverse of q_pivot_api).
    ``unpivot`` is a generate-style projection — no shuffle beyond the
    aggregate's own."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.count("*").cast("double").alias("n_items"),
    )
    return wide.unpivot(["l_returnflag"], ["sum_qty", "sum_price", "n_items"], "metric", "value")


@query(
    "q_gap_fill",
    tags=("timeseries", "window"),
    oracle=f"""
    WITH f AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS total
      FROM events WHERE value >= {GAP_THRESHOLD} GROUP BY 1, 2
    ),
    spine AS (
      SELECT ty.event_type, CAST(u.d AS DATE) AS d
      FROM (SELECT DISTINCT event_type FROM events) ty
      CROSS JOIN (
        SELECT unnest(generate_series(
          (SELECT MIN(CAST(ts AS DATE)) FROM events),
          (SELECT MAX(CAST(ts AS DATE)) FROM events),
          INTERVAL 1 DAY)) AS d
      ) u
    )
    SELECT strftime(s.d, '%Y-%m-%d') AS day, s.event_type,
           COALESCE(f.n, 0) AS n,
           CAST(last_value(f.total IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS filled_total
    FROM spine s LEFT JOIN f ON f.event_type = s.event_type AND f.d = s.d
    """,
)
def q_gap_fill(spark, sf_dir):
    """Regularize a sparse (event_type, day) series: complete day spine
    from the table's own min/max date, zero-fill counts, forward-fill
    the day total with ``last(ignorenulls)``. Leading gaps before a
    key's first observation stay null — forward fill has nothing to
    carry."""
    e = t(spark, sf_dir, "events")
    f = (
        e.where(F.col("value") >= GAP_THRESHOLD)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
    )
    rng = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    days = rng.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    types = e.select("event_type").distinct()
    spine = days.crossJoin(types)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(f, ["event_type", "d"], "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.last("total", ignorenulls=True).over(w).cast("double").alias("filled_total"),
    )


@query(
    "q_incr_agg_maintain",
    tags=("incremental", "agg"),
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type
    """,
)
def q_incr_agg_maintain(spark, sf_dir):
    """Incremental materialized-view maintenance identity: partial
    (count, sum) states of the pre-cutover slice and the delta slice
    merge by re-aggregation into the full recompute — which is exactly
    what the oracle computes. At scale the 'old' partial is the stored
    view state (never re-scanned); only the delta is read per tick."""
    e = t(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )

    old = partial(e.where(F.col("d") < SPLIT_DAY))
    delta = partial(e.where(F.col("d") >= SPLIT_DAY))
    return (
        old.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("total").cast("double").alias("total"),
        )
    )


@query(
    "q_rolling_range_window",
    tags=("timeseries", "window"),
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_num,
             SUM(CAST(value AS DECIMAL(18,2))) AS day_total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day_num,
           CAST(SUM(day_total) OVER (
             PARTITION BY event_type ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d
    FROM daily
    """,
)
def q_rolling_range_window(spark, sf_dir):
    """7-day rolling sum with a RANGE (value-based) frame: the frame
    covers day_num values in [current-6, current], NOT the previous 6
    rows — on sparse series the two differ wherever days are missing
    (a ROWS frame would silently reach further back in time). Runs on
    the pre-aggregated daily series, so the window input is |days×keys|
    rows, not raw events."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day_num")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("day_total"))
    w = Window.partitionBy("event_type").orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "event_type",
        "day_num",
        F.sum("day_total").over(w).cast("double").alias("rolling_7d"),
    )


# --- time-series similarity search ------------------------------------------

TS_QUERY_USER = 1
TS_MIN_OVERLAP = 10


@query(
    "q_ts_similarity",
    tags=("timeseries", "similarity"),
    oracle=f"""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS d, SUM(value) AS v
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), q AS (
      SELECT d, v AS qv FROM daily WHERE user_id = {TS_QUERY_USER}
    )
    SELECT daily.user_id,
           COUNT(*) AS n_days,
           CAST(ROUND(corr(v, qv), 4) AS DOUBLE) AS correlation
    FROM daily JOIN q USING (d)
    WHERE daily.user_id <> {TS_QUERY_USER}
    GROUP BY daily.user_id
    HAVING COUNT(*) >= {TS_MIN_OVERLAP}
    """,
)
def q_ts_similarity(spark, sf_dir):
    """Time-series similarity search (the EDBT'19 streaming-similarity
    shape): which users' daily activity series co-move with a query
    user's? The query series BROADCASTS (a series is bounded by the
    calendar, never by corpus size), the per-user daily aggregate
    streams once, and Pearson correlation is a single map-combinable
    aggregate per user — so the whole search is one small shuffle keyed
    on user_id regardless of how many users exist. A minimum-overlap
    floor keeps short accidental alignments out (the same guard
    production similarity search applies)."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum("value").alias("v"))
    q = F.broadcast(
        daily.where(F.col("user_id") == TS_QUERY_USER).select("d", F.col("v").alias("qv"))
    )
    return (
        daily.where(F.col("user_id") != TS_QUERY_USER)
        .join(q, "d")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            # Pearson via try_divide(covar, sa*sb) — same accumulators as
            # F.corr, but a zero-variance series yields NULL (DuckDB's
            # corr semantics) instead of an ANSI divide-by-zero raise
            # (r15 review)
            F.round(
                F.try_divide(
                    F.covar_samp("v", "qv"),
                    F.stddev_samp("v") * F.stddev_samp("qv"),
                ),
                4,
            ).cast("double").alias("correlation"),
        )
        .where(F.col("n_days") >= TS_MIN_OVERLAP)
    )


# --- trailing-window anomaly detection ---------------------------------------

ANOM_Z = 2.0


@query(
    "q_ts_anomaly",
    tags=("timeseries", "analytics"),
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, SUM(value) AS total
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, day, n, total,
             COUNT(*) OVER w AS n_prior,
             AVG(total) OVER w AS mu,
             stddev_samp(total) OVER w AS sigma
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, n,
           CAST(ROUND(total, 2) AS DOUBLE) AS total,
           CAST(ROUND((total - mu) / sigma, 4) AS DOUBLE) AS z,
           ABS(ROUND((total - mu) / sigma, 4)) > {ANOM_Z} AS is_anomaly
    FROM scored
    WHERE n_prior = 7 AND sigma > 0
    """,
)
def q_ts_anomaly(spark, sf_dir):
    """Trailing-window anomaly detection on the daily event volume: each
    day's total scores against the mean/stddev of its own PREVIOUS 7
    days (the current day never contaminates its baseline), flagged at
    |z| > 2 — the standard drift monitor on ingest volumes. One shuffle
    to the daily grain, then a single pass of frame-bounded window
    aggregates per series; state per key is 7 rows regardless of
    history length, so the same plan runs on years of 100 TB telemetry.
    The flag derives from the ROUNDED z on both engines, so the
    comparison is exact."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "event_type",
        "day",
        "n",
        "total",
        F.count("*").over(w).alias("n_prior"),
        F.avg("total").over(w).alias("mu"),
        F.stddev_samp("total").over(w).alias("sigma"),
    )
    z = F.round((F.col("total") - F.col("mu")) / F.col("sigma"), 4).cast("double")
    return (
        scored.where((F.col("n_prior") == 7) & (F.col("sigma") > 0))
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "n",
            F.round("total", 2).cast("double").alias("total"),
            z.alias("z"),
            (F.abs(z) > ANOM_Z).alias("is_anomaly"),
        )
    )


# --- rolling exact median (robust trailing statistic) -------------------------


@query(
    "q_rolling_median",
    tags=("timeseries", "window", "analytics"),
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS total_c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           CAST(ROUND(total_c / 100.0, 2) AS DOUBLE) AS total,
           CAST(ROUND(CAST(ROUND(2 * (quantile_cont(total_c, 0.5) OVER w)) AS BIGINT)
                / 200.0, 4) AS DOUBLE) AS rolling_median
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_median(spark, sf_dir):
    """Trailing 7-day exact MEDIAN of the daily volume per series — the
    robust companion to q_ts_anomaly's mean/stddev (one spike day drags
    a trailing mean, not a trailing median). Daily totals are exact
    integer cents, so the doubled window median is an exact integer on
    both engines (the q_mad_outliers trick applied to a moving frame) —
    zero float boundary risk. Frame-bounded window: 7 rows of state per
    key regardless of history; one shuffle to the daily grain, one sort
    per series."""

    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("total_c")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    med_x2 = F.round(2 * F.expr("percentile(total_c, 0.5)").over(w)).cast("long")
    return daily.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.round(F.col("total_c") / 100.0, 2).cast("double").alias("total"),
        F.round(med_x2.cast("double") / 200.0, 4).cast("double").alias("rolling_median"),
    )


# --- day-of-week seasonality profile ------------------------------------------


@query(
    "q_seasonality_profile",
    tags=("timeseries", "analytics"),
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) AS dow,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    ), per_dow AS (
      SELECT event_type, dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             AVG(n) AS mean_n
      FROM daily GROUP BY 1, 2
    ), overall AS (
      SELECT event_type, AVG(n) AS grand_mean FROM daily GROUP BY event_type
    )
    SELECT p.event_type,
           CAST(p.dow AS BIGINT) AS dow,
           p.n_days,
           CAST(ROUND(p.mean_n, 4) AS DOUBLE) AS mean_daily_events,
           CAST(ROUND(p.mean_n / o.grand_mean, 4) AS DOUBLE) AS seasonal_index
    FROM per_dow p JOIN overall o USING (event_type)
    """,
)
def q_seasonality_profile(spark, sf_dir):
    """Day-of-week seasonality profile: each series' mean daily volume
    per weekday, normalized by its own grand mean — the seasonal index a
    volume monitor divides out before alerting (q_ts_anomaly's trailing
    window absorbs level shifts; this captures the weekly cycle). Two
    narrow aggregations over the daily grain plus a |series|-row
    broadcast join; NOTE the grand mean averages the per-day totals (a
    mean of daily means per dow would weight weekdays unequally when the
    calendar span is ragged). DuckDB's Sunday=0 dayofweek matches
    Spark's dayofweek()-1."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow"),
    ).agg(F.count("*").alias("n"))
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.count("*").alias("n_days"), F.avg("n").alias("mean_n")
    )
    overall = daily.groupBy("event_type").agg(F.avg("n").alias("grand_mean"))
    return per_dow.join(F.broadcast(overall), "event_type").select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("n_days").cast("long").alias("n_days"),
        F.round("mean_n", 4).cast("double").alias("mean_daily_events"),
        F.round(F.col("mean_n") / F.col("grand_mean"), 4).cast("double").alias("seasonal_index"),
    )


# --------------------------------------------------------------------------
# Exponentially-decayed counters (round 11)
# --------------------------------------------------------------------------
# "What's trending" needs recency weighting, and re-scanning history to
# re-weight on every refresh defeats incrementality. Fixing the decay
# REFERENCE INSTANT makes the decayed count a plain additive aggregate:
# each event contributes exp(-λ · age_at_T_REF) — a constant per event —
# so per-batch partials fold by sum (the additive seam) and a read at
# any later instant T rescales the folded total by exp(-λ·(T - T_REF))
# without touching history. Ages are computed from exact epoch
# MICROSECOND integers (unix_micros / epoch_us) so both engines see
# identical doubles before exp().

DECAY_PER_DAY = 0.1  # λ: an event loses ~9.5%/day of its weight
DECAY_T_REF_US = 1_706_745_600_000_000  # 2024-02-01 00:00:00 UTC, integer literal
DECAY_BATCHES = 3


def decayed_partials(events: DataFrame) -> DataFrame:
    """Additive decayed-count partial for one batch: (event_type,
    n_events, decayed_sum) with each event weighted exp(-λ·age_days) at
    the fixed reference instant. ≤ |event types| rows out; map-side
    combinable. Publish with ``append_batch`` for exactly-once folds."""
    age_days = (F.lit(DECAY_T_REF_US) - F.unix_micros(F.col("ts"))) / F.lit(86400e6)
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.exp(-DECAY_PER_DAY * age_days)).alias("decayed_sum"),
    )


@query(
    "q_decayed_counts",
    tags=("timeseries", "agg", "incremental"),
    oracle=f"""
    SELECT event_type,
           CAST(SUM(CAST(1 AS BIGINT)) AS BIGINT) AS n_events,
           ROUND(SUM(EXP(-{DECAY_PER_DAY!r} *
                 (({DECAY_T_REF_US} - epoch_us(ts)) / 86400e6))), 4) AS decayed_count
    FROM events
    GROUP BY event_type
    """,
)
def q_decayed_counts(spark, sf_dir):
    """Recency-weighted event counts under incremental maintenance: the
    corpus arrives as DECAY_BATCHES deterministic batches (event_id %
    B), each contributing a ≤|event types|-row additive partial; the
    report folds them by sum. The oracle recomputes the decayed sums
    over the FULL corpus, so the driver hash-check pins
    merge-of-batch-partials ≡ weigh-on-full (exp() evaluated per event
    on both engines from identical epoch-microsecond ages; sums rounded
    to 4 like every float surface). Scale shape: B bounded
    aggregations — decayed trending over 100 TB of history costs one
    map-side-combinable pass per new batch, and a read at a later
    instant rescales the folded totals by one constant."""
    e = t(spark, sf_dir, "events")
    parts = None
    for b in range(DECAY_BATCHES):
        p = decayed_partials(e.where(F.col("event_id") % DECAY_BATCHES == b))
        parts = p if parts is None else parts.unionByName(p)
    return parts.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(F.sum("decayed_sum"), 4).alias("decayed_count"),
    )


# --- lag-k autocorrelation ----------------------------------------------------
#
# ACF of the daily event-volume series per event type — the first
# diagnostic a forecasting / seasonality pipeline computes over ingest
# telemetry (is the series momentum-driven? weekly-periodic? white
# noise?). Round 11 continuation depth for the timeseries family.

ACF_MAX_LAG = 3


@query(
    "q_autocorrelation",
    tags=("timeseries", "analytics"),
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), lags AS (
      SELECT CAST(unnest(range(1, {ACF_MAX_LAG} + 1)) AS INTEGER) AS lag
    )
    SELECT a.event_type, l.lag,
           COUNT(*) AS n_pairs,
           CAST(ROUND(corr(a.v, b.v), 4) AS DOUBLE) AS acf
    FROM daily a
    CROSS JOIN lags l
    JOIN daily b
      ON b.event_type = a.event_type AND b.day = a.day + l.lag
    GROUP BY a.event_type, l.lag
    """,
)
def q_autocorrelation(spark, sf_dir):
    """Lag-k autocorrelation (k = 1..ACF_MAX_LAG) of each event type's
    daily volume series. The corpus collapses to the daily grain FIRST
    (one map-side-combinable aggregation: |types|x|days| rows — calendar-
    bounded, never corpus-bounded), so the lag self-join and the Pearson
    aggregate run over metadata-sized inputs no matter how many raw
    events feed the grain; the 3-row lag spine broadcasts. That is the
    100 TB shape: ACF over years of telemetry is one shuffle to the
    daily grain plus series-sized joins. Pearson via corr() (sample
    co-moments) on both engines, rounded to 4 (registry float policy);
    pairs are aligned on exact day arithmetic so n_pairs is integral on
    both sides."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("double").alias("v"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    a = daily.alias("a")
    b = daily.select(
        F.col("event_type").alias("b_type"), F.col("day").alias("b_day"), F.col("v").alias("b_v")
    )
    return (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b_type") == F.col("a.event_type"))
            & (F.col("b_day") == F.date_add(F.col("a.day"), F.col("lag"))),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.try_divide(
                    F.covar_samp(F.col("a.v"), F.col("b_v")),
                    F.stddev_samp(F.col("a.v")) * F.stddev_samp(F.col("b_v")),
                ),
                4,
            ).cast("double").alias("acf"),
        )
    )


# --- CUSUM changepoint detection ----------------------------------------------
#
# Page's cumulative-sum statistic: S_t = sum_{i<=t} (x_i - mean). A level
# shift at day t* makes |S| peak at t*; a stable series keeps S near 0.
# The argmax-|S| day is the classic single-changepoint estimate (Page
# 1954; the binary-segmentation primitive). Drift monitors run exactly
# this over ingest telemetry to localize WHEN a pipeline's volume or
# value distribution moved, after q_ts_anomaly's z-flags say THAT it
# moved.


@query(
    "q_cusum_changepoint",
    tags=("timeseries", "analytics"),
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, SUM(value) AS x
      FROM events GROUP BY 1, 2
    ), mu AS (
      SELECT event_type, AVG(x) AS mu, COUNT(*) AS n_days FROM daily GROUP BY 1
    ), cusum AS (
      SELECT d.event_type, d.day, m.n_days,
             CAST(ROUND(ABS(SUM(d.x - m.mu) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             )), 4) AS DOUBLE) AS abs_s
      FROM daily d JOIN mu m USING (event_type)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS cp_day, n_days, abs_s AS cusum_stat
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY abs_s DESC, day
      ) AS rk FROM cusum
    ) WHERE rk = 1
    """,
)
def q_cusum_changepoint(spark, sf_dir):
    """Single-changepoint localization per event type: Page's CUSUM of
    the daily value total against the series mean, emitting the day
    where |S_t| peaks (rounded statistic ranks; ties break to the
    earliest day, so both engines pick identically). Scale shape: the
    corpus collapses to the daily grain in one map-side-combinable
    aggregation; the per-type mean is a |types|-row broadcast; the
    running sum and the argmax windows are partitioned BY SERIES over
    calendar-bounded (not corpus-bounded) partitions — the same plan
    sweeps years of 100 TB telemetry because nothing after the first
    aggregation sees raw events. Multi-changepoint binary segmentation
    is this operator applied recursively to the two halves."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("x"))
    mu = daily.groupBy("event_type").agg(
        F.avg("x").alias("mu"), F.count(F.lit(1)).alias("n_days")
    )
    run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = daily.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "day",
        "n_days",
        F.round(F.abs(F.sum(F.col("x") - F.col("mu")).over(run)), 4)
        .cast("double")
        .alias("abs_s"),
    )
    pick = Window.partitionBy("event_type").orderBy(F.col("abs_s").desc(), F.col("day"))
    return (
        cusum.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").cast("string").alias("cp_day"),
            "n_days",
            F.col("abs_s").alias("cusum_stat"),
        )
    )


# --- Holt linear exponential smoothing ------------------------------------------
#
# Level+trend recursion l_t = αx_t + (1-α)(l_{t-1}+b_{t-1}),
# b_t = β(l_t − l_{t-1}) + (1-β)b_{t-1} (Holt 1957) — the forecasting
# baseline every capacity/volume monitor runs. The recursion is
# inherently sequential IN TIME but trivially parallel ACROSS series,
# and both engines now ship recursive CTEs, so the qid runs the
# IDENTICAL recursion on both sides: the first real analytics consumer
# of the WITH RECURSIVE primitive q_recursive_cte pins.

HOLT_ALPHA = 0.5  # level gain — exactly representable in binary
HOLT_BETA = 0.25  # trend gain — exactly representable in binary
HOLT_H = 7  # forecast horizon (days)

_HOLT_REC = """
      SELECT d.event_type, d.idx, d.x,
             {A} * d.x + {IA} * (r.l + r.b) AS l,
             {B} * ({A} * d.x + {IA} * (r.l + r.b) - r.l) + {IB} * r.b AS b
      FROM {REC} r JOIN {DAILY} d
        ON d.event_type = r.event_type AND d.idx = r.idx + 1
"""

# The COMPLETE Holt query — daily grain, recursion, MAX_BY report — as
# ONE constant: it is simultaneously both qids' DuckDB oracle and
# q_holt_smoothing's spark.sql body, so the "textually identical on
# both engines" parity claim is structural, not a manual three-way copy
# sync (r15 review).
_HOLT_SQL = f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS idx,
             x
      FROM (
        SELECT event_type, CAST(ts AS DATE) AS day, SUM(value) AS x
        FROM events GROUP BY 1, 2
      )
    ), holt AS (
      SELECT event_type, idx, x, x AS l, CAST(0.0 AS DOUBLE) AS b
      FROM daily WHERE idx = 1
      UNION ALL
      {_HOLT_REC.format(A=HOLT_ALPHA, IA=1.0 - HOLT_ALPHA, B=HOLT_BETA, IB=1.0 - HOLT_BETA, REC="holt", DAILY="daily")}
    )
    SELECT event_type,
           CAST(MAX(idx) AS BIGINT) AS n_days,
           CAST(ROUND(MAX_BY(l, idx), 4) AS DOUBLE) AS level,
           CAST(ROUND(MAX_BY(b, idx), 4) AS DOUBLE) AS trend,
           CAST(ROUND(MAX_BY(l, idx) + {HOLT_H} * MAX_BY(b, idx), 4) AS DOUBLE) AS forecast_{HOLT_H}d
    FROM holt GROUP BY event_type
    """



@query(
    "q_holt_smoothing",
    tags=("timeseries", "analytics"),
    oracle=_HOLT_SQL,
)
def q_holt_smoothing(spark, sf_dir):
    """Holt's linear smoothing per event type over the daily value
    series, initialized at (l₁=x₁, b₁=0), reported as the final level,
    trend, and the h-step-ahead forecast l+h·b. BOTH engines run the
    textually identical recursive CTE — same join per step, same double
    arithmetic with exactly-representable gains (0.5, 0.25) — so the
    rounded outputs hash-match; the only Spark-side difference is DIV
    vs // style, none here.

    Scale shape: the corpus collapses to the daily grain first
    (map-combinable aggregation); the recursion runs |days| UnionLoop
    steps, each ONE hash-join of the |types|-row frontier against the
    calendar-bounded daily table — sequential in time, parallel across
    series, never corpus-touching. For |days| in the thousands the same
    recursion batches per series inside applyInPandas (the q_token_pack
    sequential-scan idiom); the declarative form here is the parity
    surface."""
    from incremental_dagster_delta_spark.tables import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_HOLT_SQL)


def _holt_fold(pdf):
    """Sequential Holt recursion over ONE series, already day-sorted by
    the caller contract. Pure IEEE-double python — the same adds and
    multiplies the recursive CTE runs JVM-side, in the same order, so
    the two paths agree bit-for-bit before rounding."""
    import pandas as pd

    pdf = pdf.sort_values("idx")
    xs = pdf["x"].tolist()
    l, b = xs[0], 0.0
    for x in xs[1:]:
        l_new = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
        b = HOLT_BETA * (l_new - l) + (1 - HOLT_BETA) * b
        l = l_new
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_days": [len(xs)],
            "level": [round(l, 4)],
            "trend": [round(b, 4)],
            "forecast": [round(l + HOLT_H * b, 4)],
        }
    )


@query(
    "q_holt_batched",
    tags=("timeseries", "analytics"),
    # same recursion, same oracle text as q_holt_smoothing
    oracle=_HOLT_SQL,
)
def q_holt_batched(spark, sf_dir):
    """q_holt_smoothing's LONG-SERIES execution path, proven: the same
    recursion runs inside ONE applyInPandas call per series instead of
    |days| sequential UnionLoop stages — constant stage count, the
    per-step join overhead gone (sweep: 9.7 s declarative vs sub-second
    here at sf0.1's 30 days; at 10⁴ days the gap is the difference
    between usable and not). Both qids share the recursive-CTE oracle
    VERBATIM: Arrow-batched python doubles run the identical IEEE adds
    and multiplies in the identical order, so the driver hash-match
    pins python-fold ≡ SQL-recursion ≡ DuckDB-recursion. Series are
    independent, so the groupBy parallelizes across them; a single
    series longer than one task's memory would chunk with carried
    (l, b) state — the q_token_pack sequential-scan idiom."""

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    idxed = daily.select(
        "event_type", F.row_number().over(w).cast("long").alias("idx"), "x"
    )
    out = idxed.groupBy("event_type").applyInPandas(
        _holt_fold,
        "event_type string, n_days long, level double, trend double, forecast double",
    )
    return out.withColumnRenamed("forecast", f"forecast_{HOLT_H}d")
