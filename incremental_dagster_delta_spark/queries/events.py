"""Event-stream operators: JSON extraction and event-time windows
(SURVEY.md §2.5).

The ``events`` table is the batch image of a stream (event_id, ts,
user_id, event_type, value, props JSON-in-string). The window queries are
written with the same ``F.window`` / ``F.session_window`` operators the
streaming path uses — ``tests/test_streaming.py`` runs the tumbling
variant as a real Structured Streaming query with ``withWatermark`` and
checks it agrees with this batch form.

Scale notes: windowed aggregations shuffle on (window, key) — at 100 TB
the key space is (hour × event_type), tiny, and partial aggregation does
nearly all the work map-side. The session window is the only stateful
shuffle keyed by user_id (high cardinality, evenly distributed — no skew).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_SQL_TS_FMT = "%Y-%m-%d %H:%M:%S"


# --- q_json_extract: JSON field extraction (props -> k) ---------------------


@query(
    "q_json_extract",
    tags=("events", "llm"),
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q_json_extract(spark, sf_dir):
    """get_json_object on the string-JSON props column, grouped — the
    schema-on-read path for semi-structured event payloads."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
            "value",
        )
        .groupBy("k_value")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


# --- q_tumbling_window: 1-hour tumbling event-time windows ------------------


@query(
    "q_tumbling_window",
    tags=("events", "window", "llm"),
    bench=True,
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_SQL_TS_FMT}') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark, sf_dir):
    """F.window(ts, '1 hour') tumbling aggregation — identical operator to
    the streaming version (which adds withWatermark; see tests)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --- q_sliding_window: 1-hour windows sliding every 30 minutes --------------


@query(
    "q_sliding_window",
    tags=("events", "window", "llm"),
    oracle=f"""
    WITH buckets AS (
      SELECT to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800) AS window_start, value FROM events
      UNION ALL
      SELECT to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800) AS window_start, value
      FROM events
    )
    SELECT strftime(window_start, '{_SQL_TS_FMT}') AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM buckets
    GROUP BY 1
    """,
)
def q_sliding_window(spark, sf_dir):
    """F.window(ts, '1 hour', '30 minutes'): each event lands in 2
    overlapping windows. The oracle expands the two slide buckets
    explicitly (UNION ALL) — same semantics, no window operator needed."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "n",
            "total_value",
        )
    )


# --- q_session_window: 10-minute-gap sessions per user ----------------------


@query(
    "q_session_window",
    tags=("events", "window", "llm"),
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             -- >= (not >): Spark's session_window is end-EXCLUSIVE — an
             -- event at exactly lag(ts) + gap starts a NEW session
             -- (ADVICE r2: latent divergence if an exact-gap pair occurs)
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 10 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             -- event_id tiebreak MUST match the flagged pass: two window
             -- passes seeing different tie orders over duplicate
             -- (user_id, ts) rows can split one session (r15 review;
             -- the q_interval_merge unique-key rule)
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '{_SQL_TS_FMT}') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_session_window(spark, sf_dir):
    """F.session_window(ts, '10 minutes') per user — dynamic-gap windows.
    The oracle derives identical sessions with the classic
    gaps-and-islands window construction (lag + cumulative flag sum)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events",
        )
    )


# --- Markov transition matrix over per-user event sequences ------------------


@query(
    "q_event_transitions",
    tags=("events", "window", "llm"),
    bench=True,
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ), counts AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(ROUND(n / SUM(n) OVER (PARTITION BY from_type), 4) AS DOUBLE) AS p
    FROM counts
    """,
)
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: lead() pairs each event with its successor (ts order,
    event_id tiebreak for same-timestamp determinism), transition counts
    aggregate globally, and row-normalized probabilities come from a
    window over the |types|² matrix. The sequence-statistics pass behind
    session modeling and next-action features. One shuffle on user_id
    for the sequencing sort, one narrow agg on the (from, to) pair —
    the per-user sort is the same partitioning every sessionization op
    shares, so at 100 TB this pipelines after q_session_window with no
    extra exchange."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    seq = e.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    counts = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    return counts.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(Window.partitionBy("from_type")), 4)
        .cast("double")
        .alias("p"),
    )
