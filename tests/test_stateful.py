"""Custom stateful streaming operator test: applyInPandasWithState
sessionization must agree with the batch gaps-and-islands computation for
every session the watermark has closed."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incremental_dagster_delta_spark.streaming.stateful import sessionize

T0 = datetime.datetime(2024, 5, 1)
SCHEMA = "user_id long, ts timestamp"
GAP_S = 600  # 10 minutes


def _events(spec):
    """spec: (user_id, minutes_after_t0)."""
    return [(u, T0 + datetime.timedelta(minutes=m)) for u, m in spec]


def _batch_sessions(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = df.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > GAP_S, 1
        ).otherwise(F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(w))
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(in_dir)

    # user 1: two sessions (gap > 10m); user 2: one session
    wave1 = _events([(1, 0), (1, 5), (1, 8), (1, 30), (1, 32), (2, 0), (2, 9)])
    spark.createDataFrame(wave1, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = (
            sessionize(stream, gap_seconds=GAP_S, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # wave 2 pushes the watermark far past every session's gap horizon so
    # all sessions above close; its own session stays open
    wave2 = _events([(1, 600), (2, 601)])
    spark.createDataFrame(wave2, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    run()
    run()  # timeout processing fires on the batch after the watermark advance

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.schema(
            "user_id long, session_start timestamp, session_end timestamp, n_events long"
        )
        .parquet(out_dir)
        .collect()
    }
    want = _batch_sessions(spark, wave1)  # wave2 sessions are still open
    assert got == want, f"got {sorted(got)}\nwant {sorted(want)}"


def test_stateful_sessionize_merges_out_of_order_events(spark, tmp_path):
    """r15 review: an on-time but out-of-order event must extend the
    session it belongs to (lowering its start), not be absorbed into
    whichever session happens to be open — and no session may be
    emitted before the watermark passes its gap horizon (an in-batch
    gap does not prove closure)."""
    in_dir, out_dir, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    os.makedirs(in_dir)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = (
            sessionize(stream, gap_seconds=GAP_S, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def emit(spec):
        spark.createDataFrame(_events(spec), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    emit([(1, 0), (1, 20)])  # two separate open sessions (gap 10m)
    run()
    # out-of-order but ON-TIME (watermark is 1h behind minute 20):
    # belongs to the minute-0 session, 15 minutes before the open
    # minute-20 one — the pre-r15 fold absorbed it there
    emit([(1, 5)])
    run()
    emit([(1, 600)])  # pushes the watermark past both horizons
    run()
    run()  # timeout pass
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.schema(
            "user_id long, session_start timestamp, session_end timestamp, n_events long"
        )
        .parquet(out_dir)
        .collect()
    }
    t = lambda m: T0 + datetime.timedelta(minutes=m)  # noqa: E731
    assert got == {(1, t(0), t(5), 2), (1, t(20), t(20), 1)}, sorted(got)
