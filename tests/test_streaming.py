"""Structured Streaming semantics: event-time windows with watermarks
(reference I12 — late/open-partition handling, improved per SURVEY.md
§7.5), checked against the batch form of the same operator."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ]
)

T0 = datetime.datetime(2024, 5, 1, 0, 0, 0)


def _rows(spec):
    """spec: list of (minutes_after_t0, event_type)."""
    return [
        (i, T0 + datetime.timedelta(minutes=m), et) for i, (m, et) in enumerate(spec)
    ]


def _windowed(df):
    return (
        df.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def _run_stream(spark, in_dir, out_dir, cp_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        _windowed(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_stream_with_watermark_drops_late_data(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    os.makedirs(in_dir)

    # wave 1: events across hours 0..3 (watermark ends at 3h - 1h = 2h)
    wave1 = _rows([(5, "click"), (20, "click"), (65, "view"), (130, "click"), (185, "view")])
    spark.createDataFrame(wave1, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, out_dir, cp_dir)

    # wave 2: one genuinely late event in hour 0 (beyond the 1h watermark)
    # plus a new event advancing time to hour 5
    wave2 = _rows([(10, "click"), (305, "view")])
    spark.createDataFrame(wave2, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, out_dir, cp_dir)
    # third run with no new data flushes windows finalized by the last
    # watermark advance
    _run_stream(spark, in_dir, out_dir, cp_dir)

    emitted = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.schema(
            "window_start string, event_type string, n long"
        ).parquet(out_dir).collect()
    }

    # the hour-0 click window must count wave-1's 2 clicks only — the
    # late wave-2 event (minute 10) arrived with watermark at 2h05 and
    # must have been dropped
    assert emitted[("2024-05-01 00:00:00", "click")] == 2
    # every emitted window matches the batch computation WITHOUT the late
    # event
    on_time = wave1 + [wave2[1]]
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in _windowed(spark.createDataFrame(on_time, SCHEMA)).collect()
    }
    for key, n in emitted.items():
        assert batch.get(key) == n, f"window {key}: stream={n} batch={batch.get(key)}"


def test_streaming_complete_mode_matches_batch(spark, tmp_path):
    """Complete-mode windowed aggregation over a stream equals the batch
    q_tumbling_window operator on the same rows."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rows = _rows([(1, "a"), (30, "a"), (61, "b"), (62, "a"), (150, "b")])
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        _windowed(stream)
        .writeStream.format("memory")
        .queryName("win_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_complete").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in _windowed(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert got == want
