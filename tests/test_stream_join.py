"""Stream-stream joins and in-flight deduplication.

Two Structured Streaming operators the batch registry can't express:

- **Stream-stream interval join**: clicks join impressions within a
  30-minute attribution window. Both sides carry watermarks and the join
  condition bounds event time on both sides, so Spark can expire join
  state — without the bounds, state grows forever at 100 TB/day.
- **dropDuplicatesWithinWatermark**: exactly-once-per-key emission for
  at-least-once upstreams (the streaming form of ``q_dedup_exact``) with
  state expiry after the watermark delay, vs batch ``dropDuplicates``
  whose state is the whole input.

Both are checked against the batch computation on the same rows.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

T0 = datetime.datetime(2024, 5, 1, 0, 0, 0)

IMP_SCHEMA = StructType(
    [
        StructField("ad_id", LongType()),
        StructField("imp_ts", TimestampType()),
    ]
)
CLK_SCHEMA = StructType(
    [
        StructField("ad_id", LongType()),
        StructField("clk_ts", TimestampType()),
        StructField("clk_id", StringType()),
    ]
)

_JOIN_COND = (
    "imp.ad_id = clk.ad_id AND "
    "clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 30 minutes"
)


def _m(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    imps = [(1, _m(0)), (1, _m(100)), (2, _m(10)), (3, _m(20))]
    clicks = [
        (1, _m(15), "c1"),   # joins imp(1, t0)
        (1, _m(110), "c2"),  # joins imp(1, t100) only — 110 > 0+30
        (2, _m(45), "c3"),   # outside 30min of imp(2, t10) — no match
        (4, _m(5), "c4"),    # no impression at all
    ]
    spark.createDataFrame(imps, IMP_SCHEMA).coalesce(1).write.parquet(imp_dir)
    spark.createDataFrame(clicks, CLK_SCHEMA).coalesce(1).write.parquet(clk_dir)

    si = (
        spark.readStream.schema(IMP_SCHEMA).parquet(imp_dir)
        .withWatermark("imp_ts", "1 hour").alias("imp")
    )
    sc = (
        spark.readStream.schema(CLK_SCHEMA).parquet(clk_dir)
        .withWatermark("clk_ts", "1 hour").alias("clk")
    )
    q = (
        si.join(sc, F.expr(_JOIN_COND))
        .select("clk_id", "imp.ad_id", "imp_ts", "clk_ts")
        .writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["clk_id"], r["ad_id"], r["imp_ts"])
        for r in spark.sql("SELECT * FROM attributed").collect()
    }
    want = {
        (r["clk_id"], r["ad_id"], r["imp_ts"])
        for r in spark.createDataFrame(imps, IMP_SCHEMA).alias("imp")
        .join(spark.createDataFrame(clicks, CLK_SCHEMA).alias("clk"), F.expr(_JOIN_COND))
        .select("clk_id", "imp.ad_id", "imp_ts", "clk_ts")
        .collect()
    }
    assert got == want
    assert ("c1", 1, _m(0)) in got and ("c2", 1, _m(100)) in got
    assert not any(cid in {"c3", "c4"} for cid, _, _ in got)


def test_drop_duplicates_within_watermark(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("payload", StringType()),
        ]
    )
    # id 1 and 2 are delivered twice (retry duplicates, seconds apart);
    # the payloads match so either copy is an acceptable survivor
    rows = [
        (1, _m(0), "a"),
        (1, _m(1), "a"),
        (2, _m(5), "b"),
        (2, _m(6), "b"),
        (3, _m(7), "c"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(in_dir)

    q = (
        spark.readStream.schema(schema).parquet(in_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM deduped").collect()
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]
    assert {r["payload"] for r in out} == {"a", "b", "c"}
