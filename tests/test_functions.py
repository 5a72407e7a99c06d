"""Time-macro function tests, incl. the ISO year/week boundary property
the reference gets wrong (SURVEY.md §7.2; delta_io.py:38-43 vs 63-67)."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.functions import expand_time, iso_year, single_time


def _dates_df(spark, dates):
    return spark.createDataFrame([(d.isoformat(),) for d in dates], ["d"]).withColumn(
        "d", F.to_date("d")
    )


def test_iso_year_week_matches_python_isocalendar(spark):
    """iso_year/weekofyear must agree with Python's datetime.isocalendar
    over random dates including year boundaries."""
    rng = random.Random(7)
    dates = [
        datetime.date(2020, 1, 1) + datetime.timedelta(days=rng.randrange(0, 3650)) for _ in range(200)
    ]
    # deliberately include the hard boundary cases
    dates += [
        datetime.date(2024, 12, 30),  # ISO 2025-W01
        datetime.date(2025, 1, 1),  # ISO 2025-W01
        datetime.date(2021, 1, 1),  # ISO 2020-W53
        datetime.date(2016, 1, 3),  # ISO 2015-W53
    ]
    df = _dates_df(spark, dates).select(
        "d",
        iso_year(F.col("d")).alias("iso_y"),
        F.weekofyear("d").alias("iso_w"),
    )
    for row in df.collect():
        y, w, _ = row["d"].isocalendar()
        assert (row["iso_y"], row["iso_w"]) == (y, w), f"{row['d']}: {(row['iso_y'], row['iso_w'])} != {(y, w)}"


def test_expand_time_daily_zero_padded(spark):
    df = expand_time(_dates_df(spark, [datetime.date(2024, 3, 6)]), "d", "daily")
    row = df.collect()[0]
    assert (row["year"], row["month"], row["day"]) == ("2024", "03", "06")


def test_expand_time_weekly_pairs_iso_year(spark):
    df = expand_time(_dates_df(spark, [datetime.date(2024, 12, 30)]), "d", "weekly")
    row = df.collect()[0]
    assert (row["year"], row["week"]) == ("2025", "01")


def test_single_time_weekly_key(spark):
    df = single_time(_dates_df(spark, [datetime.date(2024, 12, 30)]), "d", "weekly")
    assert df.collect()[0]["week"] == "2025-01"


def test_single_time_hourly_key(spark):
    df = spark.createDataFrame([("2024-03-06 13:00:00",)], ["d"]).withColumn(
        "d", F.col("d").cast("timestamp")
    )
    assert single_time(df, "d", "hourly").collect()[0]["hour"] == "2024-03-06-13"
