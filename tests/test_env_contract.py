"""Environment-contract pins (VERDICT r3 item 8).

The r3 round was dominated by one silent environment shift: PySpark 4.1.2
stopped honoring ``spark.sql.legacy.parquet.nanosAsLong``, so the events
table's ``timestamp[ns]`` column changed dtype under us and 19 queries
broke at once. These tests pin every environment assumption the repo makes
so the NEXT version bump surfaces as one clear failure here instead of 40
mysterious ones elsewhere.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incremental_dagster_delta_spark.tables import load_table


def test_events_load_yields_timestamp(spark, sf_dir):
    """load_table must normalize events.ts to session-tz TimestampType
    regardless of how the parquet reader surfaces timestamp[ns]."""
    df = load_table(spark, sf_dir, "events")
    ts_field = df.schema["ts"]
    assert isinstance(ts_field.dataType, T.TimestampType), ts_field.dataType
    row = df.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert isinstance(row["lo"], datetime.datetime)
    assert row["lo"].year >= 2020 and row["hi"].year <= 2030


def test_events_values_match_duckdb_microseconds(spark, sf_dir):
    """ns→µs truncation must agree with DuckDB's TIMESTAMP read of the
    same file (the oracle harness depends on this)."""
    duckdb = pytest.importorskip("duckdb")
    df = load_table(spark, sf_dir, "events")
    got = df.orderBy("event_id").select("event_id", "ts").limit(5).collect()
    want = duckdb.sql(
        f"SELECT event_id, ts FROM read_parquet('{sf_dir}/events.parquet') "
        "ORDER BY event_id LIMIT 5"
    ).fetchall()
    for g, w in zip(got, want):
        assert g["event_id"] == w[0]
        assert g["ts"] == w[1], (g["ts"], w[1])


def test_events_dtype_branches_cover_reader_behavior(spark, sf_dir):
    """The raw reader must produce one of the dtypes load_table branches
    on; anything else (e.g. a future ns-native TimestampNTZ(9)) should
    fail HERE with a clear message."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = dict(raw.dtypes)["ts"]
    assert ts_dtype in ("bigint", "timestamp_ntz", "timestamp"), (
        f"parquet reader now surfaces timestamp[ns] as {ts_dtype!r}; "
        "update tables.load_table's dtype branch"
    )


def test_session_timezone_is_utc(spark):
    """NTZ→timestamp cast is value-preserving only under UTC session tz."""
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_noop_sink_available(spark, sf_dir):
    """bench.py writes to format('noop') to avoid measuring driver
    deserialization."""
    load_table(spark, sf_dir, "region").write.format("noop").mode("overwrite").save()


def test_python_datasource_api_available():
    """sources/drip.py subclasses the Python DataSource API (Spark 4+)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader  # noqa: F401


def test_bench_capacity_canary_shape():
    """bench.py's host-capacity canary must return positive GB/s for the
    1/8/32-thread probes — the driver records it in BENCH_r{N}.json and
    cross-round ratios are normalized by it (docs/SCALE.md r12/r13)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    c = bench._capacity_canary()
    assert set(c) == {"t1", "t8", "t32"}
    assert all(v > 0 for v in c.values())
    # No cross-thread ratio assertion: on an oversubscribed host the
    # t32 probe legitimately lands below t1 (the canary's entire job is
    # to MEASURE that), so a timing ratio here flakes under load
    # (ADVICE r13). Shape + positivity are the contract.
