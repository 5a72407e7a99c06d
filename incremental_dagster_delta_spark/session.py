"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for correctness parity with the DuckDB oracle (UTC
session timezone, ANSI off) and for 100 TB-scale hygiene (AQE on with
partition coalescing and skew-join handling, dynamic partition overwrite for
partition-scoped refresh — the Parquet equivalent of Delta ``replaceWhere``,
see reference ``ingest_example/delta_io.py:91-107``).
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "incremental-dagster-delta-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    On a real cluster the master/memory settings come from spark-submit; in
    this repo's tests and bench we run ``local[N]``. All other settings are
    cluster-appropriate:

    - AQE enabled with partition coalescing + skew-join handling, so shuffle
      partition counts self-tune at any scale factor.
    - ``partitionOverwriteMode=dynamic`` so ``mode("overwrite")`` replaces
      only the partitions present in the written DataFrame (partition-scoped
      refresh, reference delta_io.py:92-107).
    - UTC session timezone so date/time functions agree with the DuckDB
      oracle and are stable across machines.
    - Arrow transfers on, so any Pandas-UDF path is vectorized.
    """
    n = cpus or _default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * n))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # keep hive partition values as strings, matching the reference's
        # string-typed partition columns (delta_io.py:108-110)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT96 (Spark's legacy default) is deprecated in the parquet
        # spec, carries no footer min/max stats (so neither Spark row-
        # group skipping nor the Delta-log stats export can prune on
        # timestamps), and no Delta writer emits it. TIMESTAMP_MICROS is
        # lossless for Spark's microsecond timestamps.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # events.parquet ships nanosecond timestamps; read as LONG and
        # convert in tables.load_table (also set there at runtime for
        # driver-owned sessions)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed tables (co-located joins) need a catalog warehouse;
        # keep it out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft/warehouse"),
        )
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


@contextlib.contextmanager
def runtime_filtering(
    spark: SparkSession,
    application_side_threshold: str = "10GB",
    force_shuffle_join: bool = False,
):
    """Enable Spark's runtime bloom-filter injection for the enclosed
    queries.

    When a shuffle join has a selective predicate on one side, Catalyst
    builds a bloom filter over that side's join keys at runtime and
    injects ``might_contain(xxhash64(key))`` into the other side's scan —
    pruning fact rows *before* they are shuffled. On a 100 TB fact join
    this cuts shuffle volume roughly by the dim predicate's selectivity,
    which AQE alone cannot do (it only re-plans sizes, it doesn't filter
    rows). Off by default because below
    ``application_side_threshold`` of scanned bytes the filter costs
    more than it saves; local tests lower the threshold to force it.

    ``force_shuffle_join`` additionally disables broadcast joins so the
    injection path is exercised even when the dim side would broadcast
    (at real scale the creation side is often above the broadcast
    threshold but still selective).
    """
    saved = {}

    def _set(k: str, v: str) -> None:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)

    _set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    _set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        application_side_threshold,
    )
    if force_shuffle_join:
        _set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
