"""Custom Python DataSource (Spark 4 API): batch + streaming drip
generator replacing the reference's generate.py file-dripper."""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.sources.drip import DripDataSource


def _register(spark):
    # registration is idempotent per session; re-register is allowed
    spark.dataSource.register(DripDataSource)


def test_batch_drip_deterministic_and_partitioned(spark):
    _register(spark)
    df = spark.read.format("drip").option("n_rows", 100).option("num_partitions", 8).load()
    assert df.count() == 100
    assert df.columns == ["word", "word_length", "day"]
    # generation is split across real input partitions
    assert df.rdd.getNumPartitions() == 8
    # deterministic: same options → identical corpus
    again = spark.read.format("drip").option("n_rows", 100).option("num_partitions", 8).load()
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))
    # derived column is consistent
    assert df.where(F.length("word") != F.col("word_length")).count() == 0


def test_streaming_drip_advances_offsets(spark, tmp_path):
    _register(spark)

    out_dir = str(tmp_path / "out")

    def start_query():
        return (
            spark.readStream.format("drip")
            .option("rows_per_batch", 7)
            .option("max_rows", 21)
            .option("seed", 7)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .start()
        )

    q = start_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.read.parquet(out_dir).collect()
    assert len(first) == 21  # drained exactly to the available bound

    # restart from the checkpoint: offset {row: 21} recovered, nothing
    # replayed, nothing new available
    q = start_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    again = spark.read.parquet(out_dir).collect()
    assert len(again) == 21
    assert all(isinstance(r["word"], str) and r["word"] for r in again)
    assert all(r["word_length"] == len(r["word"]) for r in again)


def test_continuous_trigger_drip_respects_admission_control(spark, tmp_path):
    """Low-latency drip mode (SURVEY §7-M8d): a processingTime trigger
    polls the drip source on a cadence — the live analogue of the
    reference's 30-60 s file dripper — and the source's rows_per_batch
    admission limit bounds EVERY micro-batch, so a burst of available
    rows becomes a sequence of small committed batches instead of one
    large one. Pins: per-batch numInputRows ≤ the admission limit, the
    drip drains to completion across multiple batches, and exactly-once
    output under the continuous cadence."""
    import time

    _register(spark)
    out_dir = str(tmp_path / "cont_out")
    q = (
        spark.readStream.format("drip")
        .option("rows_per_batch", 5)
        .option("max_rows", 20)
        .option("seed", 11)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cont_cp"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 90
        drained = 0
        while time.monotonic() < deadline:
            try:
                drained = spark.read.parquet(out_dir).count()
            except Exception:
                drained = 0  # sink dir not created yet
            if drained >= 20:
                break
            time.sleep(0.5)
        assert drained == 20, f"drip did not drain under continuous trigger: {drained}"
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
    # admission control bounded every micro-batch, and the drain took
    # multiple trigger firings (not one cluster-sized batch)
    assert len(progress) >= 4, [p["numInputRows"] for p in progress]
    assert all(p["numInputRows"] <= 5 for p in progress), [
        p["numInputRows"] for p in progress
    ]
    # exactly-once: 20 distinct generated rows, none replayed
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 20
    assert all(r["word_length"] == len(r["word"]) for r in rows)


def test_batch_drip_corpus_invariant_to_parallelism(spark):
    """r15 review: per-partition seeding made the corpus a function of
    num_partitions; absolute-position seeding (the stream reader's
    device, now shared) makes the same (seed, n_rows) yield the same
    rows under ANY partition count — and the batch corpus is the
    stream's prefix."""
    spark.dataSource.register(DripDataSource)

    def rows(parts):
        df = (
            spark.read.format("drip")
            .option("n_rows", 57)
            .option("num_partitions", parts)
            .load()
        )
        return sorted((r["word"], r["word_length"], r["day"]) for r in df.collect())

    assert rows(1) == rows(4) == rows(16)
    from incremental_dagster_delta_spark.sources.drip import row_at

    assert rows(1) == sorted(row_at(i, 42) for i in range(57))


def test_batch_drip_empty_corpus(spark):
    """r15 review: n_rows=0 returns an empty partition list, which
    pyspark substitutes with [None] — the reader must yield an empty
    DataFrame, not crash on partition.seed."""
    spark.dataSource.register(DripDataSource)
    df = spark.read.format("drip").option("n_rows", 0).load()
    assert df.count() == 0
