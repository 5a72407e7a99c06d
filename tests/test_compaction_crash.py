"""Crash-test compact()'s swap window (r2 verdict item 8).

compact() publishes via: write staging (``.compacting``) → rename root →
``.precompact`` → rename staging → root → move ``_commits`` → delete
``.precompact``. Each test reproduces the exact on-disk state a crash at
one of those points leaves behind, then asserts ``recover()`` converges to
a complete, readable table with its commit history intact — the
"readers never see a partial table" guarantee the parquet fallback owes
to Delta parity.
"""

from __future__ import annotations

import os
import shutil

from incremental_dagster_delta_spark.tableio import PartitionedTable


def _make_table(spark, path: str) -> PartitionedTable:
    table = PartitionedTable(spark, path, ["day"])
    df = spark.createDataFrame(
        [(i, f"v{i}", "2024-01-0" + str(1 + i % 2)) for i in range(10)],
        "k long, v string, day string",
    )
    table.append_batch(df.repartition("day"), 1)
    return table


def _assert_intact(table: PartitionedTable) -> None:
    assert table.read().count() == 10
    assert sorted(r["k"] for r in table.read().collect()) == list(range(10))
    assert table.committed_batches() == [1]
    for suffix in (".compacting", ".precompact"):
        assert not os.path.exists(table.path.rstrip("/") + suffix)


def test_crash_before_first_rename(spark, tmp_path):
    """Staging written, swap not started: root is live, staging is junk."""
    path = str(tmp_path / "t")
    table = _make_table(spark, path)
    table.read().write.mode("overwrite").partitionBy("day").parquet(path + ".compacting")
    table.recover()
    _assert_intact(table)


def test_crash_between_renames(spark, tmp_path):
    """Root renamed away, staging not yet promoted — the worst window:
    the table path does not exist at all. Recovery must roll BACK."""
    path = str(tmp_path / "t")
    table = _make_table(spark, path)
    table.read().write.mode("overwrite").partitionBy("day").parquet(path + ".compacting")
    os.rename(path, path + ".precompact")
    assert not os.path.exists(path)
    table.recover()
    _assert_intact(table)


def test_crash_after_promote_before_marker_move(spark, tmp_path):
    """Staging promoted to root, but _commits still lives in .precompact.
    Recovery must roll FORWARD and salvage the markers."""
    path = str(tmp_path / "t")
    table = _make_table(spark, path)
    table.read().write.mode("overwrite").partitionBy("day").parquet(path + ".compacting")
    os.rename(path, path + ".precompact")
    os.rename(path + ".compacting", path)
    # markers were not moved: root has none, .precompact has them
    assert not os.path.exists(os.path.join(path, "_commits"))
    table.recover()
    _assert_intact(table)


def test_crash_after_marker_move_before_cleanup(spark, tmp_path):
    """Everything moved; only the .precompact delete was lost."""
    path = str(tmp_path / "t")
    table = _make_table(spark, path)
    table.read().write.mode("overwrite").partitionBy("day").parquet(path + ".compacting")
    os.rename(path, path + ".precompact")
    os.rename(path + ".compacting", path)
    shutil.move(os.path.join(path + ".precompact", "_commits"), os.path.join(path, "_commits"))
    table.recover()
    _assert_intact(table)


def test_compact_runs_recovery_first(spark, tmp_path):
    """compact() itself must self-heal a previous interrupted swap before
    rewriting, so a crashed compaction followed by another compaction
    never loses data."""
    path = str(tmp_path / "t")
    table = _make_table(spark, path)
    table.read().write.mode("overwrite").partitionBy("day").parquet(path + ".compacting")
    os.rename(path, path + ".precompact")  # crash between renames
    n = table.compact()
    assert n > 0
    assert table.read().count() == 10
    assert table.committed_batches() == [1]


def test_compact_honors_target_files_per_partition(spark, tmp_path):
    """ADVICE fix: repartition by partition cols alone always yields one
    file per leaf; the salt path must yield ~target files per leaf."""
    path = str(tmp_path / "t")
    table = PartitionedTable(spark, path, ["day"])
    df = spark.createDataFrame(
        [(i, f"v{i}", "2024-01-01") for i in range(200)], "k long, v string, day string"
    )
    # many small input files
    table.append(df.repartition(16))
    leaf = os.path.join(path, "day=2024-01-01")
    n_before = len([f for f in os.listdir(leaf) if f.endswith(".parquet")])
    assert n_before >= 8
    table.compact(target_files_per_partition=3)
    n_after = len([f for f in os.listdir(leaf) if f.endswith(".parquet")])
    assert 1 <= n_after <= 3
    assert table.read().count() == 200
    table.compact(target_files_per_partition=1)
    n_single = len([f for f in os.listdir(leaf) if f.endswith(".parquet")])
    assert n_single == 1
    assert table.read().count() == 200


def test_read_as_of_collapsed_history_error(spark, tmp_path):
    """ADVICE fix: after compaction rewrites away b{id}- prefixed files,
    read_as_of must raise a descriptive error, not an inscrutable
    schema-inference failure."""
    import pytest

    path = str(tmp_path / "t")
    table = _make_table(spark, path)
    assert table.read_as_of(1).count() == 10  # history intact pre-compact
    table.compact()
    with pytest.raises(ValueError, match="history was\n?.*collapsed|collapsed"):
        table.read_as_of(1)
