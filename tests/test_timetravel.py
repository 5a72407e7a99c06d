"""Time-travel (snapshot-as-of-batch) reads on PartitionedTable.

The reference inherits version history from delta-rs; here the
``b{batch_id}-`` file prefixes plus commit markers reconstruct any
committed snapshot.
"""

from __future__ import annotations

from incremental_dagster_delta_spark.tableio import PartitionedTable


def _keys(df):
    return sorted(r["k"] for r in df.collect())


def test_read_as_of_reconstructs_each_snapshot(spark, tmp_path):
    table = PartitionedTable(spark, str(tmp_path / "t"), ["day"])
    schema = "k long, v string, day string"
    table.append_batch(
        spark.createDataFrame([(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], schema), 0
    )
    table.append_batch(spark.createDataFrame([(3, "c", "2024-01-01")], schema), 1)
    table.append_batch(spark.createDataFrame([(4, "d", "2024-01-03")], schema), 2)

    assert table.committed_batches() == [0, 1, 2]
    assert _keys(table.read_as_of(0)) == [1, 2]
    assert _keys(table.read_as_of(1)) == [1, 2, 3]
    assert _keys(table.read_as_of(2)) == [1, 2, 3, 4]
    # as-of between commits resolves to the highest committed id below it
    assert _keys(table.read_as_of(10)) == [1, 2, 3, 4]
    # current read sees everything the latest snapshot sees
    assert _keys(table.read()) == _keys(table.read_as_of(2))
    # partition columns survive the file-list read path
    snap = table.read_as_of(1)
    assert "day" in snap.columns
    assert sorted(r["day"] for r in snap.collect()) == [
        "2024-01-01",
        "2024-01-01",
        "2024-01-02",
    ]


def test_read_as_of_skips_uncommitted_and_empty(spark, tmp_path):
    table = PartitionedTable(spark, str(tmp_path / "t"), ["day"])
    schema = "k long, v string, day string"
    table.append_batch(spark.createDataFrame([(1, "a", "2024-01-01")], schema), 0)
    # empty batch commits a marker but publishes no files
    table.append_batch(spark.createDataFrame([], schema), 1)
    assert table.committed_batches() == [0, 1]
    assert _keys(table.read_as_of(1)) == [1]

    import pytest

    with pytest.raises(ValueError):
        table.read_as_of(-1)


def test_schema_evolution_merge_read(spark, tmp_path):
    """A later append may add columns (Delta mergeSchema parity): the
    merged read surfaces new columns as nulls on old rows; the default
    read keeps the original schema cheap."""
    table = PartitionedTable(spark, str(tmp_path / "t"), ["day"])
    table.append(spark.createDataFrame([(1, "a", "2024-01-01")], "k long, v string, day string"))
    table.append(
        spark.createDataFrame(
            [(2, "b", 7.5, "2024-01-02")], "k long, v string, score double, day string"
        )
    )
    merged = table.read(merge_schema=True)
    assert set(merged.columns) == {"k", "v", "score", "day"}
    by_k = {r["k"]: r["score"] for r in merged.collect()}
    assert by_k == {1: None, 2: 7.5}
    assert merged.count() == 2


def test_commit_markers_carry_row_metrics(spark, tmp_path):
    """append_batch records numOutputRows in the commit marker (Delta
    operationMetrics parity) via an Observation — no second counting
    job."""
    table = PartitionedTable(spark, str(tmp_path / "t"), ["day"])
    schema = "k long, v string, day string"
    table.append_batch(
        spark.createDataFrame([(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], schema), 0
    )
    table.append_batch(spark.createDataFrame([(3, "c", "2024-01-01")], schema), 1)
    table.append_batch(spark.createDataFrame([], schema), 2)
    m = table.batch_metrics()
    assert m[0]["rows"] == 2
    assert m[1]["rows"] == 1
    assert m[2]["rows"] == 0
