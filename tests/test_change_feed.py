"""Change-feed engine seams (tableio.change_feed): window composition,
one-delete-per-row-lifetime, the shared-version-sequence guard, history
collapse refusal, and the empty-window schema. The scripted-history
aggregate itself is driver-checked by q_change_data_feed's oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.tableio import (
    DeletionVectors,
    PartitionedTable,
    change_feed,
)


@pytest.fixture()
def history(spark, tmp_path):
    base = PartitionedTable(spark, str(tmp_path / "t"), ["day"])
    dv = DeletionVectors(base, "k")
    schema = "k long, day string"

    def rows(ks, day):
        return spark.createDataFrame([(k, day) for k in ks], schema)

    base.append_batch(rows([1, 2, 3], "d1"), 0)
    base.append_batch(rows([4, 5], "d1"), 1)
    dv.mark_deleted(rows([2, 4], "d1").select("k"), 2)
    base.append_batch(rows([6], "d2"), 3)
    dv.mark_deleted(rows([2, 6], "d1").select("k"), 4)  # k=2 again: no event
    return base, dv, rows


def _events(df):
    return sorted((r["k"], r["_change_type"], r["_commit_version"]) for r in df.collect())


def test_full_window_and_composition(spark, history):
    base, dv, rows = history
    full = _events(change_feed(base, dv, 0, 4))
    assert full == [
        (2, "delete", 2),
        (4, "delete", 2),
        (4, "insert", 1),
        (5, "insert", 1),
        (6, "delete", 4),
        (6, "insert", 3),
    ]
    # windows compose: (0,2] ∪ (2,4] == (0,4]
    first = _events(change_feed(base, dv, 0, 2))
    second = _events(change_feed(base, dv, 2, 4))
    assert sorted(first + second) == full
    # k=2's SECOND delete mark (v4) emitted nothing — one event per row
    # lifetime, at the version where the row actually existed
    assert (2, "delete", 4) not in full


def test_empty_window_keeps_schema(spark, history):
    base, dv, rows = history
    empty = change_feed(base, dv, 4, 4)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "day", "_change_type", "_commit_version"}


def test_shared_sequence_guard(spark, history):
    base, dv, rows = history
    # commit version 5 in BOTH ledgers → ambiguous → refuse
    base.append_batch(rows([7], "d2"), 5)
    dv.mark_deleted(rows([5], "d1").select("k"), 5)
    with pytest.raises(ValueError, match="BOTH ledgers"):
        change_feed(base, dv, 0, 5)
    # a window excluding the ambiguous version still reads fine
    assert len(_events(change_feed(base, dv, 0, 4))) == 6


def test_collapse_refusal_after_compact(spark, history):
    base, dv, rows = history
    base.compact()  # rewrites files without b{id}- prefixes
    with pytest.raises(ValueError, match="collapsed"):
        change_feed(base, dv, 0, 4)


def test_feed_replays_to_current_state(spark, history):
    """Applying the feed's events over the (empty) from-snapshot must
    reproduce dv.read(): inserts minus deletes == the served table."""
    base, dv, rows = history
    feed = change_feed(base, dv, 0, 4).withColumnRenamed("k", "fk")
    # start from snapshot-as-of version 0 (the from_batch state)
    state = {r["k"] for r in base.read_as_of(0).collect()}
    for r in sorted(feed.collect(), key=lambda r: r["_commit_version"]):
        if r["_change_type"] == "insert":
            state.add(r["fk"])
        else:
            state.discard(r["fk"])
    served = {r["k"] for r in dv.read().collect()}
    assert state == served
