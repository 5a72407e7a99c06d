"""Concurrent-writer behavior of PartitionedTable.append_batch — the
documented guarantee matrix for the marker-based commit protocol
(tableio.py), pinning the remaining semantic distance to the reference's
delta-rs transactions (delta_io.py:112-116):

- distinct batch ids, disjoint OR overlapping partitions: concurrent
  appends commute (per-batch staging dirs, per-batch file prefixes,
  per-batch markers — no shared mutable state);
- same batch id, serialized writers: the second observes the commit
  marker and no-ops (returns False) — the foreachBatch replay contract;
- same batch id, truly concurrent writers: OUT OF CONTRACT (Spark's
  checkpoint serializes micro-batch replays; a real Delta log would add
  optimistic concurrency here — documented in tableio.py:8-21).
"""

from __future__ import annotations

import threading

from incremental_dagster_delta_spark.tableio import PartitionedTable


def _df(spark, day: str, n: int, base: int):
    return spark.createDataFrame(
        [(base + i, f"w{base + i}", day) for i in range(n)],
        "id long, word string, day string",
    )


def _run_threads(fns):
    errs = []

    def wrap(fn):
        try:
            fn()
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    threads = [threading.Thread(target=wrap, args=(fn,)) for fn in fns]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs


def test_concurrent_appends_disjoint_partitions(spark, tmp_path):
    table = PartitionedTable(spark, str(tmp_path / "t1"), ["day"])
    _run_threads(
        [
            lambda: table.append_batch(_df(spark, "2024-01-01", 7, 0), 1),
            lambda: table.append_batch(_df(spark, "2024-01-02", 9, 100), 2),
        ]
    )
    out = table.read()
    assert out.count() == 16
    assert out.where("day = '2024-01-01'").count() == 7
    assert out.where("day = '2024-01-02'").count() == 9
    metrics = table.batch_metrics()
    assert metrics[1]["rows"] == 7 and metrics[2]["rows"] == 9


def test_concurrent_appends_same_partition(spark, tmp_path):
    """Two writers landing in the SAME leaf partition directory must both
    commit: published file names carry the b{batch_id}- prefix, so the
    renames can never collide."""
    table = PartitionedTable(spark, str(tmp_path / "t2"), ["day"])
    _run_threads(
        [
            lambda: table.append_batch(_df(spark, "2024-01-03", 5, 0), 1),
            lambda: table.append_batch(_df(spark, "2024-01-03", 6, 100), 2),
        ]
    )
    out = table.read().where("day = '2024-01-03'")
    assert out.count() == 11
    # every row exactly once — no clobbered or doubled files
    assert out.select("id").distinct().count() == 11


def test_same_batch_id_second_writer_noops(spark, tmp_path):
    """A second writer handle (fresh PartitionedTable over the same path
    — e.g. a restarted pipeline replaying its last micro-batch) must
    observe the commit marker and skip, leaving the table unchanged."""
    path = str(tmp_path / "t3")
    first = PartitionedTable(spark, path, ["day"])
    assert first.append_batch(_df(spark, "2024-01-04", 4, 0), 7) is True
    second = PartitionedTable(spark, path, ["day"])
    assert second.append_batch(_df(spark, "2024-01-04", 4, 50), 7) is False
    out = first.read()
    assert out.count() == 4
    assert {r["id"] for r in out.collect()} == {0, 1, 2, 3}
