"""Deletion-vector engine seams (tableio.DeletionVectors): the replay
matrix (marker replay, set replay), purge watermark persistence, corrupt
watermark degradation, crash-mid-purge convergence, and the empty-batch
guard. The happy-path lifecycle aggregate is driver-checked by
q_deletion_vectors' DuckDB oracle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.tableio import DeletionVectors, PartitionedTable

from tests.conftest import SF_DIR

# Excluded from the default run so `pytest tests/` fits the driver's
# verify budget (pyproject addopts); scripts/partest.py runs it.
pytestmark = pytest.mark.slow


@pytest.fixture()
def loaded(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    base = PartitionedTable(spark, str(tmp_path / "t"), ["source"])
    assert base.append_batch(docs, 0)
    return docs, base, DeletionVectors(base, "doc_id")


def _k(docs, mod, eq=0):
    return docs.where(F.col("doc_id") % mod == eq).select("doc_id")


def test_mark_and_read_excludes(spark, loaded):
    docs, base, dv = loaded
    n0 = base.read().count()
    n7 = _k(docs, 7).count()
    assert dv.mark_deleted(_k(docs, 7), 1)
    assert dv.read().count() == n0 - n7
    # base itself untouched — soft delete only
    assert base.read().count() == n0


def test_marker_replay_is_noop(spark, loaded):
    docs, base, dv = loaded
    dv.mark_deleted(_k(docs, 7), 1)
    before = dv.read().count()
    dv.mark_deleted(_k(docs, 7), 1)  # same batch id: marker suppresses
    assert dv.read().count() == before
    assert dv.sidecar.committed_batches() == [1]


def test_set_replay_fresh_batch_is_noop(spark, loaded):
    """Stronger than exactly-once: duplicate keys under a FRESH batch id
    fold to the same set (at-least-once tolerant, like HLL registers)."""
    docs, base, dv = loaded
    dv.mark_deleted(_k(docs, 7), 1)
    before = dv.read().count()
    dv.mark_deleted(_k(docs, 7), 2)
    assert dv.read().count() == before


def test_purge_bakes_and_watermark_persists(spark, loaded, tmp_path):
    docs, base, dv = loaded
    n0 = base.read().count()
    n7 = _k(docs, 7).count()
    dv.mark_deleted(_k(docs, 7), 1)
    assert dv.purge() > 0
    # physically removed: the RAW base read no longer has the rows
    assert base.read().count() == n0 - n7
    assert dv.applied_through() == 1
    # post-purge batch applies on top of rewritten files
    extra = _k(docs, 11, 3).join(_k(docs, 7), "doc_id", "left_anti")
    dv.mark_deleted(_k(docs, 11, 3), 2)
    assert dv.read().count() == n0 - n7 - extra.count()
    # a FRESH handle sees the persisted watermark (metadata on disk)
    dv2 = DeletionVectors(PartitionedTable(spark, str(tmp_path / "t"), ["source"]), "doc_id")
    assert dv2.applied_through() == 1
    assert dv2.read().count() == dv.read().count()


def test_corrupt_watermark_degrades_to_reapply(spark, loaded, tmp_path):
    """An unreadable watermark must degrade to 0 (re-apply everything):
    purged keys are gone from the files, so re-anti-joining them is a
    no-op — correctness holds, only the join is wasted."""
    docs, base, dv = loaded
    dv.mark_deleted(_k(docs, 7), 1)
    expect = dv.read().count()
    dv.purge()
    with open(str(tmp_path / "t" / "_dv_applied"), "w") as f:
        f.write("{not json")
    assert dv.applied_through() == -1
    assert dv.read().count() == expect


def test_crash_mid_purge_converges(spark, loaded, tmp_path, monkeypatch):
    """Crash AFTER partition rewrites but BEFORE the watermark advance:
    reads stay correct immediately (stale watermark re-applies removed
    keys — no-op) and the purge retry completes the protocol."""
    docs, base, dv = loaded
    n0 = base.read().count()
    n7 = _k(docs, 7).count()
    dv.mark_deleted(_k(docs, 7), 1)

    boom = RuntimeError("crash before watermark")
    real_advance = DeletionVectors._advance_watermark
    monkeypatch.setattr(
        DeletionVectors, "_advance_watermark", lambda self, th: (_ for _ in ()).throw(boom)
    )
    with pytest.raises(RuntimeError):
        dv.purge()
    monkeypatch.setattr(DeletionVectors, "_advance_watermark", real_advance)

    # rows already rewritten out; stale watermark re-applies them: no-op
    assert base.read().count() == n0 - n7
    assert dv.applied_through() == -1
    assert dv.read().count() == n0 - n7
    # retry converges the watermark
    dv.purge()
    assert dv.applied_through() == 1
    assert dv.read().count() == n0 - n7


def test_empty_delete_batch_skipped(spark, loaded):
    """An empty delete batch commits a 0-row marker (so its replay is
    suppressed, S7 semantics) but must leave reads untouched — and the
    marker-only sidecar (no data file at all) must not break the read's
    schema inference (the _has_dv_rows metadata gate)."""
    docs, base, dv = loaded
    assert dv.mark_deleted(_k(docs, 7).where(F.lit(False)), 1) is False
    assert dv.sidecar.committed_batches() == [1]  # marker committed...
    assert dv.sidecar.batch_metrics()[1]["rows"] == 0  # ...for zero rows
    assert dv.read().count() == base.read().count()
    assert dv.purge() == 0  # nothing to bake
    # a later real batch still applies on top of the empty one
    dv.mark_deleted(_k(docs, 7), 2)
    assert dv.read().count() == base.read().count() - _k(docs, 7).count()


def test_read_predicate_pushes_to_base(spark, loaded):
    """The predicate applies on the base scan (pruning/pushdown side),
    not after the anti-join — and composes with deletes."""
    docs, base, dv = loaded
    dv.mark_deleted(_k(docs, 7), 1)
    one_source = docs.select("source").orderBy("source").limit(1).collect()[0]["source"]
    got = dv.read(f"source = '{one_source}'")
    expect = docs.where(
        (F.col("source") == one_source) & (F.col("doc_id") % 7 != 0)
    ).count()
    assert got.count() == expect
    assert got.select("source").distinct().collect()[0]["source"] == one_source


def test_deletes_maintained_by_real_stream_with_restart(spark, loaded, tmp_path):
    """Production wiring: delete keys arrive as a Structured Streaming
    file source and apply through foreachBatch mark_deleted, across a
    STREAM RESTART (new query, same checkpoint). Checkpoint-assigned
    batch ids drive the exactly-once markers; the served read must equal
    base minus the union of every streamed key — and a purge mid-history
    must not disturb subsequent streamed deletes."""
    from incremental_dagster_delta_spark.tables import literal_df

    docs, base, dv = loaded
    in_dir = str(tmp_path / "dv_in")
    ckpt = str(tmp_path / "dv_ckpt")

    def handle(batch_df, batch_id):
        dv.mark_deleted(batch_df, batch_id)

    def run_stream():
        q = (
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    n0 = base.read().count()
    w1 = [(int(r["doc_id"]),) for r in _k(docs, 7).collect()]
    literal_df(spark, w1, "doc_id long").coalesce(1).write.mode("append").parquet(in_dir)
    run_stream()
    assert dv.read().count() == n0 - len(w1)

    dv.purge()  # bake wave 1; the stream keeps its checkpoint cursor

    # restart: wave 2 arrives, a NEW query resumes from the checkpoint
    w2 = [
        (int(r["doc_id"]),)
        for r in _k(docs, 11, 3).join(_k(docs, 7), "doc_id", "left_anti").collect()
    ]
    literal_df(spark, w2, "doc_id long").coalesce(1).write.mode("append").parquet(in_dir)
    run_stream()
    assert dv.read().count() == n0 - len(w1) - len(w2)
    # wave 1 is physically gone, wave 2 still soft
    assert base.read().count() == n0 - len(w1)


def test_concurrent_delete_batches_commute(spark, loaded):
    """Distinct-id delete batches commute exactly like distinct-id
    appends (each has its own staging dir, file prefix, and marker), and
    the set-union algebra makes the ORDER immaterial — serving reads the
    same survivors either way."""
    import threading

    docs, base, dv = loaded
    k7 = [int(r["doc_id"]) for r in _k(docs, 7).collect()]
    k11 = [int(r["doc_id"]) for r in _k(docs, 11, 3).collect()]
    from incremental_dagster_delta_spark.tables import literal_df

    errs = []

    def mark(keys, bid):
        try:
            dv.mark_deleted(literal_df(spark, [(k,) for k in keys], "doc_id long"), bid)
        except Exception as ex:  # pragma: no cover - failure surface
            errs.append(ex)

    t1 = threading.Thread(target=mark, args=(k7, 1))
    t2 = threading.Thread(target=mark, args=(k11, 2))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert sorted(dv.sidecar.committed_batches()) == [1, 2]
    expect = base.read().count() - len(set(k7) | set(k11))
    assert dv.read().count() == expect


def test_restore_refused_after_purge(spark, loaded):
    """purge() rewrites partitions without batch prefixes — exactly like
    compact(), it collapses restore history: rolling the BASE back past
    a purge must refuse loudly (the rolled-back batch wrote rows but its
    prefixed files are gone), not resurrect a half-history."""
    docs, base, dv = loaded
    base.append_batch(
        docs.withColumn("doc_id", F.col("doc_id") + 100000), 5
    )
    dv.mark_deleted(_k(docs, 7), 1)
    dv.purge()  # rewrites every partition: b0-/b5- prefixes gone
    with pytest.raises(ValueError, match="collapsed"):
        base.restore(0)
    # current state still fully served
    n7 = _k(docs, 7).count()
    assert dv.read().count() == 2 * docs.count() - n7
