"""Bounded-selection seam (PLANS.md algebra #3) storage story: reservoir
partials published through append_batch fold to the one-shot reservoir,
replays are no-ops in BOTH modes (marker-suppressed same-id replay AND
set-idempotent fresh-id duplicate), and a new batch shifts the sample
exactly as a full recompute would."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.curation import (
    RES_BATCHES,
    RESERVOIR_K,
    reservoir_partial,
)
from incremental_dagster_delta_spark.tableio import PartitionedTable

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _fold(parts_df):
    from pyspark.sql.window import Window

    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":res")))
    w = Window.partitionBy("source").orderBy(draw, F.col("doc_id"))
    return (
        parts_df.distinct()
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "source")
    )


def _rows(df):
    return sorted((r["doc_id"], r["source"]) for r in df.collect())


def test_fold_of_partials_equals_full(spark, docs):
    full = _rows(reservoir_partial(docs))  # one "batch" holding everything
    parts = None
    for b in range(RES_BATCHES):
        p = reservoir_partial(docs.where(F.col("doc_id") % RES_BATCHES == b))
        parts = p if parts is None else parts.unionByName(p)
    assert _rows(_fold(parts)) == full


def test_published_partials_fold_and_replay(spark, docs, tmp_path):
    tbl = PartitionedTable(spark, str(tmp_path / "res"), [])
    for b in range(RES_BATCHES):
        part = reservoir_partial(docs.where(F.col("doc_id") % RES_BATCHES == b))
        assert tbl.append_batch(part, b)
    folded = _rows(_fold(tbl.read()))
    assert folded == _rows(reservoir_partial(docs))

    # marker replay: same batch id writes nothing
    part0 = reservoir_partial(docs.where(F.col("doc_id") % RES_BATCHES == 0))
    assert tbl.append_batch(part0, 0) is False
    assert _rows(_fold(tbl.read())) == folded

    # set replay: identical rows under a FRESH id still fold to the same
    # sample — the distinct() in the fold makes bounded selection
    # at-least-once tolerant
    assert tbl.append_batch(part0, RES_BATCHES + 7)
    assert _rows(_fold(tbl.read())) == folded


def test_new_batch_shifts_like_full_recompute(spark, docs, tmp_path):
    """Admitting a genuinely new slice must update the folded sample to
    exactly the full recompute over the enlarged corpus — elements can
    only be displaced by better draws, never resurrected."""
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    tbl = PartitionedTable(spark, str(tmp_path / "res2"), [])
    tbl.append_batch(reservoir_partial(old), 0)
    before = _rows(_fold(tbl.read()))
    tbl.append_batch(reservoir_partial(new), 1)
    after = _rows(_fold(tbl.read()))
    assert after == _rows(reservoir_partial(docs))
    # monotone per source: a source never loses coverage, only swaps
    # members for better draws (the even half covers only the even
    # sources at this testdata's source=f(doc_id) layout, so new
    # sources may APPEAR — but none may vanish)
    assert {s for _, s in before} <= {s for _, s in after}
    import collections

    per_source = collections.Counter(s for _, s in after)
    assert all(n <= RESERVOIR_K for n in per_source.values())
