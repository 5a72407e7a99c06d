"""Expectation / data-quality gate tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.quality import (
    ExpectationError,
    enforce,
    split,
    violation_counts,
)

RULES = {
    "positive_value": "value > 0",
    "known_type": "event_type IN ('click', 'view')",
    "has_user": "user_id IS NOT NULL",
}


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "click", 10.0),
            (2, "view", -1.0),          # violates positive_value
            (None, "click", 5.0),       # violates has_user
            (4, "purchase", 0.0),       # violates known_type AND positive_value
            (5, "view", None),          # value NULL → positive_value passes (SQL CHECK)
        ],
        "user_id long, event_type string, value double",
    )


def test_violation_counts_single_job(spark):
    counts = violation_counts(_frame(spark), RULES)
    assert counts == {"positive_value": 2, "known_type": 1, "has_user": 1}


def test_split_tags_quarantine_rows(spark):
    frames = split(_frame(spark), RULES)
    assert sorted(r["user_id"] for r in frames.good.collect() if r["user_id"]) == [1, 5]
    q = {r["user_id"]: sorted(r["_violations"]) for r in frames.quarantine.collect()}
    assert q[2] == ["positive_value"]
    assert q[4] == ["known_type", "positive_value"]
    assert q[None] == ["has_user"]
    # good + quarantine partition the input
    assert frames.good.count() + frames.quarantine.count() == 5


def test_enforce_fail_and_drop(spark):
    df = _frame(spark)
    with pytest.raises(ExpectationError) as e:
        enforce(df, RULES, mode="fail")
    assert e.value.counts["positive_value"] == 2

    clean = df.where(F.col("value") > 0).where(F.col("user_id").isNotNull()).where(
        F.col("event_type").isin("click", "view")
    )
    assert enforce(clean, RULES, mode="fail") is clean

    kept = enforce(df, RULES, mode="drop")
    assert kept.count() == 2


def test_null_passes_like_sql_check(spark):
    """NULL rule results pass (SQL CHECK semantics) unless the rule
    names nullability explicitly."""
    df = _frame(spark)
    assert violation_counts(df, {"v_pos": "value > 0"})["v_pos"] == 2  # row 5 passes
    assert violation_counts(df, {"v_set": "value IS NOT NULL"})["v_set"] == 1


def test_pipeline_quarantine_gate(spark, tmp_path):
    """Expectations wired into IngestPipeline: failing rows land in the
    quarantine table (tagged), good rows flow to processed/backwards,
    and the partition good+quarantine == all input files holds across
    incremental waves (exactly-once on both tables)."""
    from incremental_dagster_delta_spark.sources.fixture import generate_ingest_fixture
    from incremental_dagster_delta_spark.streaming.pipeline import IngestPipeline

    root, tables = str(tmp_path / "ingest"), str(tmp_path / "tables")
    written = generate_ingest_fixture(root, wave=0)
    pipe = IngestPipeline(
        spark, root, tables, expectations={"short_word": "word_length <= 6"}
    )
    pipe.run_incremental()
    written += generate_ingest_fixture(root, wave=1)
    pipe.run_incremental()

    good = pipe.processed.read()
    quar = pipe.quarantine.read()
    assert good.where(F.col("word_length") > 6).count() == 0
    assert quar.where(F.col("word_length") <= 6).count() == 0
    assert set(quar.columns) >= {"filename", "word", "_violations", "day"}
    assert {tuple(r["_violations"]) for r in quar.collect()} == {("short_word",)}
    assert good.count() + quar.count() == len(written)
    # backwards derives from the gated rows only
    assert pipe.backwards.read().count() == good.count()


def test_empty_rules_are_a_pass(spark):
    """r15 review: an expectations dict built conditionally can end up
    empty — no rules means nothing to violate, not an internal agg
    error."""
    from incremental_dagster_delta_spark.quality import enforce, violation_counts

    df = spark.createDataFrame([(1,)], "value long")
    assert violation_counts(df, {}) == {}
    assert enforce(df, {}, mode="fail") is df
    assert enforce(df, {}, mode="drop").count() == 1


def test_split_refuses_existing_violations_column(spark):
    """r15 review: split() must not silently overwrite (and, in good,
    destroy) a pre-existing _violations column."""
    import pytest

    from incremental_dagster_delta_spark.quality import split

    df = spark.createDataFrame([(1, ["old"])], "value long, _violations array<string>")
    with pytest.raises(ValueError, match="_violations"):
        split(df, {"pos": "value > 0"})
