"""Source-format robustness: malformed-record handling on the JSONL
ingestion path.

A 100 TB raw corpus always contains broken lines; the engine's contract
is PERMISSIVE parsing with corrupt-record capture (quarantine-able,
count-able) rather than job failure — FAILFAST is opt-in for
must-be-clean feeds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

GOOD = [
    '{"doc_id": 1, "text": "alpha beta", "n_chars": 10}',
    '{"doc_id": 2, "text": "gamma", "n_chars": 5}',
]
BAD = [
    '{"doc_id": 3, "text": "unterminated',  # broken JSON
    "not json at all",
]


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "part-0.jsonl").write_text("\n".join(GOOD[:1] + BAD[:1] + GOOD[1:] + BAD[1:]) + "\n")
    return str(p)


def test_permissive_captures_corrupt_records(spark, jsonl_dir):
    schema = "doc_id long, text string, n_chars long, _corrupt string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(jsonl_dir)
    ).cache()
    good = df.where(F.col("_corrupt").isNull())
    bad = df.where(F.col("_corrupt").isNotNull())
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 2
    # the raw broken line is preserved for quarantine/debugging
    assert any("unterminated" in r["_corrupt"] for r in bad.collect())
    df.unpersist()


def test_failfast_raises_on_corrupt(spark, jsonl_dir):
    df = (
        spark.read.schema("doc_id long, text string, n_chars long")
        .option("mode", "FAILFAST")
        .json(jsonl_dir)
    )
    with pytest.raises(Exception) as e:
        df.collect()
    assert "Malformed" in str(e.value) or "FAILFAST" in str(e.value)
