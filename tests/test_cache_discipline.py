"""Cache-leak regression (r2 verdict item 5 / ADVICE): queries that
persist() intermediates must free them before returning, so a 100-query
driver session never accumulates cached blocks."""

from __future__ import annotations

import pytest

from incremental_dagster_delta_spark.queries import QUERIES


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


# Every qid whose implementation calls persist() on an intermediate.
CACHING_QIDS = [
    "q_ngram_jaccard",
    "q_ngram_jaccard_prefix",
    "q_dedup_minhash",
    "q_dedup_near_keep",
    "q_cosine_ann_ivf",
    "q_cosine_ann_rplsh",
]


@pytest.mark.parametrize("qid", CACHING_QIDS)
def test_no_persisted_intermediates_after_query(spark, sf_dir, qid):
    # Warm once first: a query's FIRST run per session may additionally
    # materialize memoized per-corpus statistics (the _hot_shingles
    # ANALYZE-stats checkpoint), which is a deliberate one-time
    # session-lifetime block, not a per-call leak (ADVICE r15). What
    # this test pins is that a 100-query driver session does not
    # ACCUMULATE blocks call over call — i.e. steady-state growth ≤ 1
    # (the query's own localCheckpoint result).
    QUERIES[qid].fn(spark, sf_dir).count()
    spark.catalog.clearCache()
    before = _persistent_rdd_count(spark)
    df = QUERIES[qid].fn(spark, sf_dir)
    assert df.count() >= 0
    # The query's own localCheckpoint result may hold ONE small block set;
    # every persisted intermediate (inverted index, band table, IVF
    # assignment) must already be gone when the query returns.
    after = _persistent_rdd_count(spark)
    assert after - before <= 1, (
        f"{qid} leaked {after - before - 1} persisted intermediate(s)"
    )
