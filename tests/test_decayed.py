"""Exponentially-decayed counters: the fixed-reference-instant trick
that makes recency weighting additive. Pins the exactly-once fold, the
rescale-at-read identity, and the decay direction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import t
from incremental_dagster_delta_spark.queries.timeseries import (
    DECAY_PER_DAY,
    DECAY_T_REF_US,
    decayed_partials,
)


def test_decayed_partials_exactly_once_and_rescale(spark, sf_dir, tmp_path):
    """Two waves + a marker-replayed wave through append_batch must fold
    to the one-shot partials over the full table; and reading the fold
    'as of' a later instant is exactly the folded total times one
    constant — no history re-scan."""
    from incremental_dagster_delta_spark.tableio import PartitionedTable

    e = t(spark, sf_dir, "events")
    w1 = e.where(F.col("event_id") % 2 == 0)
    w2 = e.where(F.col("event_id") % 2 == 1)

    tbl = PartitionedTable(spark, str(tmp_path / "decay"), ["event_type"])
    assert tbl.append_batch(decayed_partials(w1), batch_id=0) is True
    assert tbl.append_batch(decayed_partials(w2), batch_id=1) is True
    assert tbl.append_batch(decayed_partials(w2), batch_id=1) is False  # replay no-op

    def fold(df):
        return {
            r["event_type"]: (r["n"], round(r["d"], 4))
            for r in df.groupBy("event_type")
            .agg(F.sum("n_events").alias("n"), F.sum("decayed_sum").alias("d"))
            .collect()
        }

    incr = fold(tbl.read())
    oneshot = fold(decayed_partials(e))
    assert incr == oneshot

    # rescale-at-read: weights at T_REF + 7 days = weights at T_REF × e^(-7λ)
    later_us = DECAY_T_REF_US + 7 * 86_400_000_000
    age_later = (F.lit(later_us) - F.unix_micros(F.col("ts"))) / F.lit(86400e6)
    direct = {
        r["event_type"]: r["d"]
        for r in e.groupBy("event_type")
        .agg(F.sum(F.exp(-DECAY_PER_DAY * age_later)).alias("d"))
        .collect()
    }
    scale = math.exp(-DECAY_PER_DAY * 7)
    for k, (_, d) in incr.items():
        assert abs(direct[k] - d * scale) < 1e-6 * max(1.0, direct[k]), k

    # decay direction: every decayed count is strictly below the raw count
    assert all(d < n for n, d in incr.values())
