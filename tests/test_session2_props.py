"""Independent pins for the session-2 analytics (beyond the DuckDB
oracle differential): brute-force dominance for the Pareto frontier,
a pure-python Holt replay, RBO bounds/weight algebra, and KS-statistic
range — each checked against the qid's own output at sf0.001, so a
shared-oracle blind spot cannot hide a math error."""

from __future__ import annotations

import math

import pytest

from incremental_dagster_delta_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return QUERIES[name].fn(spark, SF)


def test_pareto_frontier_matches_bruteforce(spark):
    """Every kept doc must be non-dominated and every dropped doc
    dominated — checked by the O(n·frontier) definition directly on the
    full (n_chars, uniq_tokens) point set."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.registry import t as _t

    d = _t(spark, SF, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    pts = {
        r["doc_id"]: (r["n"], r["u"])
        for r in d.select(
            "doc_id",
            F.col("n_chars").alias("n"),
            F.size(F.array_distinct(toks)).alias("u"),
        ).collect()
    }
    kept = {r["doc_id"] for r in _run(spark, "q_pareto_frontier").collect()}

    def dominated(p, q):  # q dominates p
        return q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])

    for doc, p in pts.items():
        is_dom = any(dominated(p, q) for other, q in pts.items() if other != doc)
        assert (doc in kept) == (not is_dom), (doc, p, doc in kept)


def test_holt_matches_pure_python_replay(spark):
    """The recursive-CTE smoothing must equal a sequential python replay
    of the same recursion over the same daily series."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.registry import t as _t
    from incremental_dagster_delta_spark.queries.timeseries import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_H,
    )

    e = _t(spark, SF, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum("value").alias("x"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(float(r["x"]))
    got = {r["event_type"]: r for r in _run(spark, "q_holt_smoothing").collect()}
    assert set(got) == set(series)
    for ty, xs in series.items():
        l, b = xs[0], 0.0
        for x in xs[1:]:
            l_new = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (l_new - l) + (1 - HOLT_BETA) * b
            l = l_new
        assert got[ty]["n_days"] == len(xs)
        assert got[ty]["level"] == pytest.approx(round(l, 4), abs=1e-9)
        assert got[ty]["trend"] == pytest.approx(round(b, 4), abs=1e-9)
        assert got[ty][f"forecast_{HOLT_H}d"] == pytest.approx(
            round(l + HOLT_H * b, 4), abs=1e-9
        )


def test_rbo_bounds_and_weight_algebra(spark):
    """RBO must land in [0, 1]; the weight table must sum to the
    truncated-RBO value of two IDENTICAL rankings (every depth overlap
    = d → RBO = (1-p)·Σ p^(d-1)); and n_common must bound rbo from
    above via the max weight."""
    from incremental_dagster_delta_spark.queries.vector_compress import (
        MAT_K,
        RBO_P,
        _rbo_weights,
    )

    w = _rbo_weights()
    identical = sum(w)  # every item first seen at its own rank m, all K present
    expect = (1 - RBO_P) * sum(RBO_P ** (d - 1) for d in range(1, MAT_K + 1))
    assert identical == pytest.approx(expect, abs=1e-12)
    assert all(w[i] >= w[i + 1] for i in range(len(w) - 1))  # deeper ⇒ smaller

    for r in _run(spark, "q_rbo_eval").collect():
        assert 0.0 <= r["rbo"] <= round(identical, 4) + 1e-9
        assert r["rbo"] <= round(r["n_common"] * w[0], 4) + 1e-9
        if r["n_common"] == 0:
            assert r["rbo"] == 0.0


def test_ks_stat_range_and_known_identity(spark):
    """KS statistics live in (0, 1]; and a source whose length
    distribution equals its complement's would score 0 — verified on a
    synthetic two-source frame via the same integer-numerator formula."""
    for r in _run(spark, "q_ks_drift").collect():
        assert 0.0 < r["ks_stat"] <= 1.0
        assert r["n_src"] > 0

    # identity: identical distributions → every cum_src·n_rest == cum_rest·n_src
    vals = [10, 20, 30] * 4
    a = sorted(vals)
    b = sorted(vals)
    n_a, n_b = len(a), len(b)
    grid = sorted(set(a) | set(b))
    max_num = 0
    for v in grid:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        max_num = max(max_num, abs(ca * n_b - cb * n_a))
    assert max_num == 0
