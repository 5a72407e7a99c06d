"""Exact distributed order statistics (iterative bracket refinement):
the selection must return the exact rank-th element with only bounded
driver collects, across adversarial shapes — heavy duplicates (bracket
collapse), skewed distributions, and edge ranks."""

from __future__ import annotations

import pytest

from incremental_dagster_delta_spark.queries.analytics import exact_order_statistic
from incremental_dagster_delta_spark.tables import literal_df


def _check_all_ranks(spark, values):
    df = literal_df(spark, [(float(v),) for v in values], "v double")
    ordered = sorted(float(v) for v in values)
    # sample a few ranks incl. both edges
    n = len(ordered)
    ranks = sorted({1, n, (n + 1) // 2, max(1, n // 4), max(1, (3 * n) // 4)})
    for r in ranks:
        got = exact_order_statistic(df, "v", r)
        assert got == ordered[r - 1], (r, got, ordered[r - 1])


def test_ordstat_exact_on_mixed_values(spark):
    _check_all_ranks(spark, [3.7, -2.1, 0.0, 99.5, 3.7, 3.7, -2.1, 50.0, 1e-9, -1e9])


def test_ordstat_all_equal_collapses_bracket(spark):
    """Every value identical: min == max, width 0 on pass one — must
    return the value, not loop."""
    _check_all_ranks(spark, [5.5] * 200)


def test_ordstat_heavy_duplicate_mode(spark):
    """One value holds >90% of the mass: the containing bin stops
    shrinking by count, so termination must come from the final-collect
    branch (bin count <= limit), never from width alone."""
    _check_all_ranks(spark, [7.0] * 500 + [1.0, 2.0, 3.0, 100.0, 200.0])


def test_ordstat_rank_bounds_rejected(spark):
    df = literal_df(spark, [(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError):
        exact_order_statistic(df, "v", 0)
    with pytest.raises(ValueError):
        exact_order_statistic(df, "v", 3)


def test_ordstat_matches_sorted_on_random_draws(spark):
    """Property: on pseudo-random multimodal draws the selection equals
    python sorted()[r-1] for every sampled rank."""
    import hashlib

    # deterministic pseudo-random doubles (no RNG in tests: derive from md5)
    vals = []
    for i in range(3000):
        h = int(hashlib.md5(f"ordstat:{i}".encode()).hexdigest()[:12], 16)
        vals.append((h % 10_000_000) / 997.0 - 3000.0)
    _check_all_ranks(spark, vals)


def test_hist_quantiles_match_python_reference_on_random_draws(spark):
    """Property: the fixed-width histogram estimator equals a pure-python
    reimplementation (cumulate bins, interpolate within the containing
    bin) on pseudo-random multimodal draws — pinning the estimator
    algebra itself, independent of the DuckDB oracle."""
    import hashlib
    import math

    from incremental_dagster_delta_spark.queries.sketches import (
        HIST_BIN_W,
        QUANTILE_QS,
        hist_cells,
        hist_quantiles,
    )

    vals = []
    for i in range(5000):
        h = int(hashlib.md5(f"hist:{i}".encode()).hexdigest()[:12], 16)
        vals.append((h % 3_000_000) / 7919.0)  # [0, ~379)

    df = literal_df(spark, [(v,) for v in vals], "value double")
    got = {r["q"]: r["hist_estimate"] for r in hist_quantiles(hist_cells(df)).collect()}

    bins = {}
    for v in vals:
        b = math.floor(v / HIST_BIN_W)
        bins[b] = bins.get(b, 0) + 1
    n = len(vals)
    for q in QUANTILE_QS:
        target = q * n
        cum = 0
        for b in sorted(bins):
            if cum < target <= cum + bins[b]:
                expect = round(b * HIST_BIN_W + HIST_BIN_W * (target - cum) / bins[b], 4)
                break
            cum += bins[b]
        assert got[q] == expect, (q, got[q], expect)
