"""Z-order clustering: files must cover compact ranges in BOTH
dimensions, so min/max stats can skip data for predicates on either."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.functions import zorder_key, zorder_write
from incremental_dagster_delta_spark.tables import load_table


def test_zorder_key_interleaves(spark):
    # driver-side sanity on the bit math: z(0b11, 0b00) = 0b0101
    df = spark.createDataFrame([(3, 0), (0, 3), (1, 1)], "a long, b long")
    rows = {(r["a"], r["b"]): r["z"] for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()}
    assert rows[(3, 0)] == 0b0101
    assert rows[(0, 3)] == 0b1010
    assert rows[(1, 1)] == 0b0011


def test_zorder_write_clusters_both_dims(spark, sf_dir, tmp_path):
    """After z-order clustering on (o_custkey, truncated price), the
    per-file value spans of BOTH columns must be far smaller than the
    global span — the property row-group skipping relies on."""
    out = str(tmp_path / "z")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("long").alias("price")
    )
    zorder_write(orders, out, "o_custkey", "price", n_files=16)

    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) >= 8

    spans_a, spans_b = [], []
    glob_min_a = glob_max_a = glob_min_b = glob_max_b = None
    for f in files:
        t = pq.read_table(f, columns=["o_custkey", "price"])
        a = t.column("o_custkey").to_pylist()
        b = t.column("price").to_pylist()
        if not a:
            continue
        spans_a.append(max(a) - min(a))
        spans_b.append(max(b) - min(b))
        glob_min_a = min(a) if glob_min_a is None else min(glob_min_a, min(a))
        glob_max_a = max(a) if glob_max_a is None else max(glob_max_a, max(a))
        glob_min_b = min(b) if glob_min_b is None else min(glob_min_b, min(b))
        glob_max_b = max(b) if glob_max_b is None else max(glob_max_b, max(b))

    # average per-file span well under the global span in both dims —
    # random placement would put every file's span near the global one
    avg_a = sum(spans_a) / len(spans_a)
    avg_b = sum(spans_b) / len(spans_b)
    assert avg_a < 0.6 * (glob_max_a - glob_min_a), (avg_a, glob_max_a - glob_min_a)
    assert avg_b < 0.6 * (glob_max_b - glob_min_b), (avg_b, glob_max_b - glob_min_b)
    # and the clustered table still holds every row exactly once
    assert spark.read.parquet(out).count() == orders.count()


def test_morton_rank_bits_bounded(spark):
    """r15 review: |quantile boundaries| = 2^bits - 1 per column — bits
    past ~10 blow up the plan long before the interleave-overflow check
    fires; refuse loudly."""
    import pytest

    from incremental_dagster_delta_spark.functions import morton_rank_column

    df = spark.range(10).selectExpr("id AS a", "id AS b")
    with pytest.raises(ValueError, match="bits"):
        morton_rank_column(df, ["a", "b"], bits=16)
    with pytest.raises(ValueError, match="bits"):
        morton_rank_column(df, ["a", "b"], bits=0)
