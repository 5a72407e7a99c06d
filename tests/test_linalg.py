"""Linear-algebra qids: PCA pinned against a direct numpy recomputation
(q_pca_topk is rows-only — eigendecomposition has no SQL oracle) and the
bucketed-join plan shape (the qid's value claim is checked by the oracle;
its SCALE claim — zero shuffle around the join — is checked here)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _embeddings_matrix() -> np.ndarray:
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    return np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)


def test_pca_topk_matches_numpy(spark):
    """Corpus-scale PCA via the pca_topk kernel (the qid itself runs the
    pinned literal scenario against its VALUES oracle)."""
    from incremental_dagster_delta_spark.queries.linalg import pca_topk
    from incremental_dagster_delta_spark.tables import load_table

    x = _embeddings_matrix()
    cov = np.cov(x, rowvar=False, ddof=1)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    total = float(np.sum(np.clip(np.linalg.eigvalsh(cov), 0.0, None)))

    rows = pca_topk(spark, load_table(spark, SF_DIR, "embeddings")).orderBy("component").collect()
    assert len(rows) == 8
    cum = 0.0
    for r in rows:
        expect = evals[r["component"]]
        assert abs(r["eigenvalue"] - expect) < 1e-3, (r["component"], r["eigenvalue"], expect)
        assert abs(r["evr"] - expect / total) < 1e-3
        cum_next = r["cum_evr"]
        assert cum_next >= cum - 1e-9  # monotone cumulative ratio
        cum = cum_next


def test_gram_matrix_matches_numpy(spark):
    x = _embeddings_matrix()
    g = x.T @ x
    rows = QUERIES["q_gram_matrix"].fn(spark, SF_DIR).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows[:200]:
        assert abs(r["g"] - g[r["i"], r["j"]]) < 1e-3


def test_bucketed_join_qid_plan(spark):
    """The qid's plan must actually use the bucket layout: bucketed scans
    on both sides, a sort-merge join with NO Exchange below it — the only
    shuffle in the whole query is the final aggregation."""
    df = QUERIES["q_bucketed_join"].fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    assert "SortMergeJoin" in tree
    assert tree.count("Exchange") == 1, f"expected only the agg Exchange:\n{tree}"
    # Exchange must sit ABOVE the join (agg), not below it (shuffle-join)
    assert tree.index("Exchange") < tree.index("SortMergeJoin")
    assert plan.count("Bucketed: true") == 2, "both scans must read the bucket layout"


def test_gram_matrix_plan_shape(spark):
    """The Gram plan must be: scan -> MapInArrow (batch-local partials)
    -> partial agg -> ONE Exchange -> final agg. Any second Exchange or
    a missing map-side partial means the d² reduction happens after the
    shuffle — the shape that stops scaling."""
    df = QUERIES["q_gram_matrix"].fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    assert "MapInArrow" in tree
    assert tree.count("Exchange") == 1, tree
    # partial aggregation sits below the Exchange (map-side combine)
    assert tree.index("Exchange") < tree.index("MapInArrow")
    assert tree.count("HashAggregate") == 2, tree


def test_zorder_layout_buckets_are_compact(spark):
    """Every z-bucket's rectangle must be small relative to the full
    0..255 square — the data-skipping property the layout exists for."""
    rows = QUERIES["q_zorder_layout"].fn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 64
    for r in rows:
        assert r["max_x"] - r["min_x"] <= 64
        assert r["max_y"] - r["min_y"] <= 64
