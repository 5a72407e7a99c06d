"""Trained quality classifier (queries/quality_clf.py): exact
equivalence against a pure-Python NB fit, the it-actually-learns pin
(trained accuracy beats the majority baseline at every shipped SF), the
ln→floor boundary-margin pin (the one float surface), and the plan
shape (D-bounded weight broadcast, map-side-combinable postings agg)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.quality_clf import (
    BIAS_KEY,
    N_BUCKETS,
    RATIO,
    SCALE,
    STOPWORDS,
    q_quality_classifier,
    q_quality_scores,
)


def _ilogp(c: float, tot: float) -> int:
    return math.floor(math.log(c / tot) * SCALE + 0.5)


def _python_fit(spark, sf_dir):
    """The identical NB fit on collected tokens — plain dict arithmetic,
    no Spark beyond reading the parquet."""
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    import hashlib

    docs = {}
    for r in rows:
        toks = [w for w in r["text"].lower().split(" ") if w]
        s = sum(1 for w in toks if w in STOPWORDS)
        y = 1 if RATIO * s >= len(toks) else 0
        f = {}
        for w in toks:
            b = hashlib.md5(w.encode()).hexdigest()[:2]
            f[b] = f.get(b, 0) + 1
        docs[r["doc_id"]] = {"y": y, "f": f}
    cpos, cneg = {}, {}
    tpos = tneg = npos = 0
    for d in docs.values():
        npos += d["y"]
        for b, x in d["f"].items():
            if d["y"]:
                cpos[b] = cpos.get(b, 0) + x
                tpos += x
            else:
                cneg[b] = cneg.get(b, 0) + x
                tneg += x
    buckets = sorted(set(cpos) | set(cneg))
    w = {
        b: _ilogp(cpos.get(b, 0) + 1.0, tpos + float(N_BUCKETS))
        - _ilogp(cneg.get(b, 0) + 1.0, tneg + float(N_BUCKETS))
        for b in buckets
    }
    nd = len(docs)
    w[BIAS_KEY] = _ilogp(npos + 1.0, nd + 2.0) - _ilogp(nd - npos + 1.0, nd + 2.0)
    return docs, w


def test_weights_match_python_reference(spark, sf_dir):
    docs, ref_w = _python_fit(spark, sf_dir)
    got = {r["bucket"]: r["weight"] for r in q_quality_classifier(spark, sf_dir).collect()}
    assert got == ref_w


def test_margins_match_python_reference(spark, sf_dir):
    docs, w = _python_fit(spark, sf_dir)
    ref = {
        did: sum(w[b] * x for b, x in d["f"].items()) + w[BIAS_KEY]
        for did, d in docs.items()
    }
    got = {r["doc_id"]: r["margin"] for r in q_quality_scores(spark, sf_dir).collect()}
    assert got == ref


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_classifier_beats_majority(spark, sf):
    """The distilled model must actually LEARN the rule: strictly more
    accurate than always predicting the majority class. Deterministic —
    no seeds, no tolerance."""
    rows = q_quality_scores(spark, sf).collect()
    n = len(rows)
    npos = sum(r["label"] for r in rows)
    majority = max(npos, n - npos) / n
    acc = sum(1 for r in rows if r["pred"] == (r["label"] == 1)) / n
    assert acc > majority, (acc, majority)
    # and the classes are genuinely both present (the label is not
    # degenerate at this SF — otherwise the pin above is vacuous)
    assert 0 < npos < n


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ilogp_floor_boundary_margin(spark, sf):
    """The single float surface: ln((c+1)/(t+D))·SCALE + 0.5 must sit
    well away from the floor boundary for every (bucket, class) pair at
    the compared SFs, so a ulp-level libm difference between engines
    cannot flip an integer weight (the unigram-LM margin device)."""
    tok = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
            ).alias("tok"),
        )
    )
    lab = tok.groupBy("doc_id").agg(
        F.when(
            RATIO * F.sum(F.col("tok").isin(*STOPWORDS).cast("long")) >= F.count("*"),
            F.lit(1),
        )
        .otherwise(0)
        .alias("y")
    )
    post = (
        tok.select("doc_id", F.substring(F.md5(F.col("tok").cast("binary")), 1, 2).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("x"))
    )
    cls = (
        post.join(lab, "doc_id")
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("y") == 1, F.col("x")).otherwise(0)).alias("cpos"),
            F.sum(F.when(F.col("y") == 0, F.col("x")).otherwise(0)).alias("cneg"),
        )
        .collect()
    )
    tpos = sum(r["cpos"] for r in cls)
    tneg = sum(r["cneg"] for r in cls)
    nd = lab.count()
    npos = lab.agg(F.sum("y")).collect()[0][0]
    pairs = [(r["cpos"] + 1.0, tpos + float(N_BUCKETS)) for r in cls]
    pairs += [(r["cneg"] + 1.0, tneg + float(N_BUCKETS)) for r in cls]
    pairs += [(npos + 1.0, nd + 2.0), (nd - npos + 1.0, nd + 2.0)]
    worst = min(
        min(f := math.log(c / t) * SCALE + 0.5 - math.floor(math.log(c / t) * SCALE + 0.5), 1 - f)
        for c, t in pairs
    )
    # measured: > 1e-3 at both shipped SFs; a cross-libm ulp is ~1e-10
    assert worst > 1e-4, worst


def test_holdout_confusion_matches_python_reference(spark, sf_dir):
    """q_quality_holdout == the same split + fit + scoring in plain
    Python: exact confusion matrix, no leakage (test docs never touch
    the fit), unseen-in-training buckets contribute 0 log-odds."""
    import hashlib

    from incremental_dagster_delta_spark.queries.quality_clf import (
        SPLIT_SALT,
        TRAIN_PCT,
        q_quality_holdout,
    )

    docs, _ = _python_fit(spark, sf_dir)

    def side(doc_id):
        h = hashlib.md5(f"{doc_id}:{SPLIT_SALT}".encode()).hexdigest()[:8]
        return int(h, 16) % 100 < TRAIN_PCT

    train = {d: v for d, v in docs.items() if side(d)}
    test = {d: v for d, v in docs.items() if not side(d)}
    cpos, cneg = {}, {}
    tpos = tneg = npos = 0
    for d in train.values():
        npos += d["y"]
        for b, x in d["f"].items():
            if d["y"]:
                cpos[b] = cpos.get(b, 0) + x
                tpos += x
            else:
                cneg[b] = cneg.get(b, 0) + x
                tneg += x
    buckets = set(cpos) | set(cneg)
    w = {
        b: _ilogp(cpos.get(b, 0) + 1.0, tpos + float(N_BUCKETS))
        - _ilogp(cneg.get(b, 0) + 1.0, tneg + float(N_BUCKETS))
        for b in buckets
    }
    nd = len(train)
    bias = _ilogp(npos + 1.0, nd + 2.0) - _ilogp(nd - npos + 1.0, nd + 2.0)
    tp = fp = fn = tn = 0
    for d in test.values():
        m = sum(w.get(b, 0) * x for b, x in d["f"].items()) + bias
        if m >= 0:
            tp, fp = tp + (d["y"] == 1), fp + (d["y"] == 0)
        else:
            fn, tn = fn + (d["y"] == 1), tn + (d["y"] == 0)
    row = q_quality_holdout(spark, sf_dir).collect()[0]
    assert (row["n_train"], row["n_test"]) == (len(train), len(test))
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert row["tp"] + row["fp"] + row["fn"] + row["tn"] == row["n_test"]


def test_score_plan_broadcasts_weights(spark, sf_dir):
    """The weight table is D-bounded by construction (≤ 257 rows at ANY
    corpus size), so its scoring join must be a broadcast — the corpus
    side never shuffles for the join — and the postings aggregation
    must partial-aggregate map-side. ``lazy_plans`` keeps the full
    logical plan inspectable (score_docs eagerly materializes via
    ``materialize_release`` since the r9 re-scan cut)."""
    from incremental_dagster_delta_spark.tables import lazy_plans

    with lazy_plans():
        plan = str(q_quality_scores(spark, sf_dir)._jdf.queryExecution())
    spark.catalog.clearCache()
    assert "BroadcastHashJoin" in plan
    physical = plan.split("== Physical Plan ==")[-1]
    assert "partial_count" in physical or "partial_sum" in physical


def test_holdout_counts_tokenized_train_docs(spark):
    """n_train is the LABELLED train-set size: a whitespace-only doc in
    the train split produces no tokens, so it must not be counted —
    pinning the Spark query to the oracle's tokenized-doc denominator
    (ADVICE r8). Built on a tiny in-memory corpus written to parquet so
    the full qid (including the md5 split) runs unchanged."""
    import hashlib

    from incremental_dagster_delta_spark.queries.quality_clf import (
        SPLIT_SALT,
        TRAIN_PCT,
        q_quality_holdout,
    )

    def train_side(doc_id: int) -> bool:
        h = hashlib.md5(f"{doc_id}:{SPLIT_SALT}".encode()).hexdigest()[:8]
        return int(h, 16) % 100 < TRAIN_PCT

    # find an id that lands train-side to carry the empty text
    empty_id = next(i for i in range(1000, 2000) if train_side(i))
    rows = [(i, "en", f"the tok{i} of words here") for i in range(40)]
    rows.append((empty_id, "en", "   "))
    import tempfile

    d = tempfile.mkdtemp(prefix="qclf_empty_")
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    row = q_quality_holdout(spark, d).collect()[0]
    n_tokenized_train = sum(1 for i in range(40) if train_side(i))
    assert row["n_train"] == n_tokenized_train, row
    assert row["n_test"] == 40 - n_tokenized_train, row
