"""ANN recall bounds vs the exact brute-force baseline (deterministic
data + seeded hash families → exact recall values are stable; bounds
leave margin anyway)."""

from __future__ import annotations

from incremental_dagster_delta_spark.queries.similarity import (
    TOP_K,
    q_cosine_ann_ivf,
    q_cosine_ann_rplsh,
    q_cosine_topk,
)

from tests.conftest import SF_DIR


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ann_recall_bounds(spark):
    exact = _pairs(q_cosine_topk(spark, SF_DIR))
    ivf = _pairs(q_cosine_ann_ivf(spark, SF_DIR))
    rp = _pairs(q_cosine_ann_rplsh(spark, SF_DIR))
    assert len(exact) > 0
    ivf_recall = len(exact & ivf) / len(exact)
    rp_recall = len(exact & rp) / len(exact)
    # uniform-random embeddings are ANN's worst case (no cluster
    # structure); measured: IVF 0.675 at NPROBE=4, rp-LSH 0.600 at 16
    # tables — bounds with margin
    assert ivf_recall >= 0.55, ivf_recall
    assert rp_recall >= 0.5, rp_recall


def test_ann_results_are_ranked_subsets(spark):
    """Every ANN result must be genuinely cosine-ranked: rank within a
    query strictly follows descending cosine."""
    for fn in (q_cosine_ann_ivf, q_cosine_ann_rplsh):
        rows = fn(spark, SF_DIR).collect()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r["rank"])
            assert len(rs) <= TOP_K
            cosines = [r["cosine"] for r in rs]
            assert cosines == sorted(cosines, reverse=True), (q, cosines)


def test_simhash_recovers_planted_near_dups(spark):
    """SimHash (Hamming ≤ 4 via 5×13-bit pigeonhole buckets) is the
    cheap screen, not the exact answer: measured on the planted
    jaccard≥0.9 pairs it recovers 22/25 — pin a recall floor and a
    bounded false-positive count so regressions in the hash family or
    bucketing surface immediately."""
    from incremental_dagster_delta_spark.queries.dedup import (
        q_dedup_simhash,
        q_ngram_jaccard,
    )

    planted = {
        (r["doc_a"], r["doc_b"])
        for r in q_ngram_jaccard(spark, SF_DIR).where("jaccard >= 0.9").collect()
    }
    sim = {(r["doc_a"], r["doc_b"]) for r in q_dedup_simhash(spark, SF_DIR).collect()}
    assert len(planted) > 0
    recall = len(planted & sim) / len(planted)
    assert recall >= 0.7, recall  # measured 0.88 (deterministic)
    # Extras are genuine Hamming≤4 pairs that sit below the 0.9 Jaccard
    # bar (measured: 11) — the screen's precision trade for the recall
    # gain; a downstream exact-Jaccard verify drops them, same as the
    # MinHash path. Bound pins "not noisy", not "no extras".
    assert len(sim - planted) <= 12
