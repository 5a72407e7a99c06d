"""df-cap correctness on a skewed corpus (the path testdata never takes:
no testdata shingle exceeds DF_CAP, so the hot-correction machinery in
ngram_jaccard_pairs only runs here)."""

from __future__ import annotations

from itertools import combinations

from incremental_dagster_delta_spark.queries.dedup import ngram_jaccard_pairs


def _brute_force(docs: list[tuple[int, str]], threshold: float) -> dict[tuple[int, int], float]:
    def shingles(text: str) -> set[str]:
        toks = [x for x in text.lower().split(" ") if x]
        n = max(len(toks) - 2, 1)
        return {" ".join(toks[i : i + 3]) for i in range(n)}

    sh = {i: shingles(t) for i, t in docs}
    out = {}
    for (a, sa), (b, sb) in combinations(sorted(sh.items()), 2):
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out[(a, b)] = round(j, 4)
    return out


def _corpus() -> list[tuple[int, str]]:
    """300 docs all opening with the same boilerplate sentence (its
    shingles reach df=300 > the test cap of 50), plus planted near-dup
    pairs whose overlap spans BOTH boilerplate and unique text — so an
    uncorrected capped join would understate their Jaccard."""
    boiler = "this document is provided as is without any warranty"
    docs = []
    for i in range(300):
        unique = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i} theta{i}"
        docs.append((i, f"{boiler} {unique}"))
    # planted near-dups: same unique tail, one token changed
    for k in range(5):
        base = docs[k][1]
        docs.append((1000 + k, base.replace(f"zeta{k}", f"zetaX{k}")))
    return docs


def test_capped_join_matches_brute_force_on_skewed_corpus(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, df, threshold=0.5, df_cap=50).collect()
    }
    want = _brute_force(docs, 0.5)
    # Pairs sharing ANY sub-cap shingle must match brute force exactly —
    # the planted pairs share unique-tail shingles, so all survive with
    # exact (corrected) Jaccard values.
    planted = {p: j for p, j in want.items() if p[1] >= 1000}
    assert len(planted) == 5
    for p, j in planted.items():
        assert p in got, f"planted pair {p} missed by capped join"
        assert abs(got[p] - j) < 1e-9, (p, got[p], j)
    # Pairs whose ENTIRE overlap is hot boilerplate are the documented
    # cap-miss class: brute force may report them (boiler-only overlap
    # can clear a low threshold), the capped join must not blow up on
    # them — and any it does report must carry the exact Jaccard.
    for p, j in got.items():
        assert abs(want[p] - j) < 1e-9, (p, j, want.get(p))


def test_uncapped_corpus_identical_with_and_without_cap(spark):
    """With no hot shingles the probe keeps the plain plan — results must
    equal a run whose cap is effectively infinite."""
    docs = _corpus()[:40]  # 40 docs → boilerplate df=40 < cap=50
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, df, threshold=0.5, df_cap=50).collect()
    }
    want = _brute_force(docs, 0.5)
    assert capped == want


def test_hot_stats_cache_memoizes_and_isolates(spark):
    """Corpus heavy-hitter stats: a cache_key memoizes the checkpointed
    hot list (second call returns the identical entry — no recompute),
    different corpora under different keys don't cross-contaminate, and
    keyless calls stay uncached (the synthetic-corpus tests above rely
    on that isolation)."""
    from incremental_dagster_delta_spark.queries.dedup import (
        _HOT_STATS_CACHE,
        _hot_shingles,
    )
    from pyspark.sql import functions as F

    inv_cold = spark.createDataFrame(
        [(i, f"sh{i}") for i in range(20)], "doc_id long, shingle string"
    )
    inv_hot = spark.createDataFrame(
        [(i, "boiler") for i in range(30)], "doc_id long, shingle string"
    )
    sess = spark.sparkContext.applicationId
    keys = [(k, cap, sess) for k in ("t_cold", "t_hot") for cap in (5, 7)]
    for k in keys:
        _HOT_STATS_CACHE.pop(k, None)
    try:
        cold_df, cold_flag = _hot_shingles(inv_cold, 5, "t_cold")
        hot_df, hot_flag = _hot_shingles(inv_hot, 5, "t_hot")
        assert cold_flag is False and cold_df.count() == 0
        assert hot_flag is True
        assert [r["shingle"] for r in hot_df.collect()] == ["boiler"]
        # memoized: same entry object, even if the input DF differs now
        again_df, again_flag = _hot_shingles(inv_cold.limit(0), 5, "t_cold")
        assert again_df is cold_df and again_flag is False
        # a DIFFERENT cap is a different statistic — never a cache hit
        # (r15 review: a cap-8 caller previously got the cap-256 entry)
        other_df, _ = _hot_shingles(inv_cold, 7, "t_cold")
        assert other_df is not cold_df
        # keyless: never enters the cache
        n_before = len(_HOT_STATS_CACHE)
        _hot_shingles(inv_hot, 5, None)
        assert len(_HOT_STATS_CACHE) == n_before
    finally:
        for k in keys:
            _HOT_STATS_CACHE.pop(k, None)


def test_substring_spans_planted(spark):
    """Kernel pin for q_substring_dedup on a planted pair: a 9-token
    verbatim span shared mid-document is found with exact start
    positions and length; a 7-token shared run (< SUBSTR_MIN_SPAN=8)
    is not reported."""
    from incremental_dagster_delta_spark.queries.dedup import (
        SUBSTR_MIN_SPAN,
        substring_spans,
    )

    span9 = "p q r s t u v w x"  # 9 tokens >= MIN_SPAN
    span7 = "c1 c2 c3 c4 c5 c6 c7"  # 7 tokens < MIN_SPAN
    docs = spark.createDataFrame(
        [
            (1, f"{span9} y z"),
            (2, f"m n {span9} k"),
            (3, f"a0 {span7} b0"),
            (4, f"d0 d1 {span7} e0"),
        ],
        "doc_id long, text string",
    )
    rows = {tuple(r) for r in substring_spans(spark, docs).collect()}
    assert rows == {(1, 2, 1, 3, 9)}, rows
    assert SUBSTR_MIN_SPAN == 8  # the planted lengths above assume this


def test_substring_spans_repeated_span_two_islands(spark):
    """A span duplicated TWICE in one document yields one maximal island
    per alignment (distinct diagonals), not a merged or doubled run."""
    from incremental_dagster_delta_spark.queries.dedup import substring_spans

    span = "p q r s t u v w"  # 8 tokens == MIN_SPAN
    docs = spark.createDataFrame(
        [(1, f"{span} zz1 zz2"), (2, f"aa {span} bb {span}")],
        "doc_id long, text string",
    )
    rows = {tuple(r) for r in substring_spans(spark, docs).collect()}
    assert rows == {(1, 2, 1, 2, 8), (1, 2, 1, 11, 8)}, rows


def test_dup_span_fraction_interval_union(spark, tmp_path):
    """Overlapping spans from DIFFERENT partner documents must not
    double-count tokens: doc1 shares tokens 1-9 with doc2 and tokens
    3-11 with doc3, so its duplicated coverage is the union [1,11] —
    11 tokens, not 18. A span-free doc reports 0."""
    import os

    from incremental_dagster_delta_spark.queries.dedup import q_dup_span_fraction

    words = [f"t{i}" for i in range(1, 12)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(words)),          # t1..t11
            (2, " ".join(words[:9])),      # t1..t9  (9-token span with doc1)
            (3, " ".join(words[2:])),      # t3..t11 (9-token span with doc1)
            (4, "u1 u2 u3 u4 u5 u6 u7 u8"),  # no shared span
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    rows = {r["doc_id"]: r for r in q_dup_span_fraction(spark, sf).collect()}
    assert (rows[1]["dup_tokens"], rows[1]["n_tokens"]) == (11, 11)
    assert rows[1]["dup_fraction"] == 1.0
    assert (rows[2]["dup_tokens"], rows[3]["dup_tokens"]) == (9, 9)
    assert (rows[4]["dup_tokens"], rows[4]["dup_fraction"]) == (0, 0.0)


def test_dup_span_fraction_identical_intervals(spark, tmp_path):
    """Regression (r8, caught by the sf0.001 sweep): a doc fully copied
    by SEVERAL partners produces identical [1, n] intervals, and with a
    tie-ambiguous ORDER BY the two gaps-and-islands window passes could
    disagree on the tie order and split one island into two, reporting
    dup_fraction 2.0 on a 100%-duplicated doc. The iv DISTINCT makes
    the order total; coverage must be exactly n, never a multiple."""
    import os

    from incremental_dagster_delta_spark.queries.dedup import q_dup_span_fraction

    words = " ".join(f"v{i}" for i in range(1, 11))
    docs = spark.createDataFrame(
        [(1, words), (2, words), (3, words), (4, words)],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    rows = {r["doc_id"]: r for r in q_dup_span_fraction(spark, sf).collect()}
    for d in (1, 2, 3, 4):
        assert (rows[d]["dup_tokens"], rows[d]["dup_fraction"]) == (10, 1.0), rows[d]


def _py_spans(docs, k, min_span, df_cap):
    """Pure-python ExactSubstr reference: positional shingles, df cap,
    per-(pair, diagonal) consecutive-run islands."""
    from collections import defaultdict

    postings = defaultdict(list)
    for d, text in docs:
        tk = [w for w in text.lower().split(" ") if w]
        for i in range(len(tk) - k + 1):
            postings[" ".join(tk[i : i + k])].append((d, i + 1))
    keep = {sh for sh, ps in postings.items() if len({d for d, _ in ps}) <= df_cap}
    by_diag = defaultdict(set)
    for sh in keep:
        ps = postings[sh]
        for d1, p1 in ps:
            for d2, p2 in ps:
                if d1 < d2:
                    by_diag[(d1, d2, p1 - p2)].add(p1)
    out = set()
    for (a, b, diag), poss in by_diag.items():
        run = []
        for p in sorted(poss) + [None]:
            if run and p != run[-1] + 1:
                n = len(run)
                if n + k - 1 >= min_span:
                    out.add((a, b, run[0], run[0] - diag, n + k - 1))
                run = []
            if p is not None:
                run.append(p)
    return out


def test_substring_spans_random_property(spark):
    """substring_spans == the brute-force python reference on random
    low-alphabet corpora (shared runs arise by chance), across seeds —
    pins island stitching, diagonal separation, and maximality beyond
    the planted cases."""
    import random

    from incremental_dagster_delta_spark.queries.dedup import (
        SUBSTR_DF_CAP,
        SUBSTR_K,
        SUBSTR_MIN_SPAN,
        substring_spans,
    )

    for seed in (7, 41, 1234):
        rng = random.Random(seed)
        docs = []
        for d in range(1, 9):
            n = rng.randint(12, 40)
            docs.append((d, " ".join(rng.choice("ab") for _ in range(n))))
        expected = _py_spans(docs, SUBSTR_K, SUBSTR_MIN_SPAN, SUBSTR_DF_CAP)
        sdf = spark.createDataFrame(docs, "doc_id long, text string")
        got = {tuple(r) for r in substring_spans(spark, sdf).collect()}
        assert got == expected, (seed, got ^ expected)
