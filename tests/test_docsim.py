"""DIMSUM estimator accuracy + BPE correctness vs pure-Python references."""

from __future__ import annotations

from collections import Counter

from incremental_dagster_delta_spark.queries.docsim import tfidf_cosine_pairs


def _synthetic_docs():
    """Docs with planted near-duplicate pairs plus background noise."""
    docs = []
    for i in range(40):
        base = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        docs.append((i, base))
        if i < 8:  # planted near-dup: one token changed
            docs.append((1000 + i, base.replace(f"zeta{i}", "zetaX")))
    return docs


def test_exact_pairs_find_planted_dups(spark):
    df = spark.createDataFrame(_synthetic_docs(), "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]) for r in tfidf_cosine_pairs(spark, df).collect()}
    for i in range(8):
        assert (i, 1000 + i) in got, f"planted pair ({i}, {1000 + i}) missed"


def test_dimsum_estimator_tracks_exact(spark):
    """With γ high enough that p = min(1, γ/(‖a‖‖b‖)) ≈ 1 for the planted
    pairs, the sampled estimator must reproduce the exact pairs; with the
    cosine values within a loose tolerance (the estimator is unbiased,
    and deterministic via hash-sampling, so this is a fixed outcome)."""
    df = spark.createDataFrame(_synthetic_docs(), "doc_id long, text string")
    exact = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(spark, df, threshold=0.4).collect()
    }
    # γ ≥ max ‖a‖‖b‖ ⇒ every p = 1 ⇒ the estimator degenerates to exact
    full = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(spark, df, threshold=0.4, gamma=1e6).collect()
    }
    assert full == exact
    # moderate γ: contributions are genuinely sampled (p < 1); the
    # estimator is unbiased and hash-deterministic, so this outcome is
    # fixed — planted near-identical pairs must survive with a cosine in
    # a loose band around truth
    est = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(spark, df, threshold=0.4, gamma=50.0).collect()
    }
    planted = {p for p in exact if p[1] >= 1000}
    assert planted <= set(est), "moderate-gamma DIMSUM lost a planted pair"
    # Per-pair error on these 6-token docs is high-variance (dropping a
    # single sampled term moves the estimate a lot), and a hash-family
    # change re-rolls which draws land — so bound the MEAN absolute
    # error (estimator is unbiased) plus a generous per-pair cap.
    errs = [abs(est[p] - exact[p]) for p in planted]
    assert sum(errs) / len(errs) < 0.25, errs
    for p in planted:
        assert abs(est[p] - exact[p]) < 0.6, (p, est[p], exact[p])


def _python_bpe(word_freqs: dict[str, int], n: int):
    """Reference BPE (Sennrich 2016 alg.) on a word-frequency dict."""
    seqs = {w: [*w, "</w>"] for w in word_freqs}
    merges = []
    for rank in range(1, n + 1):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # argmax with (freq DESC, left ASC, right ASC) tie-break
        (left, right), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, left + right, c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_matches_python_reference(spark):
    """The Spark merge loop must learn exactly the merges the classic
    in-memory algorithm learns, including greedy leftmost application
    ('a a a' + (a,a) → 'aa a') and the deterministic tie-break."""
    from incremental_dagster_delta_spark.queries import bpe as bpe_mod

    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3 + ["aaa"] * 4
    )
    text = " ".join(corpus)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    d_orig = bpe_mod.t
    try:
        bpe_mod.t = lambda s, sf, name: df  # drive the query over the tiny corpus
        got = [
            (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"], r["freq"])
            for r in bpe_mod.q_bpe_merges(spark, "unused").collect()
        ]
    finally:
        bpe_mod.t = d_orig
    want = _python_bpe(Counter(corpus), bpe_mod.N_MERGES)
    assert got == want
