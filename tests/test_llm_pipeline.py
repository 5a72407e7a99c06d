"""End-to-end LLM training-data pipeline composition.

The registry operators are not isolated demos — this test runs the full
prep chain a training pipeline would, over the real ``documents`` table,
and checks the cross-stage invariants that make the output usable:

    quality gate → exact dedup → near-dup clustering → canonical keep
    → chunk → pack → split

Every stage is the same code path the driver's qids exercise; what's
verified here is that they *compose* (schemas line up, survivors
propagate, budgets hold, splits partition).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.quality import split as q_split
from incremental_dagster_delta_spark.queries.dedup import q_dedup_cluster, q_ngram_jaccard
from incremental_dagster_delta_spark.queries.modern import CHUNK, q_chunk_docs
from incremental_dagster_delta_spark.queries.registry import t
from incremental_dagster_delta_spark.queries.training_prep import PACK_BUDGET, q_token_pack


def test_full_prep_chain_invariants(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. quality gate: everything in this corpus passes the basic rules
    frames = q_split(
        docs,
        {"has_text": "length(text) > 0", "sane_len": "n_chars >= 1", "known_lang": "lang IS NOT NULL"},
    )
    good = frames.good
    assert good.count() + frames.quarantine.count() == n_docs

    # 2. near-dup clustering: drop every non-canonical cluster member
    clusters = q_dedup_cluster(spark, sf_dir)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    n_drop = drop.count()
    assert n_drop > 0  # the corpus has planted near-dups
    kept = good.join(drop, "doc_id", "left_anti")
    assert kept.count() == good.count() - n_drop

    # after the drop, no surviving pair is near-duplicate
    pairs = q_ngram_jaccard(spark, sf_dir).where(F.col("jaccard") >= 0.9)
    surviving_ids = kept.select("doc_id")
    bad_pairs = (
        pairs.join(surviving_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(surviving_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b")
    )
    assert bad_pairs.count() == 0

    # 3. chunking: every surviving doc chunks completely and within size
    chunks = q_chunk_docs(spark, sf_dir).join(kept.select("doc_id"), "doc_id")
    assert chunks.where(F.col("n_tokens") > CHUNK).count() == 0
    # token conservation: chunk tokens sum back to the doc's token count
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    doc_tokens = kept.select("doc_id", F.size(toks).alias("n_doc_tokens"))
    recon = chunks.groupBy("doc_id").agg(F.sum("n_tokens").alias("sum_chunk_tokens"))
    mismatch = doc_tokens.join(recon, "doc_id").where(
        F.col("n_doc_tokens") != F.col("sum_chunk_tokens")
    )
    assert mismatch.count() == 0

    # 4. packing: bins respect the budget except unavoidable singletons
    packed = q_token_pack(spark, sf_dir)
    bin_sizes = packed.groupBy("source", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"), F.count("*").alias("n_in_bin")
    )
    overfull_multi = bin_sizes.where(
        (F.col("bin_tokens") > PACK_BUDGET) & (F.col("n_in_bin") > 1)
    )
    assert overfull_multi.count() == 0
    # every doc lands in exactly one bin
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs

    # 5. split: deterministic partition of the corpus with all three sets
    nib = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    split_col = (
        F.when(nib.between("0", "9") | nib.isin("a", "b"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    assigned = kept.select("doc_id", split_col.alias("split"))
    by_split = {r["split"]: r["n"] for r in assigned.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == kept.count()
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > by_split["val"]  # 12/2/2 nibble weighting


def test_round4_dedup_chain_invariants(spark, sf_dir):
    """Round-4 chain: star-contraction clustering ≡ min-label clustering,
    survivors consistent with clusters, leakage-free split respects
    cluster boundaries, DSIR weights cover the corpus, and incremental
    dedup catches every planted copy."""
    from incremental_dagster_delta_spark.queries.dedup import (
        BATCH_OFFSET,
        q_dedup_cluster,
        q_incremental_dedup,
    )
    from incremental_dagster_delta_spark.queries.graph import (
        q_dedup_clusters,
        q_dedup_survivors,
    )
    from incremental_dagster_delta_spark.queries.selection import q_dsir_weights

    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()

    # star contraction and min-label propagation must produce the SAME
    # partition of the non-singleton nodes (independent algorithms, one
    # answer)
    star = {(r["doc_id"], r["component"]) for r in q_dedup_clusters(spark, sf_dir).collect()}
    minlabel = {(r["doc_id"], r["cluster_id"]) for r in q_dedup_cluster(spark, sf_dir).collect()}
    assert minlabel <= star  # star also labels singletons
    assert len(star) == n_docs

    # survivors: one keeper per multi-member component, keeper belongs to
    # its component, drops counted exactly
    comp_of = dict(star)
    surv = q_dedup_survivors(spark, sf_dir).collect()
    assert len(surv) > 0
    sizes = {}
    for d, c in star:
        sizes[c] = sizes.get(c, 0) + 1
    for r in surv:
        assert comp_of[r["keep_doc_id"]] == r["component"]
        assert r["n_members"] == sizes[r["component"]] >= 2
        assert r["n_dropped"] == r["n_members"] - 1

    # leakage-free split: every member of a component shares its split
    from incremental_dagster_delta_spark.queries.graph import q_leakage_free_split

    split_rows = q_leakage_free_split(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in split_rows) == n_docs

    # DSIR: a weight for every tokenized doc; target-language docs score
    # higher on average than the rest (the estimator's defining property)
    w = q_dsir_weights(spark, sf_dir).join(docs.select("doc_id", "lang"), "doc_id")
    assert w.count() == n_docs
    means = {
        r["is_en"]: r["m"]
        for r in w.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]

    # incremental dedup: every planted exact copy (batch_id = src+OFFSET,
    # src % 10 == 0) is matched back to a corpus doc with jaccard 1.0 for
    # its own source; reversed-token plants are never flagged
    matches = {r["batch_id"]: (r["dup_of"], r["jaccard"]) for r in q_incremental_dedup(spark, sf_dir).collect()}
    planted = [r["doc_id"] for r in docs.where(F.col("doc_id") % 10 == 0).collect()]
    for src in planted:
        assert src + BATCH_OFFSET in matches, f"planted copy of {src} not caught"
    reversed_ids = {r["doc_id"] + BATCH_OFFSET for r in docs.where(F.col("doc_id") % 10 == 7).collect()}
    flagged_reversed = reversed_ids & set(matches)
    assert not flagged_reversed, f"reversed-token plants wrongly flagged: {flagged_reversed}"


def test_class_balance_stable_under_class_growth(spark):
    """The md5-ordered undersample's selling point: growing ONE class
    never changes which rows of OTHER classes are kept (as long as the
    minority count is unchanged) — no RNG reseeding, no global shuffle
    dependence. Build a corpus, balance it, add rows to one label,
    balance again, and require the other labels' kept sets identical."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def balance(df):
        counts = df.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
        m = counts.agg(F.min("n").alias("m"))
        w = Window.partitionBy("label").orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        return (
            df.withColumn("rank", F.row_number().over(w))
            .crossJoin(F.broadcast(m))
            .where(F.col("rank") <= F.col("m"))
            .select("vec_id", "label")
        )

    base = [(i, i % 4) for i in range(40)]  # labels 0-3, 10 rows each
    df1 = spark.createDataFrame(base, "vec_id long, label int")
    # grow label 0 by 20 new rows; min count (10) unchanged
    df2 = spark.createDataFrame(base + [(100 + i, 0) for i in range(20)], "vec_id long, label int")
    kept1 = {(r["vec_id"], r["label"]) for r in balance(df1).collect()}
    kept2 = {(r["vec_id"], r["label"]) for r in balance(df2).collect()}
    for lbl in (1, 2, 3):
        a = {v for v, l in kept1 if l == lbl}
        b = {v for v, l in kept2 if l == lbl}
        assert a == b, f"label {lbl} selection changed when label 0 grew"
    assert len({v for v, l in kept2 if l == 0}) == 10


def test_mixture_temperature_flattens_toward_uniform(spark, sf_dir):
    """α < 1 must pull every source's share toward uniform: sources
    above the natural share shrink, sources below it grow, shares still
    sum to 1, and targets sum to the budget (±|sources| rounding)."""
    from incremental_dagster_delta_spark.queries.assembly import (
        _TOKEN_BUDGET,
        q_mixture_temperature,
    )

    rows = q_mixture_temperature(spark, sf_dir).collect()
    n = len(rows)
    uni = 1.0 / n
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["nat_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["target_tokens"] for r in rows) - _TOKEN_BUDGET) <= n
    moved = 0
    for r in rows:
        # strict only when the distance from uniform exceeds the 4 dp
        # reporting grain — a source sitting ~at uniform may round to
        # an unchanged share
        if r["nat_share"] > uni + 2e-3:
            assert r["temp_share"] < r["nat_share"], r
            moved += 1
        elif r["nat_share"] < uni - 2e-3:
            assert r["temp_share"] > r["nat_share"], r
            moved += 1
        else:
            assert abs(r["temp_share"] - r["nat_share"]) < 2e-3, r
    assert moved >= 1  # the pin is vacuous if every source is ~uniform


def test_kn_is_proper_distribution_and_matches_reference(spark, tmp_path):
    """Interpolated KN must be a PROPER conditional distribution: for
    every history w1, Σ over the full vocab of
    (max(c−d,0)/c1 + λ(w1)·P_cont(w2)) is exactly 1 (the discount mass
    d·N1+(w1·)/c1 is what the interpolation term hands back). Planted
    corpus where every vocab word occurs as a continuation so
    Σ P_cont = 1 holds with no boundary cases; also pins the Spark
    per-doc cross-entropy against the same formulas in plain Python
    with the identical 8-dp/4-dp rounding."""
    import math
    import os
    from collections import Counter, defaultdict

    from incremental_dagster_delta_spark.queries.lm import KN_D, q_kn_perplexity

    texts = {1: "a b c a b", 2: "b c a c b", 3: "c a a b c"}
    docs = spark.createDataFrame(
        [(i, s) for i, s in texts.items()], "doc_id long, text string"
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))

    bigs = {d: list(zip(s.split(), s.split()[1:])) for d, s in texts.items()}
    allb = [b for bs in bigs.values() for b in bs]
    c2 = Counter(allb)
    c1 = Counter(w1 for w1, _ in allb)
    n1f = {w1: len({b for a, b in c2 if a == w1}) for w1 in c1}
    n1p = defaultdict(int)
    for _, w2 in c2:
        n1p[w2] += 1
    nbt = len(c2)
    vocab = sorted({w for s in texts.values() for w in s.split()})

    def p(w1, w2):
        disc = max(c2.get((w1, w2), 0) - KN_D, 0.0) / c1[w1]
        lam = KN_D * n1f[w1] / c1[w1]
        return disc + lam * (n1p[w2] / nbt)

    for w1 in c1:
        assert abs(sum(p(w1, w2) for w2 in vocab) - 1.0) < 1e-12, w1

    got = {r["doc_id"]: r for r in q_kn_perplexity(spark, sf).collect()}
    for d, bs in bigs.items():
        lps = [round(math.log(p(w1, w2)), 8) for w1, w2 in bs]
        ce = round(-sum(lps) / len(lps), 4)
        assert got[d]["n_bigrams"] == len(bs)
        assert got[d]["cross_entropy"] == ce, (d, got[d]["cross_entropy"], ce)


def test_bm25_stats_incremental_maintenance_exactly_once(spark):
    """BM25's corpus statistics (per-term df, document count N, total
    token count Σdl) are additive over disjoint ingest batches: publish
    each batch's ≤(|terms|+1)-row partial via exactly-once
    ``append_batch``, fold with ``merge_bm25_stats``, and the result
    must equal the one-shot statistics over the union corpus — with a
    crash-replayed batch (foreachBatch at-least-once) contributing
    zero. This is the storage seam behind q_bm25_incremental."""
    import shutil
    import tempfile

    from incremental_dagster_delta_spark.queries.retrieval import (
        bm25_batch_stats,
        merge_bm25_stats,
    )
    from incremental_dagster_delta_spark.tableio import PartitionedTable
    from incremental_dagster_delta_spark.tables import literal_df

    base = tempfile.mkdtemp(prefix="bm25_incr_")
    try:
        tbl = PartitionedTable(spark, f"{base}/stats", ["tok"])
        d1 = [(1, "dup join window dup"), (2, "alpha beta join")]
        d2 = [(3, "window window gamma"), (4, "dup delta")]
        b1 = literal_df(spark, d1, "doc_id long, text string")
        b2 = literal_df(spark, d2, "doc_id long, text string")
        assert tbl.append_batch(bm25_batch_stats(b1), batch_id=0) is True
        assert tbl.append_batch(bm25_batch_stats(b2), batch_id=1) is True
        # crash-replay of batch 2: marker exists -> no-op, no double count
        assert tbl.append_batch(bm25_batch_stats(b2), batch_id=1) is False

        fold = {
            r["tok"]: (r["df"], r["n"], r["sdl"])
            for r in merge_bm25_stats(tbl.read()).collect()
        }
        union = literal_df(spark, d1 + d2, "doc_id long, text string")
        oneshot = {
            r["tok"]: (r["df"], r["n"], r["sdl"])
            for r in merge_bm25_stats(bm25_batch_stats(union)).collect()
        }
        assert fold == oneshot
        # hand-checked ground truth over the 4-doc corpus
        assert fold["dup"] == (2, 0, 0)
        assert fold["join"] == (2, 0, 0)
        assert fold["window"] == (2, 0, 0)
        assert fold["zz_stats"] == (0, 4, 12)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_bm25_stats_merge_invariant_to_batch_split(spark):
    """Property: folding bm25_batch_stats over ANY partition of the
    corpus into batches yields identical statistics — the additivity
    that makes the maintenance correct under arbitrary ingest
    batching, not just the qid's doc_id % 3 split."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from incremental_dagster_delta_spark.queries.retrieval import (
        bm25_batch_stats,
        merge_bm25_stats,
    )
    from incremental_dagster_delta_spark.tables import literal_df

    docs = [
        (1, "dup join window dup"),
        (2, "alpha beta join"),
        (3, "window window gamma"),
        (4, "dup delta"),
        (5, "join dup window alpha"),
        (6, "epsilon zeta"),
    ]

    def fold(assignment):
        waves: dict[int, list] = {}
        for d, w in zip(docs, assignment):
            waves.setdefault(w, []).append(d)
        parts = None
        for rows in waves.values():
            p = bm25_batch_stats(literal_df(spark, rows, "doc_id long, text string"))
            parts = p if parts is None else parts.unionByName(p)
        return {
            r["tok"]: (r["df"], r["n"], r["sdl"])
            for r in merge_bm25_stats(parts).collect()
        }

    oneshot = fold([0] * len(docs))

    @settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.lists(st.integers(min_value=0, max_value=2), min_size=6, max_size=6))
    def prop(assignment):
        assert fold(assignment) == oneshot

    prop()
