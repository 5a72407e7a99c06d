"""Sketch accuracy bounds + harness property tests (hypothesis)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from incremental_dagster_delta_spark.oracle import norm_cell, table_hash
from incremental_dagster_delta_spark.queries.sketches import approx_distinct_report
from incremental_dagster_delta_spark.tables import load_table

from tests.conftest import SF_DIR


def test_hll_within_error_bound(spark):
    """approx_count_distinct(rsd=0.02) must land within a generous 5×rsd
    of the exact count for every group — corpus-scale, over the events
    table (the qid itself runs the pinned literal scenario)."""
    events = load_table(spark, SF_DIR, "events")
    for row in approx_distinct_report(events, "event_type", "user_id").collect():
        exact, approx = row["exact_users"], row["approx_users"]
        assert abs(approx - exact) <= max(1, 0.10 * exact), row


# --- oracle-harness properties (pure python, no spark) ----------------------

_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_infinity=False, width=64),
    st.text(max_size=12),
    st.booleans(),
)


@given(st.lists(st.tuples(_cell, _cell, _cell), max_size=30), st.randoms())
@settings(max_examples=200, deadline=None)
def test_table_hash_is_order_insensitive(rows, rnd):
    """Row order and column order must not affect the hash (the driver
    compares order-insensitively)."""
    cols = ["b_col", "a_col", "c_col"]
    h1 = table_hash(rows, cols)
    shuffled_rows = list(rows)
    rnd.shuffle(shuffled_rows)
    assert table_hash(shuffled_rows, cols) == h1
    # permute columns consistently with their names → same hash
    perm = [2, 0, 1]
    permuted = [tuple(r[i] for i in perm) for r in rows]
    assert table_hash(permuted, [cols[i] for i in perm]) == h1


@given(st.lists(st.tuples(_cell), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_table_hash_detects_any_cell_change(rows):
    """Changing one cell to a distinct value must change the hash."""
    h1 = table_hash(rows, ["x"])
    mutated = list(rows)
    old = mutated[0][0]
    new = "sentinel-other" if norm_cell(old) != "sentinel-other" else "sentinel-other2"
    mutated[0] = (new,)
    assert table_hash(mutated, ["x"]) != h1


def test_norm_cell_floats_stable():
    assert norm_cell(1.0000000000000002) == norm_cell(1.0)
    assert norm_cell(float("nan")) == "NaN"
    assert norm_cell(None) == "NULL"
    assert norm_cell(True) == "1"


def test_hash_seeded_determinism():
    rng = random.Random(1)
    rows = [(rng.random(), rng.randrange(100), f"s{rng.randrange(10)}") for _ in range(50)]
    assert table_hash(rows, ["a", "b", "c"]) == table_hash(list(rows), ["a", "b", "c"])


# --- count-min sketch -------------------------------------------------------


def test_cms_never_underestimates_full_vocabulary(spark):
    """The qid reports only the top-N heavy hitters; the defining CMS
    guarantee (estimate >= exact, always) must hold for EVERY token, so
    probe the sketch with the whole vocabulary here."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.sketches import cms_cells, cms_estimates

    d = load_table(spark, SF_DIR, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    tok = d.select(F.explode(toks).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    probed = cms_estimates(cms_cells(tok), cnt)
    bad = probed.where(F.col("cms_estimate") < F.col("exact_cnt")).count()
    assert bad == 0
    # The sketch must also be USEFUL at this width: exact for at least
    # half the vocabulary (collisions only add, never subtract).
    n = probed.count()
    tight = probed.where(F.col("cms_estimate") == F.col("exact_cnt")).count()
    assert tight * 2 >= n, f"CMS too collided to be useful: {tight}/{n} exact"


def test_cms_incremental_maintenance_exactly_once(spark):
    """The sketch's incremental-by-default configuration: per-batch
    PARTIAL cells published with tableio's exactly-once append_batch,
    estimates folded over the appended partials. Two waves + a replayed
    wave (the foreachBatch at-least-once contract) must equal the
    one-shot sketch over the union corpus — replay contributes zero."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.sketches import cms_cells, cms_estimates
    from incremental_dagster_delta_spark.tableio import PartitionedTable
    from incremental_dagster_delta_spark.tables import literal_df

    base = tempfile.mkdtemp(prefix="cms_incr_")
    try:
        tbl = PartitionedTable(spark, f"{base}/cells", ["row_i"])
        w1 = ["alpha"] * 5 + ["beta"] * 3 + ["gamma"]
        w2 = ["alpha"] * 2 + ["delta"] * 4 + ["beta"]
        tok1 = literal_df(spark, [(w,) for w in w1], "tok string")
        tok2 = literal_df(spark, [(w,) for w in w2], "tok string")
        assert tbl.append_batch(cms_cells(tok1), batch_id=0) is True
        assert tbl.append_batch(cms_cells(tok2), batch_id=1) is True
        # crash-replay of wave 2: marker exists -> no-op, no double count
        assert tbl.append_batch(cms_cells(tok2), batch_id=1) is False

        keys = literal_df(
            spark, [(w,) for w in sorted(set(w1 + w2))], "tok string"
        )
        incremental = {
            r["tok"]: r["cms_estimate"]
            for r in cms_estimates(tbl.read(), keys).collect()
        }
        union_tok = literal_df(spark, [(w,) for w in w1 + w2], "tok string")
        oneshot = {
            r["tok"]: r["cms_estimate"]
            for r in cms_estimates(cms_cells(union_tok), keys).collect()
        }
        assert incremental == oneshot
        exact = {w: (w1 + w2).count(w) for w in set(w1 + w2)}
        assert all(incremental[w] >= c for w, c in exact.items())
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- bloom membership -------------------------------------------------------


def test_bloom_no_false_negatives_with_planted_duplicates(spark):
    """The corpus qid's batch never truly overlaps the corpus (testdata
    texts are unique), so the true-hit path needs a planted scenario:
    half the batch IS corpus content. Every planted duplicate must be
    flagged possibly_present (no false negatives — the Bloom contract)
    and actually_present."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.sketches import bloom_bits, bloom_possibly

    corpus_rows = [(i, f"corpus document number {i} with shared boilerplate") for i in range(200)]
    # batch: 20 exact duplicates of corpus docs + 20 genuinely new docs
    batch_rows = [(1000 + i, corpus_rows[i * 7][1]) for i in range(20)] + [
        (2000 + i, f"fresh never-seen content {i}") for i in range(20)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string").select(
        "doc_id", F.md5("text").alias("key")
    )
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string").select(
        "doc_id", F.md5("text").alias("key")
    )
    probe = bloom_possibly(bloom_bits(corpus.select("key")), batch)
    rows = {r["doc_id"]: r["possibly_present"] for r in probe.collect()}
    for i in range(20):
        assert rows[1000 + i] is True, f"false negative on planted duplicate {1000 + i}"
    # New docs may collide (false positives) but most must be misses at
    # this fill factor (200 keys x 3 hashes into 4096 bits ~ 3% FP).
    misses = sum(1 for i in range(20) if not rows[2000 + i])
    assert misses >= 15, f"implausible FP rate: only {misses}/20 misses"


def test_bloom_incremental_maintenance_exactly_once(spark):
    """Bit sets are union-mergeable, so the Bloom filter maintains
    incrementally like the CMS: each batch appends its (distinct-within-
    batch) bit partials via exactly-once append_batch; the probe
    distincts across appends. Replay contributes zero, and the folded
    filter equals the one-shot filter over the union corpus."""
    import shutil
    import tempfile

    from incremental_dagster_delta_spark.queries.sketches import bloom_bits, bloom_possibly
    from incremental_dagster_delta_spark.tableio import PartitionedTable
    from incremental_dagster_delta_spark.tables import literal_df

    base = tempfile.mkdtemp(prefix="bloom_incr_")
    try:
        from pyspark.sql import functions as F

        tbl = PartitionedTable(spark, f"{base}/bits", ["band"])
        w1 = literal_df(spark, [(f"k{i}",) for i in range(30)], "key string")
        w2 = literal_df(spark, [(f"k{i}",) for i in range(20, 50)], "key string")
        band = lambda df: df.withColumn("band", (F.col("pos") % 4).cast("string"))
        assert tbl.append_batch(band(bloom_bits(w1)), batch_id=0) is True
        assert tbl.append_batch(band(bloom_bits(w2)), batch_id=1) is True
        assert tbl.append_batch(band(bloom_bits(w2)), batch_id=1) is False  # replay no-op

        batch = literal_df(
            spark, [(f"k{i}",) for i in range(45, 60)] + [("never-seen",)], "key string"
        )
        incremental = {
            r["key"]: r["possibly_present"]
            for r in bloom_possibly(tbl.read().select("pos"), batch).collect()
        }
        union_keys = literal_df(spark, [(f"k{i}",) for i in range(50)], "key string")
        oneshot = {
            r["key"]: r["possibly_present"]
            for r in bloom_possibly(bloom_bits(union_keys), batch).collect()
        }
        assert incremental == oneshot
        # no false negatives on the keys genuinely present (45..49)
        for i in range(45, 50):
            assert incremental[f"k{i}"] is True
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_cms_unseen_key_estimates_zero(spark):
    """Probing a never-inserted key must return the true CMS min over
    its cells with absent cells counting as 0 — an inner join would
    drop the key or inflate the estimate to the min of only its
    collided cells."""
    from incremental_dagster_delta_spark.queries.sketches import cms_cells, cms_estimates
    from incremental_dagster_delta_spark.tables import literal_df

    corpus = literal_df(spark, [("alpha",)] * 3 + [("beta",)], "tok string")
    keys = literal_df(spark, [("alpha",), ("never-inserted-key",)], "tok string")
    est = {r["tok"]: r["cms_estimate"] for r in cms_estimates(cms_cells(corpus), keys).collect()}
    assert est["alpha"] == 3
    # with 2 keys x 4 positions in 4096 cells a within-probe collision is
    # implausible; all 4 of the unseen key's cells are absent -> 0
    assert est["never-inserted-key"] == 0


# --- hand-rolled HLL (incremental registers) --------------------------------


def test_hll_registers_at_least_once_tolerant(spark):
    """HLL registers merge by elementwise MAX — idempotent, so the
    incremental distinct count survives not just a marker-deduped replay
    (exactly-once) but a duplicate batch appended under a NEW batch_id,
    the case the commit marker cannot catch. Fold-of-batches must equal
    the one-shot sketch over the union corpus in all cases."""
    import shutil
    import tempfile

    from incremental_dagster_delta_spark.queries.sketches import (
        hll_estimate,
        hll_registers,
    )
    from incremental_dagster_delta_spark.tableio import PartitionedTable
    from incremental_dagster_delta_spark.tables import literal_df

    base = tempfile.mkdtemp(prefix="hll_incr_")
    try:
        tbl = PartitionedTable(spark, f"{base}/regs", ["reg"])
        w1 = [f"tok{i}" for i in range(400)]
        w2 = [f"tok{i}" for i in range(200, 700)]  # 300-key overlap with w1
        b1 = literal_df(spark, [(w,) for w in w1], "tok string")
        b2 = literal_df(spark, [(w,) for w in w2], "tok string")
        assert tbl.append_batch(hll_registers(b1), batch_id=0) is True
        assert tbl.append_batch(hll_registers(b2), batch_id=1) is True
        # marker-level replay: no-op
        assert tbl.append_batch(hll_registers(b2), batch_id=1) is False
        est_once = hll_estimate(tbl.read()).first()["hll_estimate"]

        # at-least-once beyond the marker: the same data re-appended as a
        # "new" batch — max-merge absorbs it, estimate unchanged
        assert tbl.append_batch(hll_registers(b2), batch_id=2) is True
        est_dup = hll_estimate(tbl.read()).first()["hll_estimate"]
        assert est_dup == est_once

        union = literal_df(spark, [(w,) for w in w1 + w2], "tok string")
        est_full = hll_estimate(hll_registers(union)).first()["hll_estimate"]
        assert est_once == est_full

        # error-bound audit: 700 true distinct, rsd ≈ 4.6% at m=512
        assert abs(est_full - 700) / 700 < 0.15, est_full
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- fixed-width histogram quantiles (incremental) ---------------------------


def test_hist_quantiles_incremental_exactly_once_and_accuracy(spark, sf_dir):
    """Histogram cells are additive like CMS cells: two waves + a
    marker-replayed wave through append_batch must give the same
    quantile estimates as the one-shot histogram over the union corpus,
    and each estimate must sit within one bin width of the exact sorted
    percentile (the uniform-within-bin interpolation bound)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.registry import t
    from incremental_dagster_delta_spark.queries.sketches import (
        HIST_BIN_W,
        hist_cells,
        hist_quantiles,
    )
    from incremental_dagster_delta_spark.tableio import PartitionedTable

    e = t(spark, sf_dir, "events")
    w1 = e.where(F.col("event_id") % 2 == 0)
    w2 = e.where(F.col("event_id") % 2 == 1)

    base = tempfile.mkdtemp(prefix="hist_incr_")
    try:
        tbl = PartitionedTable(spark, f"{base}/cells", ["bin"])
        assert tbl.append_batch(hist_cells(w1), batch_id=0) is True
        assert tbl.append_batch(hist_cells(w2), batch_id=1) is True
        assert tbl.append_batch(hist_cells(w2), batch_id=1) is False  # replay no-op

        incr = {r["q"]: r["hist_estimate"] for r in hist_quantiles(tbl.read()).collect()}
        oneshot = {r["q"]: r["hist_estimate"] for r in hist_quantiles(hist_cells(e)).collect()}
        assert incr == oneshot

        exact = {
            q: e.agg(F.percentile("value", F.lit(q))).first()[0] for q in (0.5, 0.9, 0.99)
        }
        for q, est in incr.items():
            assert abs(est - exact[q]) <= HIST_BIN_W, (q, est, exact[q])
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- real-stream maintenance of the sketch seams ------------------------------


def test_sketch_seams_maintained_by_real_stream_with_restart(spark, tmp_path):
    """End-to-end: a real Structured Streaming file source drives BOTH
    incremental seams through foreachBatch — additive CMS cells via
    exactly-once append_batch and idempotent-max HLL registers — across
    a STREAM RESTART (new query, same checkpoint). After all waves, the
    folded estimates must equal the one-shot sketches over the union of
    every ingested file. This is the production wiring the simulated
    replay tests abstract: batch ids come from the checkpoint, not the
    test."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.sketches import (
        cms_cells,
        cms_estimates,
        hll_estimate,
        hll_registers,
    )
    from incremental_dagster_delta_spark.tableio import PartitionedTable
    from incremental_dagster_delta_spark.tables import literal_df

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    cms_tbl = PartitionedTable(spark, str(tmp_path / "cms"), ["row_i"])
    hll_tbl = PartitionedTable(spark, str(tmp_path / "hll"), ["reg"])

    def handle(batch_df, batch_id):
        tok = batch_df.select("tok")
        cms_tbl.append_batch(cms_cells(tok), batch_id=batch_id)
        hll_tbl.append_batch(hll_registers(tok), batch_id=batch_id)

    def run_stream():
        q = (
            spark.readStream.schema("tok string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    w1 = ["alpha"] * 6 + ["beta"] * 2 + [f"k{i}" for i in range(50)]
    w2 = ["alpha"] * 3 + ["gamma"] * 4 + [f"k{i}" for i in range(30, 90)]
    literal_df(spark, [(w,) for w in w1], "tok string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_stream()

    # restart: second wave arrives, a NEW query resumes from the checkpoint
    literal_df(spark, [(w,) for w in w2], "tok string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_stream()

    union = literal_df(spark, [(w,) for w in w1 + w2], "tok string")
    keys = literal_df(spark, [(w,) for w in sorted(set(w1 + w2))], "tok string")

    streamed_cms = {
        r["tok"]: r["cms_estimate"] for r in cms_estimates(cms_tbl.read(), keys).collect()
    }
    oneshot_cms = {
        r["tok"]: r["cms_estimate"] for r in cms_estimates(cms_cells(union), keys).collect()
    }
    assert streamed_cms == oneshot_cms

    streamed_hll = hll_estimate(hll_tbl.read()).first()["hll_estimate"]
    oneshot_hll = hll_estimate(hll_registers(union)).first()["hll_estimate"]
    assert streamed_hll == oneshot_hll

    exact = union.agg(F.count_distinct("tok")).first()[0]
    assert abs(streamed_hll - exact) / exact < 0.2


# --- KMV bottom-k (selection seam) -------------------------------------------


def test_kmv_sketch_selection_merge_and_accuracy(spark):
    """Bottom-k is the selection merge algebra: re-selecting over the
    union of per-batch sketches equals the sketch of the union corpus
    (idempotent — a replayed batch changes nothing). And on planted
    vocabularies with known overlap the KMV Jaccard estimate must land
    within the ~1/sqrt(K) band."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.sketches import KMV_K, kmv_sketches
    from incremental_dagster_delta_spark.tables import literal_df

    # two sources, 600-token vocabularies, exactly 300 shared -> J = 1/3
    a = [f"sh{i}" for i in range(300)] + [f"a{i}" for i in range(300)]
    b = [f"sh{i}" for i in range(300)] + [f"b{i}" for i in range(300)]
    rows = [("A", tkn) for tkn in a] + [("B", tkn) for tkn in b]
    st = literal_df(spark, rows, "source string, tok string")

    # selection merge: sketch(batch1 ∪ batch2) == reselect(sketch(b1) ∪ sketch(b2))
    b1 = st.where(F.col("tok").startswith("sh"))
    b2 = st.where(~F.col("tok").startswith("sh"))
    merged = kmv_sketches(kmv_sketches(b1).unionByName(kmv_sketches(b2)))
    oneshot = kmv_sketches(st)
    got_m = sorted(map(tuple, merged.collect()))
    got_o = sorted(map(tuple, oneshot.collect()))
    assert got_m == got_o
    # idempotence: re-selecting a sketch returns itself
    again = sorted(map(tuple, kmv_sketches(oneshot).collect()))
    assert again == got_o

    # estimator accuracy: union-sketch intersection fraction ~ 1/3
    sk = {s: {r["u"] for r in oneshot.where(F.col("source") == s).collect()} for s in "AB"}
    union_k = sorted(sk["A"] | sk["B"])[:KMV_K]
    est = sum(1 for u in union_k if u in sk["A"] and u in sk["B"]) / len(union_k)
    assert abs(est - 1 / 3) < 2.5 / (KMV_K ** 0.5), est


def test_paragraph_bloom_dedup_incremental_sidecar_and_no_false_negatives(spark):
    """Dolma-style paragraph dedup (q_bloom_paragraph_dedup): (a) the
    Bloom sidecar folded incrementally from disjoint corpus batches via
    exactly-once append_batch dedups a batch IDENTICALLY to the one-shot
    filter over the union corpus (merge ≡ full), and (b) a paragraph
    planted in the corpus can never survive the probe (no false
    negatives), while unseen paragraphs mostly survive at this fill
    factor."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.lines import (
        PARA_BLOOM_BITS,
        PARA_BLOOM_HASHES,
        paragraph_bloom_dedup,
    )
    from incremental_dagster_delta_spark.queries.sketches import bloom_bits
    from incremental_dagster_delta_spark.tableio import PartitionedTable
    from incremental_dagster_delta_spark.tables import literal_df

    mk_bits = lambda keys: bloom_bits(keys, m=PARA_BLOOM_BITS, k=PARA_BLOOM_HASHES)  # noqa: E731
    corpus1 = literal_df(spark, [(f"seen paragraph {i}",) for i in range(200)], "key string")
    corpus2 = literal_df(
        spark, [(f"seen paragraph {i}",) for i in range(150, 400)], "key string"
    )
    # batch doc 1: planted duplicates at positions 0/2, fresh at 1/3;
    # batch doc 2: all fresh
    batch = literal_df(
        spark,
        [
            (1, 0, "seen paragraph 7"),
            (1, 1, "fresh paragraph alpha"),
            (1, 2, "seen paragraph 399"),
            (1, 3, "fresh paragraph beta"),
            (2, 0, "fresh paragraph gamma"),
        ],
        "doc_id long, para_pos int, key string",
    )

    base = tempfile.mkdtemp(prefix="para_bloom_")
    try:
        tbl = PartitionedTable(spark, f"{base}/bits", [])
        assert tbl.append_batch(mk_bits(corpus1), batch_id=0) is True
        assert tbl.append_batch(mk_bits(corpus2), batch_id=1) is True
        assert tbl.append_batch(mk_bits(corpus2), batch_id=1) is False  # replay no-op

        incr = {
            r["doc_id"]: r.asDict()
            for r in paragraph_bloom_dedup(batch, tbl.read().select("pos")).collect()
        }
        oneshot = {
            r["doc_id"]: r.asDict()
            for r in paragraph_bloom_dedup(
                batch, mk_bits(corpus1.unionAll(corpus2))
            ).collect()
        }
        assert incr == oneshot  # merge ≡ full

        # no false negatives: both planted paragraphs are gone, order kept
        assert "seen paragraph 7" not in incr[1]["clean_text"]
        assert "seen paragraph 399" not in incr[1]["clean_text"]
        assert incr[1]["n_dropped"] == 2 and incr[1]["n_paras"] == 4
        assert incr[1]["clean_text"] == "fresh paragraph alpha fresh paragraph beta"
        # 650 keys x 3 hashes into 2^17 bits → FP ~ 5e-6: fresh survives
        assert incr[2] == {
            "doc_id": 2,
            "clean_text": "fresh paragraph gamma",
            "n_kept": 1,
            "n_paras": 1,
            "n_dropped": 0,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
