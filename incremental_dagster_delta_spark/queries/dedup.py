"""Deduplication operators for LLM training-data pipelines (SURVEY.md §2.5).

Four dedup families over ``documents``, each built scale-first:

- **exact** — hash-groupBy on content; survivor = min(doc_id). One shuffle
  on the content hash; at 100 TB group on a 128-bit digest, never raw text.
- **key-normalized exact** — same shape over a normalization key (here the
  3-token prefix), catching near-identical boilerplate.
- **n-gram Jaccard** — shingle inverted index + self-join on shingle, count
  co-occurrences, filter by exact Jaccard. No cross join: candidate pairs
  only materialize for documents that *share at least one shingle*, and the
  Jaccard threshold is applied with a group-filter (size-ratio prefix
  pruning would drop further candidates at scale).
- **MinHash + LSH banding** — 48 deterministic xxhash64 min-hashes per doc,
  banded 16×3; documents colliding in ≥1 band bucket become candidates
  (bucket join — NEVER all-pairs), then exact Jaccard verifies. This is the
  scale path: cost is O(docs × bands) map-side + a bucket-key shuffle.

The near-dup queries share one DuckDB oracle — exact all-pairs Jaccard —
which is only feasible *because* sf0.01 is small; the Spark side never
does all-pairs. LSH banding (16 bands × rows of 3) keeps
P[miss | jaccard ≥ 0.9] = (1 - 0.9³)¹⁶ ≈ 8e-10 per pair, and the
min-hashes are deterministic (fixed seeds), so the verified candidate set
is stable run-to-run — the oracle equality below is checked, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incremental_dagster_delta_spark.queries.registry import query, t, TOKS_SQL

JACCARD_THRESHOLD = 0.5  # planted near-dups sit at ≥0.9 with a clean gap

_TOKS_SQL = TOKS_SQL  # canonical tokenizer — registry.py
# 3-token shingle list per document, distinct, as DuckDB SQL.
_SHINGLES_SQL = f"""
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' ')
         )) AS shingles
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
"""
# Exact all-pairs Jaccard ≥ threshold (oracle only — O(n²) is fine at
# sf0.01; the Spark side uses an inverted index / LSH instead).
_PAIRS_ORACLE = f"""
    WITH sh AS ({_SHINGLES_SQL})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(ROUND(
             CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
             (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))),
           4) AS DOUBLE) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
          (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
          >= {JACCARD_THRESHOLD}
"""


def _tokens(col):
    return F.filter(F.split(F.lower(col), " "), lambda x: x != F.lit(""))


def doc_shingles(d: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingles array<string>) — distinct k-token shingles."""
    toks = _tokens(F.col("text"))
    with_toks = d.select("doc_id", toks.alias("toks"))
    n = F.greatest(F.size("toks") - (k - 1), F.lit(1))
    shingle = lambda i: F.array_join(F.slice(F.col("toks"), i, k), " ")  # noqa: E731
    return with_toks.select(
        "doc_id",
        F.array_distinct(F.transform(F.sequence(F.lit(1), n), shingle)).alias("shingles"),
    )


# --- exact dedup -------------------------------------------------------------


@query(
    "q_dedup_exact",
    tags=("dedup", "llm"),
    bench=True,
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
    )
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash with deterministic survivor selection
    (min doc_id). The corpus is documents plus a re-keyed copy of every
    7th document, so the dedup decision is non-vacuous. Grouping on the
    md5 digest (not raw text) keeps shuffle rows small at scale."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = (
        d.where(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    corpus = d.unionByName(dupes)
    return (
        corpus.select(F.md5(F.col("text").cast("binary")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


@query(
    "q_dedup_prefix_key",
    tags=("dedup", "llm"),
    oracle=f"""
    SELECT array_to_string(toks[1:3], ' ') AS prefix_key,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_docs
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    GROUP BY array_to_string(toks[1:3], ' ')
    HAVING COUNT(*) > 1
    """,
)
def q_dedup_prefix_key(spark, sf_dir):
    """Normalized-key dedup: group on the 3-token prefix and report only
    colliding groups — the 'same boilerplate opening' heuristic."""
    d = t(spark, sf_dir, "documents")
    key = F.array_join(F.slice(_tokens(F.col("text")), 1, 3), " ")
    return (
        d.select(key.alias("prefix_key"), "doc_id")
        .groupBy("prefix_key")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


# --- n-gram Jaccard near-dup (inverted index) --------------------------------


# Candidate-generation df-cap: shingles appearing in more than this many
# documents are dropped from the inverted index BEFORE the self-join (they
# still participate in exact-Jaccard verification). A shingle with document
# frequency d produces O(d²) candidate pairs, so one boilerplate trigram
# shared by 10⁶ documents would alone materialize ~5×10¹¹ rows — the one
# scale hazard the r2 verdict flagged. Completeness argument: a pair at
# J ≥ 0.5 is missed only if EVERY shingle the two documents share is hotter
# than the cap, i.e. the overlap is pure >256-way boilerplate — exactly the
# pairs a near-dup pass should not fire on. Measured on testdata: max df is
# 7 at sf0.01 and 25 at sf0.1 (every oracle pair shares a df≤3 shingle), so
# the cap is behavior-neutral here and the exact oracle still matches.
DF_CAP = 256


# Per-corpus heavy-hitter statistics, memoized by (caller key, df_cap,
# session) — the caller key names an immutable corpus (e.g. the
# scale-factor dir; TESTDATA.md datasets are immutable), df_cap is part
# of the statistic's definition (the same corpus under a different cap
# has a DIFFERENT hot set — r15 review), and the session qualifier keeps
# a cached localCheckpoint from outliving its SparkContext (a hit from a
# later session would hand out a DataFrame whose checkpoint blocks died
# with the stopped context). Values are localCheckpointed DataFrames:
# tiny (hot shingles only), lineage-free, and still distributed — never
# collected to the driver.
_HOT_STATS_CACHE: dict[tuple, tuple["DataFrame", bool]] = {}


def _session_key(df) -> str:
    """Cache qualifier tying a checkpointed DataFrame to its owning
    SparkContext (applicationId is unique per context)."""
    return df.sparkSession.sparkContext.applicationId


def _hot_shingles(inv, df_cap: int, cache_key: str | None):
    """(hot shingles DataFrame, is-non-empty) — shingles with document
    frequency > df_cap, EXACT (one hash aggregation over the index),
    checkpointed, and memoized per (corpus, cap, session) together with
    the emptiness flag (so a cache hit issues no Spark job at all).
    Recompute-per-call designs all serialized an index pass in front of
    the pair-finding shuffle (see the plan-shape note in
    :func:`ngram_jaccard_pairs`); as dataset-lifecycle statistics the
    cost is paid once, like ANALYZE table stats."""
    key = None if cache_key is None else (cache_key, df_cap, _session_key(inv))
    if key is not None and key in _HOT_STATS_CACHE:
        return _HOT_STATS_CACHE[key]
    hot = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > df_cap)
        .select("shingle")
        .localCheckpoint(eager=True)
    )
    entry = (hot, hot.limit(1).count() > 0)
    if key is not None:
        _HOT_STATS_CACHE[key] = entry
    return entry


def ngram_jaccard_pairs(
    spark,
    docs,
    threshold: float = JACCARD_THRESHOLD,
    df_cap: int = DF_CAP,
    cache_key: str | None = None,
):
    """Core of q_ngram_jaccard over any (doc_id, text) DataFrame — exact
    3-gram Jaccard pairs via a df-capped inverted index. Exposed so tests
    can drive the hot-correction path with a synthetic skewed corpus
    (testdata has no shingle hotter than the cap). ``cache_key`` opts an
    immutable corpus into memoized heavy-hitter statistics; the cache has
    no invalidation — if the keyed table can be mutated in-session, pass
    ``cache_key=None`` (or a version-qualified key) instead."""
    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES, fan_out, materialize_release, sized_shuffle

    with sized_shuffle(spark, docs):
        return _ngram_jaccard_pairs_impl(
            spark, docs, threshold, df_cap, cache_key, fan_out, materialize_release
        )


def _ngram_jaccard_pairs_impl(spark, docs, threshold, df_cap, cache_key, fan_out, materialize_release):
    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES

    sh = doc_shingles(fan_out(docs, spark, per_task_bytes=SHINGLE_TASK_BYTES)).persist()
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle")).persist()
    # EXACT, CACHED heavy-hitter statistics (r5 rework of the sampled
    # probe; SURVEY §7-M6f). The r5 profiles showed every probe variant
    # — full, row-sampled, doc-sampled, lazy, window-fused — paying
    # 0.8-1.4 s at sf0.1, because any hot/cold split the main shuffle
    # depends on serializes a full index pass in front of the join. The
    # fix is lifecycle, not plan shape: per-shingle document frequency
    # is corpus-level METADATA (the same object as ANALYZE table
    # statistics — deterministic for an immutable dataset), so it is
    # computed EXACTLY once per corpus (one hash aggregation — no
    # sampling, no Chernoff caveats), localCheckpointed, and memoized by
    # ``cache_key``. Steady-state runs skip straight to the (typically
    # empty) hot list and pay zero: the plan is then identical to the
    # plain inverted-index self-join. Hot keys still never reach the
    # O(df²) join — the cap bound is unconditional.
    hot, has_hot = _hot_shingles(inv, df_cap, cache_key)
    cold = inv.join(F.broadcast(hot), "shingle", "left_anti").persist() if has_hot else inv
    pairs = (
        cold.alias("a")
        .join(cold.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_cold"))
    )
    jac = (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "n_b"}), "doc_b")
    )
    if has_hot:
        # Exactness correction: each doc's hot-shingle set is tiny (few
        # shingles are shared by >DF_CAP docs), so the true intersection is
        # n_cold + |hot_a ∩ hot_b| — narrow rows throughout; only pairs
        # whose ENTIRE overlap is hot are missed (the documented trade).
        hot_per_doc = (
            inv.join(F.broadcast(hot), "shingle", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("hot_sh"))
        )
        empty = F.array().cast("array<string>")
        jac = (
            jac.join(hot_per_doc.withColumnsRenamed({"doc_id": "doc_a", "hot_sh": "hot_a"}), "doc_a", "left")
            .join(hot_per_doc.withColumnsRenamed({"doc_id": "doc_b", "hot_sh": "hot_b"}), "doc_b", "left")
            .withColumn(
                "n_shared",
                F.col("n_cold")
                + F.size(F.array_intersect(F.coalesce("hot_a", empty), F.coalesce("hot_b", empty))),
            )
        )
    else:
        jac = jac.withColumn("n_shared", F.col("n_cold"))
    jac = jac.withColumn(
        "jaccard",
        F.col("n_shared").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
    ).where(F.col("jaccard") >= threshold)
    out = jac.select("doc_a", "doc_b", F.round("jaccard", 4).cast("double").alias("jaccard"))
    cached = [sh, inv]
    if has_hot:
        cached.append(cold)
    return materialize_release(out, *cached)


@query("q_ngram_jaccard", tags=("dedup", "llm"), bench=True, oracle=_PAIRS_ORACLE)
def q_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by exact 3-gram Jaccard via a df-capped inverted
    index (see :func:`ngram_jaccard_pairs`). Split shingles into cold
    (df ≤ DF_CAP) and hot: the self-join runs ONLY on the cold index (no
    single boilerplate shingle can blow it up — see DF_CAP above), and
    co-occurrence counts stay narrow (doc_id × doc_id rows, never shingle
    arrays). Heavy-hitter statistics are exact, computed once per corpus
    and memoized (ANALYZE-stats lifecycle — see :func:`_hot_shingles`),
    so the steady-state un-skewed plan IS the plain inverted-index
    self-join; when hot shingles exist, exactness
    is restored with the per-doc hot-set correction
    ``n_cold_shared + |hot_a ∩ hot_b|`` — only pairs whose ENTIRE overlap
    is hot are missed (the documented cap trade; exercised by
    tests/test_dedup_cap.py since testdata has no hot shingles).

    (Measured at sf0.1: the count-based shape is ~4× faster than
    verifying candidates against full shingle arrays — wide-array joins +
    the distinct dominate there. A PPJoin prefix-filtered variant exists
    as q_ngram_jaccard_prefix; xxhash64-ing shingles to 8-byte join keys
    was only ~8% faster while forfeiting exactness — not adopted; the
    designed approximate scale path is q_dedup_minhash.)"""
    return ngram_jaccard_pairs(spark, t(spark, sf_dir, "documents"), cache_key=sf_dir)


@query("q_ngram_jaccard_prefix", tags=("dedup", "llm"), oracle=_PAIRS_ORACLE)
def q_ngram_jaccard_prefix(spark, sf_dir):
    """PPJoin-style prefix-filtered variant of q_ngram_jaccard: only each
    document's rarest ⌈(1-t)·|S|⌉ + 1 shingles (under one global
    rare-first order) enter the inverted index — any pair with J ≥ t
    must share a prefix shingle (All-Pairs/PPJoin lemma), so the
    candidate set is provably complete while the self-join shrinks by
    ~t/(1+t). Candidates verify with exact Jaccard over full shingle
    sets; the oracle confirms identical output. This is the AT-SCALE
    path: its extra shuffles (frequency join + per-doc window) only pay
    off once the all-shingle self-join dominates — measured 4× slower
    at sf0.1, the right trade at 10⁹ documents."""
    from pyspark.sql.window import Window

    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES, fan_out, materialize_release

    sh = doc_shingles(fan_out(t(spark, sf_dir, "documents"), spark, per_task_bytes=SHINGLE_TASK_BYTES)).persist()
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    # global rare-first order: ascending document frequency, shingle text
    # as the tiebreak — the SAME total order for every document
    freq = inv.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    prefix_len = F.ceil(F.lit(1.0 - JACCARD_THRESHOLD) * F.size("shingles")).cast("int") + 1
    prefix = (
        inv.join(freq, "shingle")
        .withColumn("rk", F.row_number().over(w))
        .join(sh.select("doc_id", prefix_len.alias("plen")), "doc_id")
        .where(F.col("rk") <= F.col("plen"))
        .select("doc_id", "shingle")
        .persist()
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = verify_jaccard(cand, sh, sh, "doc_a", "doc_b")
    out = verified.select("doc_a", "doc_b", F.round("jaccard", 4).cast("double").alias("jaccard"))
    return materialize_release(out, sh, prefix)


# --- MinHash + LSH banding ---------------------------------------------------

N_HASHES = 48
N_BANDS = 16  # rows per band r = 3: P[miss | jaccard 0.9] = (1-0.9³)¹⁶ ≈ 8e-10


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES, carry: tuple = ()) -> DataFrame:
    """(doc_id, sig array<long>): deterministic min-hash per seed.

    Each shingle STRING is hashed exactly once (xxhash64 over variable-
    length text is the expensive part); the n_hashes families then
    re-hash that fixed 8-byte long with per-family seeds —
    xxhash64(seed, h) is a fresh independent-ish 64-bit family per seed,
    and hashing a long is O(1) vs O(len). Measured 2× faster than
    hashing the string per family at sf0.1. The recall equivalence vs
    hashing the string directly is PROBABILISTIC, not structural: a
    different hash family re-rolls which near-threshold pairs collide,
    and the (1-j³)¹⁶ miss bound (≈8e-10 at j=0.9) is what makes either
    family safe — validated against the exact all-pairs oracle at the
    measured scale factors, which stays the gate before any driver
    round samples q_dedup_minhash. Candidates are exact-Jaccard
    verified downstream either way. Deterministic: fixed seeds, no
    RNG."""
    base = sh.select(
        "doc_id", *carry, F.transform("shingles", lambda s: F.xxhash64(s)).alias("hs")
    )

    def min_hash(seed: int):
        seed_lit = F.lit(seed)
        return F.array_min(F.transform(F.col("hs"), lambda h: F.xxhash64(seed_lit, h)))

    return base.select(
        "doc_id", *carry, F.array(*[min_hash(i) for i in range(n_hashes)]).alias("sig")
    )


def band_struct_frame(sh):
    """(doc_id, shingles, bb array<struct<band,bucket>>) — the ONE
    definition of the N_HASHES/N_BANDS banding (band b's bucket hashes
    signature rows b·r..b·r+r-1), carried NEXT TO the shingle sets so
    q_dedup_minhash can cache a single frame serving both the band
    self-join and the exact-Jaccard verify (r15: two separate caches
    cost two materialization passes over the corpus). q_dedup_minhash's
    self-join and q_incremental_dedup's batch-probe MUST band
    identically or the incremental probe stops being comparable with
    the one-shot path (r15 review: previously two inline copies)."""
    sig = minhash_signatures(sh, carry=("shingles",))
    r = N_HASHES // N_BANDS
    return sig.select(
        "doc_id",
        "shingles",
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.hash(*[F.col("sig")[b * r + j] for j in range(r)]).alias("bucket"),
                )
                for b in range(N_BANDS)
            ]
        ).alias("bb"),
    )


def band_table(sh):
    """(doc_id, band, bucket) LSH band rows — the exploded view of
    :func:`band_struct_frame` (see there for the single-definition
    contract)."""
    return band_struct_frame(sh).select(
        "doc_id", F.explode("bb").alias("b2")
    ).select("doc_id", "b2.band", "b2.bucket")


def verify_jaccard(cand, sh_left, sh_right, lkey: str, rkey: str, threshold: float = JACCARD_THRESHOLD):
    """Exact-Jaccard verification of candidate pairs: join each side's
    shingle set, |∩|/|∪| as ``jaccard``, keep ≥ threshold. The single
    definition of the dedup family's verify stage (q_dedup_minhash,
    q_ngram_jaccard_prefix, q_incremental_dedup) — candidates only,
    never all-pairs."""
    return (
        cand.join(sh_left.withColumnsRenamed({"doc_id": lkey, "shingles": "_sh_l"}), lkey)
        .join(sh_right.withColumnsRenamed({"doc_id": rkey, "shingles": "_sh_r"}), rkey)
        .withColumn("n_shared", F.size(F.array_intersect("_sh_l", "_sh_r")))
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.size("_sh_l") + F.size("_sh_r") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
    )


@query("q_dedup_minhash", tags=("dedup", "llm"), bench=True, oracle=_PAIRS_ORACLE)
def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup detection, verified with exact Jaccard.

    Pipeline: shingle → 48 min-hashes → 16 bands of 3 rows → band-bucket
    join yields candidate pairs (docs agreeing on *all* rows of ≥1 band) →
    exact Jaccard on candidates only → threshold. The only shuffles are the
    band-bucket groupBy and the candidate join — cost scales with bucket
    collisions, not n². Returns the same (doc_a, doc_b, jaccard) surface
    as q_ngram_jaccard and is checked against the same exact oracle."""
    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES, fan_out, materialize_release

    d = fan_out(t(spark, sf_dir, "documents"), spark, per_task_bytes=SHINGLE_TASK_BYTES)
    # ONE cached frame carries shingles AND band buckets (r15: separate
    # sh/bands caches cost two 64-task materialization passes over the
    # corpus; the signature stage runs once either way, but the second
    # cache write and its task wave are pure overhead).
    combo = band_struct_frame(doc_shingles(d)).persist()
    sh = combo.select("doc_id", "shingles")
    bands = combo.select("doc_id", F.explode("bb").alias("b2")).select(
        "doc_id", "b2.band", "b2.bucket"
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = verify_jaccard(cand, sh, sh, "doc_a", "doc_b")
    out = verified.select("doc_a", "doc_b", F.round("jaccard", 4).cast("double").alias("jaccard"))
    return materialize_release(out, combo)


@query(
    "q_dedup_near_keep",
    tags=("dedup", "llm"),
    oracle=f"""
    WITH pairs AS ({_PAIRS_ORACLE})
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
    """,
)
def q_dedup_near_keep(spark, sf_dir):
    """The dedup *decision*: keep every document that is not the
    higher-id member of a near-dup pair (greedy drop-newest policy —
    at scale the same anti-join runs against connected components)."""
    pairs = q_ngram_jaccard(spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    return d.join(
        pairs.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    ).select("doc_id")


# --- n-gram novelty (memorization / boilerplate screen) ----------------------


_NOVELTY_ORACLE = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    df AS (SELECT s, count(*) AS df FROM ex GROUP BY s)
    SELECT ex.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE df.df = 1) AS BIGINT) AS n_novel,
           CAST(ROUND(1.0 * count(*) FILTER (WHERE df.df = 1) / count(*), 4) AS DOUBLE)
             AS novelty
    FROM ex JOIN df USING (s)
    GROUP BY ex.doc_id
"""


@query("q_ngram_novelty", tags=("dedup", "llm"), oracle=_NOVELTY_ORACLE)
def q_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a document's distinct
    3-token shingles that appear in NO other document — the memorization
    / boilerplate screen (novelty ≈ 0 means the document is assembled
    from corpus-common phrasing; ≈ 1 means unique content) run before
    selecting data for eval sets or dedup thresholds. Shape: one grouped
    count for the shingle document frequencies, one shingle-keyed join
    back (rows are linear in total shingle occurrences — no pair
    blowup), one per-doc aggregation. All-integer counts; the rate
    division is the only float, rounded to 4 dp."""
    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES, fan_out

    # fan_out: shingling a single-split scan serialized onto one core
    # (r15 profile: two ~3 s single-task stages — ex feeds both the df
    # count and the join back, so the shingle pass runs per branch);
    # at scale the scan is already split and this is a no-op.
    d = fan_out(t(spark, sf_dir, "documents"), spark, per_task_bytes=SHINGLE_TASK_BYTES)
    ex = doc_shingles(d).select("doc_id", F.explode("shingles").alias("s"))
    df = ex.groupBy("s").agg(F.count("*").alias("df"))
    return (
        ex.join(df, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("long").alias("n_novel"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1.0).otherwise(0.0)) / F.count("*"), 4
            )
            .cast("double")
            .alias("novelty"),
        )
    )


# --- SimHash (rows-only: hash family not portable to the oracle) ------------


# Hamming budget + pigeonhole blocks. Any pair within Hamming distance
# HAMMING_BUDGET must agree exactly on ≥1 of the SIMHASH_BLOCKS sub-keys
# (budget < blocks), so the bucket join on (block, sub-key) finds every
# such pair with no all-pairs scan. Dial (measured on the 25 planted
# jaccard≥0.9 pairs at sf0.01, whose Hamming histogram is
# [0×4, 1×2, 2×5, 3×4, 4×7, 5×3]): budget 3 / 4×16-bit blocks → recall
# 15/25 = 0.60; budget 4 / 5×13-bit blocks → recall 22/25 = 0.88 with no
# extra false positives after the Hamming filter. 13-bit blocks keep
# random collisions at ~2⁻¹³ per block — selective enough that bucket
# sizes stay bounded at 10⁹ docs (SimHash pigeonhole is a screen; pairs
# still pass the exact Hamming check).
HAMMING_BUDGET = 4
SIMHASH_BLOCKS = 5  # 64 bits → blocks of 13,13,13,13,12


def simhash_pairs(d):
    """64-bit SimHash per document: sign-aggregate each bit of the token
    xxhash64 over the document, then report candidate pairs at Hamming
    distance ≤ HAMMING_BUDGET via bucket join on SIMHASH_BLOCKS sub-keys
    (pigeonhole — see the dial comment above). Input: (doc_id, text)."""
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    th = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    bit_sums = th.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
                f"b{b}"
            )
            for b in range(64)
        ]
    )
    one = F.lit(1).cast("long")
    simhash = bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.shiftleft(one, b)).otherwise(F.lit(0).cast("long"))
                for b in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return hamming_pairs(simhash).orderBy("doc_a", "doc_b")


def _pigeonhole_keys(hashes, blocks: int):
    """(doc_id, simhash, slot, sub) pigeonhole sub-keys of a 64-bit
    fingerprint table: ``blocks`` contiguous bit ranges per fingerprint.
    Shared by the symmetric pair join and the batch×corpus probe."""
    bounds = [round(64 * k / blocks) for k in range(blocks + 1)]
    return hashes.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("slot"),
                        F.shiftrightunsigned(F.col("simhash"), bounds[k])
                        .bitwiseAND(F.lit((1 << (bounds[k + 1] - bounds[k])) - 1))
                        .alias("sub"),
                    )
                    for k in range(blocks)
                ]
            )
        ).alias("kk"),
    ).select("doc_id", "simhash", "kk.slot", "kk.sub")


def hamming_probe(
    corpus_hashes, batch_hashes, budget: int = HAMMING_BUDGET, blocks: int = SIMHASH_BLOCKS
):
    """Asymmetric pigeonhole probe: every (batch_id, corpus_id, hamming)
    pair within ``budget`` between a NEW batch's fingerprints and the
    accumulated corpus fingerprint index — without ever comparing the
    corpus to itself or re-fingerprinting it. The corpus key table is
    precomputed once (blocks rows per fingerprint, appendable
    incrementally — fingerprints are per-row map work); each batch pays
    O(batch) key explode plus one bucket-keyed join, independent of
    corpus growth except via bucket occupancy — the same asymmetry as
    the MinHash batch probe (q_incremental_dedup). doc_id namespaces
    must be disjoint between the two sides (enforced by the callers'
    id offsets)."""
    ck = _pigeonhole_keys(corpus_hashes, blocks)
    bk = _pigeonhole_keys(batch_hashes, blocks)
    cand = (
        bk.alias("b")
        .join(
            ck.alias("c"),
            (F.col("b.slot") == F.col("c.slot")) & (F.col("b.sub") == F.col("c.sub")),
        )
        .select(
            F.col("b.doc_id").alias("batch_id"),
            F.col("c.doc_id").alias("corpus_id"),
            F.col("b.simhash").alias("sim_b"),
            F.col("c.simhash").alias("sim_c"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sim_b").bitwiseXOR(F.col("sim_c"))))
        .where(F.col("hamming") <= budget)
        .select("batch_id", "corpus_id", F.col("hamming").cast("long").alias("hamming"))
    )


def hamming_pairs(hashes, budget: int = HAMMING_BUDGET, blocks: int = SIMHASH_BLOCKS):
    """All (doc_a, doc_b, hamming) pairs within Hamming distance
    ``budget`` over a 64-bit fingerprint table (doc_id, simhash) via
    the pigeonhole bucket join: any pair within ``budget`` flips
    agrees exactly on ≥ 1 of ``blocks`` sub-keys (requires
    budget < blocks), so candidates come from equality joins on the
    sub-keys — never an all-pairs product — and the exact bit_count
    check screens them. Shared by the text SimHash family and the
    perceptual dHash image dedup (r11); see the dial comment above
    for the bucket-size maths."""
    keys = _pigeonhole_keys(hashes, blocks)
    cand = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.slot") == F.col("b.slot"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .where(F.col("hamming") <= budget)
        .select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))
    )


_SIMHASH_SCENARIO = [
    (0, "the quick brown fox jumps over the lazy dog near the old stone bridge"),
    (1, "the quick brown fox jumps over the lazy dog near the old stone bridge"),
    (2, "the quick brown wolf jumps over the lazy dog near the old stone bridge"),
    (3, "the quick brown fox leaps over the sleepy dog near the new stone bridge"),
    (4, "seventeen green turtles watch the river drift past the mossy harbor wall"),
    (5, "seventeen green turtles watch the river drift past the mossy harbor wall"),
    (6, "completely unrelated text about compilers registers and allocation order"),
    (7, "the quick brown fox jumps over the lazy dog near the old iron bridge"),
]

# Pinned output of simhash_pairs over _SIMHASH_SCENARIO: the two exact
# duplicate pairs at Hamming 0, plus the single-token edit (doc 2) at
# Hamming 3 from both members of the first dup pair. Docs 3/7 land
# beyond the budget (short docs — one token flips many bits) and docs
# 4-6 are unrelated: their absence is part of the pin.
# IMPLEMENTATION PIN — taken under Spark 4.1.2's xxhash64. A version
# bump that changes the hash seed/algorithm re-rolls every bit family:
# a red here after an upgrade is pin drift, not a kernel bug — re-pin.
_SIMHASH_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
      (0, 2, 3),
      (1, 2, 3),
      (4, 5, 0)
    ) AS t(doc_a, doc_b, hamming)
    """


@query("q_dedup_simhash", tags=("dedup", "llm"), oracle=_SIMHASH_ORACLE)
def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup screen through :func:`simhash_pairs`, hash-checked
    via the literal-scenario pattern: a pinned 8-document set (two exact
    duplicate pairs, three single-token edits, unrelated fillers) whose
    candidate pairs and Hamming distances under the xxhash64 bit family
    are the VALUES oracle — any drift in tokenization, the sign
    aggregation, or the pigeonhole bucketing flips the comparison.
    Corpus-scale recall vs the planted jaccard≥0.9 pairs stays pinned in
    tests/test_ann.py."""
    from incremental_dagster_delta_spark.tables import literal_df

    docs = literal_df(spark, _SIMHASH_SCENARIO, "doc_id long, text string")
    return simhash_pairs(docs)


# --- connected components over the near-dup graph ---------------------------


@query(
    "q_dedup_cluster",
    tags=("dedup", "llm", "iterative"),
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_PAIRS_ORACLE}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id,
           LEAST(src, MIN(dst)) AS cluster_id
    FROM reach
    GROUP BY src
    """,
)
def q_dedup_cluster(spark, sf_dir):
    """Near-dup *cluster* formation: connected components over the
    Jaccard pair graph, so a whole family of mutual near-dups collapses
    to one canonical survivor (min doc_id) instead of the pairwise
    greedy drop of ``q_dedup_near_keep`` (which can over-drop on chains
    a-b, b-c).

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in
    O(graph diameter) rounds. Each round is one shuffle join + one
    aggregation — the simplest distributed-CC shape, kept as the
    diameter-bound baseline; the SCALE path is
    ``graph.connected_components`` (alternating large-star/small-star,
    O(log² n) rounds regardless of diameter — see ``q_dedup_clusters``,
    which also labels singletons and feeds ``q_dedup_survivors``).
    ``localCheckpoint`` truncates the plan lineage each round so the
    loop doesn't compound into one giant DAG. Oracle: DuckDB recursive
    CTE transitive closure (feasible only at test scale)."""
    pairs = q_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = fwd.unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).localCheckpoint()
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint()
    while True:
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


# --- incremental dedup: batch vs existing corpus -----------------------------

BATCH_OFFSET = 300000  # re-keyed batch doc ids start here


@query(
    "q_incremental_dedup",
    tags=("dedup", "incremental", "llm"),
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    batch AS (
      -- arriving batch: exact copies of every 10th doc (dups the index
      -- must catch) + reversed-token rewrites of every (10k+7)th doc
      -- (novel content the index must NOT flag)
      SELECT doc_id + {BATCH_OFFSET} AS batch_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + {BATCH_OFFSET} AS batch_id,
             array_to_string(list_reverse({_TOKS_SQL}), ' ') AS text
      FROM documents WHERE doc_id % 10 = 7
    ),
    bsh AS (
      SELECT batch_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS shingles
      FROM (SELECT batch_id, {_TOKS_SQL} AS toks FROM batch)
    ),
    matches AS (
      SELECT b.batch_id, s.doc_id,
             CAST(len(list_intersect(b.shingles, s.shingles)) AS DOUBLE) /
             (len(b.shingles) + len(s.shingles) - len(list_intersect(b.shingles, s.shingles)))
               AS jaccard
      FROM bsh b JOIN sh s ON TRUE
      WHERE CAST(len(list_intersect(b.shingles, s.shingles)) AS DOUBLE) /
            (len(b.shingles) + len(s.shingles) - len(list_intersect(b.shingles, s.shingles)))
            >= {JACCARD_THRESHOLD}
    ),
    best AS (
      SELECT batch_id, doc_id, jaccard,
             row_number() OVER (PARTITION BY batch_id ORDER BY jaccard DESC, doc_id ASC) AS rk
      FROM matches
    )
    SELECT batch_id, doc_id AS dup_of,
           CAST(ROUND(jaccard, 4) AS DOUBLE) AS jaccard
    FROM best WHERE rk = 1
    """,
)
def q_incremental_dedup(spark, sf_dir):
    """Incremental dedup — the production shape: a new BATCH is screened
    against the EXISTING corpus without ever re-comparing the corpus to
    itself. Band buckets are computed for both sides with the same fixed
    seeds, but the candidate join is batch×corpus only (batch side is a
    day's arrivals — orders of magnitude smaller than the index), then
    exact Jaccard verifies and the best match per batch doc wins. At
    100 TB the corpus band table is a precomputed, bucketed-on-
    (band, bucket) index that each day's batch probes; the cost is
    O(batch) map work + one bucket-keyed shuffle, independent of corpus
    size growth except via bucket occupancy. The oracle is exact
    all-pairs batch×corpus (oracle-scale only)."""
    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES, fan_out, materialize_release

    d = fan_out(t(spark, sf_dir, "documents"), spark, per_task_bytes=SHINGLE_TASK_BYTES).select("doc_id", "text")
    toks = _tokens(F.col("text"))
    batch = (
        d.where(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + BATCH_OFFSET).alias("doc_id"), "text")
        .unionByName(
            d.where(F.col("doc_id") % 10 == 7).select(
                (F.col("doc_id") + BATCH_OFFSET).alias("doc_id"),
                F.array_join(F.reverse(toks), " ").alias("text"),
            )
        )
    )
    corpus_sh = doc_shingles(d).persist()
    batch_sh = doc_shingles(batch).persist()
    corpus_bands = band_table(corpus_sh)
    batch_bands = band_table(batch_sh)
    cand = (
        batch_bands.alias("b")
        .join(
            corpus_bands.alias("c"),
            (F.col("b.band") == F.col("c.band")) & (F.col("b.bucket") == F.col("c.bucket")),
        )
        .select(F.col("b.doc_id").alias("batch_id"), F.col("c.doc_id").alias("corpus_id"))
        .distinct()
    )
    verified = verify_jaccard(cand, batch_sh, corpus_sh, "batch_id", "corpus_id")
    from pyspark.sql import Window

    w = Window.partitionBy("batch_id").orderBy(F.col("jaccard").desc(), F.col("corpus_id").asc())
    out = (
        verified.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "batch_id",
            F.col("corpus_id").alias("dup_of"),
            F.round("jaccard", 4).cast("double").alias("jaccard"),
        )
    )
    return materialize_release(out, corpus_sh, batch_sh)


# --- containment (asymmetric subset-duplication) ----------------------------

CONTAIN_THRESHOLD = 0.9
CONTAIN_OFFSET = 400000  # re-keyed truncated copies start here


@query(
    "q_containment",
    tags=("dedup", "llm"),
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- planted: first-half truncations of every 13th doc — contained in
      -- their source but far below symmetric-Jaccard thresholds
      SELECT doc_id + {CONTAIN_OFFSET} AS doc_id,
             array_to_string(toks[1:greatest(len(toks) // 2, 3)], ' ') AS text
      FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
      WHERE doc_id % 13 = 0
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS shingles
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
            FROM corpus)
    )
    SELECT a.doc_id AS contained_doc, b.doc_id AS container_doc,
           CAST(ROUND(
             CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) / len(a.shingles),
           4) AS DOUBLE) AS containment
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) / len(a.shingles)
          >= {CONTAIN_THRESHOLD}
    """,
)
def q_containment(spark, sf_dir):
    """Asymmetric containment dedup: |A∩B| / |A| ≥ 0.9 catches a document
    CONTAINED in another (quote expansions, truncated mirrors, page
    fragments) that symmetric Jaccard misses entirely — the planted
    half-truncations sit at containment 1.0 but Jaccard ≈ 0.5·|B|/|A|.
    Same inverted-index scale shape as q_ngram_jaccard: candidates only
    materialize for docs sharing a shingle, co-occurrence counts stay
    (doc, doc) narrow, and the directional score is computed for both
    orientations of each candidate pair. (At 100 TB, apply the same
    DF_CAP cold/hot split q_ngram_jaccard uses before the self-join —
    omitted here so the exact oracle stays unconditional.) The corpus
    plants first-half truncations of every 13th document."""
    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES, fan_out, materialize_release

    d = fan_out(t(spark, sf_dir, "documents"), spark, per_task_bytes=SHINGLE_TASK_BYTES).select("doc_id", "text")
    toks = _tokens(F.col("text"))
    half = F.slice(toks, 1, F.greatest((F.size(toks) / 2).cast("int"), F.lit(3)))
    planted = d.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + CONTAIN_OFFSET).alias("doc_id"),
        F.array_join(half, " ").alias("text"),
    )
    corpus = d.unionByName(planted)
    sh = doc_shingles(corpus).persist()
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_x"), F.col("b.doc_id").alias("doc_y"))
        .agg(F.count("*").alias("n_shared"))
    )
    scored = (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "doc_x", "n_sh": "n_x"}), "doc_x")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_y", "n_sh": "n_y"}), "doc_y")
    )
    # both orientations of each undirected candidate pair
    directed = scored.select(
        F.col("doc_x").alias("contained_doc"),
        F.col("doc_y").alias("container_doc"),
        (F.col("n_shared").cast("double") / F.col("n_x")).alias("containment"),
    ).unionByName(
        scored.select(
            F.col("doc_y").alias("contained_doc"),
            F.col("doc_x").alias("container_doc"),
            (F.col("n_shared").cast("double") / F.col("n_y")).alias("containment"),
        )
    )
    out = directed.where(F.col("containment") >= CONTAIN_THRESHOLD).select(
        "contained_doc", "container_doc", F.round("containment", 4).cast("double").alias("containment")
    )
    return materialize_release(out, sh)


# --- edit-distance (fuzzy) dedup with blocking -------------------------------

FUZZY_REL_DIST = 0.1  # keep pairs with levenshtein <= 10% of the longer text


@query(
    "q_dedup_fuzzy",
    tags=("dedup", "llm"),
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, lang, n_chars // 64 AS len_bucket,
             array_to_string((string_split(text, ' '))[1:2], ' ') AS pfx
      FROM documents
    )
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_distance
    FROM b x JOIN b y
      ON x.lang = y.lang AND x.len_bucket = y.len_bucket
     AND x.pfx = y.pfx AND x.doc_id < y.doc_id
    WHERE levenshtein(x.text, y.text)
          <= {FUZZY_REL_DIST} * GREATEST(length(x.text), length(y.text))
    """,
)
def q_dedup_fuzzy(spark, sf_dir):
    """Fuzzy (edit-distance) dedup: blocked candidate generation, then
    exact Levenshtein verification at ≤10% of the longer text — the
    dedup family member for OCR noise / minor-revision duplicates where
    token-set measures (Jaccard, MinHash) under-read character-level
    edits.

    Scale shape: Levenshtein is O(|a|·|b|) per pair, so it can NEVER run
    all-pairs — candidates come from an equality BLOCK on
    (lang, length-bucket, first-2-tokens): a hash-partitionable key whose
    per-block cost is Σ|block|² with tight blocks (max block = 2 on
    testdata, and the length bucket alone caps how different two blocked
    texts can be). The verify filter runs inside the join's codegen —
    JVM-side, no UDF. Same (doc_a, doc_b) surface as the other dedup
    qids, so survivors/clusters compose downstream."""
    from incremental_dagster_delta_spark.tables import fan_out

    # fan_out: the block self-join broadcasts the build side, so the
    # probe side's partitioning is the scan's — one split at sf0.1 put
    # every Levenshtein verify on a single core (r15 profile: one 6.2 s
    # task); a no-op on an already-split scan at scale.
    d = fan_out(t(spark, sf_dir, "documents"), spark)
    b = d.select(
        "doc_id",
        "text",
        "lang",
        F.floor(F.col("n_chars") / 64).alias("len_bucket"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 2), " ").alias("pfx"),
    )
    x, y = b.alias("x"), b.alias("y")
    dist = F.levenshtein(F.col("x.text"), F.col("y.text"))
    return (
        x.join(
            y,
            (F.col("x.lang") == F.col("y.lang"))
            & (F.col("x.len_bucket") == F.col("y.len_bucket"))
            & (F.col("x.pfx") == F.col("y.pfx"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .where(
            dist
            <= FUZZY_REL_DIST * F.greatest(F.length(F.col("x.text")), F.length(F.col("y.text")))
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            dist.cast("long").alias("edit_distance"),
        )
    )


# --- exact substring (span) dedup --------------------------------------------
#
# The one standard LLM dedup family the document-level and line-level
# operators both miss: cross-document duplicated SPANS — runs of >=
# SUBSTR_MIN_SPAN consecutive tokens shared verbatim by two documents
# (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
# Better", the suffix-array ExactSubstr dedup). The suffix-array
# formulation is inherently sequential; the Spark-first equivalent is
# positional shingle postings + a gaps-and-islands window:
#
#   1. positional K-token shingles (doc_id, pos, shingle) — the
#      q_ngram_jaccard inverted-index machinery, positions kept;
#   2. df-cap the postings (drop shingles in > SUBSTR_DF_CAP docs):
#      bounds the self-join at sum(df^2) by construction, the same
#      unconditional bound as DF_CAP above. A span consisting ENTIRELY
#      of ultra-common shingles is the documented trade (boilerplate
#      that hot is better handled by q_boilerplate_lines);
#   3. self-join postings on shingle with doc_a < doc_b: one match row
#      per aligned shingle occurrence;
#   4. islands: within a (doc_a, doc_b) pair, a shared span is a run of
#      matches advancing BOTH positions by 1 — i.e. constant diagonal
#      (pos_a - pos_b) with consecutive pos_a. island = pos_a -
#      row_number() over (pair, diag | order pos_a) groups each maximal
#      run; a run of n shingles covers n + K - 1 tokens.
#
# At 100 TB: the postings table partitions by shingle hash (the join
# key), the window partitions by (doc_a, doc_b, diag) — millions of
# tiny partitions, never a global sort; every stage is bounded by the
# df cap. No UDFs anywhere.

SUBSTR_K = 5  # positional shingle width (tokens)
SUBSTR_MIN_SPAN = 8  # minimum duplicated span length (tokens) to report
SUBSTR_DF_CAP = 64  # drop shingles appearing in more docs (join bound)

# Shared CTE chain for the positional-shingle span detection — toks ->
# pos -> df-capped cold -> diagonal match -> island grouping -> spans.
# ONE definition (r15 review: previously inlined twice); q_substring_dedup
# selects the spans directly, q_dup_span_fraction merges their per-doc
# interval coverage on top.
_SPANS_CTES = f"""toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(toks[i:i+{SUBSTR_K - 1}], ' ') AS shingle
      FROM toks, unnest(range(1, len(toks) - {SUBSTR_K} + 2)) r(i)
      WHERE len(toks) >= {SUBSTR_K}
    ),
    cold AS (
      SELECT p.doc_id, p.pos, p.shingle
      FROM pos p
      JOIN (
        SELECT shingle FROM pos GROUP BY shingle
        HAVING count(DISTINCT doc_id) <= {SUBSTR_DF_CAP}
      ) keep USING (shingle)
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
      FROM cold a JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
             pos_a - row_number() OVER (
               PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
             ) AS island
      FROM m
    ),
    spans AS (
      SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
             count(*) + {SUBSTR_K} - 1 AS span_tokens
      FROM isl GROUP BY doc_a, doc_b, diag, island
      HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_MIN_SPAN}
    )"""

_SUBSTR_ORACLE = f"""
    WITH {_SPANS_CTES}
    SELECT doc_a, doc_b,
           CAST(start_a AS BIGINT) AS start_a,
           CAST(start_b AS BIGINT) AS start_b,
           CAST(span_tokens AS BIGINT) AS span_tokens
    FROM spans
"""


def positional_shingles(d: DataFrame, k: int = SUBSTR_K) -> DataFrame:
    """(doc_id, pos, shingle) — K-token shingles WITH their 1-based
    token position (q_ngram_jaccard's :func:`doc_shingles` drops
    positions and distincts; span detection needs both kept)."""
    toks = _tokens(F.col("text"))
    wt = d.select("doc_id", toks.alias("toks")).where(F.size("toks") >= k)
    entries = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (k - 1)),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.array_join(F.slice(F.col("toks"), i, k), " ").alias("shingle"),
        ),
    )
    return wt.select("doc_id", F.explode(entries).alias("e")).select(
        "doc_id", F.col("e.pos").alias("pos"), F.col("e.shingle").alias("shingle")
    )


def substring_spans(
    spark,
    docs: DataFrame,
    k: int = SUBSTR_K,
    min_span: int = SUBSTR_MIN_SPAN,
    df_cap: int = SUBSTR_DF_CAP,
) -> DataFrame:
    """Cross-document duplicated spans ≥ ``min_span`` tokens — see the
    section comment above for the algorithm and its bounds. Returns
    (doc_a, doc_b, start_a, start_b, span_tokens), one row per maximal
    shared run per document pair."""
    from pyspark.sql.window import Window

    from incremental_dagster_delta_spark.tables import materialize_release

    ps = positional_shingles(docs, k).persist()
    keep = (
        ps.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") <= df_cap)
        .select("shingle")
    )
    cold = ps.join(keep, "shingle")
    m = (
        cold.alias("a")
        .join(
            cold.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.pos").alias("pos_b"),
        )
    )
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = m.select("doc_a", "doc_b", "pos_a", "pos_b", diag).withColumn(
        "island", F.col("pos_a") - F.row_number().over(w)
    )
    out = (
        isl.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.count("*") + (k - 1)).cast("long").alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= min_span)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )
    return materialize_release(out, ps)


@query("q_substring_dedup", tags=("dedup", "llm"), oracle=_SUBSTR_ORACLE)
def q_substring_dedup(spark, sf_dir):
    """Exact substring (span) dedup: every maximal run of ≥
    SUBSTR_MIN_SPAN consecutive tokens shared verbatim across a document
    pair — the Lee et al. 2021 ExactSubstr family, re-expressed as
    df-capped positional shingle postings + a gaps-and-islands window
    (see :func:`substring_spans`). Catches copied passages inside
    otherwise-distinct documents, which document-level MinHash/SimHash
    and line-level q_dedup_lines both miss."""
    return substring_spans(spark, t(spark, sf_dir, "documents"))


_DUP_FRACTION_ORACLE = f"""
    WITH {_SPANS_CTES},
    iv AS (
      -- DISTINCT is load-bearing: it makes ORDER BY (s, e) a TOTAL
      -- order inside the two window ops below. With duplicate
      -- intervals (the same span found via several partners), the
      -- engine may evaluate marked's prefix-max and merged's running
      -- sum over DIFFERENT tie orders, splitting one island into two
      -- groups and double-counting its tokens (observed on DuckDB at
      -- sf0.001, doc 120: 3 identical [1,75] intervals -> 150/75).
      SELECT DISTINCT doc_id, s, e FROM (
        SELECT doc_a AS doc_id, start_a AS s, start_a + span_tokens - 1 AS e FROM spans
        UNION ALL
        SELECT doc_b AS doc_id, start_b AS s, start_b + span_tokens - 1 AS e FROM spans
      )
    ),
    marked AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(max(e) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
      FROM iv
    ),
    merged AS (
      SELECT doc_id, min(s) AS mn, max(e) AS mx
      FROM (
        SELECT doc_id, s, e, sum(brk) OVER (
          PARTITION BY doc_id ORDER BY s, e
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM marked
      ) GROUP BY doc_id, grp
    ),
    cov AS (
      SELECT doc_id, sum(mx - mn + 1) AS dup_tokens FROM merged GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(ROUND(COALESCE(c.dup_tokens, 0) / (1.0 * len(t.toks)), 4) AS DOUBLE)
             AS dup_fraction
    FROM toks t LEFT JOIN cov c USING (doc_id)
"""


@query("q_dup_span_fraction", tags=("dedup", "llm"), oracle=_DUP_FRACTION_ORACLE)
def q_dup_span_fraction(spark, sf_dir):
    """Per-document duplicated-token fraction: the share of each
    document's tokens covered by ANY cross-document duplicated span
    (≥ SUBSTR_MIN_SPAN tokens) — the corpus-health readout Lee et al.
    2021 report next to ExactSubstr dedup, and the score a curation
    pipeline thresholds on ("drop documents that are >50% copied").

    Shape: the :func:`substring_spans` span table (df-cap-bounded, see
    the section comment above) exploded to per-doc [start, end] token
    intervals, merged per doc with the classic prefix-max islands
    window (interval union — overlapping spans from different partners
    must not double-count a token), then one left join back onto the
    per-doc token counts so span-free documents report 0. Every window
    partitions by doc_id; nothing is corpus-global."""
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    spans = substring_spans(spark, docs)
    iv = spans.select(
        F.col("doc_a").alias("doc_id"),
        F.col("start_a").alias("s"),
        (F.col("start_a") + F.col("span_tokens") - 1).alias("e"),
    ).unionAll(
        spans.select(
            F.col("doc_b").alias("doc_id"),
            F.col("start_b").alias("s"),
            (F.col("start_b") + F.col("span_tokens") - 1).alias("e"),
        )
    ).distinct()  # total (s, e) order for the windows below — see the
    # oracle's iv CTE: duplicate intervals make the tie order between
    # the prefix-max and running-sum windows engine-dependent, which
    # can split an island and double-count its tokens
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    brk = F.when(F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1).otherwise(0)
    merged = (
        iv.withColumn("brk", brk)
        .withColumn("grp", F.sum("brk").over(w_run))
        .groupBy("doc_id", "grp")
        .agg(F.min("s").alias("mn"), F.max("e").alias("mx"))
    )
    cov = merged.groupBy("doc_id").agg(F.sum(F.col("mx") - F.col("mn") + 1).alias("dup_tokens"))
    n_tok = docs.select("doc_id", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"))
    return (
        n_tok.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / (1.0 * F.col("n_tokens")), 4
            ).cast("double").alias("dup_fraction"),
        )
    )


# --- URL-canonicalization dedup ----------------------------------------------
#
# The CCNet/RefinedWeb/C4 first-stage primitive: web corpora arrive keyed
# by URL, and the same page surfaces under many raw spellings — scheme
# and case variants, www prefixes, default ports, trailing slashes,
# fragments, tracking parameters. Canonicalize, then EXACT-dedup on the
# canonical key: a pure map-side projection plus one hash aggregation,
# the cheapest dedup family member and the one that runs first at scale.
#
# The documents table has no URL column, so a deterministic messy URL is
# synthesized per document from (source, doc_id) — same discipline as
# q_dedup_exact's planted duplicates: collisions (doc_id mod 25 paths — lcm with the 20-source cycle gives ~5 raw variants per page at sf0.01)
# and every variant class above are planted by construction, making the
# canonicalization decision non-vacuous and the oracle exact.

# Portability contract for the shared SQL below (runs verbatim in BOTH
# Spark SQL and DuckDB): backslash-free regexes ([?]/[.] char classes —
# Spark string literals consume backslashes, DuckDB's don't), and every
# pattern matches AT MOST ONCE per URL (anchored, or single-occurrence
# by construction — DuckDB's regexp_replace replaces only the first
# match where Spark replaces all; per-parameter removal keeps the two
# engines in lockstep). Boundary, found by the hypothesis sweep in
# tests/test_url_canon_props.py and pinned there: a REPEATED tracking
# key (utm_source=a&utm_source=b) breaks the at-most-once premise and
# the engines diverge — each tracking key at most once per URL is the
# supported domain (true of real tracking params and of the planted
# construction).
_URL_SQL = """concat(
  CASE WHEN doc_id % 3 = 0 THEN 'http://' ELSE 'https://' END,
  CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END,
  source, '.example.com',
  CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,
  '/Articles/', CAST(doc_id % 25 AS STRING),
  CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
  CASE WHEN doc_id % 7 = 0 THEN concat('?utm_source=feed&utm_campaign=x&id=', CAST(doc_id % 25 AS STRING))
       WHEN doc_id % 7 = 1 THEN concat('?id=', CAST(doc_id % 25 AS STRING))
       ELSE '' END,
  CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)"""

# lowercase → strip scheme → strip www. → strip default port → strip
# fragment → strip tracking params (content params like id= survive) →
# mend the query string → strip trailing slash.
_URL_CANON_STEPS = (
    ("^https?://", ""),
    ("^www[.]", ""),
    (":(80|443)/", "/"),
    ("#.*$", ""),
    ("utm_source=[^&#]*", ""),
    ("utm_campaign=[^&#]*", ""),
    ("[?]&+", "?"),
    ("[?&]+$", ""),
    ("/[?]", "?"),
    ("/+$", ""),
)


def canonical_url_sql(raw: str) -> str:
    """The canonicalization chain over any URL-typed SQL expression —
    identical semantics in Spark SQL and DuckDB (see the portability
    contract above)."""
    out = f"lower({raw})"
    for pat, rep in _URL_CANON_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}')"
    return out


@query(
    "q_url_dedup",
    tags=("dedup", "llm"),
    oracle=f"""
    WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    SELECT {canonical_url_sql('url')} AS canonical_url,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_dups,
           COUNT(DISTINCT url) AS n_raw_forms
    FROM u
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def q_url_dedup(spark, sf_dir):
    """URL-canonicalization dedup (CCNet/RefinedWeb first stage): group
    documents by canonical URL, keep the smallest doc_id per group,
    report only colliding groups. Whole pipeline is two codegen
    projections (synthesize + canonicalize — zero Python UDFs) and one
    hash aggregation keyed on the canonical string: map-side combine,
    no self-join, no index. At 100 TB this is a single shuffle whose
    key cardinality is the number of distinct pages — the scale path
    needs nothing beyond AQE; n_raw_forms > 1 groups measure how much
    work canonicalization saved the downstream content-hash pass."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    u = d.select("doc_id", F.expr(_URL_SQL).alias("url"))
    return (
        u.select("doc_id", "url", F.expr(canonical_url_sql("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.countDistinct("url").alias("n_raw_forms"),
        )
        .where(F.col("n_dups") > 1)
    )


# Blocklist rules for q_domain_filter: exact hosts plus suffix rules
# (the registrable-domain form real lists use — one 'example.org' entry
# blocks every subdomain). Deterministic; planted so both kinds fire on
# the synthesized hosts (suffix '7.example.com' catches src7 AND src17).
_DOMAIN_BLOCKLIST_SQL = """(VALUES
  ('src3.example.com', 'host'),
  ('news.internal.example', 'host'),
  ('7.example.com', 'suffix')) AS bl(pattern, kind)"""

_DOMAIN_MATCH_SQL = (
    "(kind = 'host' AND host = pattern) "
    "OR (kind = 'suffix' AND host LIKE concat('%', pattern))"
)


@query(
    "q_domain_filter",
    tags=("curation", "llm"),
    oracle=f"""
    WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
    h AS (SELECT doc_id,
                 regexp_extract({canonical_url_sql('url')}, '^([^/]+)', 1) AS host
          FROM u),
    sel AS (
      SELECT h.doc_id, h.host,
             MAX(CASE WHEN bl.pattern IS NOT NULL THEN 1 ELSE 0 END) AS blk
      FROM h LEFT JOIN {_DOMAIN_BLOCKLIST_SQL}
        ON {_DOMAIN_MATCH_SQL}
      GROUP BY h.doc_id, h.host
    )
    SELECT host, CAST(blk AS BOOLEAN) AS blocked, COUNT(*) AS n_docs
    FROM sel GROUP BY host, blk
    """,
)
def q_domain_filter(spark, sf_dir):
    """Domain-blocklist filtering (the C4/RefinedWeb/CCNet crawl-curation
    stage that runs right after URL canonicalization): extract the host
    from each document's canonical URL and match it against a blocklist
    of exact hosts and registrable-domain SUFFIX rules, reporting
    per-host keep/block document counts.

    Scale shape: the corpus side is a map-only projection
    (canonicalize + regexp_extract); the blocklist — thousands of rows
    in practice, never corpus-sized — BROADCASTS, and the suffix rules
    make the match a BroadcastNestedLoopJoin, which is exactly right:
    the loop is |docs| × |rules| with the rules in memory, no shuffle
    of the corpus at any scale. The per-doc MAX() collapse makes a doc
    matched by several rules count once."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    hosts = d.select(
        "doc_id",
        F.regexp_extract(
            F.expr(canonical_url_sql(_URL_SQL)), "^([^/]+)", 1
        ).alias("host"),
    )
    bl = F.broadcast(spark.sql(f"SELECT * FROM {_DOMAIN_BLOCKLIST_SQL}"))
    return (
        hosts.join(bl, F.expr(_DOMAIN_MATCH_SQL), "left")
        .groupBy("doc_id", "host")
        .agg(F.max(F.when(F.col("pattern").isNotNull(), 1).otherwise(0)).alias("blk"))
        .groupBy("host", F.col("blk").cast("boolean").alias("blocked"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
