"""Corpus-curation operators for LLM training-data pipelines.

The second curation family beyond dedup (SURVEY.md §2.5): the filters a
100 TB pretraining corpus passes through between raw ingest and
tokenization —

- **PII redaction** — regex scrub of emails / phone numbers / IPv4s, with
  per-doc redaction counts. Pure ``regexp_replace`` → whole-stage codegen,
  no Python. Patterns are kept to the RE2 ∩ Java-regex common subset so
  the DuckDB oracle applies the identical expressions.
- **benchmark decontamination** — drop training docs sharing any 8-token
  shingle with a held-out "benchmark" split (here: ``source = 'src0'``),
  the standard n-gram-collision screen (e.g. GPT-3 appendix C). Inverted
  index on the shingle hash + semi-join; never doc×doc.
- **stratified sampling** — per-source keep-rates decided by a
  deterministic md5-based uniform draw per doc (same device as
  q_hash_split): reproducible, rerun-stable, no RNG state; at scale this
  is a map-only filter.
- **Gopher-style quality rules** — the classic static filters (word
  count bounds, mean word length, symbol ratio, stopword presence,
  within-doc repetition fraction) as boolean columns + a keep decision.
- **per-source reservoir top-k** — deterministic k-per-group sample via
  ``row_number`` over an md5 order: one shuffle on the group key; the
  at-scale form of "give me k examples from each source".

All five are oracle-checked against DuckDB on the same parquet.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t, TOKS_SQL

# --- PII redaction -----------------------------------------------------------

# RE2 ∩ Java-regex compatible patterns (no backrefs, no lookaround).
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}

# The synthetic corpus contains no PII, which would make the operator
# vacuous — so both engines deterministically inject a synthetic email
# for every 20th doc and a phone for every 50th, then redact. The
# injection is part of the test harness, not the operator.
_INJECT_SQL = """
    SELECT doc_id,
           text ||
             CASE WHEN doc_id % 20 = 0
                  THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
             CASE WHEN doc_id % 50 = 0
                  THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
             AS text
    FROM documents
"""


@query(
    "q_pii_redact",
    tags=("curation", "llm"),
    oracle=f"""
    WITH injected AS ({_INJECT_SQL})
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
             '{_PII_PATTERNS["phone"]}', '<PHONE>', 'g'),
             '{_PII_PATTERNS["ipv4"]}', '<IP>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '{_PII_PATTERNS["email"]}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_PATTERNS["phone"]}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text, '{_PII_PATTERNS["ipv4"]}')) AS BIGINT) AS n_ipv4
    FROM injected
    """,
)
def q_pii_redact(spark, sf_dir):
    """Regex PII scrub with per-category counts. regexp_replace /
    regexp_count are JVM codegen — at 100 TB this is a map-only pass with
    zero shuffle; counts let a downstream gate quarantine PII-dense docs
    instead of silently rewriting them."""
    d = t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 20 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 50 == 0,
                F.concat(F.lit(" call 555-010-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_PATTERNS["email"], "<EMAIL>"),
            _PII_PATTERNS["phone"],
            "<PHONE>",
        ),
        _PII_PATTERNS["ipv4"],
        "<IP>",
    )
    return injected.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_count(F.col("text"), F.lit(_PII_PATTERNS["email"])).cast("long").alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(_PII_PATTERNS["phone"])).cast("long").alias("n_phone"),
        F.regexp_count(F.col("text"), F.lit(_PII_PATTERNS["ipv4"])).cast("long").alias("n_ipv4"),
    )


# --- benchmark decontamination ----------------------------------------------

DECONTAM_NGRAM = 8  # 31-token vocab → short shingles collide by chance; 8 is discriminative

_TOKS_SQL = TOKS_SQL  # canonical tokenizer — registry.py
_NGRAMS_SQL = f"""
  SELECT doc_id, source,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - {DECONTAM_NGRAM - 1}, 0) + 1),
           i -> array_to_string(toks[i:i+{DECONTAM_NGRAM - 1}], ' ')
         )) AS grams
  FROM (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents)
"""


@query(
    "q_decontaminate",
    tags=("curation", "llm"),
    oracle=f"""
    WITH grams AS ({_NGRAMS_SQL}),
    bench AS (
      SELECT DISTINCT unnest(grams) AS gram FROM grams WHERE source = 'src0'
    ),
    train AS (
      SELECT doc_id, unnest(grams) AS gram FROM grams WHERE source <> 'src0'
    )
    SELECT DISTINCT t.doc_id AS doc_id
    FROM train t JOIN bench b ON t.gram = b.gram
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs (source != 'src0') that
    share any 8-token shingle with the held-out split (source = 'src0').
    Shape at 100 TB: the benchmark shingle set is tiny relative to the
    corpus (benchmarks are MBs, corpora are TBs) → distinct bench grams
    broadcast, and the flagged set falls out of a semi-join against the
    training side's exploded shingles — one shuffle-free map + semi-join,
    never doc×doc. Shingles are compared by value here (exactness for the
    oracle); at scale hash them to 8-byte keys first."""
    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES, fan_out

    # fan_out: the 8-gram shingling is CPU-heavy per byte and the single-
    # file scan arrives as ONE split — profiled 4.5 s + 2.2 s single-task
    # stages here (r15); at scale the scan is already thousands of splits
    # and this is a no-op.
    d = fan_out(t(spark, sf_dir, "documents"), spark, per_task_bytes=SHINGLE_TASK_BYTES)
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    with_toks = d.select("doc_id", "source", toks.alias("toks"))
    n = F.size("toks") - (DECONTAM_NGRAM - 1)
    gram = lambda i: F.array_join(F.slice(F.col("toks"), i, DECONTAM_NGRAM), " ")  # noqa: E731
    # sequence(1, n) with n <= 0 runs DESCENDING — guard short docs to an
    # empty gram set explicitly (DuckDB's range(1, n+1) is empty there).
    grams = with_toks.select(
        "doc_id",
        "source",
        F.when(
            n >= 1, F.array_distinct(F.transform(F.sequence(F.lit(1), n), gram))
        ).otherwise(F.array().cast("array<string>")).alias("grams"),
    ).where(F.size("grams") > 0)
    bench = (
        grams.where(F.col("source") == "src0")
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    train = grams.where(F.col("source") != "src0").select(
        "doc_id", F.explode("grams").alias("gram")
    )
    return (
        train.join(F.broadcast(bench), "gram", "left_semi").select("doc_id").distinct()
    )


# --- stratified sampling ------------------------------------------------------

# Per-source keep-rates (percent). Deterministic md5 draw — the same
# device as q_hash_split, so any rerun (or a different engine) keeps the
# exact same docs.
_STRATA_RATES = {"src0": 100, "src1": 50, "src2": 25}
_DEFAULT_RATE = 10

_DRAW_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 8)) AS BIGINT) % 100"


@query(
    "q_stratified_sample",
    tags=("curation", "llm"),
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_DRAW_SQL} < CASE source
        WHEN 'src0' THEN 100 WHEN 'src1' THEN 50 WHEN 'src2' THEN 25 ELSE 10 END
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Stratified downsampling with per-source rates — the mixture-
    rebalancing step of corpus assembly. The keep decision is a pure
    function of doc_id (md5 first 8 hex digits mod 100 < rate), so it is
    a map-only filter with no shuffle, stable under reruns and
    backfills — at 100 TB each executor decides its rows locally."""
    d = t(spark, sf_dir, "documents")
    draw = F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat"))), 1, 8), 16, 10).cast("long") % 100
    rate = F.when(F.col("source") == "src0", 100)
    for s, r in list(_STRATA_RATES.items())[1:]:
        rate = rate.when(F.col("source") == s, r)
    rate = rate.otherwise(_DEFAULT_RATE)
    return d.where(draw < rate).select("doc_id", "source")


# --- Gopher-style quality rules ----------------------------------------------

_STOPWORDS = ("the", "a", "and", "of", "to")  # vocab-appropriate subset


@query(
    "q_gopher_rules",
    tags=("curation", "llm"),
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_TOKS_SQL} AS toks, text FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(ROUND(list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum')
                        / greatest(len(toks), 1), 4) AS DOUBLE) AS mean_word_len,
             CAST(ROUND(CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                        / greatest(length(text), 1), 4) AS DOUBLE) AS symbol_ratio,
             len(list_filter(toks, x -> x IN ('the','a','and','of','to'))) > 0 AS has_stopword,
             CAST(ROUND(1.0 - CAST(len(list_distinct(list_transform(
                    range(1, greatest(len(toks) - 2, 0) + 1),
                    i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
                  / greatest(len(toks) - 2, 1), 4) AS DOUBLE) AS rep_3gram_frac
      FROM w
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, has_stopword, rep_3gram_frac,
           (n_words BETWEEN 10 AND 100000
            AND mean_word_len BETWEEN 2.0 AND 10.0
            AND symbol_ratio <= 0.1
            AND has_stopword
            AND rep_3gram_frac <= 0.9) AS keep
    FROM m
    """,
)
def q_gopher_rules(spark, sf_dir):
    """Gopher-style static quality filters as one codegen'd projection:
    word-count bounds, mean word length, symbol-to-char ratio, stopword
    presence, and within-doc repeated-3-gram fraction (the repetition
    signal; near-1 means the doc is one phrase looped). All arithmetic is
    JVM higher-order functions over the token array — a map-only pass at
    any scale; the boolean columns let downstream stages route docs
    instead of just dropping them."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    w = d.select("doc_id", "text", toks.alias("toks"))
    n_words = F.size("toks").cast("long")
    # 0-token docs: the oracle's list_aggregate over an empty list is
    # NULL, not 0 — mirror that so mean_word_len stays NULL there (the
    # keep conjunction is already FALSE via the n_words bound).
    mean_wl = F.when(
        F.size("toks") > 0,
        F.round(
            F.aggregate(F.transform("toks", lambda x: F.length(x).cast("double")), F.lit(0.0), lambda a, v: a + v)
            / F.greatest(F.size("toks"), F.lit(1)),
            4,
        ),
    ).cast("double")
    symbol_ratio = F.round(
        F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9 ]", "")).cast("double")
        / F.greatest(F.length("text"), F.lit(1)),
        4,
    ).cast("double")
    has_stop = F.size(F.filter("toks", lambda x: x.isin(*_STOPWORDS))) > 0
    n3 = F.size("toks") - 2
    shingle = lambda i: F.array_join(F.slice(F.col("toks"), i, 3), " ")  # noqa: E731
    # sequence(1, n3) with n3 <= 0 runs DESCENDING into slice(toks, 0, 3)
    # — a crash on any ≤2-token doc (the q_decontaminate guard, applied
    # here too; DuckDB's range(1, n3+1) is just empty there).
    shingles = F.when(
        n3 >= 1, F.transform(F.sequence(F.lit(1), n3), shingle)
    ).otherwise(F.array().cast("array<string>"))
    rep_frac = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(shingles)).cast("double")
        / F.greatest(F.size("toks") - 2, F.lit(1)),
        4,
    ).cast("double")
    m = w.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        has_stop.alias("has_stopword"),
        rep_frac.alias("rep_3gram_frac"),
    )
    keep = (
        F.col("n_words").between(10, 100000)
        & F.col("mean_word_len").between(2.0, 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & F.col("has_stopword")
        & (F.col("rep_3gram_frac") <= 0.9)
    )
    return m.withColumn("keep", keep)


# --- per-source reservoir top-k ----------------------------------------------

RESERVOIR_K = 20


@query(
    "q_reservoir_per_source",
    tags=("curation", "llm"),
    oracle=f"""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':res'), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= {RESERVOIR_K}
    """,
)
def q_reservoir_per_source(spark, sf_dir):
    """Deterministic k-per-group sample: order each source's docs by an
    md5 draw and keep the first k — reservoir sampling's output, without
    RNG state. One shuffle on the group key; at 100 TB prefer the
    two-phase form (per-partition top-k then global top-k per group,
    which is exactly what Spark's window + partial sort does under AQE).
    Inspection samples, eval slices, and per-domain caps all reduce to
    this operator. Body: :func:`reservoir_partial` over the full corpus
    — the single definition of the draw/tiebreak the incremental fold's
    merge-equals-full proof depends on."""
    return reservoir_partial(t(spark, sf_dir, "documents"))


# --- per-group null imputation -----------------------------------------------


@query(
    "q_group_impute",
    tags=("curation", "quality"),
    oracle="""
    WITH masked AS (
      SELECT event_type,
             CASE WHEN event_id % 23 = 0 THEN NULL ELSE value END AS v
      FROM events
    ), stats AS (
      SELECT event_type, AVG(v) AS fill FROM masked GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(m.v) AS BIGINT) AS n_imputed,
           CAST(ROUND(ANY_VALUE(s.fill), 4) AS DOUBLE) AS fill_value,
           CAST(ROUND(SUM(COALESCE(m.v, s.fill)), 2) AS DOUBLE) AS sum_after
    FROM masked m JOIN stats s USING (event_type)
    GROUP BY m.event_type
    """,
)
def q_group_impute(spark, sf_dir):
    """Per-group mean imputation: nulls (here deterministically masked —
    every 23rd event id — since testdata ships none) fill with their own
    group's mean over the NON-null rows, the standard feature-cleaning
    pass before numeric columns feed a model. Two narrow shuffles: the
    per-group mean (map-side combined) and the final report; the fill
    itself is a broadcast join of a |groups|-row stats table — at 100 TB
    the fact table is touched twice and never re-keyed."""
    e = t(spark, sf_dir, "events")
    masked = e.select(
        "event_type",
        F.when(F.col("event_id") % 23 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    stats = masked.groupBy("event_type").agg(F.avg("v").alias("fill"))
    return (
        masked.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.count("*") - F.count("v")).cast("long").alias("n_imputed"),
            F.round(F.first("fill"), 4).cast("double").alias("fill_value"),
            F.round(F.sum(F.coalesce("v", "fill")), 2).cast("double").alias("sum_after"),
        )
    )


# --- per-source WEIGHTED sample (Efraimidis-Spirakis A-ES) -------------------

WEIGHTED_K = 15

_WEIGHTED_ORACLE = f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(n_chars AS BIGINT) AS weight,
             ROUND(
               -ln(GREATEST(
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wres'), 1, 8))
                   AS BIGINT) / 4294967296.0,
                 1e-12)) / n_chars,
               6) AS key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, weight, CAST(key AS DOUBLE) AS key
    FROM (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rk
      FROM scored
    )
    WHERE rk <= {WEIGHTED_K}
"""


@query("q_weighted_sample", tags=("curation", "llm"), oracle=_WEIGHTED_ORACLE)
def q_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement, k per source, via
    Efraimidis-Spirakis exponential keys: each doc draws a deterministic
    md5 uniform u and is ranked by -ln(u)/w ascending (equivalent to
    u^(1/w) descending), so P[selected] follows the char-count weight —
    the size-proportional inspection/eval sample a mixture builder wants
    (long documents carry more of the token budget and deserve
    proportional scrutiny). Keys are rounded to 6 dp BEFORE ranking with
    a doc_id tiebreak (the established cross-engine float device). One
    shuffle on the group key; the same two-phase top-k shape as the
    uniform reservoir at 100 TB."""
    from pyspark.sql.window import Window

    from incremental_dagster_delta_spark.functions import md5_uniform

    d = t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = md5_uniform(F.col("doc_id"), F.lit("wres"))
    key = F.round(-F.log(F.greatest(u, F.lit(1e-12))) / F.col("n_chars"), 6)
    w = Window.partitionBy("source").orderBy("key", "doc_id")
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("key"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= WEIGHTED_K)
        .select("doc_id", "source", "weight", F.col("key").cast("double").alias("key"))
    )


# --- incremental reservoir maintenance (bounded-selection seam) ----------------
#
# The fourth seam family's storage story, completed: PLANS.md algebra #3
# (bounded selection) states that merged local top-ks equal the global
# top-k because the E-S/md5 draw keys are deterministic — this qid runs
# that fold over deterministic ingest batches and hash-checks it against
# the one-shot reservoir oracle. The fold DEDUPS before re-selecting, so
# re-inserting an already-folded batch is a no-op: at-least-once
# tolerant (the q_hll_incremental replay class), stronger than the
# additive sketches' exactly-once requirement.

RES_BATCHES = 3  # deterministic corpus split: doc_id % 3


def reservoir_partial(docs_batch):
    """Per-source top-RESERVOIR_K of ONE ingest batch under the md5
    draw — ≤ K·|sources| rows regardless of batch size (the rank
    filter rewrites to WindowGroupLimit: per-partition K-row heaps
    before the shuffle). Because the draw is a pure function of doc_id,
    every element of the CORPUS top-k is necessarily in its own batch's
    local top-k — the merge loses nothing."""
    from pyspark.sql.window import Window

    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":res")))
    w = Window.partitionBy("source").orderBy(draw, F.col("doc_id"))
    return (
        docs_batch.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "source")
    )


@query(
    "q_reservoir_incremental",
    tags=("curation", "incremental", "llm"),
    oracle=f"""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':res'), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= {RESERVOIR_K}
    """,
)
def q_reservoir_incremental(spark, sf_dir):
    """Reservoir sample under incremental maintenance: the corpus
    arrives as RES_BATCHES deterministic batches, each contributing its
    ≤K·|sources|-row local reservoir; the serve-side fold dedups and
    re-selects top-K per source. The oracle recomputes the one-shot
    reservoir over the FULL corpus, so the driver hash-match IS the
    merge-equals-full proof for the bounded-selection algebra. Per-batch
    cost: one bounded window over the batch; the fold's input is
    B·K·|sources| rows — never corpus-sized. The storage seam
    (append_batch publication + replay no-op) is pinned in
    tests/test_reservoir_seam.py."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    parts = None
    for b in range(RES_BATCHES):
        p = reservoir_partial(d.where(F.col("doc_id") % RES_BATCHES == b))
        parts = p if parts is None else parts.unionByName(p)
    # the fold's re-selection is the SAME bounded selection, applied to
    # the deduped union of local reservoirs (idempotent under batch
    # re-insertion)
    return reservoir_partial(parts.distinct())


# --- Pareto-frontier (skyline) selection ----------------------------------------
#
# Multi-objective curation: when two quality axes trade off (here:
# document length vs lexical richness), the defensible keep-set is the
# PARETO FRONTIER — documents no other document beats on both axes
# (Börzsönyi et al., "The Skyline Operator", ICDE 2001). Both axes are
# INTEGERS (n_chars, distinct-token count), so dominance has no float
# boundary and both engines agree exactly.


@query(
    "q_pareto_frontier",
    tags=("curation", "analytics", "llm"),
    oracle=f"""
    WITH m AS (
      SELECT doc_id, n_chars,
             CAST(len(list_distinct({_TOKS_SQL})) AS BIGINT) AS uniq_tokens
      FROM documents
    ), best AS (
      SELECT n_chars, MAX(uniq_tokens) AS best_uniq FROM m GROUP BY n_chars
    ), fr AS (
      SELECT n_chars, best_uniq FROM (
        SELECT n_chars, best_uniq,
               MAX(best_uniq) OVER (
                 ORDER BY n_chars DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max
        FROM best
      ) WHERE prev_max IS NULL OR best_uniq > prev_max
    )
    SELECT m.doc_id, m.n_chars, m.uniq_tokens
    FROM m JOIN fr ON m.n_chars = fr.n_chars AND m.uniq_tokens = fr.best_uniq
    """,
)
def q_pareto_frontier(spark, sf_dir):
    """2-D skyline over (n_chars, distinct tokens): a document survives
    iff no other document is ≥ on both axes and > on one. The classic
    sweep: collapse to one best-richness row per distinct length (one
    map-combinable agg), then a single running-max pass down the
    length-sorted pair table keeps exactly the strictly-improving
    staircase; frontier documents re-join on their surviving (length,
    richness) pair, so ties on BOTH axes all survive (equal-equal is
    not dominance).

    Scale shape: raw docs are touched twice, both map-only/one-agg; the
    running-max window runs over ONE ROW PER DISTINCT LENGTH — bounded
    by the value domain (max doc length), not the corpus. If the domain
    itself were huge, the same staircase routes through
    analytics._global_order (range-partitioned rank + broadcast
    offsets); at document-length domains (≤10⁶) the single-task pass on
    a metadata-sized table is the cheaper plan."""
    d = t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    m = d.select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(toks)).cast("long").alias("uniq_tokens"),
    )
    best = m.groupBy("n_chars").agg(F.max("uniq_tokens").alias("best_uniq"))
    w = Window.orderBy(F.col("n_chars").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    fr = (
        best.withColumn("prev_max", F.max("best_uniq").over(w))
        .where(F.col("prev_max").isNull() | (F.col("best_uniq") > F.col("prev_max")))
        .select(F.col("n_chars").alias("fr_n"), F.col("best_uniq").alias("fr_uniq"))
    )
    return m.join(
        F.broadcast(fr),
        (F.col("n_chars") == F.col("fr_n")) & (F.col("uniq_tokens") == F.col("fr_uniq")),
    ).select("doc_id", "n_chars", "uniq_tokens")


# --- two-sample Kolmogorov–Smirnov drift ------------------------------------------
#
# Distribution drift per source: the KS statistic
# D = max_x |ECDF_source(x) − ECDF_rest(x)| of each source's document-
# length distribution against the rest of the corpus — the
# nonparametric companion to q_kl_drift's binned KL (KS needs no
# binning and catches location/scale shifts KL's coarse bins smear).
# The maximization is EXACT and float-free: the numerator
# |cum_src·n_rest − cum_rest·n_src| is an integer, so the argmax is an
# integer comparison and the division happens once, at output.


@query(
    "q_ks_drift",
    tags=("curation", "analytics", "llm"),
    oracle="""
    WITH c AS (
      SELECT source, n_chars AS v, COUNT(*) AS cnt FROM documents GROUP BY 1, 2
    ), tot AS (
      SELECT v, SUM(cnt) AS tcnt FROM c GROUP BY v
    ), srcs AS (
      SELECT source, SUM(cnt) AS n_src FROM c GROUP BY source
    ), n AS (SELECT SUM(cnt) AS n_all FROM c),
    grid AS (
      SELECT s.source, s.n_src, t.v, t.tcnt, COALESCE(c.cnt, 0) AS cnt
      FROM srcs s CROSS JOIN tot t
      LEFT JOIN c ON c.source = s.source AND c.v = t.v
    ), cums AS (
      SELECT source, n_src, v,
             SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum_src,
             SUM(tcnt) OVER (PARTITION BY source ORDER BY v) AS cum_all
      FROM grid
    ), scored AS (
      SELECT source, n_src, v,
             ABS(cum_src * (n.n_all - n_src) - (cum_all - cum_src) * n_src) AS num
      FROM cums, n
    )
    SELECT source,
           CAST(n_src AS BIGINT) AS n_src,
           CAST(v AS BIGINT) AS at_value,
           CAST(ROUND(num / (1.0 * n_src * ((SELECT n_all FROM n) - n_src)), 4) AS DOUBLE) AS ks_stat
    FROM (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY num DESC, v) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def q_ks_drift(spark, sf_dir):
    """Per-source two-sample KS test of the n_chars distribution vs the
    corpus complement, reporting the statistic and the length at which
    the ECDFs diverge most (ties break to the smallest length). Scale
    shape: the corpus collapses to (source, length) counts in ONE
    map-combinable aggregation; every later step — the sources×lengths
    grid, the per-source cumulative windows, the integer argmax — runs
    on |sources|·|distinct lengths| rows, bounded by the VALUE DOMAIN
    (max document length), never by corpus size. The ECDF difference is
    ranked by its exact integer numerator (cum_src·n_rest −
    cum_rest·n_src), so both engines pick the identical argmax with no
    float boundary; the one division is at output, rounded 4."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    c = d.groupBy("source", F.col("n_chars").alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
    c = c.localCheckpoint(eager=True)  # grid + totals reuse one aggregation
    tot = c.groupBy("v").agg(F.sum("cnt").alias("tcnt"))
    srcs = c.groupBy("source").agg(F.sum("cnt").alias("n_src"))
    n_all = c.agg(F.sum("cnt").alias("n_all"))
    grid = (
        srcs.crossJoin(F.broadcast(tot))
        .join(
            c.select(F.col("source").alias("c_src"), F.col("v").alias("c_v"), "cnt"),
            (F.col("c_src") == F.col("source")) & (F.col("c_v") == F.col("v")),
            "left",
        )
        .select("source", "n_src", "v", "tcnt", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy("v")
    cums = grid.select(
        "source",
        "n_src",
        "v",
        F.sum("cnt").over(w).alias("cum_src"),
        F.sum("tcnt").over(w).alias("cum_all"),
    )
    scored = cums.crossJoin(F.broadcast(n_all)).select(
        "source",
        "n_src",
        "v",
        "n_all",
        F.abs(
            F.col("cum_src") * (F.col("n_all") - F.col("n_src"))
            - (F.col("cum_all") - F.col("cum_src")) * F.col("n_src")
        ).alias("num"),
    )
    pick = Window.partitionBy("source").orderBy(F.col("num").desc(), F.col("v"))
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select(
            "source",
            F.col("n_src").cast("long").alias("n_src"),
            F.col("v").cast("long").alias("at_value"),
            F.round(
                F.col("num") / (1.0 * F.col("n_src") * (F.col("n_all") - F.col("n_src"))), 4
            ).cast("double").alias("ks_stat"),
        )
    )


# --- chi-square mix drift -----------------------------------------------------------
#
# Completes the drift triad: q_kl_drift (binned KL on values), q_ks_drift
# (distribution-free KS on a numeric column), and now Pearson's χ² on a
# CATEGORICAL mix — "did today's event-type composition move off the
# corpus baseline?", the daily guardrail on ingest composition.


@query(
    "q_chi2_drift",
    tags=("curation", "analytics"),
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), days AS (
      SELECT day, SUM(cnt) AS day_n FROM c GROUP BY day
    ), types AS (
      SELECT event_type, SUM(cnt) AS type_n FROM c GROUP BY event_type
    ), n AS (SELECT SUM(cnt) AS n_all FROM c),
    grid AS (
      SELECT d.day, d.day_n, ty.event_type,
             COALESCE(c.cnt, 0) AS obs,
             d.day_n * ty.type_n / (1.0 * n.n_all) AS exp
      FROM days d CROSS JOIN types ty CROSS JOIN n
      LEFT JOIN c ON c.day = d.day AND c.event_type = ty.event_type
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(MAX(day_n) AS BIGINT) AS n_events,
           CAST(COUNT(*) - 1 AS BIGINT) AS dof,
           CAST(ROUND(SUM((obs - exp) * (obs - exp) / exp), 4) AS DOUBLE) AS chi2
    FROM grid GROUP BY day
    """,
)
def q_chi2_drift(spark, sf_dir):
    """Per-day Pearson χ² of the event-type mix against the whole-corpus
    composition (expected = day_total · type_share), zero-observation
    cells included via the days×types grid. Scale shape: ONE
    map-combinable aggregation collapses the corpus to (day, type)
    counts; the day and type margins, the grid (|days|·|types| rows —
    calendar × enum, metadata-sized), and the χ² fold never touch raw
    events again. Integer counts make the expected-value arithmetic
    identical on both engines; the per-day χ² sum is over |types|
    doubles, rounded 4."""
    e = t(spark, sf_dir, "events")
    c = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    c = c.localCheckpoint(eager=True)  # three margins reuse one aggregation
    days = c.groupBy("day").agg(F.sum("cnt").alias("day_n"))
    types = c.groupBy("event_type").agg(F.sum("cnt").alias("type_n"))
    n = c.agg(F.sum("cnt").alias("n_all"))
    grid = (
        days.crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(n))
        .join(
            c.select(F.col("day").alias("c_day"), F.col("event_type").alias("c_ty"), "cnt"),
            (F.col("c_day") == F.col("day")) & (F.col("c_ty") == F.col("event_type")),
            "left",
        )
        .select(
            "day",
            "day_n",
            F.coalesce("cnt", F.lit(0)).alias("obs"),
            (F.col("day_n") * F.col("type_n") / (1.0 * F.col("n_all"))).alias("exp"),
        )
    )
    return grid.groupBy("day").agg(
        F.max("day_n").cast("long").alias("n_events"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.round(
            F.sum((F.col("obs") - F.col("exp")) * (F.col("obs") - F.col("exp")) / F.col("exp")), 4
        ).cast("double").alias("chi2"),
    ).select(F.col("day").cast("string"), "n_events", "dof", "chi2")


# --------------------------------------------------------------------------
# k-anonymity audit (r15) — the privacy gate a training-data release
# pipeline runs next to PII redaction (q_pii_redact): group the table by
# its quasi-identifier columns and flag every equivalence class smaller
# than k (a record in such a class is re-identifiable by the
# quasi-identifiers alone; suppressing those rows is the classic
# k-anonymity enforcement). Reports per class: size, at_risk, and the
# class's share of the table in round-half-up basis points (exact
# integer arithmetic — the bitext division pattern).
#
# Scale shape: one map-side-combined groupBy on the quasi-identifier
# tuple plus a 1-row broadcast total — the class table is bounded by the
# quasi-identifier domain, not the corpus, so the audit costs one
# aggregation pass at any scale.

K_ANON_K = 5
K_ANON_QI = ("c_nationkey", "c_mktsegment")  # quasi-identifiers


@query(
    "q_k_anonymity",
    tags=("curation", "privacy", "llm"),
    oracle=f"""
    WITH cls AS (
      SELECT {", ".join(K_ANON_QI)}, COUNT(*) AS class_size
      FROM customer GROUP BY {", ".join(K_ANON_QI)}
    ), tot AS (SELECT CAST(SUM(class_size) AS BIGINT) AS n FROM cls)
    SELECT {", ".join(K_ANON_QI)},
           CAST(class_size AS BIGINT) AS class_size,
           class_size < {K_ANON_K} AS at_risk,
           (2 * class_size * 10000 + n) // (2 * n) AS share_bp
    FROM cls CROSS JOIN tot
    """,
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the customer quasi-identifiers — see the
    family note above. ``share_bp`` is the class's table share in
    round-half-up basis points (integer division, engine-identical)."""
    c = t(spark, sf_dir, "customer")
    cls = c.groupBy(*K_ANON_QI).agg(F.count("*").alias("class_size"))
    tot = F.broadcast(cls.agg(F.sum("class_size").cast("long").alias("n")))
    return cls.crossJoin(tot).select(
        *K_ANON_QI,
        F.col("class_size").cast("long").alias("class_size"),
        (F.col("class_size") < K_ANON_K).alias("at_risk"),
        F.expr("(2 * class_size * 10000 + n) DIV (2 * n)").alias("share_bp"),
    )


# --------------------------------------------------------------------------
# Differentially-private noisy counts (r15) — the release twin of
# q_k_anonymity: instead of suppressing small classes, publish every
# per-(nation, segment) count under ε-DP Laplace noise (sensitivity 1,
# b = 1/ε). The noise is DETERMINISTIC here: the Laplace draw comes
# from the md5-uniform device (functions.md5_uniform — the engine's
# standard hash-deterministic sampler) through the inverse CDF
#   noise = -b · sign(u - 0.5) · ln(1 - 2·|u - 0.5|)
# so both engines add bit-identical noise and the driver hash check
# pins the whole mechanism. (A production release would swap the seed
# for a secret drawn once per release; the operator shape — groupBy +
# map-only noise + rounding — is unchanged.)
#
# Determinism: u is the exact 32-bit md5 fraction; ln is the
# established hash-stable surface (unigram_lm/selection oracles);
# the final value rounds to 4 dp. u = 0.5 exactly would make the ln
# argument 1 (noise 0) — no singularity; u can never be so close to 0
# or 1 that the ln argument is 0 (min |1-2|u-.5|| = 2^-31 > 0).
#
# Scale shape: one map-side-combined groupBy over the class tuple +
# one noise projection. The class table is domain-bounded; nothing
# corpus-sized moves.

DP_EPSILON = 1.0  # per-release budget; b = 1/ε


@query(
    "q_dp_noisy_counts",
    tags=("curation", "privacy", "llm"),
    oracle=f"""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ), drawn AS (
      SELECT *,
             CAST(('0x' || substr(md5(
               CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment || ':dp'
             ), 1, 8)) AS BIGINT) / 4294967296.0 AS u
      FROM cls
    )
    SELECT c_nationkey, c_mktsegment, true_count,
           CAST(ROUND(true_count
             - (1.0 / {DP_EPSILON}) * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
               * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS DOUBLE) AS noisy_count
    FROM drawn
    """,
)
def q_dp_noisy_counts(spark, sf_dir):
    """ε-DP Laplace noisy release of the per-(nation, segment) customer
    counts — see the family note above. The deterministic md5 draw
    makes the full mechanism (grouping, inverse-CDF noise, rounding)
    hash-checkable across engines."""
    from incremental_dagster_delta_spark.functions import md5_uniform

    c = t(spark, sf_dir, "customer")
    cls = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("true_count")
    )
    u = md5_uniform(F.col("c_nationkey"), F.col("c_mktsegment"), F.lit("dp"))
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = -(1.0 / DP_EPSILON) * sign * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    return cls.select(
        "c_nationkey",
        "c_mktsegment",
        "true_count",
        F.round(F.col("true_count") + noise, 4).cast("double").alias("noisy_count"),
    )
