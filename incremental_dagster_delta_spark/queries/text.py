"""Text-analysis operators for LLM training-data pipelines (SURVEY.md §2.5).

All operate on the ``documents`` table (doc_id, text, lang, source,
n_chars). Everything is built from JVM-side ``pyspark.sql.functions`` —
token pipelines stay inside whole-stage codegen; no Python UDFs.

Scale notes: every query here is a single scan + narrow per-row transforms
followed by one hash aggregation (or none) — embarrassingly parallel, no
skew risk (token frequencies skew, but partial aggregation absorbs hot
keys map-side before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

# Stopword marker set used by the quality / language heuristics. Kept tiny
# and explicit so the SQL oracle can inline the same list.
STOPWORDS = ("the", "a", "and", "of", "to")
_SW_SQL = "('the', 'a', 'and', 'of', 'to')"

# BPE-ish subword unit: a maximal consonant*-vowel+-consonant* run — a
# deterministic stand-in for a learned merge table that both engines'
# regex dialects (Java util.regex vs RE2) interpret identically.
_SUBWORD_RE = "[bcdfghjklmnpqrstvwxyz]*[aeiou]+[bcdfghjklmnpqrstvwxyz]*"


def _tokens(col):
    """Lower-cased whitespace tokens with empties dropped."""
    return F.filter(F.split(F.lower(col), " "), lambda x: x != F.lit(""))


# --- q_token_counts: corpus token frequencies -------------------------------


@query(
    "q_token_counts",
    tags=("text", "llm"),
    bench=True,
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    )
    WHERE tok <> ''
    GROUP BY tok
    """,
)
def q_token_counts(spark, sf_dir):
    """Corpus-wide token frequency: tokenize → explode → count. Partial
    (map-side) aggregation absorbs the Zipfian head before the shuffle."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )


# --- q_text_quality: per-document quality scoring ---------------------------


@query(
    "q_text_quality",
    tags=("text", "llm"),
    oracle=f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks), 4) AS DOUBLE) AS avg_tok_len,
           CAST(ROUND(CAST(len(list_filter(toks, x -> x IN {_SW_SQL})) AS DOUBLE) / len(toks), 4) AS DOUBLE)
             AS stopword_ratio,
           CAST(len(toks) >= 20 AND len(list_distinct(toks)) >= 10 AS BOOLEAN) AS quality_ok
    FROM (
      SELECT doc_id, text, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    )
    """,
)
def q_text_quality(spark, sf_dir):
    """Length / lexical-diversity / stopword-ratio quality gates — the
    day-one heuristics of a training-data filter (C4/Gopher-style rules),
    all as codegen'd array expressions."""
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    # n_tokens == 0 (empty / whitespace-only doc): the ratios are NULL —
    # DuckDB's x/0 convention, and ANSI Spark would otherwise ABORT the
    # whole query with DIVIDE_BY_ZERO on one bad row (r15 review; the
    # shipped fixtures never produce such a doc, tests/test_short_docs.py
    # does)
    nz = F.when(n_tokens > 0, n_tokens)
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / nz, 4)
        .cast("double")
        .alias("avg_tok_len"),
        F.round(F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast("double") / nz, 4)
        .cast("double")
        .alias("stopword_ratio"),
        ((n_tokens >= 20) & (F.size(F.array_distinct(toks)) >= 10)).alias("quality_ok"),
    )


# --- q_lang_id: marker-token language heuristic -----------------------------

# Deterministic n-gram-style heuristic: score each language by its marker
# tokens' share of the document; highest share wins, 'und' when no marker
# hits. Marker sets are fixed so the SQL oracle matches exactly.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}


@query(
    "q_lang_id",
    tags=("text", "llm"),
    oracle="""
    SELECT doc_id,
           CASE
             WHEN en_n = 0 AND es_n = 0 AND fr_n = 0 AND de_n = 0 THEN 'und'
             WHEN en_n >= es_n AND en_n >= fr_n AND en_n >= de_n THEN 'en'
             WHEN es_n >= fr_n AND es_n >= de_n THEN 'es'
             WHEN fr_n >= de_n THEN 'fr'
             ELSE 'de'
           END AS lang_guess
    FROM (
      SELECT doc_id,
             len(list_filter(toks, x -> x IN ('the','a','and'))) AS en_n,
             len(list_filter(toks, x -> x IN ('el','la','de'))) AS es_n,
             len(list_filter(toks, x -> x IN ('le','la','et'))) AS fr_n,
             len(list_filter(toks, x -> x IN ('der','die','und'))) AS de_n
      FROM (
        SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        FROM documents
      )
    )
    """,
)
def q_lang_id(spark, sf_dir):
    """Marker-token language ID with a deterministic tie-break order
    (en > es > fr > de), 'und' when nothing matches. A real deployment
    swaps the marker sets for character-n-gram profiles; the operator
    shape (per-row array scoring, no shuffle) is identical."""
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def marker_score(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(s) for s in markers])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = {lang: marker_score(markers) for lang, markers in _LANG_MARKERS.items()}
    en, es, fr, de = scores["en"], scores["es"], scores["fr"], scores["de"]
    guess = (
        F.when((en == 0) & (es == 0) & (fr == 0) & (de == 0), F.lit("und"))
        .when((en >= es) & (en >= fr) & (en >= de), F.lit("en"))
        .when((es >= fr) & (es >= de), F.lit("es"))
        .when(fr >= de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return d.select("doc_id", guess.alias("lang_guess"))


# --- q_doc_fingerprint: shingle-hash document fingerprint -------------------


@query(
    "q_doc_fingerprint",
    tags=("text", "llm"),
    oracle="""
    SELECT doc_id,
           CASE WHEN len(toks) > 0
                THEN md5(array_to_string(toks, ' ')) END AS content_md5,
           CASE WHEN len(toks) > 0 THEN
             list_aggregate(
               list_transform(
                 range(1, greatest(len(toks) - 3, 1) + 1),
                 i -> md5(array_to_string(toks[i:i+3], ' '))
               ), 'min') END AS min_shingle_hash
    FROM (
      SELECT doc_id, text, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    )
    """,
)
def q_doc_fingerprint(spark, sf_dir):
    """Two fingerprints per document: an exact content hash (md5 of the
    normalized token stream) and a MinHash-1 rolling fingerprint (minimum
    md5 over 4-token shingles) — the building block the near-dup operators
    in dedup.py band into buckets. A zero-token document fingerprints as
    NULL on BOTH engines (explicit branch — unguarded, DuckDB's
    array_to_string([]) is NULL while Spark's array_join is '', a silent
    hash divergence; r15 review, pinned by tests/test_short_docs.py)."""
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    with_toks = d.select("doc_id", toks.alias("toks"))
    shingle = lambda i: F.md5(  # noqa: E731
        F.array_join(F.slice(F.col("toks"), i, 4), " ").cast("binary")
    )
    n_shingles = F.greatest(F.size("toks") - 3, F.lit(1))
    nonempty = F.size("toks") > 0
    return with_toks.select(
        "doc_id",
        F.when(nonempty, F.md5(F.array_join("toks", " ").cast("binary"))).alias("content_md5"),
        F.when(
            nonempty,
            F.array_min(F.transform(F.sequence(F.lit(1), n_shingles), shingle)),
        ).alias("min_shingle_hash"),
    )


# --- q_winnow_fingerprint: rolling-hash winnowing fingerprint ---------------

_RK_MOD = 1_000_000_007
_GRAM_K = 8  # char-gram width
_WIN_W = 4  # winnowing window (Schleimer et al.: min hash per window)


@query(
    "q_winnow_fingerprint",
    tags=("text", "llm"),
    bench=True,
    oracle=f"""
    SELECT doc_id,
           CASE WHEN length(norm) > 0 THEN CAST(len(ghashes) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS n_grams,
           CASE WHEN length(norm) > 0 THEN
             md5(array_to_string(
               list_transform(
                 list_sort(list_distinct(
                   list_transform(range(1, greatest(len(ghashes) - {_WIN_W - 1}, 1) + 1),
                                  j -> list_aggregate(ghashes[j:j+{_WIN_W - 1}], 'min'))
                 )),
                 h -> CAST(h AS VARCHAR)), ',')) END AS fingerprint
    FROM (
      SELECT doc_id, norm,
             list_transform(
               list_transform(range(1, greatest(length(norm) - {_GRAM_K - 1}, 1) + 1),
                              i -> substring(norm, CAST(i AS INT), {_GRAM_K})),
               g -> list_reduce(list_transform(string_split(g, ''), c -> CAST(ascii(c) AS BIGINT)),
                                (a, b) -> (a * 257 + b) % {_RK_MOD})
             ) AS ghashes
      FROM (
        -- COALESCE: array_to_string([]) is NULL in DuckDB but '' in
        -- Spark's array_join; the zero-gram branch must fire identically
        SELECT doc_id,
               COALESCE(array_to_string(list_filter(string_split(lower(text), ' '), x -> x <> ''), ' '), '') AS norm
        FROM documents
      )
    )
    """,
)
def q_winnow_fingerprint(spark, sf_dir):
    """Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken):
    Rabin-Karp rolling hashes over 8-char grams, minimum per 4-gram
    window, fingerprint = md5 of the distinct sorted mins. The standard
    near-dup/plagiarism fingerprint — pure codegen'd array expressions,
    identical arithmetic on both engines (verified: same polynomial mod
    fold, same gram lists)."""
    from incremental_dagster_delta_spark.tables import SHINGLE_TASK_BYTES, fan_out

    d = fan_out(t(spark, sf_dir, "documents"), spark, per_task_bytes=SHINGLE_TASK_BYTES)
    norm = d.select(
        "doc_id", F.array_join(_tokens(F.col("text")), " ").alias("norm")
    )
    ghashes = norm.select(
        "doc_id",
        F.length("norm").alias("n_chars"),
        F.expr(
            f"""transform(
              transform(sequence(1, greatest(length(norm) - {_GRAM_K - 1}, 1)),
                        i -> substring(norm, i, {_GRAM_K})),
              g -> aggregate(transform(split(g, ''), c -> cast(ascii(c) as bigint)),
                             0L, (a, x) -> (a * 257 + x) % {_RK_MOD})
            )"""
        ).alias("ghashes"),
    )
    # zero-char norm (empty doc): 0 grams / NULL fingerprint, explicit on
    # both engines (r15 review — the greatest(…, 1) floor otherwise
    # fabricates one gram from the empty string, and DuckDB's NULL norm
    # diverged from Spark's '')
    nonempty = F.col("n_chars") > 0
    return ghashes.select(
        "doc_id",
        F.when(nonempty, F.size("ghashes")).otherwise(F.lit(0)).cast("long").alias("n_grams"),
        F.when(
            nonempty,
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.array_distinct(
                                F.expr(
                                    f"""transform(sequence(1, greatest(size(ghashes) - {_WIN_W - 1}, 1)),
                                              j -> array_min(slice(ghashes, j, {_WIN_W})))"""
                                )
                            )
                        ),
                        lambda h: h.cast("string"),
                    ),
                    ",",
                ).cast("binary")
            ),
        ).alias("fingerprint"),
    )


# --- q_subword_counts: BPE-ish subword segmentation counting ----------------


@query(
    "q_subword_counts",
    tags=("text", "llm"),
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(lower(text), '{_SUBWORD_RE}')) AS BIGINT) AS n_subwords
    FROM documents
    """,
)
def q_subword_counts(spark, sf_dir):
    """Whitespace token count + BPE-ish subword count (syllable-shaped
    regex units) — the cheap proxy for 'how many model tokens is this
    document' used when budgeting a training mix."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_SUBWORD_RE), F.lit(0))).cast("long").alias(
            "n_subwords"
        ),
    )


@query(
    "q_char_entropy",
    tags=("text", "curation", "llm"),
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
      FROM documents WHERE length(text) > 0
    ),
    freq AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY doc_id)
    SELECT f.doc_id,
           CAST(ROUND(-sum((f.c / (1.0 * t.n)) * ln(f.c / (1.0 * t.n))), 4) AS DOUBLE)
             AS char_entropy,
           CAST(count(*) AS BIGINT) AS n_distinct_chars
    FROM freq f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id
    """,
)
def q_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the cheap gibberish
    detector (binary junk and aaaa-spam score far below natural text's
    ~2.8-3.2 nats; encrypted/compressed payloads score near the alphabet
    ceiling). One char explode + two keyed aggregations, both map-side
    combinable; no token model needed, which is what makes it the FIRST
    gate in a curation cascade at 100 TB."""
    d = t(spark, sf_dir, "documents").where(F.length("text") > 0)
    chars = d.select("doc_id", F.explode(F.split(F.lower("text"), "")).alias("ch")).where(
        F.col("ch") != ""
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / (1.0 * F.col("n"))
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).cast("double").alias("char_entropy"),
            F.count("*").cast("long").alias("n_distinct_chars"),
        )
    )


# --- distinguishing terms per source (grouped TF-IDF ranking) -----------------

TOPIC_TOP_N = 5


@query(
    "q_topic_terms",
    tags=("text", "llm"),
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
      FROM documents
    ), tf AS (
      SELECT source, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), sdf AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), ns AS (
      SELECT COUNT(DISTINCT source) AS n_sources FROM tf
    ), scored AS (
      SELECT tf.source, tf.tok,
             ROUND(tf.tf * ln((ns.n_sources + 1.0) / (sdf.df + 0.5)), 6) AS score
      FROM tf JOIN sdf USING (tok) CROSS JOIN ns
    )
    SELECT source, tok, CAST(score AS DOUBLE) AS score, CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, tok) AS rk
      FROM scored
    ) WHERE rk <= {TOPIC_TOP_N}
    """,
)
def q_topic_terms(spark, sf_dir):
    """Distinguishing terms per source: grouped TF-IDF where the
    "document" is the whole source's concatenation — term frequency
    within the source × inverse SOURCE frequency, top-{TOPIC_TOP_N} per
    source. The corpus-exploration readout behind mixture debugging
    ("what is source X actually full of?"). Token explode feeds one
    (source, tok) aggregation; the per-term source-df table has one row
    per distinct corpus token (Heaps-law-sized at 100 TB) so its join is
    UNHINTED — AQE broadcasts only when runtime stats justify it; only
    the 1-row source count is hint-broadcast. Ranking is a window over
    the per-source term lists. Scores round at 6 BEFORE the rank (the ADVICE
    ntile-boundary rule) with a token tiebreak, so ordering is
    engine-identical."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    tf = (
        d.select("source", F.explode(toks).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("tf"))
    )
    sdf = tf.groupBy("tok").agg(F.count("*").alias("df"))
    ns = tf.agg(F.countDistinct("source").alias("n_sources"))
    scored = (
        tf.join(sdf, "tok")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "tok",
            F.round(
                F.col("tf") * F.log((F.col("n_sources") + 1.0) / (F.col("df") + 0.5)), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPIC_TOP_N)
        .select("source", "tok", F.col("score").cast("double"), F.col("rank").cast("long"))
    )


# --- Zipf's-law fit -------------------------------------------------------------
#
# Corpus-health diagnostic: natural-language token frequencies follow a
# power law freq ∝ rank^(-s) with s ≈ 1 (Zipf 1949); a corpus whose
# fitted exponent sits far from 1 is template spam (flat head, s « 1) or
# looped boilerplate (cliff, s » 1). The fit is ordinary least squares
# on (ln rank, ln freq) — regr_slope/intercept/r2 are one-pass
# map-combinable aggregates on both engines.


@query(
    "q_zipf_fit",
    tags=("text", "analytics", "llm"),
    oracle="""
    WITH freq AS (
      SELECT tok, COUNT(*) AS f
      FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY tok
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rk FROM freq
    )
    SELECT COUNT(*) AS n_types,
           CAST(SUM(f) AS BIGINT) AS n_tokens,
           CAST(ROUND(regr_slope(ln(f), ln(rk)), 4) AS DOUBLE) AS zipf_slope,
           CAST(ROUND(regr_intercept(ln(f), ln(rk)), 4) AS DOUBLE) AS zipf_intercept,
           CAST(ROUND(regr_r2(ln(f), ln(rk)), 4) AS DOUBLE) AS r2
    FROM ranked
    """,
)
def q_zipf_fit(spark, sf_dir):
    """Zipf exponent of the corpus unigram distribution: rank the
    vocabulary by frequency (tok tiebreak — engine-identical), regress
    ln freq on ln rank, report slope/intercept/R². One token explode
    feeds one map-combinable frequency aggregation (hot tokens absorbed
    map-side); the ranking window runs over ONE ROW PER VOCABULARY TYPE
    — the unigram-LM vocab-window bound (|V| grows ~heapishly, millions
    at web scale, never corpus-sized), same as unigram_lm.py:344 — and
    the regression is a single-pass co-moment aggregate. Double ln()
    and co-moments on both engines, rounded to 4 (the
    q_regression_by_group precedent)."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("tok"))
    ranked = freq.withColumn("rk", F.row_number().over(w))
    y = F.log(F.col("f").cast("double"))
    x = F.log(F.col("rk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.round(F.regr_slope(y, x), 4).cast("double").alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 4).cast("double").alias("zipf_intercept"),
        F.round(F.regr_r2(y, x), 4).cast("double").alias("r2"),
    )
