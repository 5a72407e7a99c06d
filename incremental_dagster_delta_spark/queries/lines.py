"""Line-level corpus cleaning (C4 / RefinedWeb-style boilerplate removal).

Web-scale curation operates *within* documents too: C4 dropped lines
duplicated across the corpus, RefinedWeb strips repeated boilerplate
(nav bars, cookie banners) that exact- and near-dedup at the document
level cannot see. The synthetic corpus has no newlines, so a "line" here
is a fixed 8-token segment (``LINE_TOKENS``) — the operators are agnostic
to how the line splitter is defined.

Three operators, all DuckDB-oracle-checked:

- **q_dedup_lines** — within-document duplicate-line removal (keep first
  occurrence, preserve order). Map-only: ``array_distinct`` keeps
  first-occurrence order, so no shuffle at any scale.
- **q_boilerplate_lines** — corpus-level duplicate-line removal: lines
  seen in ≥2 distinct documents are dropped from every document (C4's
  "three-sentence" rule at our corpus's duplication density). Two
  aggregations + one anti-join, all on the line hash — never doc×doc.
- **q_repeated_ngrams** — the reporting twin: which word bigrams repeat
  across ≥25 documents, with corpus totals; the profiling pass you run
  before choosing boilerplate thresholds.
- **q_bloom_paragraph_dedup** — Dolma-style paragraph dedup: an arriving
  batch's paragraphs are dropped when a corpus-built Bloom sidecar says
  "possibly seen" (Soldaini et al. 2024 run exactly this — a Bloom
  filter at paragraph grain, accepting false-positive drops). The
  sidecar is the mergeable `sketches.bloom_bits` table, so it is
  incrementally maintainable with exactly-once ``append_batch``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t, TOKS_SQL

LINE_TOKENS = 8  # tokens per pseudo-line
BOILER_MIN_DOCS = 2  # line appearing in >= N distinct docs is boilerplate
REP_MIN_DF = 25  # report bigrams appearing in >= N distinct docs

_TOKS_SQL = TOKS_SQL  # canonical tokenizer — registry.py
# ceil-split the token list into LINE_TOKENS-sized chunks (last may be short)
_CHUNKS_SQL = f"""
  SELECT doc_id,
         list_transform(range(1, ((len(toks) + {LINE_TOKENS - 1}) // {LINE_TOKENS}) + 1),
           i -> array_to_string(toks[(i-1)*{LINE_TOKENS}+1:(i-1)*{LINE_TOKENS}+{LINE_TOKENS}], ' ')
         ) AS chunks
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
  WHERE len(toks) > 0
"""


def _doc_lines(spark, sf_dir):
    """(doc_id, chunks array<string>) — fixed-size pseudo-lines, built
    with codegen'd ``sequence``/``slice``/``array_join`` (zero Python).

    Deliberately NOT fan_out()-repartitioned: measured at sf0.1, the
    round-robin shuffle of full document texts costs more than the
    single-split tokenize it parallelizes (7.4s vs 2.7s end-to-end) —
    downstream shuffles already spread the exploded lines. On a real
    cluster the scan arrives multi-split anyway."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    w = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    nchunks = F.floor((F.size("toks") + (LINE_TOKENS - 1)) / LINE_TOKENS).cast("int")
    chunk = lambda i: F.array_join(  # noqa: E731
        F.slice(F.col("toks"), (i - 1) * LINE_TOKENS + 1, LINE_TOKENS), " "
    )
    # sequence(1, n) with n <= 0 runs DESCENDING — n >= 1 is guaranteed by
    # the size filter above, but keep the guard for robustness.
    return w.select(
        "doc_id",
        F.when(nchunks >= 1, F.transform(F.sequence(F.lit(1), nchunks), chunk))
        .otherwise(F.array().cast("array<string>"))
        .alias("chunks"),
    )


@query(
    "q_dedup_lines",
    tags=("curation", "llm"),
    oracle=f"""
    WITH c AS ({_CHUNKS_SQL}),
    u AS (
      SELECT doc_id, unnest(chunks) AS line,
             unnest(range(1, len(chunks) + 1)) AS pos
      FROM c
    ),
    f AS (SELECT doc_id, line, min(pos) AS first_pos FROM u GROUP BY doc_id, line)
    SELECT f.doc_id,
           string_agg(f.line, ' ' ORDER BY f.first_pos) AS clean_text,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(any_value(len(c.chunks)) AS BIGINT) AS n_lines
    FROM f JOIN c ON f.doc_id = c.doc_id
    GROUP BY f.doc_id
    """,
)
def q_dedup_lines(spark, sf_dir):
    """Within-document duplicate-line removal. ``array_distinct`` keeps
    the FIRST occurrence in order (matching the oracle's min-position
    reconstruction), so the whole operator is a map-only projection —
    zero shuffle at 100 TB, embarrassingly parallel over any
    partitioning."""
    lines = _doc_lines(spark, sf_dir)
    kept = F.array_distinct("chunks")
    return lines.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        F.size("chunks").cast("long").alias("n_lines"),
    )


@query(
    "q_boilerplate_lines",
    tags=("curation", "llm"),
    bench=True,
    oracle=f"""
    WITH c AS ({_CHUNKS_SQL}),
    u AS (
      SELECT doc_id, unnest(chunks) AS line,
             unnest(range(1, len(chunks) + 1)) AS pos
      FROM c
    ),
    heavy AS (
      SELECT line FROM u GROUP BY line
      HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
    ),
    kept AS (SELECT doc_id, line, pos FROM u ANTI JOIN heavy USING (line)),
    agg AS (
      SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT c.doc_id,
           COALESCE(a.clean_text, '') AS clean_text,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(c.chunks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped
    FROM c LEFT JOIN agg a ON c.doc_id = a.doc_id
    """,
)
def q_boilerplate_lines(spark, sf_dir):
    """Corpus-level boilerplate-line removal (C4-style): a line occurring
    in >= BOILER_MIN_DOCS distinct documents is dropped from every
    document. Plan: one agg on the line value to find the heavy set, one
    left-anti join to drop those positions, one per-doc agg to
    reconstruct — never doc×doc, and every shuffle keys on the line hash
    or doc_id. At 100 TB, hash lines to 8-byte keys first and let AQE
    split the inevitable hot-line skew; the heavy set itself stays small
    (it is *defined* by repetition, i.e. boilerplate, not content)."""
    from incremental_dagster_delta_spark.tables import materialize_release

    # lines / u are each referenced from multiple branches (heavy set,
    # anti-join, final outer join); persisting them runs the tokenize and
    # explode ONCE instead of three times (measured ~3x at sf0.1), with
    # materialize_release freeing the cache before returning.
    lines = _doc_lines(spark, sf_dir).persist()
    u = lines.select(
        "doc_id", F.size("chunks").alias("n_lines"), F.posexplode("chunks").alias("pos", "line")
    ).persist()
    heavy = (
        u.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= BOILER_MIN_DOCS)
        .select("line")
    )
    kept = u.join(heavy, "line", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    out = (
        lines.select("doc_id", F.size("chunks").alias("n_lines"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_dropped"),
        )
    )
    return materialize_release(out, lines, u)


@query(
    "q_repeated_ngrams",
    tags=("curation", "llm"),
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
               i -> array_to_string(toks[i:i+1], ' '))) AS gram
      FROM toks
    )
    SELECT gram,
           CAST(count(*) AS BIGINT) AS total_count,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM g GROUP BY gram
    HAVING count(DISTINCT doc_id) >= {REP_MIN_DF}
    """,
)
def q_repeated_ngrams(spark, sf_dir):
    """Corpus repetition profile: word bigrams with document frequency
    >= REP_MIN_DF, with total occurrence counts — the scan you run to
    pick boilerplate/df-cap thresholds. One explode + one agg keyed on
    the gram; partial (map-side) aggregation absorbs the Zipf head
    before the shuffle, so the reduce side sees near-distinct grams
    regardless of corpus size."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    w = d.select("doc_id", toks.alias("toks"))
    n = F.greatest(F.size("toks") - 1, F.lit(0))
    gram = lambda i: F.array_join(F.slice(F.col("toks"), i, 2), " ")  # noqa: E731
    grams = w.select(
        "doc_id",
        F.explode(
            F.when(n >= 1, F.transform(F.sequence(F.lit(1), n), gram))
            .otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").cast("long").alias("total_count"),
            F.count_distinct("doc_id").cast("long").alias("doc_freq"),
        )
        .where(F.col("doc_freq") >= REP_MIN_DF)
    )


# --------------------------------------------------------------------------
# Dolma-style paragraph Bloom dedup
# --------------------------------------------------------------------------

# Sized for the paragraph key space (distinct corpus paragraphs: ~3.1k at
# sf0.01, ~31k at sf0.1): k·n/m = 0.70 at sf0.1 → ~13% FP drops (visible,
# non-degenerate), ~0.03% at the sf0.01 gate. Production sizes m to the
# expected corpus paragraph count, exactly like Dolma's --bloom_filter_size.
PARA_BLOOM_BITS = 1 << 17  # m
PARA_BLOOM_HASHES = 3  # k

from incremental_dagster_delta_spark.queries.sketches import _md5_pos_sql  # noqa: E402

_PARA_POS_SQL = _md5_pos_sql("j.j", "line", PARA_BLOOM_BITS)


def paragraph_bloom_dedup(batch_paras, corpus_bits):
    """Drop an arriving batch's paragraphs that a corpus Bloom sidecar
    marks possibly-seen (Dolma's paragraph dedup stage: Soldaini et al.
    2024, "Dolma", §4.1 — Bloom-filter dedup at paragraph grain, false
    positives accepted as extra drops). ``batch_paras`` is
    (doc_id, para_pos, key) — ``para_pos`` because the probe's internal
    bit-position column is named ``pos``; ``corpus_bits`` a bit table from
    ``sketches.bloom_bits(..., m=PARA_BLOOM_BITS, k=PARA_BLOOM_HASHES)``
    — possibly holding per-batch PARTIALS, since bit sets union.

    Scale shape: the probe is map-only against the broadcast ≤ m-row bit
    table (the corpus itself never re-shuffles per batch); the only
    shuffle is the per-document regroup, and the collect_list there is
    bounded by document length. Returns one row per batch document:
    (doc_id, clean_text, n_kept, n_paras, n_dropped)."""
    from incremental_dagster_delta_spark.queries.sketches import bloom_possibly

    probed = bloom_possibly(
        corpus_bits, batch_paras, m=PARA_BLOOM_BITS, k=PARA_BLOOM_HASHES
    )
    # collect_list skips nulls, so the when() keeps only non-dup
    # paragraphs; array_sort on (pos, key) structs restores document
    # order before the join.
    kept = F.when(
        ~F.col("possibly_present"), F.struct(F.col("para_pos"), F.col("key"))
    )
    return probed.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s.key), " "
        ).alias("clean_text"),
        F.sum(F.when(F.col("possibly_present"), 0).otherwise(1))
        .cast("long")
        .alias("n_kept"),
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.when(F.col("possibly_present"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
    )


@query(
    "q_bloom_paragraph_dedup",
    tags=("curation", "dedup", "sketch", "llm"),
    oracle=f"""
    WITH c AS ({_CHUNKS_SQL}),
    corpus AS (
      SELECT DISTINCT unnest(chunks) AS line FROM c WHERE doc_id % 10 <> 0
    ),
    bits AS (
      SELECT DISTINCT {_PARA_POS_SQL} AS pos
      FROM corpus CROSS JOIN range({PARA_BLOOM_HASHES}) j(j)
    ),
    batch AS (
      SELECT doc_id, unnest(chunks) AS line,
             unnest(range(1, len(chunks) + 1)) AS pos
      FROM c WHERE doc_id % 10 = 0
    ),
    probe AS (
      SELECT b.doc_id, b.line, b.pos,
             SUM(CASE WHEN t.pos IS NOT NULL THEN 1 ELSE 0 END)
               = {PARA_BLOOM_HASHES} AS dup
      FROM (
        SELECT doc_id, line, pos, {_PARA_POS_SQL} AS bp
        FROM batch CROSS JOIN range({PARA_BLOOM_HASHES}) j(j)
      ) b
      LEFT JOIN bits t ON t.pos = b.bp
      GROUP BY b.doc_id, b.line, b.pos
    )
    SELECT doc_id,
           COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE NOT dup), '')
             AS clean_text,
           CAST(COUNT(*) FILTER (WHERE NOT dup) AS BIGINT) AS n_kept,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(COUNT(*) FILTER (WHERE dup) AS BIGINT) AS n_dropped
    FROM probe GROUP BY doc_id
    """,
)
def q_bloom_paragraph_dedup(spark, sf_dir):
    """Paragraph-grain Bloom dedup of an arriving batch against the
    corpus — the Dolma curation stage (Soldaini et al. 2024 §4.1) that
    exact doc-level and MinHash near-dup both miss: boilerplate and
    quoted paragraphs recurring across distinct documents. Batch = the
    doc_id % 10 == 0 slice, corpus = the rest (the q_bloom_membership
    split).

    The sidecar is the MERGEABLE ``sketches.bloom_bits`` position table
    (bit sets from disjoint corpus batches union to the full filter —
    merge ≡ full pinned in tests/test_sketches.py), so at 100 TB the corpus
    is folded in once, incrementally, with exactly-once ``append_batch``;
    each arriving batch pays one map-side broadcast probe plus a
    document-keyed regroup whose state is bounded by document length.
    False positives (deterministic md5 positions — the oracle replays
    every bit) are EXTRA paragraph drops, the trade Dolma documents;
    false negatives cannot happen, so no duplicate paragraph survives."""
    paras = _doc_lines(spark, sf_dir)
    from incremental_dagster_delta_spark.queries.sketches import bloom_bits

    corpus_keys = (
        paras.where(F.col("doc_id") % 10 != 0)
        .select(F.explode("chunks").alias("key"))
        .distinct()
    )
    bits = bloom_bits(corpus_keys, m=PARA_BLOOM_BITS, k=PARA_BLOOM_HASHES)
    batch = paras.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.posexplode("chunks").alias("para_pos", "key")
    )
    return paragraph_bloom_dedup(batch, bits)
