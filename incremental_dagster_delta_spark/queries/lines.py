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
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_dagster_delta_spark.queries.registry import query, t

LINE_TOKENS = 8  # tokens per pseudo-line
BOILER_MIN_DOCS = 2  # line appearing in >= N distinct docs is boilerplate
REP_MIN_DF = 25  # report bigrams appearing in >= N distinct docs

_TOKS_SQL = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
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
