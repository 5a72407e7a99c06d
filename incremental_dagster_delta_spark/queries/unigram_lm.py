"""Unigram-LM (SentencePiece-shape) subword tokenizer (SURVEY §7-M9) —
the second trained-tokenizer family next to BPE (Kudo 2018, "Subword
Regularization"): seed a substring vocabulary, then alternate Viterbi
segmentation (E) and count re-estimation (M), hard-EM style.

Scale shape — the corpus pays exactly ONE tokenize + word-count pass
(map-side-combinable groupBy), identical to ``bpe.learn_bpe``; every EM
iteration runs on the |distinct words| table. The E-step is the
Spark-first part: Viterbi over a word is a *single projection
expression* — ``F.aggregate`` over character positions with an
accumulator array of (score, seg) structs and the piece scores inlined
as a ``create_map`` literal (the vocab is bounded: |seed| ≈ 100 pieces,
so collecting its counts to the driver is the same legitimate
vocab-bounded scalar as BPE's merge argmax). No joins, no shuffle, no
Python — the whole DP stays inside whole-stage codegen (pinned by
tests/test_plans.py). The M-step is one |V|-bounded shuffle
(explode + groupBy-sum). At 100 TB the corpus pass dominates and
everything downstream is vocab-sized.

Determinism — the DP compares INTEGER-scaled log-probs
(``floor(ln(cnt/total)·1e6 + 0.5)`` as BIGINT): integer sums are exact
in both engines, so Viterbi argmax never sits on a float boundary. Ties
on equal score break on the segmentation string ascending (distinct
boundary sets ⇒ distinct SEP-delimited strings ⇒ total order). The only
float surface is the single ``ln`` per vocab piece before integer
rounding; its distance from the rounding boundary is measured and
pinned by tests/test_unigram_lm.py (the q_pca_topk margin device).
Training words are capped at MAX_WORD_LEN chars (the DP/oracle unroll
bound) — at every shipped SF the corpus max word length is 8 (pinned by
tests/test_unigram_lm.py), so nothing is excluded from TRAINING at the
compared scales. Application (encode/fertility) covers every corpus
word regardless: words outside the trained segmentation fall back to
character-level encoding (:func:`char_fallback_unigram`), mirrored in
the oracles via LEFT JOIN + COALESCE.

Oracle — the q_pagerank / q_bpe_merges device: the identical hard-EM
replayed as unrolled chained CTEs (per EM iteration, one MATERIALIZED
CTE per character position carrying the per-word best (score, seg);
per-word argmax via row_number ORDER BY score DESC, seg).

Reference parity note: the reference repo has no trained tokenizer
(its text path stops at whitespace splits, transform.py:34-41); this
module extends the engine's LLM-curation surface per SURVEY §2.5.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from incremental_dagster_delta_spark.queries.bpe import SEP, _TOKS_SQL
from incremental_dagster_delta_spark.queries.registry import query, t

MAX_PIECE_LEN = 4  # max subword piece length considered
MAX_WORD_LEN = 16  # training word-length cap == DP unroll bound (corpus max is 8)
N_SEED_MULTI = 60  # multi-char seed pieces kept (top by count desc, piece asc)
EM_ITERS = 2  # hard-EM rounds (fixed, unrolled in the oracle)
TOP_K = 40  # vocab rows reported by q_unigram_lm
SCALE = 1_000_000  # integer log-prob scale


def _ilogp(cnt: int, total: int) -> int:
    """floor(ln(cnt/total)·SCALE + 0.5) — the shared integer-scaled
    log-prob. ``floor(x + 0.5)`` (not ``round``) because Python rounds
    half-to-even while DuckDB rounds half-away; floor+0.5 is identical
    everywhere. The margin from the floor boundary is test-pinned."""
    return math.floor(math.log(cnt / total) * SCALE + 0.5)


def _scores(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    return {p: _ilogp(c, total) for p, c in counts.items()}


def word_table(docs: DataFrame) -> DataFrame:
    """(word, freq) over whitespace-split lowercased text — the one
    corpus pass. Words containing SEP or longer than MAX_WORD_LEN are
    excluded from training (none exist at any shipped SF)."""
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    return (
        docs.select(F.explode(toks).alias("word"))
        .where(~F.col("word").contains(SEP) & (F.length("word") <= MAX_WORD_LEN))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def seed_counts(words: DataFrame) -> DataFrame:
    """(piece, cnt): every single character plus the top N_SEED_MULTI
    multi-char substrings (length 2..MAX_PIECE_LEN) by corpus occurrence
    count weighted by word frequency. All-integer, deterministic order."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(MAX_PIECE_LEN)),
            lambda plen: F.filter(
                F.transform(
                    F.sequence(F.lit(0), F.length(w) - 1),
                    lambda p: F.when(
                        p + plen <= F.length(w), F.substr(w, p + F.lit(1), plen)
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    counts = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    chars = counts.where(F.length("piece") == 1)
    multi = (
        counts.where(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(N_SEED_MULTI)
    )
    return chars.unionAll(multi)


def viterbi_seg(word_col, scores: dict[str, int]):
    """Best-segmentation column: the whole Viterbi DP as one expression.

    ``F.aggregate`` folds character positions 1..len(word); the
    accumulator is the dp array of (score, seg) structs (dp[0] = (0,'')).
    At position i the candidates are the ≤ MAX_PIECE_LEN pieces ending
    at i whose text is in the score map; the best is chosen by
    (score desc, seg asc) with an explicit fold comparator, so the
    result is order-of-evaluation independent and bit-identical to the
    oracle's row_number tiebreak."""
    m = F.create_map(
        *[x for p in sorted(scores) for x in (F.lit(p), F.lit(scores[p]))]
    )
    worst = F.struct(
        F.lit(-(1 << 62)).cast("long").alias("score"), F.lit("").alias("seg")
    )

    def step(acc, i):
        def cand(plen):
            j = i - F.lit(plen)
            piece = F.substr(word_col, j + F.lit(1), F.lit(plen))
            # clamped index is only read when j >= 0 (the when-guard)
            prev = F.element_at(acc, F.greatest(j + F.lit(1), F.lit(1)))
            sc = F.try_element_at(m, piece)
            return F.when(
                (j >= F.lit(0)) & sc.isNotNull(),
                F.struct(
                    (prev["score"] + sc).alias("score"),
                    F.concat(prev["seg"], piece, F.lit(SEP)).alias("seg"),
                ),
            )
        cands = F.filter(
            F.array(*[cand(p) for p in range(1, MAX_PIECE_LEN + 1)]),
            lambda c: c.isNotNull(),
        )
        best = F.aggregate(
            cands,
            worst,
            lambda b, c: F.when(
                (c["score"] > b["score"])
                | ((c["score"] == b["score"]) & (c["seg"] < b["seg"])),
                c,
            ).otherwise(b),
        )
        return F.concat(acc, F.array(best))

    n = F.length(word_col)
    init = F.array(F.struct(F.lit(0).cast("long").alias("score"), F.lit("").alias("seg")))
    dp = F.aggregate(F.sequence(F.lit(1), n), init, step)
    return F.element_at(dp, n + F.lit(1))["seg"]


def train_unigram(spark, docs: DataFrame):
    """Run hard-EM; returns ``(segs, counts, words)``:

    - ``segs`` — (word, freq, seg) final Viterbi segmentations of every
      training word (what encoding/fertility consume),
    - ``counts`` — (piece, vcnt) final M-step usage counts (BIGINT),
    - ``words`` — the persisted word table (caller releases via
      ``materialize_release``).

    Per iteration the driver collects only the |V|-bounded count table
    (≈ 100 rows) to inline the next score map — the same vocab-bounded
    driver scalar as ``learn_bpe``'s merge argmax."""
    words = word_table(docs).persist()
    # release on ANY mid-training failure — a dead EM run must not leak
    # its persisted word table into the long-lived session (the
    # materialize_release r15 discipline; learn_bpe has the same guard)
    try:
        # the seed aggregation consumes every partition, so its collect
        # also materializes the words cache — no separate count() job
        # (r16, guide §5 — one driver round-trip instead of two)
        seed = {r["piece"]: r["cnt"] for r in seed_counts(words).collect()}
        scores = _scores(seed)
        segs = None
        counts = None
        for it in range(EM_ITERS):
            segs = words.select(
                "word", "freq", viterbi_seg(F.col("word"), scores).alias("seg")
            )
            pieces = F.filter(F.split("seg", SEP), lambda x: x != F.lit(""))
            counts = (
                segs.select(F.explode(pieces).alias("piece"), "freq")
                .groupBy("piece")
                .agg(F.sum("freq").cast("long").alias("vcnt"))
            )
            if it < EM_ITERS - 1:
                vcnt = {r["piece"]: r["vcnt"] for r in counts.collect()}
                # +1 smoothing over the full seed keeps unused pieces
                # scoreable (hard-EM revival) and every score finite.
                scores = _scores({p: vcnt.get(p, 0) + 1 for p in seed})
    except BaseException:
        words.unpersist()
        raise
    return segs, counts, words


def _words_cte() -> str:
    return f"""WITH words AS MATERIALIZED (
      SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
      WHERE NOT contains(tok, '{SEP}') AND len(tok) <= {MAX_WORD_LEN}
      GROUP BY tok
    ), subs AS (
      SELECT substr(word, p + 1, L) AS piece, freq
      FROM words, range(1, {MAX_PIECE_LEN + 1}) t1(L), range(0, {MAX_WORD_LEN}) t2(p)
      WHERE p + L <= len(word)
    ), piece_counts AS (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM subs GROUP BY piece
    ), seed AS MATERIALIZED (
      SELECT piece, cnt FROM piece_counts WHERE len(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM piece_counts WHERE len(piece) >= 2
        ORDER BY cnt DESC, piece LIMIT {N_SEED_MULTI}
      )
    )"""


def _em_ctes(it: int, vocab_cte: str) -> str:
    """One EM iteration: integer scores from ``vocab_cte`` (piece, cnt),
    then the unrolled per-position Viterbi chain dp{it}_1..dp{it}_MAXW
    and the M-step counts m{it}."""
    parts = [
        f""", v{it} AS MATERIALIZED (
      SELECT piece,
             CAST(floor(ln(cnt * 1.0 / (SELECT sum(cnt) FROM {vocab_cte})) * {SCALE} + 0.5)
                  AS BIGINT) AS s
      FROM {vocab_cte}
    ), dp{it}_0 AS (
      SELECT word, freq, CAST(0 AS BIGINT) AS score, '' AS seg FROM words
    )"""
    ]
    for i in range(1, MAX_WORD_LEN + 1):
        branches = []
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            branches.append(
                f"""SELECT d.word, d.freq, d.score + v.s AS score,
               d.seg || substr(d.word, {j + 1}, {i - j}) || '{SEP}' AS seg
        FROM dp{it}_{j} d JOIN v{it} v ON v.piece = substr(d.word, {j + 1}, {i - j})
        WHERE len(d.word) >= {i}"""
            )
        union = "\n        UNION ALL ".join(branches)
        parts.append(
            f""", dp{it}_{i} AS MATERIALIZED (
      SELECT word, freq, score, seg FROM (
        SELECT c.*, row_number() OVER (PARTITION BY word ORDER BY score DESC, seg) AS rn
        FROM ({union}) c
      ) WHERE rn = 1
    )"""
        )
    final_union = "\n      UNION ALL ".join(
        f"SELECT word, freq, seg FROM dp{it}_{i} WHERE len(word) = {i}"
        for i in range(1, MAX_WORD_LEN + 1)
    )
    parts.append(
        f""", seg{it} AS MATERIALIZED (
      {final_union}
    ), m{it} AS MATERIALIZED (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS vcnt
      FROM (SELECT unnest(list_filter(string_split(seg, '{SEP}'), x -> x <> '')) AS piece,
                   freq
            FROM seg{it})
      GROUP BY piece
    )"""
    )
    return "".join(parts)


def _train_ctes() -> str:
    """Full training chain: seed → EM_ITERS × (scores, DP, M-step).
    Iteration k scores come from the previous M-step's +1-smoothed
    counts over the full seed (vocab{k} CTE)."""
    sql = _words_cte() + _em_ctes(1, "seed")
    for it in range(2, EM_ITERS + 1):
        sql += f""", vocab{it} AS MATERIALIZED (
      SELECT s.piece, COALESCE(m.vcnt, 0) + 1 AS cnt
      FROM seed s LEFT JOIN m{it - 1} m USING (piece)
    )"""
        sql += _em_ctes(it, f"vocab{it}")
    return sql


def _unigram_oracle() -> str:
    return (
        _train_ctes()
        + f"""
    SELECT CAST(row_number() OVER (ORDER BY vcnt DESC, piece) AS BIGINT) AS rank,
           piece, vcnt
    FROM m{EM_ITERS}
    ORDER BY vcnt DESC, piece LIMIT {TOP_K}"""
    )


def _unigram_fertility_oracle() -> str:
    return (
        _train_ctes()
        + f""", vocab AS (
      SELECT word,
             CAST(len(list_filter(string_split(seg, '{SEP}'), x -> x <> '')) AS BIGINT)
               AS n_toks
      FROM seg{EM_ITERS}
    ), doc_words AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
    )
    SELECT doc.lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(COALESCE(v.n_toks, length(d.word))) AS BIGINT) AS n_unigram_tokens,
           CAST(ROUND(sum(COALESCE(v.n_toks, length(d.word))) / (1.0 * count(*)), 4)
                AS DOUBLE) AS fertility,
           CAST(ROUND(sum(length(d.word)) / (1.0 * count(*)), 4) AS DOUBLE)
             AS avg_word_len
    FROM doc_words d
    LEFT JOIN vocab v USING (word)
    JOIN documents doc USING (doc_id)
    GROUP BY doc.lang"""
    )


@query("q_unigram_lm", tags=("text", "llm"), oracle=_unigram_oracle(), bench=True)
def q_unigram_lm(spark, sf_dir):
    """Train the unigram-LM tokenizer over the documents corpus and
    report the final vocabulary: the top TOP_K pieces by Viterbi usage
    count after EM_ITERS hard-EM rounds, as (rank, piece, vcnt). All
    values are exact integers (see the module determinism story); the
    rank window runs on the ≤|V|-row count table (vocab-bounded, like
    BPE's merge table — not a corpus-sized single-partition sort)."""
    from incremental_dagster_delta_spark.tables import materialize_release
    from pyspark.sql import Window

    _, counts, words = train_unigram(spark, t(spark, sf_dir, "documents"))
    w = Window.orderBy(F.col("vcnt").desc(), "piece")
    out = (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("rank", "piece", "vcnt")
    )
    return materialize_release(out, words)


@query("q_unigram_fertility", tags=("text", "llm"), oracle=_unigram_fertility_oracle())
def q_unigram_fertility(spark, sf_dir):
    """Per-language fertility under the trained unigram-LM vocab — the
    same coverage-fairness metric as q_tokenizer_fertility but against
    the second tokenizer family, via the shared
    ``bpe.fertility_by_lang`` helper (the round-6 verdict's 'accept
    either tokenizer' rewiring): any (word, n_toks) segmentation table
    plugs in. Scale shape: one corpus explode + an UNHINTED word-keyed
    join against the |distinct words|-row segmentation + a |langs|-row
    agg; OOV words take the unigram char-fallback."""
    from incremental_dagster_delta_spark.queries.bpe import fertility_by_lang
    from incremental_dagster_delta_spark.tables import materialize_release

    docs = t(spark, sf_dir, "documents")
    segs, _, words = train_unigram(spark, docs)
    pieces = F.filter(F.split("seg", SEP), lambda x: x != F.lit(""))
    seg = segs.select("word", F.size(pieces).cast("long").alias("n_toks"))
    out = fertility_by_lang(
        docs, seg, tokens_alias="n_unigram_tokens", fallback=char_fallback_unigram
    )
    return materialize_release(out, words)


def _unigram_encode_oracle() -> str:
    return (
        _train_ctes()
        + f""", vocab AS (
      SELECT word,
             CAST(len(list_filter(string_split(seg, '{SEP}'), x -> x <> '')) AS BIGINT)
               AS n_toks
      FROM seg{EM_ITERS}
    ), doc_words AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
    )
    SELECT d.doc_id,
           CAST(sum(COALESCE(v.n_toks, length(d.word))) AS BIGINT) AS n_unigram_tokens,
           CAST(sum(length(d.word)) AS BIGINT) AS n_chars,
           CAST(ROUND(sum(length(d.word))
                      / (1.0 * sum(COALESCE(v.n_toks, length(d.word)))), 4) AS DOUBLE)
             AS compression
    FROM doc_words d LEFT JOIN vocab v USING (word)
    GROUP BY d.doc_id"""
    )


def char_fallback_unigram(word_col):
    """OOV token count for a word outside the trained segmentation
    (longer than MAX_WORD_LEN or containing SEP — excluded from
    training): character-level encoding, one token per character —
    SentencePiece's byte/char-fallback shape. An entirely-OOV document
    therefore has compression exactly 1."""
    return F.length(word_col)


def encode_unigram(docs, seg):
    """Corpus encode given the trained (word, n_toks) Viterbi
    segmentation: one explode + a word-keyed LEFT join against the
    |distinct words|-row segmentation table + one doc-keyed agg. The
    seg table grows with the corpus's distinct-word count (Heaps' law:
    10^8-10^9 rows at 100 TB), so the join is deliberately UNHINTED —
    AQE broadcasts only when runtime stats justify it (pinned by
    tests/test_plans.py). OOV words fall back to char-level counts."""
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    doc_words = docs.select("doc_id", F.explode(toks).alias("word"))
    n_toks = F.coalesce(F.col("n_toks"), char_fallback_unigram(F.col("word")))
    return (
        doc_words.join(seg, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(n_toks).cast("long").alias("n_unigram_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.round(F.sum(F.length("word")) / (1.0 * F.sum(n_toks)), 4)
            .cast("double")
            .alias("compression"),
        )
    )


@query("q_unigram_encode", tags=("text", "llm"), oracle=_unigram_encode_oracle())
def q_unigram_encode(spark, sf_dir):
    """Encode the corpus with the trained unigram-LM vocab: per document
    the Viterbi token count, character count, and compression ratio —
    the q_bpe_encode twin for the second tokenizer family. Encoding
    never re-runs EM over the corpus: a word's token count is a pure
    function of the trained vocab — see :func:`encode_unigram` for the
    join shape and OOV char-fallback."""
    from incremental_dagster_delta_spark.tables import materialize_release

    docs = t(spark, sf_dir, "documents")
    segs, _, words = train_unigram(spark, docs)
    pieces = F.filter(F.split("seg", SEP), lambda x: x != F.lit(""))
    seg = segs.select("word", F.size(pieces).cast("long").alias("n_toks"))
    return materialize_release(encode_unigram(docs, seg), words)
