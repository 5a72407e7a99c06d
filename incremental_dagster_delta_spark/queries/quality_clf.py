"""Trained quality classifier (SURVEY §7-M11) — a fasttext-shape linear
model over hashed bag-of-words features, fit from labels, applied as a
map-only scoring pass.

The model is multinomial Naive Bayes with add-one smoothing: per-bucket
integer log-odds weights

    w_b   = ilogp(c_b|1 + 1, T_1 + D) − ilogp(c_b|0 + 1, T_0 + D)
    bias  = ilogp(n_1 + 1, N + 2)     − ilogp(n_0 + 1, N + 2)
    score = Σ_b x_b · w_b + bias        (exact BIGINT)

over D=256 hashed unigram buckets (first 2 hex nibbles of md5(token) —
the q_dsir_weights feature device, byte-identical across engines). The
training labels are the engine's own rule-based stopword-ratio quality
filter (``RATIO·stop_count ≥ n_tokens``, all-integer, exact): the
classifier DISTILLS the rule filter into a dense linear scorer, the
standard bootstrap for corpus quality models (fasttext classifiers
trained on heuristic labels).

Why a closed-form fit and not gradient descent: full-batch logistic GD
was prototyped first (the SURVEY M11 sketch) and oscillates around the
majority class for every (lr, T) with T small enough to unroll in an
oracle CTE chain — the hashed features are heavily correlated, so both
plain and diagonally-preconditioned steps overshoot; no setting beat
the majority baseline within 12 iterations. The NB fit is the same
model class (linear over hashed counts), trains in ONE pass, beats the
majority baseline at every shipped SF (test-pinned), and its oracle is
a plain CTE chain with no unrolling.

Determinism — all sums are exact BIGINTs; the only float surface is the
single ``ln`` per (bucket, class) before integer rounding
(``floor(ln(c/t)·1e6 + 0.5)``, the unigram-LM ``_ilogp`` device); its
distance from the floor boundary is measured and pinned by
tests/test_quality_clf.py. ``floor(x + 0.5)`` rather than ``round``
because DuckDB rounds half-away while Python rounds half-even.

Scale shape — training is one corpus tokenize pass feeding two
map-side-combinable aggregations (per-doc labels, per-(doc,bucket)
counts), then a D-bounded (257-row) weight table; nothing
corpus-growing is ever collected or broadcast. Scoring joins postings
to the weight table — D-bounded BY CONSTRUCTION (≤ 257 rows at any
corpus size, unlike the distinct-words segmentation tables that must
NOT be hint-broadcast), so the broadcast hint is safe and keeps scoring
map-only at 100 TB; the single wide shuffle is the per-doc margin
groupBy. Reference parity note: the reference repo has no trained
models (transform.py stops at string ops); this module extends the
engine's LLM-curation surface per SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incremental_dagster_delta_spark.queries.bpe import _TOKS_SQL
from incremental_dagster_delta_spark.queries.registry import query, t

N_BUCKETS = 256  # 2 hex nibbles of md5(token)
SCALE = 1_000_000  # integer log-prob scale (shared with unigram_lm)
STOPWORDS = ("the", "a", "of", "to", "is")  # vocab-appropriate subset
RATIO = 12  # label: RATIO * stop_count >= n_tokens (integer-exact)
BIAS_KEY = "zz_bias"  # hex buckets are [0-9a-f]{2}: cannot collide
TRAIN_PCT = 80  # holdout split: md5(doc_id:salt) % 100 < 80 trains
SPLIT_SALT = "qclf"  # decorrelates this split from q_hash_split's


def _toks(docs: DataFrame):
    return F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))


def tok_table(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) — the one corpus tokenize pass."""
    return docs.select("doc_id", F.explode(_toks(docs)).alias("tok"))


def doc_labels(tok: DataFrame) -> DataFrame:
    """(doc_id, y) — the rule label, all-integer so the boundary is
    exact in both engines (no float ratio compare)."""
    is_stop = F.col("tok").isin(*STOPWORDS)
    return tok.groupBy("doc_id").agg(
        F.when(
            RATIO * F.sum(is_stop.cast("long")) >= F.count("*"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("y")
    )


def doc_postings(tok: DataFrame) -> DataFrame:
    """(doc_id, bucket, x) hashed unigram counts."""
    bucket = F.substring(F.md5(F.col("tok").cast("binary")), 1, 2)
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("x"))
    )


def _ilogp_col(c, tot):
    """floor(ln(c/tot)·SCALE + 0.5) as BIGINT — c, tot already floats."""
    return F.floor(F.log(c / tot) * SCALE + F.lit(0.5)).cast("long")


def train_weights(docs: DataFrame) -> DataFrame:
    """(bucket, weight): the fitted integer log-odds, one row per
    observed bucket plus the BIAS_KEY row. ≤ N_BUCKETS+1 rows at any
    corpus size."""
    tok = tok_table(docs)
    return _fit(doc_postings(tok), doc_labels(tok))


def _fit(post: DataFrame, lab: DataFrame) -> DataFrame:
    """The NB fit from prepared postings + labels. Factored so
    :func:`score_docs` feeds the SAME DataFrame instances it scores
    with — identical subtrees let Spark reuse the postings/labels
    exchanges instead of re-tokenizing the corpus per consumer."""
    cls = (
        post.join(lab, "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("y") == 1, F.col("x")).otherwise(0)).alias("cpos"),
            F.sum(F.when(F.col("y") == 0, F.col("x")).otherwise(0)).alias("cneg"),
        )
    )
    tot = cls.agg(F.sum("cpos").alias("tpos"), F.sum("cneg").alias("tneg"))
    w = cls.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            _ilogp_col(F.col("cpos") + 1.0, F.col("tpos") + float(N_BUCKETS))
            - _ilogp_col(F.col("cneg") + 1.0, F.col("tneg") + float(N_BUCKETS))
        ).alias("weight"),
    )
    nn = lab.agg(
        F.sum("y").cast("double").alias("npos"),
        (F.count("*") - F.sum("y")).cast("double").alias("nneg"),
        F.count("*").cast("double").alias("nd"),
    )
    bias = nn.select(
        F.lit(BIAS_KEY).alias("bucket"),
        (
            _ilogp_col(F.col("npos") + 1.0, F.col("nd") + 2.0)
            - _ilogp_col(F.col("nneg") + 1.0, F.col("nd") + 2.0)
        ).alias("weight"),
    )
    return w.unionAll(bias)


def score_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, margin, pred, label): exact integer margin per doc under
    the trained weights; pred = margin ≥ 0. The weight join is hinted
    broadcast — legitimately, because the table is D-bounded by
    construction (contrast bpe.py/unigram_lm.py where the
    distinct-words segmentation table grows with the corpus and must
    stay AQE-decided).

    The combined fit+score lineage re-scans the documents parquet per
    consumer branch (11 scans in the full plan — Spark never
    materializes shared subtrees). An r9 A/B at sf0.1 (REPS=5 medians,
    same session, interleaved) measured both persist-based cures WORSE
    than the re-scans: unpersisted 1.15-1.56 s vs persist(post)+
    persist(lab)+materialize_release 2.43-2.60 s vs persist(tok) 2.26-
    3.22 s — the parallel re-tokenize passes are pure whole-stage
    codegen over a sub-GB parquet, while the persists serialize the DAG
    behind a block-manager write. The re-scan is a linear constant
    factor, kept deliberately; the deployment shape at 100 TB persists
    the ≤257-row weight table from q_quality_classifier once, making
    scoring ONE corpus pass (see docs/PLANS.md)."""
    tok = tok_table(docs)
    lab = doc_labels(tok)
    post = doc_postings(tok)
    w = _fit(post, lab)
    bias = w.where(F.col("bucket") == BIAS_KEY).select(
        F.col("weight").alias("bias_w")
    )
    margins = (
        post.join(F.broadcast(w.where(F.col("bucket") != BIAS_KEY)), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("weight")).alias("dot"))
        .crossJoin(F.broadcast(bias))
        .select("doc_id", (F.col("dot") + F.col("bias_w")).cast("long").alias("margin"))
    )
    return margins.join(lab, "doc_id").select(
        "doc_id",
        "margin",
        (F.col("margin") >= 0).alias("pred"),
        F.col("y").alias("label"),
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

# Shared oracle CTE prefix: tokenize → labels → postings → class counts
# → fitted weights (incl. bias row).
_CLF_CTES = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    lab AS (
      SELECT doc_id,
             CASE WHEN {RATIO} * SUM(CASE WHEN tok IN ({_STOP_IN}) THEN 1 ELSE 0 END)
                       >= COUNT(*) THEN 1 ELSE 0 END AS y
      FROM tok GROUP BY doc_id
    ),
    post AS (
      SELECT doc_id, substring(md5(tok), 1, 2) AS bucket, COUNT(*) AS x
      FROM tok GROUP BY doc_id, substring(md5(tok), 1, 2)
    ),
    cls AS (
      SELECT p.bucket,
             SUM(CASE WHEN l.y = 1 THEN p.x ELSE 0 END) AS cpos,
             SUM(CASE WHEN l.y = 0 THEN p.x ELSE 0 END) AS cneg
      FROM post p JOIN lab l USING (doc_id) GROUP BY p.bucket
    ),
    tot AS (SELECT SUM(cpos) AS tpos, SUM(cneg) AS tneg FROM cls),
    nn AS (
      SELECT CAST(SUM(y) AS DOUBLE) AS npos,
             CAST(COUNT(*) - SUM(y) AS DOUBLE) AS nneg,
             CAST(COUNT(*) AS DOUBLE) AS nd
      FROM lab
    ),
    w AS (
      SELECT bucket,
             CAST(FLOOR(LN((cpos + 1.0) / (tpos + {N_BUCKETS}.0)) * {SCALE} + 0.5)
                - FLOOR(LN((cneg + 1.0) / (tneg + {N_BUCKETS}.0)) * {SCALE} + 0.5)
                AS BIGINT) AS weight
      FROM cls CROSS JOIN tot
      UNION ALL
      SELECT '{BIAS_KEY}',
             CAST(FLOOR(LN((npos + 1.0) / (nd + 2.0)) * {SCALE} + 0.5)
                - FLOOR(LN((nneg + 1.0) / (nd + 2.0)) * {SCALE} + 0.5)
                AS BIGINT)
      FROM nn
    )
"""


@query(
    "q_quality_classifier",
    tags=("curation", "llm", "trained"),
    oracle=_CLF_CTES + "\n    SELECT bucket, weight FROM w",
)
def q_quality_classifier(spark, sf_dir):
    """Fit the hashed-linear quality classifier (NB log-odds) from the
    rule labels: the trained (bucket, weight) table, ≤ 257 rows."""
    return train_weights(t(spark, sf_dir, "documents"))


@query(
    "q_quality_scores",
    tags=("curation", "llm", "trained"),
    bench=True,
    oracle=_CLF_CTES
    + f"""
    SELECT p.doc_id,
           CAST(SUM(p.x * w.weight)
                + (SELECT weight FROM w WHERE bucket = '{BIAS_KEY}') AS BIGINT) AS margin,
           SUM(p.x * w.weight)
                + (SELECT weight FROM w WHERE bucket = '{BIAS_KEY}') >= 0 AS pred,
           CAST(MIN(l.y) AS INT) AS label
    FROM post p
    JOIN w ON p.bucket = w.bucket
    JOIN lab l ON p.doc_id = l.doc_id
    GROUP BY p.doc_id
    """,
)
def q_quality_scores(spark, sf_dir):
    """Score every document under the trained classifier: exact integer
    margin, predicted keep/drop, and the rule label it was trained on.
    Train + score run in ONE self-contained lineage here so the oracle
    gate needs no persisted state; the tokenize subtree therefore feeds
    both the fit and the scoring branches (Spark may or may not reuse
    the exchange). A 100 TB deployment splits the steps: persist the
    ≤257-row weight table from q_quality_classifier once, and scoring
    becomes a single map-side-combinable pass (postings → broadcast
    weight join → margin groupBy) over the corpus."""
    return score_docs(t(spark, sf_dir, "documents"))


def _split_draw():
    """md5(doc_id:salt) % 100 — the q_stratified_sample integer draw
    (exact on both engines, no float compare at the split boundary)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":" + SPLIT_SALT))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )


_DRAW_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':"
    + SPLIT_SALT
    + "'), 1, 8)) AS BIGINT) % 100"
)

_HOLDOUT_ORACLE = f"""
    WITH drw AS (SELECT doc_id, {_DRAW_SQL} AS d FROM documents),
    tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    lab AS (
      SELECT doc_id,
             CASE WHEN {RATIO} * SUM(CASE WHEN tok IN ({_STOP_IN}) THEN 1 ELSE 0 END)
                       >= COUNT(*) THEN 1 ELSE 0 END AS y
      FROM tok GROUP BY doc_id
    ),
    post AS (
      SELECT doc_id, substring(md5(tok), 1, 2) AS bucket, COUNT(*) AS x
      FROM tok GROUP BY doc_id, substring(md5(tok), 1, 2)
    ),
    trl AS (SELECT l.* FROM lab l JOIN drw USING (doc_id) WHERE d < {TRAIN_PCT}),
    trp AS (SELECT p.* FROM post p JOIN drw USING (doc_id) WHERE d < {TRAIN_PCT}),
    cls AS (
      SELECT p.bucket,
             SUM(CASE WHEN l.y = 1 THEN p.x ELSE 0 END) AS cpos,
             SUM(CASE WHEN l.y = 0 THEN p.x ELSE 0 END) AS cneg
      FROM trp p JOIN trl l USING (doc_id) GROUP BY p.bucket
    ),
    tot AS (SELECT SUM(cpos) AS tpos, SUM(cneg) AS tneg FROM cls),
    nn AS (
      SELECT CAST(SUM(y) AS DOUBLE) AS npos,
             CAST(COUNT(*) - SUM(y) AS DOUBLE) AS nneg,
             CAST(COUNT(*) AS DOUBLE) AS nd
      FROM trl
    ),
    w AS (
      SELECT bucket,
             CAST(FLOOR(LN((cpos + 1.0) / (tpos + {N_BUCKETS}.0)) * {SCALE} + 0.5)
                - FLOOR(LN((cneg + 1.0) / (tneg + {N_BUCKETS}.0)) * {SCALE} + 0.5)
                AS BIGINT) AS weight
      FROM cls CROSS JOIN tot
    ),
    bias AS (
      SELECT CAST(FLOOR(LN((npos + 1.0) / (nd + 2.0)) * {SCALE} + 0.5)
                - FLOOR(LN((nneg + 1.0) / (nd + 2.0)) * {SCALE} + 0.5)
                AS BIGINT) AS b
      FROM nn
    ),
    tel AS (SELECT l.* FROM lab l JOIN drw USING (doc_id) WHERE d >= {TRAIN_PCT}),
    tep AS (SELECT p.* FROM post p JOIN drw USING (doc_id) WHERE d >= {TRAIN_PCT}),
    m AS (
      SELECT p.doc_id,
             SUM(p.x * COALESCE(w.weight, 0)) + (SELECT b FROM bias) AS margin
      FROM tep p LEFT JOIN w USING (bucket) GROUP BY p.doc_id
    )
    SELECT CAST((SELECT COUNT(*) FROM trl) AS BIGINT) AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN m.margin >= 0 AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN m.margin >= 0 AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN m.margin < 0 AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN m.margin < 0 AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM m JOIN tel l USING (doc_id)
"""


@query("q_quality_holdout", tags=("curation", "llm", "trained"), oracle=_HOLDOUT_ORACLE)
def q_quality_holdout(spark, sf_dir):
    """Holdout evaluation of the trained classifier: fit on the
    deterministic 80% hash split, score the held-out 20%, and report
    the exact confusion matrix (n_train, n_test, tp, fp, fn, tn) — the
    eval step an honest quality-model pipeline runs before thresholding
    a corpus, with NO train/test leakage (the md5 doc_id draw is a pure
    row function, so the same doc lands on the same side on every
    engine and every rerun). Test-side buckets unseen in training score
    0 log-odds (LEFT JOIN + COALESCE, mirrored in the oracle). Scale
    shape is q_quality_scores' plus one map-only split filter."""
    docs = t(spark, sf_dir, "documents")
    draw = _split_draw()
    train = docs.where(draw < TRAIN_PCT)
    test = docs.where(draw >= TRAIN_PCT)
    tok_tr = tok_table(train)
    lab_tr = doc_labels(tok_tr)
    w = _fit(doc_postings(tok_tr), lab_tr)
    bias = w.where(F.col("bucket") == BIAS_KEY).select(F.col("weight").alias("bias_w"))
    w_feats = w.where(F.col("bucket") != BIAS_KEY)
    tok_te = tok_table(test)
    lab_te = doc_labels(tok_te)
    margins = (
        doc_postings(tok_te)
        .join(F.broadcast(w_feats), "bucket", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.coalesce(F.col("weight"), F.lit(0))).alias("dot"))
        .crossJoin(F.broadcast(bias))
        .select("doc_id", (F.col("dot") + F.col("bias_w")).alias("margin"))
    )
    # n_train counts the LABELLED train set (docs that produced ≥1
    # token), matching the oracle's trl denominator — counting raw
    # train-split rows would diverge on an empty/whitespace-only doc
    # (ADVICE r8, low #2)
    n_train = lab_tr.agg(F.count("*").cast("long").alias("n_train"))
    return (
        margins.join(lab_te, "doc_id")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(((F.col("margin") >= 0) & (F.col("y") == 1)).cast("long")).alias("tp"),
            F.sum(((F.col("margin") >= 0) & (F.col("y") == 0)).cast("long")).alias("fp"),
            F.sum(((F.col("margin") < 0) & (F.col("y") == 1)).cast("long")).alias("fn"),
            F.sum(((F.col("margin") < 0) & (F.col("y") == 0)).cast("long")).alias("tn"),
        )
        .crossJoin(F.broadcast(n_train))
        .select("n_train", "n_test", "tp", "fp", "fn", "tn")
    )


# --------------------------------------------------------------------------
# Inter-annotator agreement (r15). When a curation pipeline runs TWO
# quality raters — a heuristic and a model, or two model versions — the
# decision "do they agree beyond chance" is Cohen's kappa over their
# joint label distribution. Here the two annotators are the engine's
# own deterministic raters: A bins documents by character length, B by
# token count (correlated but not identical — exactly the regime kappa
# is for).
#
# Exactness: with n docs, agree = Σ_k conf[k,k], and chance mass
# S = Σ_k a_k·b_k (row × column marginals),
#   po = agree/n,  pe = S/n²,  κ = (po−pe)/(1−pe) = (n·agree − S)/(n² − S)
# — every quantity an exact BIGINT ratio, emitted as the standard 4-dp
# integer quotient. (κ can be negative; both engines' DIV truncates
# toward zero identically, so the hash seam is still exact.)
#
# Scale shape: one map-side-combined groupBy over (a_lbl, b_lbl) — a
# ≤9-row confusion matrix — then driver-free scalar algebra on the
# broadcast 1-row aggregate. Nothing corpus-sized moves.

KAPPA_CHAR_CUTS = (216, 380)  # character-length terciles at the gate SF
KAPPA_TOK_CUTS = (39, 69)  # token-count terciles at the gate SF

_KAPPA_ORACLE = f"""
    WITH lab AS (
      SELECT doc_id,
             CASE WHEN length(text) < {KAPPA_CHAR_CUTS[0]} THEN 0
                  WHEN length(text) < {KAPPA_CHAR_CUTS[1]} THEN 1
                  ELSE 2 END AS a_lbl,
             CASE WHEN len({_TOKS_SQL}) < {KAPPA_TOK_CUTS[0]} THEN 0
                  WHEN len({_TOKS_SQL}) < {KAPPA_TOK_CUTS[1]} THEN 1
                  ELSE 2 END AS b_lbl
      FROM documents
    ), conf AS (
      SELECT a_lbl, b_lbl, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lab GROUP BY a_lbl, b_lbl
    ), marg AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a_lbl = b_lbl THEN cnt ELSE 0 END) AS BIGINT)
               AS agree,
             CAST((SELECT SUM(a.ac * b.bc) FROM
                    (SELECT a_lbl AS k, SUM(cnt) AS ac FROM conf GROUP BY a_lbl) a
                    JOIN
                    (SELECT b_lbl AS k, SUM(cnt) AS bc FROM conf GROUP BY b_lbl) b
                    USING (k)) AS BIGINT) AS chance
      FROM conf
    )
    SELECT n, agree, chance,
           CAST((2 * agree * 10000 + n) // (2 * n) AS DOUBLE) / 10000 AS po,
           CAST((2 * chance * 10000 + n * n) // (2 * n * n) AS DOUBLE) / 10000
             AS pe,
           CAST(CASE WHEN n * n > chance
                THEN (2 * (n * agree - chance) * 10000 + (n * n - chance))
                     // (2 * (n * n - chance)) END AS DOUBLE) / 10000 AS kappa
    FROM marg
    """


@query("q_cohen_kappa", tags=("curation", "eval", "llm"), oracle=_KAPPA_ORACLE)
def q_cohen_kappa(spark, sf_dir):
    """Cohen's kappa between the two deterministic raters — see the
    family note above. One ≤9-row aggregation, exact BIGINT algebra,
    4-dp integer quotients."""
    lab = t(spark, sf_dir, "documents").select(
        F.when(F.length("text") < KAPPA_CHAR_CUTS[0], 0)
        .when(F.length("text") < KAPPA_CHAR_CUTS[1], 1)
        .otherwise(2)
        .alias("a_lbl"),
        F.when(
            F.size(F.expr("filter(split(lower(text), ' '), x -> x != '')"))
            < KAPPA_TOK_CUTS[0],
            0,
        )
        .when(
            F.size(F.expr("filter(split(lower(text), ' '), x -> x != '')"))
            < KAPPA_TOK_CUTS[1],
            1,
        )
        .otherwise(2)
        .alias("b_lbl"),
    )
    conf = lab.groupBy("a_lbl", "b_lbl").agg(F.count("*").cast("long").alias("cnt"))
    a_marg = conf.groupBy(F.col("a_lbl").alias("k")).agg(F.sum("cnt").alias("ac"))
    b_marg = conf.groupBy(F.col("b_lbl").alias("k")).agg(F.sum("cnt").alias("bc"))
    chance = (
        a_marg.join(b_marg, "k")
        .agg(F.sum(F.col("ac") * F.col("bc")).cast("long").alias("chance"))
    )
    totals = conf.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.when(F.col("a_lbl") == F.col("b_lbl"), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    m = totals.crossJoin(F.broadcast(chance))  # 1-row × 1-row scalar join

    def _q4(num: str, den: str, guard=None):
        e = F.expr(f"(2 * ({num}) * 10000 + ({den})) DIV (2 * ({den}))")
        if guard is not None:
            e = F.when(guard, e)
        return e.cast("double") / 10000

    return m.select(
        "n",
        "agree",
        "chance",
        _q4("agree", "n").alias("po"),
        _q4("chance", "n * n").alias("pe"),
        _q4(
            "n * agree - chance",
            "n * n - chance",
            F.col("n") * F.col("n") > F.col("chance"),
        ).alias("kappa"),
    )
